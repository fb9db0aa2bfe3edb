"""Host-offloaded optimizer state — the TPU-native analog of the
reference's DeepSpeed ZeRO-2 CPU offload (reference
configs/deepspeed/zero2offload.json:5-8 moves Adam moments + the update
math to host RAM; scripts select it for the memory-tight runs).

Here the Adam moments persist in PINNED HOST memory between steps instead
of HBM, via JAX memory kinds (no DeepSpeed, no torch):

  * ``in_step=True`` (real TPU): the jitted step takes the moments as
    ``pinned_host`` inputs, streams them on-chip with
    ``jax.memory.Space.Device``, and writes the updated moments straight
    back to host memory inside the SAME program — HBM never holds a
    persistent copy, and XLA overlaps the PCIe/host DMA with compute.
  * ``in_step=False`` (fallback): the driver moves the moments
    HBM<->pinned_host at the step boundary. The CPU backend has no
    ``annotate_device_placement`` custom-call (and its SPMD partitioner
    rejects it multi-device), so tests and CPU smoke runs use this path;
    HBM is then free of the moments BETWEEN steps (the update itself
    still peaks with them resident).

``make_offload_train_step`` probes the backend once and picks the best
variant; both produce bit-identical training to the on-device step
(tests/test_offload.py).

For the 8B LoRA+connector recipe the moments are small (only trainable
params carry state, models/arguments_live.py:16-19 analog) — this exists
for parity with the reference's config matrix (SURVEY.md §2.3 ZeRO row)
and for full-finetune variants where the moments rival the weights.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax

from . import step as step_mod


def _with_kind(tree: Any, kind: str) -> Any:
    """device_put every non-scalar leaf onto its CURRENT sharding with a
    different memory kind (layout/spec preserved — only the memory space
    moves). Scalars (optax step counters) stay put: they are free, and
    pinning an eagerly-initialized uncommitted scalar would COMMIT it to
    one device, clashing with mesh-committed moments in the same jit."""
    return jax.tree.map(
        lambda x: x if getattr(x, "ndim", 0) == 0
        else jax.device_put(x, x.sharding.with_memory_kind(kind)),
        tree)


def to_host(tree: Any) -> Any:
    """Move a pytree (optimizer moments) to pinned host memory."""
    return _with_kind(tree, "pinned_host")


def to_device(tree: Any) -> Any:
    """Move a pytree back to device (HBM) memory."""
    return _with_kind(tree, "device")


@functools.lru_cache(maxsize=1)
def supports_in_step_offload() -> bool:
    """Probe: can this backend compile a program whose output is annotated
    into pinned_host? True on TPU; False on the CPU test backend."""
    import jax.numpy as jnp
    try:
        dev = jax.devices()[0]
        s = jax.sharding.SingleDeviceSharding(dev,
                                              memory_kind="pinned_host")
        x = jax.device_put(jnp.zeros((8,), jnp.float32), s)

        def f(a):
            a = jax.device_put(a, jax.memory.Space.Device)
            return jax.device_put(a + 1.0, jax.memory.Space.Host)

        y = jax.jit(f, in_shardings=(s,), out_shardings=s)(x)
        return y.sharding.memory_kind == "pinned_host"
    except Exception:
        return False


def make_offload_train_step(cfg, tx, accum_steps: int = 1, attn_impl=None,
                            in_step: Optional[bool] = None,
                            chunked_loss: bool = False,
                            loss_chunk: Optional[int] = None,
                            remat_group: int = 1):
    """A drop-in replacement for :func:`step.make_jitted_train_step` whose
    optimizer state lives in pinned host memory between steps. The state
    passed in must already be host-resident (:func:`offload_state`)."""
    if in_step is None:
        in_step = supports_in_step_offload()

    if in_step:
        def inner(state, frozen, batch):
            state = state._replace(
                opt_state=jax.device_put(state.opt_state,
                                         jax.memory.Space.Device))
            state, metrics = step_mod.train_step(
                state, frozen, batch, cfg=cfg, tx=tx,
                accum_steps=accum_steps, attn_impl=attn_impl,
                chunked_loss=chunked_loss, loss_chunk=loss_chunk,
                remat_group=remat_group)
            state = state._replace(
                opt_state=jax.device_put(state.opt_state,
                                         jax.memory.Space.Host))
            return state, metrics

        return jax.jit(inner, donate_argnums=(0,))

    base = step_mod.make_jitted_train_step(cfg, tx,
                                           accum_steps=accum_steps,
                                           attn_impl=attn_impl,
                                           chunked_loss=chunked_loss,
                                           loss_chunk=loss_chunk,
                                           remat_group=remat_group)

    def boundary(state, frozen, batch):
        state = state._replace(opt_state=to_device(state.opt_state))
        state, metrics = base(state, frozen, batch)
        state = state._replace(opt_state=to_host(state.opt_state))
        return state, metrics

    return boundary


def offload_state(state: step_mod.TrainState) -> step_mod.TrainState:
    """Move a TrainState's optimizer moments to pinned host memory."""
    return state._replace(opt_state=to_host(state.opt_state))
