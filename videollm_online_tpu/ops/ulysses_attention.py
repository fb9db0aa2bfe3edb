"""Ulysses-style sequence parallelism: all-to-all head/sequence repartition.

SURVEY §2.3 lists SP/Ulysses as absent from the reference (DeepSpeed-Ulysses
was its ecosystem's long-sequence option; the reference itself truncates to
max_num_frames, models/arguments_live.py:37,47). This is the TPU-native
construction, complementary to ops/ring_attention.py (CP):

  * activations enter SEQUENCE-sharded (B, H, T/N, d) per device — exactly
    the layout the decoder's other (purely token-local) matmuls want under
    GSPMD sequence sharding;
  * one ``lax.all_to_all`` per operand repartitions to HEAD-sharded
    (B, H/N, T, d) — each device then runs ordinary full-sequence attention
    (the Pallas flash kernel on TPU) for its head slice, with no
    communication inside the softmax;
  * one reverse all-to-all restores sequence sharding on the output.

Ring vs Ulysses trade-off: ring keeps memory strictly O(T/N) per device and
overlaps ICI with compute but pays N permute steps; Ulysses pays 2 (cheap,
bisection-friendly) all-to-alls total and keeps the attention kernel
monolithic (better MXU utilization), but each device holds H/N * T — it
needs H >= N and moderate T. For the 10-minute live1+ regime Ulysses wins;
for hour-long live1 streams the ring's memory bound wins.

All-to-alls are differentiable (their transpose is the reverse all-to-all),
so ``jax.grad`` gives the standard Ulysses backward. Validated against
single-device full attention on the 8-virtual-device CPU mesh
(tests/test_ulysses_attention.py); the identical program lowers to ICI
all-to-alls on a real slice.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _local_full_attn(q, k, v, scale, causal):
    """Ordinary full attention on the device-local head slice (B, Hl, T, d).
    On TPU this is the Pallas flash kernel (MXU path, fp32 online softmax);
    elsewhere the XLA einsum reference."""
    T, d = q.shape[2], q.shape[3]
    if (jax.default_backend() == "tpu" and causal and T % 128 == 0
            and d in (64, 128, 256)):
        from .flash_attention import flash_attention
        return flash_attention(q, k, v, scale, True, 0)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        s = jnp.where((cols <= rows)[None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v)


def _ulysses_local(q, k, v, *, axis_name, scale, causal):
    """shard_map body: local shards (B, H, T/N, d) -> same layout out."""
    a2a = functools.partial(jax.lax.all_to_all, axis_name=axis_name,
                            tiled=True)
    # heads scatter, sequence gather: (B, H, T/N, d) -> (B, H/N, T, d)
    qh = a2a(q, split_axis=1, concat_axis=2)
    kh = a2a(k, split_axis=1, concat_axis=2)
    vh = a2a(v, split_axis=1, concat_axis=2)
    oh = _local_full_attn(qh, kh, vh, scale, causal)
    # heads gather, sequence scatter: back to (B, H, T/N, d)
    return a2a(oh, split_axis=2, concat_axis=1)


def ulysses_attention(q, k, v, *, mesh: Mesh, axis_name: str,
                      scale: Optional[float] = None, causal: bool = True,
                      batch_axis: Optional[str] = None):
    """Sequence-parallel attention: q/k/v (B, H, T, d) with T sharded over
    ``axis_name`` of ``mesh`` (and optionally B over ``batch_axis``).
    Returns (B, H, T, d) sharded the same way.

    Requires H % axis_size == 0 (each device computes >= 1 full head) and
    T % axis_size == 0. Gradients supported (autodiff through the
    all-to-alls)."""
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    n = mesh.shape[axis_name]
    assert q.shape[1] % n == 0, (
        f"Ulysses needs heads {q.shape[1]} divisible by axis {axis_name}={n} "
        "(use ops.ring_attention for head-poor, sequence-rich shapes)")
    assert q.shape[2] % n == 0, (q.shape, n)
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    spec = P(batch_axis, None, axis_name, None)
    fn = shard_map(
        functools.partial(_ulysses_local, axis_name=axis_name, scale=scale,
                          causal=causal),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    return fn(q, k, v)


def make_ulysses_attn(mesh: Mesh, axis_name: str,
                      batch_axis: Optional[str] = None):
    """attn_impl adapter for llama.forward's full-causal TRAINING path:
    Ulysses sequence parallelism over ``axis_name``. GQA kv heads are
    expanded to full query heads first so the head all-to-all is uniform
    (same choice as make_ring_attn)."""
    def impl(q, k, v, q_pos, kv_valid_upto, *, num_groups,
             sliding_window=None):
        assert sliding_window is None, (
            "ulysses attention: sliding window not supported")
        if q.shape[2] != k.shape[2]:
            # cache-decode shapes (generation inside the trainer's eval):
            # SP applies to the full-causal training forward only
            from .auto import auto_attention
            return auto_attention(q, k, v, q_pos, kv_valid_upto,
                                  num_groups=num_groups,
                                  sliding_window=sliding_window)
        if num_groups > 1:
            k = jnp.repeat(k, num_groups, axis=1)
            v = jnp.repeat(v, num_groups, axis=1)
        return ulysses_attention(q, k, v, mesh=mesh, axis_name=axis_name,
                                 causal=True, batch_axis=batch_axis)
    return impl
