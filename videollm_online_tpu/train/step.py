"""pjit training step: weighted streaming CE over LoRA + connector.

TPU-native replacement for HF Trainer + DeepSpeed ZeRO (reference train.py,
engine/trainer_with_gen2eval.py, configs/deepspeed/*.json):

  * one jitted step = forward (remat over layers) + backward + AdamW update;
  * gradient accumulation is a ``lax.scan`` over a leading microbatch axis
    inside the same jit (reference: grad-accum 8, scripts/ego4d/live1+.sh);
  * distribution is declarative: parameters/optimizer state follow the
    PartitionSpecs from parallel/sharding.py; batch is sharded over ``data``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.config import LiveConfig
from ..models import live
from . import optim


class TrainState(NamedTuple):
    step: jax.Array
    trainable: Dict[str, Any]
    opt_state: Any


def init_train_state(params: Dict[str, Any], tx: optax.GradientTransformation
                     ) -> Tuple[TrainState, Dict[str, Any]]:
    trainable, frozen = optim.split_trainable(params)
    return TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                      opt_state=tx.init(trainable)), frozen


def loss_fn(trainable, frozen, cfg: LiveConfig, batch, *, remat=True,
            attn_impl=None, dropout_rng=None, chunked_loss=False,
            loss_chunk=None, remat_group=1):
    params = optim.merge_params(trainable, frozen)
    _, loss, _ = live.forward(
        params, cfg,
        input_ids=batch["input_ids"],
        frames=batch.get("frames"),
        labels=batch["labels"],
        remat=remat,
        attn_impl=attn_impl,
        dropout_rng=dropout_rng,
        chunked_loss=chunked_loss,
        loss_chunk=loss_chunk,
        remat_group=remat_group,
    )
    return loss


def train_step(state: TrainState, frozen, batch, *, cfg: LiveConfig,
               tx: optax.GradientTransformation, accum_steps: int = 1,
               attn_impl=None, chunked_loss: bool = False,
               loss_chunk=None,
               remat_group: int = 1) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """One optimizer step. With ``accum_steps > 1``, every array in ``batch``
    must carry a leading (accum_steps, ...) axis; gradients are averaged by a
    scan before the update.

    LoRA dropout (reference PEFT lora_dropout=0.05, modeling_live.py:207) is
    driven by a per-step rng folded from the step counter — deterministic
    resume, no rng state to checkpoint. The key uses the ``rbg`` PRNG: mask
    BITS come from the TPU's hardware RngBitGenerator instead of threefry
    (key split/fold stays threefry — cheap, keys are tiny). Measured on the
    chip: 112 dropout sites over (1, 4096, 2048) cost 296.7 ms as threefry
    vs 13.3 ms as rbg; in the 1B train step that was 113.9 ms (22%) of
    515.9 — dropout bits were the single largest non-matmul cost
    (benchmarks/train_bench.py --attrib, round 4)."""
    step_rng = jax.random.fold_in(
        jax.random.key(0x10ad, impl="rbg"), state.step)

    def grads_of(b, rng):
        return jax.value_and_grad(loss_fn)(state.trainable, frozen, cfg, b,
                                           attn_impl=attn_impl,
                                           dropout_rng=rng,
                                           chunked_loss=chunked_loss,
                                           loss_chunk=loss_chunk,
                                           remat_group=remat_group)

    if accum_steps == 1:
        loss, grads = grads_of(batch, step_rng)
    else:
        def body(carry, xs):
            microbatch, micro_rng = xs
            loss_acc, grad_acc = carry
            loss, grads = grads_of(microbatch, micro_rng)
            return (loss_acc + loss,
                    jax.tree.map(jnp.add, grad_acc, grads)), None

        zeros = jax.tree.map(jnp.zeros_like, state.trainable)
        micro_rngs = jax.random.split(step_rng, accum_steps)
        (loss, grads), _ = jax.lax.scan(body, (jnp.zeros(()), zeros),
                                        (batch, micro_rngs))
        loss = loss / accum_steps
        grads = jax.tree.map(lambda g: g / accum_steps, grads)

    updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
    trainable = optax.apply_updates(state.trainable, updates)
    metrics = {
        "loss": loss,
        "grad_norm": optax.global_norm(grads),
        "step": state.step,
    }
    return TrainState(state.step + 1, trainable, opt_state), metrics


def make_jitted_train_step(cfg: LiveConfig, tx, accum_steps: int = 1,
                           attn_impl=None, chunked_loss: bool = False,
                           loss_chunk=None, remat_group: int = 1):
    """Jitted step; shard the inputs with :func:`shard_params` /
    :func:`shard_batch` first and GSPMD propagates from argument shardings.

    ``chunked_loss`` streams the weighted CE through LOSS_CHUNK-position
    lm_head chunks (see live._stream_ce_loss_chunked) — required to fit 8B
    full-vocab training at the reference's live1+ sequence lengths (T≈8-12k)
    on a single 16 GiB chip."""
    step = functools.partial(train_step, cfg=cfg, tx=tx,
                             accum_steps=accum_steps, attn_impl=attn_impl,
                             chunked_loss=chunked_loss,
                             loss_chunk=loss_chunk, remat_group=remat_group)
    return jax.jit(step, donate_argnums=(0,))


def shard_params(params, mesh, policy: str = "fsdp_tp"):
    """device_put a param pytree according to the sharding rules."""
    from jax.sharding import NamedSharding
    from ..parallel import sharding as shd

    specs = shd.param_specs(params, policy)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def shard_batch(batch, mesh, accum_axis: bool = False):
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel.mesh import DATA_AXIS

    spec = P(None, DATA_AXIS) if accum_axis else P(DATA_AXIS)
    data_size = mesh.shape[DATA_AXIS]
    out = {}
    for k, v in batch.items():
        if v is None:
            out[k] = None
        elif k == "frames":
            # frames are flattened across the batch (collator concat) — their
            # leading dim is total-frames, not batch; replicate in v0 (the
            # joint_embed gather then stays shard-local on the text side).
            out[k] = jax.device_put(v, NamedSharding(mesh, P()))
        else:
            batch_dim = v.shape[1] if accum_axis else v.shape[0]
            if batch_dim % data_size:
                # batch smaller than / indivisible by the data axis (e.g.
                # batch 1 on a data=4 mesh): replicate rather than fail —
                # GSPMD still shards the sequence-level compute
                out[k] = jax.device_put(v, NamedSharding(mesh, P()))
            else:
                out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out
