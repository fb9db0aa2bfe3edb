"""Optimizer + LR schedule for LoRA/connector finetuning.

Replaces the reference's HF Trainer + DeepSpeed optimizer stack
(scripts/*: AdamW, cosine schedule, 5% warmup, lr 2e-4, bf16; the base LLM is
frozen and only LoRA + connector train, models/modeling_live.py:203-213).
Optimizer state sharding falls out of pjit: the state pytree inherits the
parameter PartitionSpecs (= ZeRO-1/2 equivalence for free).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import optax


class OptimConfig(NamedTuple):
    learning_rate: float = 2e-4
    warmup_ratio: float = 0.05
    total_steps: int = 1000
    weight_decay: float = 0.0
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    max_grad_norm: float = 1.0
    schedule: str = "cosine"  # or "constant"
    # Adam first-moment dtype ('' = follow the param dtype, optax default).
    # NOTE: trainables (LoRA/connector) are bf16, so mu AND nu are already
    # bf16 by default — measured: --mu_dtype bfloat16 reproduces the exact
    # same 15.99G OOM at 8B x T=12288 rg=2 (train_bench), i.e. moment
    # memory is NOT the fit boundary there. Kept for f32-trainable setups.
    mu_dtype: str = ""


def make_schedule(cfg: OptimConfig):
    warmup = max(int(cfg.total_steps * cfg.warmup_ratio), 1)
    if cfg.schedule == "constant":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.learning_rate, warmup),
             optax.constant_schedule(cfg.learning_rate)], [warmup])
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=cfg.learning_rate,
        warmup_steps=warmup, decay_steps=max(cfg.total_steps, warmup + 1),
        end_value=0.0)


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(make_schedule(cfg), b1=cfg.b1, b2=cfg.b2, eps=cfg.eps,
                    weight_decay=cfg.weight_decay,
                    mu_dtype=cfg.mu_dtype or None),
    )


def split_trainable(params: dict):
    """(trainable, frozen): LoRA + connector train; the Llama base is frozen
    (reference finetune_modules=['connector'] + LoRA adapters,
    models/arguments_live.py:16-19)."""
    trainable = {k: params[k] for k in ("lora", "connector") if k in params}
    frozen = {k: v for k, v in params.items() if k not in trainable}
    return trainable, frozen


def merge_params(trainable: dict, frozen: dict) -> dict:
    out = dict(frozen)
    out.update(trainable)
    return out


def count_params(tree: Any) -> int:
    return sum(x.size for x in jax.tree.leaves(tree))
