"""Orbax checkpointing for {LoRA, connector} adapters and full params.

The reference persists only PEFT adapter checkpoints via trainer.save_model
(train.py:25) and re-applies them onto a hub-fetched base
(models/modeling_live.py:215-216). Here: Orbax for adapters/full trees; the
base Llama weights are converted once from HF safetensors
(models/convert.py) and referenced by path.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


def save_params(path: str, params: Dict[str, Any]) -> None:
    ckptr = _checkpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def restore_params(path: str, like: Optional[Dict[str, Any]] = None
                   ) -> Dict[str, Any]:
    """Restore a param tree onto the CURRENT default device.

    Checkpoints record the shardings they were saved with; restoring a
    CPU-converted checkpoint (tools/convert_weights.py) on a TPU then fails
    with "Device TFRT_CPU_0 was not found". Build the restore target from
    the checkpoint's own metadata with a single-device sharding on this
    platform instead."""
    import orbax.checkpoint as ocp

    ckptr = _checkpointer()
    path = os.path.abspath(path)
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    if like is not None:
        target = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype,
                                           sharding=sharding), like)
        return ckptr.restore(path, target)
    meta = ckptr.metadata(path)
    tree_meta = getattr(meta, "item_metadata", meta)
    target = jax.tree.map(
        lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding),
        tree_meta)
    return ckptr.restore(path, target)


def save_adapter(path: str, params: Dict[str, Any]) -> None:
    """Persist just the trainable subtree (lora + connector), the PEFT-
    checkpoint equivalent."""
    adapter = {k: params[k] for k in ("lora", "connector") if k in params}
    save_params(path, adapter)


def load_adapter_into(params: Dict[str, Any], path: str) -> Dict[str, Any]:
    adapter_like = {k: params[k] for k in ("lora", "connector") if k in params}
    adapter = restore_params(path, like=adapter_like)
    out = dict(params)
    out.update(adapter)
    return out


# ---------------------------------------------------------------------------
# full training-state checkpoints (trainable params + optimizer state + step)
# — the reference relies on HF Trainer's checkpoint/resume semantics
# (SURVEY.md §5); here the whole TrainState round-trips through Orbax so a
# preempted TPU job resumes exactly (same step, same Adam moments).


def save_train_state(path: str, state) -> None:
    tree = {"step": state.step, "trainable": state.trainable,
            "opt_state": state.opt_state}
    save_params(path, tree)


def restore_train_state(path: str, like_state):
    like = {"step": like_state.step, "trainable": like_state.trainable,
            "opt_state": like_state.opt_state}
    tree = restore_params(path, like=like)
    return type(like_state)(step=tree["step"], trainable=tree["trainable"],
                            opt_state=tree["opt_state"])
