"""Parameter/activation partition rules (the ZeRO + Megatron-TP equivalent).

The reference delegated all distribution to DeepSpeed ZeRO over NCCL
(configs/deepspeed/zero{1,2,3}.json). Here distribution is declarative: a
pytree of `PartitionSpec`s computed from parameter *path names*; `pjit`/GSPMD
inserts the collectives.

Policies:
  * ``tp``       — Megatron-style tensor parallel over the ``model`` axis
                   (column-parallel qkv/gate/up, row-parallel o/down).
  * ``fsdp_tp``  — additionally shards the non-TP dimension of every large
                   matrix over the ``data`` axis (fully-sharded params =
                   ZeRO-3 equivalence; optimizer state inherits the same
                   specs, = ZeRO-1/2).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

# (path-substring, policy) -> spec. Paths are '/'-joined key paths into the
# param pytree (see models/llama.py for the tree layout). Layer-stacked
# params carry a leading layer dim which is always replicated.
_RULES = [
    # LoRA overlays FIRST (their paths contain the base-weight names)
    ("lora_a",      {"tp": P(),                         "fsdp_tp": P()}),
    ("lora_b",      {"tp": P(),                         "fsdp_tp": P()}),
    # decoder
    ("embed",       {"tp": P(None, MODEL_AXIS),        "fsdp_tp": P(DATA_AXIS, MODEL_AXIS)}),
    ("wq",          {"tp": P(None, None, MODEL_AXIS),  "fsdp_tp": P(None, DATA_AXIS, MODEL_AXIS)}),
    ("wk",          {"tp": P(None, None, MODEL_AXIS),  "fsdp_tp": P(None, DATA_AXIS, MODEL_AXIS)}),
    ("wv",          {"tp": P(None, None, MODEL_AXIS),  "fsdp_tp": P(None, DATA_AXIS, MODEL_AXIS)}),
    ("wo",          {"tp": P(None, MODEL_AXIS, None),  "fsdp_tp": P(None, MODEL_AXIS, DATA_AXIS)}),
    ("w_gate",      {"tp": P(None, None, MODEL_AXIS),  "fsdp_tp": P(None, DATA_AXIS, MODEL_AXIS)}),
    ("w_up",        {"tp": P(None, None, MODEL_AXIS),  "fsdp_tp": P(None, DATA_AXIS, MODEL_AXIS)}),
    ("w_down",      {"tp": P(None, MODEL_AXIS, None),  "fsdp_tp": P(None, MODEL_AXIS, DATA_AXIS)}),
    ("lm_head",     {"tp": P(None, MODEL_AXIS),        "fsdp_tp": P(DATA_AXIS, MODEL_AXIS)}),
    # vision encoder (replicated over model axis in v0; its matmuls are small
    # relative to the decoder and it runs on the encode stage of the pipeline)
    ("vision",      {"tp": P(),                         "fsdp_tp": P()}),
    # connector MLP (1024->D->D; reference modeling_live_llama.py:18-22)
    ("connector",   {"tp": P(),                         "fsdp_tp": P()}),
]


def _spec_for_path(path: str, policy: str, ndim: int) -> P:
    for needle, by_policy in _RULES:
        if needle in path:
            spec = by_policy[policy]
            if len(spec) == 0:  # replicated — valid for any rank
                return spec
            # unstacked variant of a layer-stacked rule (e.g. a single layer's
            # weight, or per-layer norms)
            if len(spec) > ndim:
                spec = P(*spec[len(spec) - ndim:])
            if len(spec) < ndim:
                spec = P(*((None,) * (ndim - len(spec)) + tuple(spec)))
            return spec
    return P()  # replicate norms, biases, everything small


def param_specs(params: Any, policy: str = "tp") -> Any:
    """PartitionSpec pytree matching ``params`` under ``policy``."""
    assert policy in ("tp", "fsdp_tp"), policy

    def spec(path, leaf):
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        return _spec_for_path(name, policy, getattr(leaf, "ndim", 0))

    return jax.tree_util.tree_map_with_path(spec, params)


def batch_spec() -> P:
    """Activations: batch over the data axis."""
    return P(DATA_AXIS)


def kv_cache_spec() -> P:
    """KV cache (layers, batch, kv_heads, max_len, head_dim): heads over TP."""
    return P(None, DATA_AXIS, MODEL_AXIS, None, None)
