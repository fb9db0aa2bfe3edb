"""Automatic attention-kernel dispatch.

One adapter with the models.llama._attention signature that routes to the
right implementation per call shape:
  * full causal self-attention (T == S, the training/no-cache path) ->
    Pallas flash attention;
  * small query chunk vs long KV ring (the serving frame/decode path) ->
    Pallas ring decode attention;
  * anything else (ragged long prefill into a ring, CPU backend) -> XLA
    reference.
"""

from __future__ import annotations

import jax

from .decode_attention import ring_decode_attention
from .flash_attention import flash_attention

MAX_DECODE_CHUNK = 64


def auto_attention(q, k, v, q_pos, kv_valid_upto, *, num_groups):
    from ..models.llama import _attention as xla_attention

    B, Hq, T, d = q.shape
    S = k.shape[2]
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        return xla_attention(q, k, v, q_pos, kv_valid_upto,
                             num_groups=num_groups)
    if T == S and T % 128 == 0 and d in (64, 128, 256):
        # training / full forward: positions are 0..T-1
        return flash_attention(q, k, v, 1.0 / d ** 0.5, True, 0)
    if T <= MAX_DECODE_CHUNK and d in (64, 128, 256):
        return ring_decode_attention(q, k, v, q_pos)
    return xla_attention(q, k, v, q_pos, kv_valid_upto,
                         num_groups=num_groups)


def resolve_attn_impl(name: str):
    """'auto' | 'xla' | 'pallas_flash' -> attn_impl callable or None."""
    if name in ("auto", "pallas", "pallas_flash"):
        return auto_attention
    return None  # 'xla': llama.forward's built-in reference path
