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

from .decode_attention import (ring_decode_attention,
                               ring_decode_attention_layered)
from .flash_attention import flash_attention

MAX_DECODE_CHUNK = 64


def auto_attention(q, k, v, q_pos, kv_valid_upto, *, num_groups,
                   sliding_window=None, k_scale=None, v_scale=None):
    from ..models.llama import _attention as xla_attention

    B, Hq, T, d = q.shape
    S = k.shape[2]
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        return xla_attention(q, k, v, q_pos, kv_valid_upto,
                             num_groups=num_groups,
                             sliding_window=sliding_window,
                             k_scale=k_scale, v_scale=v_scale)
    if (k_scale is None and T == S and T % 128 == 0
            and d in (64, 128, 256)):
        # training / full forward: positions are 0..T-1
        return flash_attention(q, k, v, 1.0 / d ** 0.5, True, 0,
                               window=sliding_window)
    if T <= MAX_DECODE_CHUNK and d in (64, 128, 256):
        return ring_decode_attention(q, k, v, q_pos, window=sliding_window,
                                     k_scale=k_scale, v_scale=v_scale)
    return xla_attention(q, k, v, q_pos, kv_valid_upto,
                         num_groups=num_groups, sliding_window=sliding_window,
                         k_scale=k_scale, v_scale=v_scale)


def _auto_layered(q, k_all, v_all, q_pos, layer, *, num_groups,
                  sliding_window=None, k_scale=None, v_scale=None):
    """Cache-resident attention: reads kv blocks straight from the stacked
    (L, B, Hkv, C, d) ring at ``layer`` — no per-layer slice materialization
    (O(valid) HBM traffic instead of O(capacity), see decode_attention).
    k_scale/v_scale: full stacked (L, B, Hkv, C) fp32 int8-KV scales; the
    Pallas kernel dequantizes in-kernel (int8 bytes over HBM)."""
    B, Hq, T, d = q.shape
    if (jax.default_backend() == "tpu" and T <= MAX_DECODE_CHUNK
            and d in (64, 128, 256)):
        return ring_decode_attention_layered(q, k_all, v_all, q_pos, layer,
                                             window=sliding_window,
                                             k_scale=k_scale, v_scale=v_scale)
    from ..models.llama import _attention as xla_attention
    k_l = jax.lax.dynamic_index_in_dim(k_all, layer, 0, keepdims=False)
    v_l = jax.lax.dynamic_index_in_dim(v_all, layer, 0, keepdims=False)
    sc = {}
    if k_scale is not None:
        sc = {"k_scale": jax.lax.dynamic_index_in_dim(k_scale, layer, 0,
                                                      keepdims=False),
              "v_scale": jax.lax.dynamic_index_in_dim(v_scale, layer, 0,
                                                      keepdims=False)}
    return xla_attention(q, k_l, v_l, q_pos, None, num_groups=num_groups,
                         sliding_window=sliding_window, **sc)


auto_attention.layered = _auto_layered


def resolve_attn_impl(name: str):
    """'auto' | 'xla' | 'pallas_flash' -> attn_impl callable or None.
    'sp_ring' | 'sp_ulysses' pass through as strings — they need the mesh,
    so LiveTrainer binds them to its model axis at construction."""
    if name in ("auto", "pallas", "pallas_flash"):
        return auto_attention
    if name in ("sp_ring", "sp_ulysses"):
        return name
    return None  # 'xla': llama.forward's built-in reference path
