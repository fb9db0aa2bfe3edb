"""Pallas decode attention over the static KV ring (serving hot path).

The streaming loop appends 1-16 tokens per step and attends a long ring
(demo/inference.py one-forward-per-frame; our serve/engine.py burst loop).
This kernel computes attention for a small query chunk against the (B, Hkv,
C, d) ring with per-stream valid lengths, skipping invalid ring blocks:

  * scalar-prefetched per-batch block counts drive the BlockSpec index maps —
    out-of-range kv blocks map to the last valid block, so Pallas issues no
    new HBM DMA for them (the paged-attention trick), and compute is
    predicated off with ``pl.when``;
  * GQA queries fold into rows: q reshaped to (B, Hkv, G*S, d) so each grid
    step is one MXU matmul per kv block;
  * fp32 online softmax, bf16 IO.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_K = 512  # v5e: 512 halves grid-step overhead vs 256 (0.67 vs 1.21 ms/token at 8B)
NEG_INF = -1e30


def _kernel(nb_ref, qpos_ref, q_ref, k_ref, v_ref, *rest,
            block_k, rows, n_batch, window=None, quantized=False):
    if quantized:
        ks_ref, vs_ref, o_ref, acc_ref, m_ref, l_ref = rest
    else:
        o_ref, acc_ref, m_ref, l_ref = rest
    b = pl.program_id(0)
    h = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    live = ki < nb_ref[b]
    if window is not None:
        live = jnp.logical_and(live, ki >= nb_ref[n_batch + b])

    @pl.when(live)
    def _compute():
        q = q_ref[0, 0]                              # (rows, d)
        k = k_ref[0, 0]                              # (bk, d)
        if quantized:
            # int8 codes -> bf16 RAW (scales applied to the logits/probs, a
            # (rows, bk)/(1, bk) elementwise — never a (bk, d) dequant): the
            # MXU operand stays bf16, HBM traffic stays int8
            k = k.astype(jnp.float32).astype(q.dtype)
        scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if quantized:
            # this head's per-slot scales: (1, bk) row of the (Hkv, bk) block
            s = s * ks_ref[0, pl.ds(h, 1), :]
        cols = jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 1)
        qpos = qpos_ref[0, 0].astype(jnp.int32)[:, None]  # (rows, 1)
        mask = (ki * block_k + cols) <= qpos
        if window is not None:
            # Mistral sliding window: slot visible iff slot > qpos - window
            mask = jnp.logical_and(mask,
                                   (ki * block_k + cols) > qpos - window)
        s = jnp.where(mask, s, NEG_INF)
        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = jnp.broadcast_to(
            l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True),
            l_ref.shape)
        if quantized:
            pv = (p * vs_ref[0, pl.ds(h, 1), :]).astype(q_ref.dtype)
            v = v_ref[0, 0].astype(jnp.float32).astype(q_ref.dtype)
        else:
            pv = p.astype(v_ref.dtype)
            v = v_ref[0, 0]
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            pv, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_ref[:, :1]
        safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / safe).astype(o_ref.dtype)


def ring_decode_attention(q, k, v, q_pos, *, block_k: int = DEFAULT_BLOCK_K,
                          window: int = None, interpret: bool = None,
                          k_scale=None, v_scale=None):
    """q: (B, Hq, S, d); k/v: (B, Hkv, C, d); q_pos: (B, S) absolute
    positions (mask: ring slot j visible iff j <= q_pos, and with ``window``
    additionally j > q_pos - window). Dead blocks on either side of the band
    issue no HBM DMA. Returns (B, Hq, S, d).

    int8 KV: pass k/v as int8 codes + k_scale/v_scale (B, Hkv, C) fp32; the
    kernel dequantizes in-VMEM (scales fold into logits/probs rows, the MXU
    operands are raw-code bf16) so HBM reads stay int8 — KV read bytes halve.
    """
    B, Hq, S, d = q.shape
    _, Hkv, C, _ = k.shape
    G = Hq // Hkv
    rows = G * S
    quantized = k_scale is not None
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    # (B, Hkv, G*S, d): row r of group-head h is (head h*G + r//S, query r%S)
    qg = q.reshape(B, Hkv, G, S, d).reshape(B, Hkv, rows, d)
    qpos_rows = jnp.tile(q_pos, (1, G))[:, None]  # (B, 1, rows)

    # per-batch first/last kv blocks that contain any visible slot
    max_pos = jnp.max(q_pos, axis=1)
    nb = jnp.minimum(max_pos // block_k + 1,
                     pl.cdiv(C, block_k)).astype(jnp.int32)
    if window is not None:
        min_pos = jnp.min(q_pos, axis=1)
        fb = jnp.maximum((min_pos - window + 1) // block_k, 0).astype(jnp.int32)
    else:
        fb = jnp.zeros((B,), jnp.int32)
    meta = jnp.concatenate([nb, fb], axis=0)  # [nb_0..nb_B-1, fb_0..fb_B-1]

    def kv_map(b, h, ki, meta):
        return (b, h, jnp.clip(ki, meta[B + b], meta[b] - 1), 0)

    def sc_map(b, h, ki, meta):
        # full-Hkv sublane block (Mosaic: last-two block dims must be
        # 8/128-divisible or equal to the array dims — Hkv can be 2/8);
        # the kernel selects its head's row
        return (b, 0, jnp.clip(ki, meta[B + b], meta[b] - 1))

    in_specs = [
        pl.BlockSpec((1, 1, rows), lambda b, h, ki, meta: (b, 0, 0)),
        pl.BlockSpec((1, 1, rows, d), lambda b, h, ki, meta: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, block_k, d), kv_map),
        pl.BlockSpec((1, 1, block_k, d), kv_map),
    ]
    operands = [meta, qpos_rows, qg, k, v]
    if quantized:
        in_specs += [pl.BlockSpec((1, Hkv, block_k), sc_map),
                     pl.BlockSpec((1, Hkv, block_k), sc_map)]
        operands += [k_scale, v_scale]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv, pl.cdiv(C, block_k)),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, rows, d),
                               lambda b, h, ki, meta: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((rows, d), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, block_k=block_k, rows=rows, n_batch=B,
                          window=window, quantized=quantized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, rows, d), q.dtype),
        interpret=interpret,
    )(*operands)
    return out.reshape(B, Hkv, G, S, d).reshape(B, Hq, S, d)


def ring_decode_attention_layered(q, k_all, v_all, q_pos, layer, *,
                                  block_k: int = DEFAULT_BLOCK_K,
                                  window: int = None,
                                  interpret: bool = None,
                                  k_scale=None, v_scale=None):
    """Same as :func:`ring_decode_attention` but reads kv blocks DIRECTLY
    from the full stacked cache (L, B, Hkv, C, d) at a traced ``layer``
    index. Inside the decoder's layer scan this avoids materializing a
    (B, Hkv, C, d) per-layer slice: Pallas only DMAs the valid blocks of the
    addressed layer, so HBM traffic is O(valid), not O(capacity).

    q: (B, Hq, S, d); q_pos: (B, S); layer: int32 scalar.
    int8 KV: k_all/v_all int8 codes + k_scale/v_scale (L, B, Hkv, C) fp32
    per-slot scales — dequantized in-kernel (see ring_decode_attention).
    """
    B, Hq, S, d = q.shape
    L, _, Hkv, C, _ = k_all.shape
    G = Hq // Hkv
    rows = G * S
    quantized = k_scale is not None
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    qg = q.reshape(B, Hkv, G, S, d).reshape(B, Hkv, rows, d)
    qpos_rows = jnp.tile(q_pos, (1, G))[:, None]  # (B, 1, rows)

    max_pos = jnp.max(q_pos, axis=1)
    nb = jnp.minimum(max_pos // block_k + 1,
                     pl.cdiv(C, block_k)).astype(jnp.int32)
    if window is not None:
        min_pos = jnp.min(q_pos, axis=1)
        fb = jnp.maximum((min_pos - window + 1) // block_k, 0).astype(jnp.int32)
    else:
        fb = jnp.zeros((B,), jnp.int32)
    # one scalar-prefetch vector: [layer, nb_0..nb_B-1, fb_0..fb_B-1]
    meta = jnp.concatenate(
        [jnp.asarray(layer, jnp.int32).reshape(1), nb, fb], axis=0)

    def kv_map(b, h, ki, meta):
        return (meta[0], b, h,
                jnp.clip(ki, meta[1 + B + b], meta[1 + b] - 1), 0)

    def sc_map(b, h, ki, meta):
        # full-Hkv sublane block (Mosaic block rules); head row selected
        # in-kernel
        return (meta[0], b, 0,
                jnp.clip(ki, meta[1 + B + b], meta[1 + b] - 1))

    in_specs = [
        pl.BlockSpec((1, 1, rows), lambda b, h, ki, meta: (b, 0, 0)),
        pl.BlockSpec((1, 1, rows, d), lambda b, h, ki, meta: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, 1, block_k, d), kv_map),
        pl.BlockSpec((1, 1, 1, block_k, d), kv_map),
    ]
    operands = [meta, qpos_rows, qg, k_all, v_all]
    if quantized:
        in_specs += [pl.BlockSpec((1, 1, Hkv, block_k), sc_map),
                     pl.BlockSpec((1, 1, Hkv, block_k), sc_map)]
        operands += [k_scale, v_scale]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv, pl.cdiv(C, block_k)),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, rows, d),
                               lambda b, h, ki, meta: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((rows, d), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_layered, block_k=block_k, rows=rows,
                          n_batch=B, window=window, quantized=quantized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, rows, d), q.dtype),
        interpret=interpret,
    )(*operands)
    return out.reshape(B, Hkv, G, S, d).reshape(B, Hq, S, d)


def _kernel_layered(meta_ref, qpos_ref, q_ref, k_ref, v_ref, *rest,
                    block_k, rows, n_batch, window=None, quantized=False):
    if quantized:
        ks_ref, vs_ref, o_ref, acc_ref, m_ref, l_ref = rest
    else:
        o_ref, acc_ref, m_ref, l_ref = rest
    b = pl.program_id(0)
    h = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    live = ki < meta_ref[1 + b]
    if window is not None:
        live = jnp.logical_and(live, ki >= meta_ref[1 + n_batch + b])

    @pl.when(live)
    def _compute():
        q = q_ref[0, 0]                              # (rows, d)
        k = k_ref[0, 0, 0]                           # (bk, d)
        if quantized:
            k = k.astype(jnp.float32).astype(q.dtype)
        scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if quantized:
            s = s * ks_ref[0, 0, pl.ds(h, 1), :]
        cols = jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 1)
        qpos = qpos_ref[0, 0].astype(jnp.int32)[:, None]
        mask = (ki * block_k + cols) <= qpos
        if window is not None:
            mask = jnp.logical_and(mask,
                                   (ki * block_k + cols) > qpos - window)
        s = jnp.where(mask, s, NEG_INF)
        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = jnp.broadcast_to(
            l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True),
            l_ref.shape)
        if quantized:
            pv = (p * vs_ref[0, 0, pl.ds(h, 1), :]).astype(q_ref.dtype)
            v = v_ref[0, 0, 0].astype(jnp.float32).astype(q_ref.dtype)
        else:
            pv = p.astype(v_ref.dtype)
            v = v_ref[0, 0, 0]
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            pv, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_ref[:, :1]
        safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / safe).astype(o_ref.dtype)


def decode_attention_adapter(q, k, v, q_pos, kv_valid_upto, *, num_groups):
    """Drop-in for models.llama._attention on the serving path."""
    return ring_decode_attention(q, k, v, q_pos)
