"""Paged decode attention: per-stream page tables over a shared KV pool.

BASELINE config #4 names "paged KV cache" for batched multi-stream serving.
The static per-stream ring (models/llama.KVCache) reserves ``capacity``
slots per stream regardless of use; the paged pool shares physical pages
(PAGE_SIZE slots each) across streams, so N streams with heterogeneous
lengths fit in sum-of-usage, not N x max. Window compaction becomes
page-granular page FREEING — no device data movement at all (the ring's
compact_kv_cache rolls the whole ring).

The kernel is the page-table variant of ops/decode_attention.py: the
scalar-prefetched metadata carries each stream's page table, and the
BlockSpec index map reads logical kv block ``ki`` from PHYSICAL page
``table[b, ki]`` of the pool. Out-of-range logical blocks clip to a
visited page so Pallas issues no new HBM DMA for them (same trick as the
ring kernel's valid-block clipping); compute is predicated off.

The reference has no analog — its torch KV cache grows per stream in model
dtype with no sharing (demo/inference.py:64-68).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

PAGE_SIZE = 512  # slots per page = the proven ring block_k (v5e)


def _kernel(meta_ref, qpos_ref, q_ref, k_ref, v_ref, *rest,
            page, rows, n_batch, window=None, quantized=False):
    if quantized:
        ks_ref, vs_ref, o_ref, acc_ref, m_ref, l_ref = rest
    else:
        o_ref, acc_ref, m_ref, l_ref = rest
    b = pl.program_id(0)
    h = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    live = jnp.logical_and(ki >= meta_ref[1 + n_batch + b],
                           ki < meta_ref[1 + b])

    @pl.when(live)
    def _compute():
        q = q_ref[0, 0]                               # (rows, d)
        k = k_ref[0, 0, 0]                            # (page, d)
        if quantized:
            # int8 codes -> bf16 RAW; per-slot scales fold into the
            # logits/probs rows (ring kernel discipline: MXU operands
            # stay bf16, HBM reads stay int8)
            k = k.astype(jnp.float32).astype(q.dtype)
        scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (rows, page)
        if quantized:
            # this head's per-slot scales: (1, page) row of (Hkv, page)
            s = s * ks_ref[0, 0, pl.ds(h, 1), :]
        # logical slot index of column j = ki*page + j; visible iff
        # slot <= q_pos (slot-relative positions, pos_base already removed)
        slot = ki * page + jax.lax.broadcasted_iota(jnp.int32,
                                                    (rows, page), 1)
        qp = qpos_ref[0, 0][:, None]                  # (rows, 1)
        vis = slot <= qp
        if window is not None:  # banded (Mistral-family sliding window)
            vis = jnp.logical_and(vis, slot > qp - window)
        s = jnp.where(vis, s, NEG_INF)

        m_prev = m_ref[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:, :1] = alpha * l_ref[:, :1] + jnp.sum(p, -1, keepdims=True)
        m_ref[:, :1] = m_new
        if quantized:
            pv = (p * vs_ref[0, 0, pl.ds(h, 1), :]).astype(q_ref.dtype)
            v = v_ref[0, 0, 0].astype(jnp.float32).astype(q_ref.dtype)
        else:
            pv = p.astype(v_ref.dtype)
            v = v_ref[0, 0, 0]
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            pv, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(ki == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0, 0] = (acc_ref[:]
                       / jnp.maximum(l_ref[:, :1], 1e-30)).astype(o_ref.dtype)


def paged_decode_attention(q, pool_k, pool_v, table, q_pos, layer, *,
                           window=None, interpret: bool = None,
                           k_scale=None, v_scale=None):
    """q: (B, Hq, S, d); pool_k/pool_v: (L, P, Hkv, page, d); table:
    (B, MAXP) int32 physical page per logical page; q_pos: (B, S)
    slot-relative query positions; layer: int32 scalar. Logical slot j of
    stream b lives at pool[layer, table[b, j // page], :, j % page]; slot
    j is visible iff j <= q_pos (and > q_pos - window when windowed).
    Returns (B, Hq, S, d).

    int8 KV: pass pools as int8 codes + k_scale/v_scale (L, P, Hkv, page)
    fp32 scale pools (paged like the codes); the kernel dequantizes
    in-VMEM so HBM page reads stay int8."""
    B, Hq, S, d = q.shape
    L, P, Hkv, page, _ = pool_k.shape
    MAXP = table.shape[1]
    G = Hq // Hkv
    rows = G * S
    quantized = k_scale is not None
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    qg = q.reshape(B, Hkv, G, S, d).reshape(B, Hkv, rows, d)
    qpos_rows = jnp.tile(q_pos, (1, G))[:, None]      # (B, 1, rows)

    max_pos = jnp.max(q_pos, axis=1)
    nb = jnp.minimum(max_pos // page + 1, MAXP).astype(jnp.int32)
    if window is not None:
        min_pos = jnp.min(q_pos, axis=1)
        fb = jnp.maximum((min_pos - window + 1) // page, 0).astype(jnp.int32)
    else:
        fb = jnp.zeros((B,), jnp.int32)
    # scalar prefetch: [layer, nb_0..B-1, fb_0..B-1, table row-major]
    meta = jnp.concatenate([
        jnp.asarray(layer, jnp.int32).reshape(1), nb, fb,
        table.reshape(-1).astype(jnp.int32)], axis=0)

    def kv_map(b, h, ki, meta):
        kc = jnp.clip(ki, meta[1 + B + b], meta[1 + b] - 1)
        return (meta[0], meta[1 + 2 * B + b * MAXP + kc], h, 0, 0)

    def sc_map(b, h, ki, meta):
        # full-Hkv sublane block (Mosaic block rules); head row selected
        # in-kernel
        kc = jnp.clip(ki, meta[1 + B + b], meta[1 + b] - 1)
        return (meta[0], meta[1 + 2 * B + b * MAXP + kc], 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, rows), lambda b, h, ki, meta: (b, 0, 0)),
        pl.BlockSpec((1, 1, rows, d), lambda b, h, ki, meta: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, 1, page, d), kv_map),
        pl.BlockSpec((1, 1, 1, page, d), kv_map),
    ]
    operands = [meta, qpos_rows, qg, pool_k, pool_v]
    if quantized:
        in_specs += [pl.BlockSpec((1, 1, Hkv, page), sc_map),
                     pl.BlockSpec((1, 1, Hkv, page), sc_map)]
        operands += [k_scale, v_scale]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv, MAXP),
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
        functools.partial(_kernel, page=page, rows=rows, n_batch=B,
                          window=window, quantized=quantized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, rows, d), q.dtype),
        interpret=interpret,
    )(*operands)
    return out.reshape(B, Hkv, G, S, d).reshape(B, Hq, S, d)


def paged_attention_reference(q, pool_k, pool_v, table, q_pos, layer, *,
                              window=None, k_scale=None, v_scale=None):
    """XLA gather fallback (CPU tests / non-TPU backends): materialize each
    stream's logical KV from its pages (dequantizing int8 codes with their
    paged scales when given), then masked attention."""
    B, Hq, S, d = q.shape
    L, P, Hkv, page, _ = pool_k.shape
    MAXP = table.shape[1]
    G = Hq // Hkv
    k_l = jax.lax.dynamic_index_in_dim(pool_k, layer, 0, keepdims=False)
    v_l = jax.lax.dynamic_index_in_dim(pool_v, layer, 0, keepdims=False)
    # (B, MAXP, Hkv, page, d) -> (B, Hkv, MAXP*page, d)
    kg = k_l[table].transpose(0, 2, 1, 3, 4).reshape(B, Hkv, MAXP * page, d)
    vg = v_l[table].transpose(0, 2, 1, 3, 4).reshape(B, Hkv, MAXP * page, d)
    if k_scale is not None:
        ks_l = jax.lax.dynamic_index_in_dim(k_scale, layer, 0, keepdims=False)
        vs_l = jax.lax.dynamic_index_in_dim(v_scale, layer, 0, keepdims=False)
        ksg = ks_l[table].transpose(0, 2, 1, 3).reshape(B, Hkv, MAXP * page)
        vsg = vs_l[table].transpose(0, 2, 1, 3).reshape(B, Hkv, MAXP * page)
        kg = kg.astype(jnp.float32) * ksg[..., None]
        vg = vg.astype(jnp.float32) * vsg[..., None]
    qf = q.astype(jnp.float32).reshape(B, Hkv, G * S, d)
    s = jnp.einsum("bhrd,bhcd->bhrc", qf, kg.astype(jnp.float32))
    s = s / jnp.sqrt(jnp.float32(d))
    slot = jnp.arange(MAXP * page, dtype=jnp.int32)
    qp = jnp.tile(q_pos, (1, G))[:, None, :, None]    # (B, 1, G*S, 1)
    mask = slot[None, None, None, :] <= qp
    if window is not None:
        mask = jnp.logical_and(mask, slot[None, None, None, :]
                               > qp - window)
    s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhrc,bhcd->bhrd", p, vg.astype(jnp.float32))
    return o.reshape(B, Hkv, G, S, d).reshape(B, Hq, S, d).astype(q.dtype)


def paged_attention(q, pool_k, pool_v, table, q_pos, layer, *,
                    window=None, k_scale=None, v_scale=None):
    """Backend dispatch: Pallas kernel on TPU, gather reference elsewhere
    (interpret-mode Pallas does not catch Mosaic legality and is slow for
    the CPU suite)."""
    if jax.default_backend() == "tpu":
        return paged_decode_attention(q, pool_k, pool_v, table, q_pos,
                                      layer, window=window,
                                      k_scale=k_scale, v_scale=v_scale)
    return paged_attention_reference(q, pool_k, pool_v, table, q_pos,
                                     layer, window=window,
                                     k_scale=k_scale, v_scale=v_scale)
