"""Pallas flash attention (training path): fused causal attention fwd + bwd.

TPU-native replacement for the reference's flash-attn CUDA dependency
(models/arguments_live.py:27 ``attn_implementation='flash_attention_2'`` —
SURVEY.md §2.2 calls this the single biggest kernel work item). Blockwise
online-softmax forward with LSE residuals; the backward runs as two Pallas
kernels (dkdv over kv-blocks x q-blocks, dq over q-blocks x kv-blocks) with
fp32 VMEM accumulators. GQA is folded into the BlockSpec index maps (each
query head reads its kv group's block — no repeat_kv materialization).

Layout: q (B, Hq, T, d), k/v (B, Hkv, S, d); supports causal masking with a
query-position offset (``q_offset``) so cache-append attention (queries at
absolute positions offset..offset+T attending S>=T cached slots) uses the
same kernel as full self-attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512
NEG_INF = -1e30


def _blocks(n, b):
    return pl.cdiv(n, b)

def _clamp_block(block, n):
    """Largest multiple of 128 that divides n and is <= block (or n itself
    when n < 128)."""
    if n <= block and n % 128 == 0:
        return n
    if n < 128:
        return n
    b = min(block, n)
    b = (b // 128) * 128
    while b > 128 and n % b != 0:
        b -= 128
    return b



# --------------------------------------------------------------------------
# forward


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                acc_ref, m_ref, l_ref, *, scale, causal, block_q, block_k,
                kv_len, q_offset_static, window=None):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q_start = qi * block_q + q_offset_static  # absolute position of row 0
    k_start = ki * block_k

    run = True
    if causal:
        run = k_start <= q_start + block_q - 1
    if window is not None:
        # sliding window: block dead unless some col > some row - window
        run = jnp.logical_and(run, k_start + block_k - 1 > q_start - window)

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (bq, bk)
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = (k_start + cols) < kv_len
        if causal:
            mask = jnp.logical_and(mask,
                                   (k_start + cols) <= (q_start + rows))
        if window is not None:
            # Mistral sliding window: col visible iff col > row - window
            mask = jnp.logical_and(
                mask, (k_start + cols) > (q_start + rows - window))
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:, :1]                       # (bq, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                      # (bq, bk)
        alpha = jnp.exp(m_prev - m_new)             # (bq, 1)
        l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_ref[:, :1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / safe_l).astype(o_ref.dtype)
        lse = m_ref[:, :1] + jnp.log(safe_l)
        lse_ref[0, 0] = jnp.where(l == 0.0, NEG_INF, lse)


def _flash_fwd(q, k, v, *, scale, causal, q_offset, block_q, block_k,
               window=None, kv_valid=None):
    B, Hq, T, d = q.shape
    _, Hkv, S, _ = k.shape
    kv_len = kv_valid if kv_valid is not None else S
    block_q = _clamp_block(block_q, T)
    block_k = _clamp_block(block_k, S)
    groups = Hq // Hkv
    grid = (B, Hq, _blocks(T, block_q), _blocks(S, block_k))

    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal, block_q=block_q,
        block_k=block_k, kv_len=kv_len, q_offset_static=q_offset,
        window=window)

    def kv_index(b, h, qi, ki):
        if causal:
            # blocks above the causal diagonal are never attended: clamp the
            # index so Pallas re-serves the previous block (no HBM DMA)
            last_needed = (qi * block_q + block_q - 1 + q_offset) // block_k
            ki = jnp.minimum(ki, last_needed)
        if window is not None:
            # blocks wholly below the sliding window are dead too
            first_needed = jnp.maximum(
                (qi * block_q + q_offset - window + 1) // block_k, 0)
            ki = jnp.maximum(ki, first_needed)
        return (b, h // groups, ki, 0)

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d),
                         lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), kv_index),
            pl.BlockSpec((1, 1, block_k, d), kv_index),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d),
                         lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1),
                         lambda b, h, qi, ki: (b, h, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hq, T, d), q.dtype),
            jax.ShapeDtypeStruct((B, Hq, T, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        interpret=_interpret_mode(),
    )(q, k, v)
    return out, lse


# --------------------------------------------------------------------------
# backward


def _dkdv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                 dk_ref, dv_ref, dk_acc, dv_acc, *, scale, causal, block_q,
                 block_k, kv_len, q_offset_static, window=None):
    ki = pl.program_id(2)
    qi = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q_start = qi * block_q + q_offset_static
    k_start = ki * block_k
    run = True
    if causal:
        run = k_start <= q_start + block_q - 1
    if window is not None:
        # sliding window: block dead unless some col > some row - window
        run = jnp.logical_and(run, k_start + block_k - 1 > q_start - window)

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0].astype(jnp.float32)
        delta = delta_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = (k_start + cols) < kv_len
        if causal:
            mask = jnp.logical_and(mask,
                                   (k_start + cols) <= (q_start + rows))
        if window is not None:
            # Mistral sliding window: col visible iff col > row - window
            mask = jnp.logical_and(
                mask, (k_start + cols) > (q_start + rows - window))
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)        # (bq, bk)
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (bk, d)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta) * scale)                    # (bq, bk)
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (bk, d)

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
               dq_acc, *, scale, causal, block_q, block_k, kv_len,
               q_offset_static, window=None):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q_start = qi * block_q + q_offset_static
    k_start = ki * block_k
    run = True
    if causal:
        run = k_start <= q_start + block_q - 1
    if window is not None:
        # sliding window: block dead unless some col > some row - window
        run = jnp.logical_and(run, k_start + block_k - 1 > q_start - window)

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0].astype(jnp.float32)
        delta = delta_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = (k_start + cols) < kv_len
        if causal:
            mask = jnp.logical_and(mask,
                                   (k_start + cols) <= (q_start + rows))
        if window is not None:
            # Mistral sliding window: col visible iff col > row - window
            mask = jnp.logical_and(
                mask, (k_start + cols) > (q_start + rows - window))
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        dq_acc[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[0, 0] = dq_acc[:].astype(dq_ref.dtype)


def _flash_bwd(res, g, *, scale, causal, q_offset, block_q, block_k,
               window=None, kv_valid=None):
    q, k, v, out, lse = res
    B, Hq, T, d = q.shape
    _, Hkv, S, _ = k.shape
    kv_len = kv_valid if kv_valid is not None else S
    block_q = _clamp_block(block_q, T)
    block_k = _clamp_block(block_k, S)
    groups = Hq // Hkv
    do = g
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)  # (B, Hq, T, 1)

    nq = _blocks(T, block_q)

    def q_index(b, h, ki, qi):
        if causal:
            # q blocks fully above the diagonal never see this kv block:
            # clamp to the first contributing q block (skips the DMA)
            first_needed = jnp.maximum(
                (ki * block_k - q_offset) // block_q, 0)
            qi = jnp.maximum(qi, jnp.minimum(first_needed, nq - 1))
        if window is not None:
            # q rows at or beyond col + window never see this kv block
            last_needed = jnp.maximum(
                (ki * block_k + block_k - 1 + window - 1 - q_offset)
                // block_q, 0)
            qi = jnp.minimum(qi, jnp.minimum(last_needed, nq - 1))
        return (b, h, qi, 0)

    q_spec = pl.BlockSpec((1, 1, block_q, d), q_index)
    kv_spec_g = pl.BlockSpec((1, 1, block_k, d),
                             lambda b, h, ki, qi: (b, h // groups, ki, 0))
    row_spec = pl.BlockSpec((1, 1, block_q, 1),
                            lambda b, h, ki, qi: q_index(b, h, ki, qi))

    dk, dv = pl.pallas_call(
        functools.partial(_dkdv_kernel, scale=scale, causal=causal,
                          block_q=block_q, block_k=block_k, kv_len=kv_len,
                          q_offset_static=q_offset, window=window),
        grid=(B, Hq, _blocks(S, block_k), _blocks(T, block_q)),
        in_specs=[q_spec, kv_spec_g, kv_spec_g, q_spec, row_spec, row_spec],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, ki, qi: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, ki, qi: (b, h, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hq, S, d), jnp.float32),
            jax.ShapeDtypeStruct((B, Hq, S, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=_interpret_mode(),
    )(q, k, v, do, lse, delta)

    # fold grouped-query gradients back onto the kv heads
    dk = dk.reshape(B, Hkv, groups, S, d).sum(axis=2).astype(k.dtype)
    dv = dv.reshape(B, Hkv, groups, S, d).sum(axis=2).astype(v.dtype)

    def kv_index_dq(b, h, qi, ki):
        if causal:
            last_needed = (qi * block_q + block_q - 1 + q_offset) // block_k
            ki = jnp.minimum(ki, last_needed)
        if window is not None:
            first_needed = jnp.maximum(
                (qi * block_q + q_offset - window + 1) // block_k, 0)
            ki = jnp.maximum(ki, first_needed)
        return (b, h // groups, ki, 0)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, causal=causal,
                          block_q=block_q, block_k=block_k, kv_len=kv_len,
                          q_offset_static=q_offset, window=window),
        grid=(B, Hq, _blocks(T, block_q), _blocks(S, block_k)),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), kv_index_dq),
            pl.BlockSpec((1, 1, block_k, d), kv_index_dq),
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1),
                         lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1),
                         lambda b, h, qi, ki: (b, h, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda b, h, qi, ki: (b, h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hq, T, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=_interpret_mode(),
    )(q, k, v, do, lse, delta)

    return dq, dk, dv


# --------------------------------------------------------------------------
# public API


_INTERPRET = [False]


def _interpret_mode() -> bool:
    return _INTERPRET[0] or jax.default_backend() not in ("tpu",)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def flash_attention(q, k, v, scale: float, causal: bool = True,
                    q_offset: int = 0, block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K, window=None,
                    kv_valid=None):
    """Fused attention. q (B, Hq, T, d); k/v (B, Hkv, S, d) with Hq % Hkv == 0.
    Causal mask: kv slot j visible to query i iff j <= q_offset + i; with
    ``window`` (Mistral sliding window) additionally j > q_offset + i -
    window. Fully-masked blocks issue no HBM DMA on either side of the
    band."""
    out, _ = _flash_fwd(q, k, v, scale=scale, causal=causal,
                        q_offset=q_offset, block_q=block_q, block_k=block_k,
                        window=window, kv_valid=kv_valid)
    return out


def _vjp_fwd(q, k, v, scale, causal, q_offset, block_q, block_k, window,
             kv_valid):
    out, lse = _flash_fwd(q, k, v, scale=scale, causal=causal,
                          q_offset=q_offset, block_q=block_q, block_k=block_k,
                          window=window, kv_valid=kv_valid)
    return out, (q, k, v, out, lse)


def _vjp_bwd(scale, causal, q_offset, block_q, block_k, window, kv_valid,
             res, g):
    return _flash_bwd(res, g, scale=scale, causal=causal, q_offset=q_offset,
                      block_q=block_q, block_k=block_k, window=window,
                      kv_valid=kv_valid)


flash_attention.defvjp(_vjp_fwd, _vjp_bwd)
