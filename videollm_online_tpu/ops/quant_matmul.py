"""Pallas weight-only-int8 matmul (opt-in; XLA currently wins).

Streams int8 weight blocks HBM->VMEM, converts on-chip, bf16 MXU matmul
with fp32 accumulation, per-output-channel scale epilogue. Measured on v5e
at decode shapes (8 x 4096 @ 4096x14336): ~280 GB/s effective vs ~371 GB/s
for XLA's FUSED convert-matmul (XLA does NOT materialize bf16 temporaries
as one might fear), so models/quant.py keeps the XLA path; this kernel
stays as a tuning base (bigger-block DMA pipelining is the gap)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_K = 512
DEFAULT_BLOCK_N = 512


def _kernel(x_ref, w_ref, scale_ref, o_ref, acc_ref, *, n_k):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]                      # (rows, block_k) bf16
    w = w_ref[:].astype(x.dtype)      # int8 -> bf16 in VMEM
    acc_ref[:] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(ki == n_k - 1)
    def _finalize():
        scale = scale_ref[:].astype(jnp.float32)  # (1, block_n)
        o_ref[:] = (acc_ref[:] * scale).astype(o_ref.dtype)


def quant_matmul_p(x: jax.Array, w_q8: jax.Array, scale: jax.Array, *,
                   block_k: int = DEFAULT_BLOCK_K,
                   block_n: int = DEFAULT_BLOCK_N,
                   interpret: bool = None) -> jax.Array:
    """x (rows, K) bf16 @ w_q8 (K, N) int8 * scale (N,) -> (rows, N).
    rows is padded to the fp32 sublane tile (8)."""
    rows, K = x.shape
    _, N = w_q8.shape
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    bk = min(block_k, K)
    bn = min(block_n, N)
    pad_rows = (-rows) % 8
    if pad_rows:
        x = jnp.pad(x, ((0, pad_rows), (0, 0)))
    prows = x.shape[0]

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=pl.cdiv(K, bk)),
        grid=(pl.cdiv(N, bn), pl.cdiv(K, bk)),
        in_specs=[
            pl.BlockSpec((prows, bk), lambda ni, ki: (0, ki)),
            pl.BlockSpec((bk, bn), lambda ni, ki: (ki, ni)),
            pl.BlockSpec((1, bn), lambda ni, ki: (0, ni)),
        ],
        out_specs=pl.BlockSpec((prows, bn), lambda ni, ki: (0, ni)),
        out_shape=jax.ShapeDtypeStruct((prows, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((prows, bn), jnp.float32)],
        interpret=interpret,
    )(x, w_q8, scale.reshape(1, N))
    return out[:rows]


MAX_KERNEL_ROWS = 128


def quant_matmul(x: jax.Array, w_q8: jax.Array, scale: jax.Array) -> jax.Array:
    """Shape-polymorphic wrapper: (..., K) @ (K, N). Uses the Pallas kernel
    for decode-sized row counts on TPU; falls back to the XLA convert-matmul
    otherwise (prefill/training where the matmul is compute-bound anyway)."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    N = w_q8.shape[-1]
    rows = 1
    for d in lead:
        rows *= d
    use_kernel = (jax.default_backend() == "tpu" and rows <= MAX_KERNEL_ROWS
                  and K % 128 == 0 and N % 128 == 0)
    if use_kernel:
        out = quant_matmul_p(x.reshape(rows, K), w_q8, scale)
        return out.reshape(lead + (N,))
    y = x @ w_q8.astype(x.dtype)
    return y * scale.astype(x.dtype)
