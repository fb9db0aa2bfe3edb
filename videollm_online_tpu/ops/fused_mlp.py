"""Fused SwiGLU-MLP decode kernel (Pallas, weight-only int8).

Why a whole-MLP kernel when per-matmul Pallas kernels LOSE the decode step
(see models/quant.py — each pallas_call is a fusion barrier that forfeits
XLA's cross-op weight prefetch, ~22us x 224 calls/token): one kernel per
LAYER amortizes the barrier over the MLP's three matrices — 75% of a
Llama-8B layer's weight bytes (3 x D x F of the 3DF + 2D^2 + 2*D*kv total)
— and keeps the (B, F_block) gate/up activations in VMEM, never touching
HBM for intermediates.

Dataflow per grid step j over F-blocks:
    g = x @ Wg[:, j]   (MXU, int8 block converted in VMEM)
    u = x @ Wu[:, j]
    h = silu(g * sg) * (u * su)          (VPU, f32)
    out += (h @ Wd[j, :]) * sd           (MXU, f32 accumulation in VMEM)
All three weight matrices stream through VMEM exactly once per call
(HBM traffic = int8 bytes, double-buffered by the Pallas grid pipeline);
batch-1 decode is weight-bandwidth-bound so bytes ~= time.

Replaces (numerically ~equal, f32 accumulation instead of bf16
intermediates) the XLA path in models/llama._layer:
    silu(dense(x, w_gate)) * dense(x, w_up) -> dense(., w_down)
Reference behavior: modeling_live_llama.py's LlamaMLP (HF). Weight layout:
models/quant.py int8 dicts {"q8": (in, out), "scale": (out,)}.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wg_ref, sg_ref, wu_ref, su_ref, wd_ref, sd_ref, out_ref):
    j = pl.program_id(0)
    x = x_ref[:]                                   # (B, D) bf16
    wg = wg_ref[:].astype(jnp.bfloat16)            # (D, FB)
    wu = wu_ref[:].astype(jnp.bfloat16)
    g = jnp.dot(x, wg, preferred_element_type=jnp.float32)
    u = jnp.dot(x, wu, preferred_element_type=jnp.float32)
    g = g * sg_ref[:]                              # (1, FB) f32 scales
    u = u * su_ref[:]
    h = (g * jax.nn.sigmoid(g)) * u                # SiLU(g) * u, f32
    wd = wd_ref[:].astype(jnp.bfloat16)            # (FB, D)
    p = jnp.dot(h.astype(jnp.bfloat16), wd,
                preferred_element_type=jnp.float32)
    p = p * sd_ref[:]                              # (1, D) f32

    @pl.when(j == 0)
    def _():
        out_ref[:] = p

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + p


@functools.partial(jax.jit, static_argnames=("block_f", "interpret"))
def fused_mlp_int8(x, wg_q, wg_s, wu_q, wu_s, wd_q, wd_s, *,
                   block_f: int = None, interpret: bool = False):
    """SwiGLU MLP over int8 weights: x (B, D) bf16 -> (B, D) bf16.

    wg_q/wu_q: (D, F) int8, scales (F,) f32; wd_q: (F, D) int8, scale (D,)
    f32 (models/quant.quantize_weight layout)."""
    B, D = x.shape
    F = wg_q.shape[1]
    block_f = BLOCK_F if block_f is None else block_f
    fb = min(block_f, F)
    assert F % fb == 0, (F, fb)
    grid = (F // fb,)

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, fb), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fb), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, fb), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fb), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, D), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, D), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024)),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * F * 3,
            bytes_accessed=3 * D * F + 4 * (2 * F + D) + 2 * B * D,
            transcendentals=B * F,
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), wg_q, wg_s.reshape(1, F), wu_q,
      wu_s.reshape(1, F), wd_q, wd_s.reshape(1, wd_s.shape[-1]))
    return out.astype(x.dtype)


def _deq_groups(q, scale):
    """Dequantize unpacked int4 values q (R, C) with group scales
    (n_groups, C) over the rows: returns bf16 (R, C). Rows within a group
    are contiguous, so the scale broadcast is a sublane-split reshape
    (layout-free on TPU)."""
    R, C = q.shape
    n_groups = scale.shape[0]
    # scale-mul in f32 (v5e VPU: no bf16 ALU), single convert at the end
    w = q.astype(jnp.float32).reshape(n_groups, R // n_groups, C)
    w = w * scale[:, None, :].astype(jnp.float32)
    return w.reshape(R, C).astype(jnp.bfloat16)


def _unpack_f32(p):
    """Nibble unpack in f32 arithmetic. Mosaic has no i8 vector shifts and
    the v5e VPU has no bf16 ALU (bf16 is storage-only), so the unpack runs
    float: every packed byte value (|p| <= 128) and every intermediate is
    an integer exact in f32. p = 16*hi + lo_u with hi in [-8,7], lo_u in
    [0,15]; the floor(lo_u/8) term is the {0,1} high-half mask rebasing
    lo_u to signed (arithmetic-only: vector compares don't legalize)."""
    f = p.astype(jnp.float32)
    hi = jnp.floor(f * (1.0 / 16.0))
    lo_u = f - hi * 16.0
    lo = lo_u - 16.0 * jnp.floor(lo_u * (1.0 / 8.0))
    return lo, hi


def _kernel_int4(x_ref, wg_ref, sg_ref, wu_ref, su_ref, wd_ref, sd_ref,
                 out_ref, *, gfb2: int):
    """One (F-block, column-half) step of the int4 SwiGLU MLP.

    The reduction over F is permutation-invariant, so the grid walks F in
    PACKED-PAIR order over a 2-D grid (j, h): step (j, h) covers unpacked
    F-columns [h*F/2 + j*PB, h*F/2 + (j+1)*PB) — h selects which nibble of
    the wd byte rows [j*PB, (j+1)*PB) (row r packs F-rows r and r+F/2).
    The half-selection rides the GRID, not a mid-tensor slice: every block
    stays rank-2 with native (32, 128)-tiled int8 layout (a (.., 2, PB)
    block tiles its last two dims — sublane dim 2 → 16x padded DMA and
    VPU; measured 23 GB/s before this layout). h is the INNER grid dim, so
    the wd block index is unchanged between the two h-steps and Mosaic
    skips its re-fetch. Nibbles unpack via f32 floor-arithmetic
    (_unpack_f32); scales apply per 128-row group in f32 (matching
    models/quant._dequantize_int4 numerics up to f32 scale-mul)."""
    h = pl.program_id(1)
    first = jnp.logical_and(pl.program_id(0) == 0, h == 0)

    x = x_ref[:]                                    # (B, D) bf16
    D = x.shape[1]
    xl, xh = x[:, : D // 2], x[:, D // 2:]

    def gate_up(w_ref, s_ref):
        p = w_ref[:]                                # (D/2, PB) packed int8
        lo, hi = _unpack_f32(p)                     # D-rows [0,D/2), [D/2,D)
        s = s_ref[:]                                # (G, PB), G = D/group
        G = s.shape[0]
        y = jnp.dot(xl, _deq_groups(lo, s[: G // 2]),
                    preferred_element_type=jnp.float32)
        y += jnp.dot(xh, _deq_groups(hi, s[G // 2:]),
                     preferred_element_type=jnp.float32)
        return y                                    # (B, PB) f32

    g = gate_up(wg_ref, sg_ref)
    u = gate_up(wu_ref, su_ref)
    hid = ((g * jax.nn.sigmoid(g)) * u).astype(jnp.bfloat16)
    lo_d, hi_d = _unpack_f32(wd_ref[:])             # (PB, D) f32 each
    nib = jnp.where(h == 0, lo_d, hi_d)
    # sd block (1, P, D): rows [0, gfb2) = this (j, h)-step's F-group
    # scales (host-permuted into per-step order, 8-padded leading rows)
    wd = _deq_groups(nib, sd_ref[0, :gfb2, :])
    p = jnp.dot(hid, wd, preferred_element_type=jnp.float32)

    @pl.when(first)
    def _():
        out_ref[:] = p

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] = out_ref[:] + p


@functools.partial(jax.jit, static_argnames=("block_f", "interpret"))
def fused_mlp_int4(x, wg_p, wg_s, wu_p, wu_s, wd_p, wd_s, *,
                   block_f: int = None, interpret: bool = False):
    """SwiGLU MLP over nibble-packed int4 weights: x (B, D) -> (B, D).

    wg_p/wu_p: (D/2, F) packed int8 (models/quant.quantize_weight_int4:
    byte i = reduction-row i low nibble, row i + D/2 high nibble), scales
    (D/group, F) f32; wd_p: (F/2, D) packed, scale (F/group, D). block_f
    is the PACKED F-block (covers 2*block_f unpacked columns/step).

    Why a kernel at all: XLA cannot fuse the nibble unpack into matmul
    weight streaming — it materializes the unpacked operand in HBM and the
    8B engine drops to 6 FPS (BENCH_NOTES.md). Here the int4 bytes stream
    through VMEM once and unpack in registers."""
    B, D = x.shape
    F = wg_p.shape[1]
    half = F // 2
    block_f = BLOCK_F if block_f is None else block_f
    fb = min(block_f, half)
    assert half % fb == 0, (F, fb)
    gd = wg_s.shape[0]                  # D-groups (even: lo/hi halves split)
    gf = wd_s.shape[0]                  # F-groups
    group_f = F // gf
    assert gd % 2 == 0 and gf % 2 == 0 and fb % group_f == 0, (gd, gf, fb)
    gfb2 = fb // group_f                # F-groups per (j, h) step
    steps = half // fb
    grid = (steps, 2)                   # h (column half) INNER: wd block
    #                                     index is h-invariant -> one fetch
    # wd scales permuted into per-(j, h)-step order: one contiguous leading
    # block index each step, rows 8-padded (Mosaic block rule: trailing
    # two dims (8-mult, 128-mult) or full)
    sd = wd_s.reshape(2, steps, gfb2, D).transpose(1, 0, 2, 3)
    sd = sd.reshape(steps * 2, gfb2, D)
    P = ((gfb2 + 7) // 8) * 8
    if P != gfb2:
        sd = jnp.pad(sd, ((0, 0), (0, P - gfb2), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel_int4, gfb2=gfb2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, D), lambda j, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D // 2, fb), lambda j, h: (0, h * steps + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gd, fb), lambda j, h: (0, h * steps + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D // 2, fb), lambda j, h: (0, h * steps + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gd, fb), lambda j, h: (0, h * steps + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, D), lambda j, h: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, D), lambda j, h: (2 * j + h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, D), lambda j, h: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024)),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * F * 3,
            bytes_accessed=3 * D * F // 2 + 2 * B * D,
            transcendentals=B * F,
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), wg_p, wg_s, wu_p, wu_s, wd_p, sd)
    return out.astype(x.dtype)


# --------------------------------------------------------------------------
# int4 v2: COLUMN-packed nibbles (models/quant.quantize_weight_int4c) with
# partial-sum dequant. Because both nibbles of a byte share the same
# contraction row,  x @ bytes = 16*(x @ hi) + x @ lo_biased : ONE matmul
# against the raw bytes plus one against the floor-extracted high nibble
# recovers both output-column halves on (B, block) partials. Scales and the
# +8 low-nibble bias apply per contraction GROUP to those partials, never
# per element. VPU cost: ~5 ops/packed byte (cvt-bf16, cvt-f32, mul, floor,
# cvt-bf16) vs ~11 for the row-packed q4p kernel — measured 5.71 ->
# ~byte-roof ms per 8-layer MLP (see BENCH_NOTES.md round 3).


def _int4c_partials(x, w, s_lo, s_hi):
    """x (B, K) bf16, w (K, PB) col-packed int8, s_lo/s_hi (G, PB) f32
    -> (acc_lo, acc_hi) (B, PB) f32 with scales applied."""
    K = w.shape[0]
    G = s_lo.shape[0]
    gk = K // G
    xf = x.astype(jnp.float32)
    acc_lo = acc_hi = None
    for g in range(G):
        xg = x[:, g * gk:(g + 1) * gk]
        fg = w[g * gk:(g + 1) * gk, :]
        y_mix = jnp.dot(xg, fg.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        hi_f = jnp.floor(fg.astype(jnp.float32) * (1.0 / 16.0))
        y_hi = jnp.dot(xg, hi_f.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        rs = jnp.sum(xf[:, g * gk:(g + 1) * gk], axis=1, keepdims=True)
        y_lo = y_mix - 16.0 * y_hi - 8.0 * rs
        pl_ = y_lo * s_lo[g:g + 1, :]
        ph_ = y_hi * s_hi[g:g + 1, :]
        acc_lo = pl_ if acc_lo is None else acc_lo + pl_
        acc_hi = ph_ if acc_hi is None else acc_hi + ph_
    return acc_lo, acc_hi


def _kernel_int4c(x_ref, wg_ref, sgl_ref, sgh_ref, wu_ref, sul_ref, suh_ref,
                  wdl_ref, wdh_ref, sd_ref, out_ref, *, gf_per: int):
    """One F-block step of the column-packed int4 SwiGLU MLP. Step j covers
    unpacked F-columns [j*PB, (j+1)*PB) (lo nibbles) and [F/2 + j*PB, ...)
    (hi nibbles) of gate/up, then immediately consumes exactly those h rows
    of wd (two row-blocks of the column-packed down matrix)."""
    j = pl.program_id(0)
    x = x_ref[:]                                    # (B, D) bf16
    Dh = wdl_ref.shape[1]

    g_lo, g_hi = _int4c_partials(x, wg_ref[:], sgl_ref[:], sgh_ref[:])
    u_lo, u_hi = _int4c_partials(x, wu_ref[:], sul_ref[:], suh_ref[:])
    h_lo = ((g_lo * jax.nn.sigmoid(g_lo)) * u_lo).astype(jnp.bfloat16)
    h_hi = ((g_hi * jax.nn.sigmoid(g_hi)) * u_hi).astype(jnp.bfloat16)

    sd = sd_ref[:][0]                               # (16, D)
    out_lo = out_hi = None
    for src_idx, (hs, wd_r) in enumerate(((h_lo, wdl_ref), (h_hi, wdh_ref))):
        wd = wd_r[:]                                # (PB, Dh) packed
        PB = wd.shape[0]
        gk = PB // gf_per
        hf = hs.astype(jnp.float32)
        for gf in range(gf_per):
            hg = hs[:, gf * gk:(gf + 1) * gk]
            fg = wd[gf * gk:(gf + 1) * gk, :]
            y_mix = jnp.dot(hg, fg.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            hi_f = jnp.floor(fg.astype(jnp.float32) * (1.0 / 16.0))
            y_hi = jnp.dot(hg, hi_f.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            rs = jnp.sum(hf[:, gf * gk:(gf + 1) * gk], axis=1, keepdims=True)
            y_lo = y_mix - 16.0 * y_hi - 8.0 * rs
            srow = sd[src_idx * 8 + gf:src_idx * 8 + gf + 1, :]  # (1, D)
            pl_ = y_lo * srow[:, :Dh]
            ph_ = y_hi * srow[:, Dh:]
            out_lo = pl_ if out_lo is None else out_lo + pl_
            out_hi = ph_ if out_hi is None else out_hi + ph_

    res = jnp.concatenate([out_lo, out_hi], axis=1)  # (B, D)

    @pl.when(j == 0)
    def _():
        out_ref[:] = res

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + res


@functools.partial(jax.jit, static_argnames=("block_f", "interpret"))
def fused_mlp_int4c(x, wg_p, wg_s, wu_p, wu_s, wd_p, wd_s, *,
                    block_f: int = None, interpret: bool = False):
    """SwiGLU MLP over COLUMN-packed int4 weights: x (B, D) -> (B, D).

    wg_p/wu_p: (D, F/2) packed int8 (byte (k, j) = 16*q[k, j+F/2] +
    (q[k, j]+8)), scales (D/group, F) f32; wd_p: (F, D/2) packed, scale
    (F/group, D) f32. block_f is the PACKED column block (covers the column
    pair (j, j+F/2) per packed column)."""
    B, D = x.shape
    half = wg_p.shape[1]                 # F/2
    F = 2 * half
    block_f = BLOCK_F if block_f is None else block_f
    fb = min(block_f, half)
    assert half % fb == 0, (F, fb)
    steps = half // fb
    Gd = wg_s.shape[0]
    Gf = wd_s.shape[0]
    group_f = F // Gf
    assert Gf % 2 == 0 and fb % group_f == 0, (Gf, fb, group_f)
    gf_per = fb // group_f               # F-groups per step per source
    assert gf_per <= 8, gf_per
    # per-step down scales: rows [0, gf_per) = lo-source groups, rows
    # [8, 8+gf_per) = hi-source groups (8-row padding per Mosaic block rule)
    sdl = wd_s[: Gf // 2].reshape(steps, gf_per, D)
    sdh = wd_s[Gf // 2:].reshape(steps, gf_per, D)
    pad = ((0, 0), (0, 8 - gf_per), (0, 0))
    sd = jnp.concatenate([jnp.pad(sdl, pad), jnp.pad(sdh, pad)], axis=1)

    out = pl.pallas_call(
        functools.partial(_kernel_int4c, gf_per=gf_per),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((B, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, fb), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((Gd, fb), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Gd, fb), lambda j, s=steps: (0, s + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, fb), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((Gd, fb), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Gd, fb), lambda j, s=steps: (0, s + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, D // 2), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, D // 2), lambda j, s=steps: (s + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, D), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, D), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024)),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * F * 3 * 2,   # mix + hi matmuls
            bytes_accessed=3 * D * F // 2 + 2 * B * D,
            transcendentals=B * F,
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), wg_p, wg_s, wg_s, wu_p, wu_s, wu_s,
      wd_p, wd_p, sd)
    return out.astype(x.dtype)


def _kernel_matmul_int4c(x_ref, w_ref, sl_ref, sh_ref, lo_ref, hi_ref):
    acc_lo, acc_hi = _int4c_partials(x_ref[:], w_ref[:], sl_ref[:],
                                     sh_ref[:])
    lo_ref[:] = acc_lo
    hi_ref[:] = acc_hi


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def matmul_int4c(x, w_p, w_s, *, block_n: int, interpret: bool = False):
    """x (B, K) @ column-packed int4 (K, N/2; scale (K/group, N)) -> (B, N)
    f32. One pallas_call; used for the int4 lm_head (one call per decode
    token — the per-matmul fusion-barrier economics that kill per-matmul
    int8 kernels don't apply to a matrix XLA can't stream packed)."""
    B, K = x.shape
    half = w_p.shape[1]
    N = 2 * half
    G = w_s.shape[0]
    assert half % block_n == 0, (half, block_n)
    steps = half // block_n

    lo, hi = pl.pallas_call(
        _kernel_matmul_int4c,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((B, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, block_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, block_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, block_n), lambda j, s=steps: (0, s + j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, block_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, block_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, half), jnp.float32),
                   jax.ShapeDtypeStruct((B, half), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024)),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * N * 2,
            bytes_accessed=K * N // 2 + 4 * B * N,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), w_p, w_s, w_s)
    return jnp.concatenate([lo, hi], axis=1)


def _int4c_block_n(half: int, group: int) -> int:
    """Largest packed-column block <= 512 that divides N/2 (lane-aligned)."""
    for cand in (512, 384, 256, 128):
        if half % cand == 0:
            return cand
    return 0


def maybe_matmul_int4c(x, qw):
    """Trace-time dispatch for a single col-packed int4 matmul (lm_head,
    gate-logit gathers): TPU + decode-regime token counts only. Returns
    (.., N) f32 output or None (caller falls back to the XLA dequant)."""
    if not _enabled() or jax.default_backend() != "tpu":
        return None
    w_p, w_s = qw.get("q4c"), qw.get("scale")
    if w_p is None or w_p.ndim != 2:
        return None
    *lead, K = x.shape
    B = 1
    for d in lead:
        B *= d
    if B == 0 or B > MAX_FUSED_TOKENS:
        return None
    if K != w_p.shape[0] or K % w_s.shape[0]:
        return None
    bn = _int4c_block_n(w_p.shape[1], K // w_s.shape[0])
    if not bn:
        return None
    y = matmul_int4c(x.reshape(B, K), w_p, w_s, block_n=bn)
    return y.reshape(*lead, y.shape[-1])


def mlp_int8(x, layer_params, *, block_f: int = None, interpret: bool = False):
    """(B, S, D) wrapper over the fused kernel for models/llama._layer.

    Only valid for int8-quantized layers without LoRA on the MLP; callers
    gate on that (llama._layer falls back to the XLA path otherwise)."""
    B, S, D = x.shape
    wg, wu, wd = (layer_params["w_gate"], layer_params["w_up"],
                  layer_params["w_down"])
    y = fused_mlp_int8(
        x.reshape(B * S, D), wg["q8"], wg["scale"], wu["q8"], wu["scale"],
        wd["q8"], wd["scale"], block_f=block_f, interpret=interpret)
    return y.reshape(B, S, D)


def mlp_int4(x, layer_params, *, block_f: int = None, interpret: bool = False):
    """(B, S, D) wrapper over the int4 fused kernel (same contract)."""
    B, S, D = x.shape
    wg, wu, wd = (layer_params["w_gate"], layer_params["w_up"],
                  layer_params["w_down"])
    y = fused_mlp_int4(
        x.reshape(B * S, D), wg["q4p"], wg["scale"], wu["q4p"], wu["scale"],
        wd["q4p"], wd["scale"], block_f=block_f, interpret=interpret)
    return y.reshape(B, S, D)


def mlp_int4c(x, layer_params, *, block_f: int = None,
              interpret: bool = False):
    """(B, S, D) wrapper over the column-packed int4 fused kernel."""
    B, S, D = x.shape
    wg, wu, wd = (layer_params["w_gate"], layer_params["w_up"],
                  layer_params["w_down"])
    y = fused_mlp_int4c(
        x.reshape(B * S, D), wg["q4c"], wg["scale"], wu["q4c"], wu["scale"],
        wd["q4c"], wd["scale"], block_f=block_f, interpret=interpret)
    return y.reshape(B, S, D)


# serving-shape bound: decode is S=1, chunked ingest S<=~16, batched
# multistream B*S<=~128; prefill buckets (256+) are MXU-bound and XLA wins
MAX_FUSED_TOKENS = 128

# Default packed-F block for the int8/int4 kernels. The maybe_fused dispatch
# guard derives its divisibility checks from this SAME constant, so changing
# the kernel default can never desync the guard from the kernel's asserts.
BLOCK_F = 512


def _enabled() -> bool:
    # read per call (trace-time only, cost nil): a kill-switch snapshot at
    # import time would silently ignore VLO_FUSED_MLP set mid-process
    return os.environ.get("VLO_FUSED_MLP", "1") != "0"


def maybe_fused(x, layer_params, layer_lora):
    """Trace-time dispatch: the fused whole-MLP kernel when the layer is
    weight-only quantized (int8 or int4), the MLP carries no LoRA, the
    token count is in the weight-bound regime, and we're on real TPU.
    Returns the MLP output or None (caller falls back to the XLA path)."""
    if not _enabled() or jax.default_backend() != "tpu":
        return None
    B, S, D = x.shape
    if B * S > MAX_FUSED_TOKENS:
        return None
    if layer_lora is not None and any(
            layer_lora.get(n) is not None
            for n in ("w_gate", "w_up", "w_down")):
        return None
    mats = [layer_params.get(n) for n in ("w_gate", "w_up", "w_down")]
    if not all(isinstance(m, dict) for m in mats):
        return None
    wg, wu, wd = mats
    # int8: SETTLED — XLA's fused convert-matmul with cross-op weight
    # prefetch wins (3.5 vs 5.2 ms per 8-layer MLP scan, benchmarks/
    # mlp_bench.py); the int8 kernel stays for A/B but is not dispatched.
    # int4: the kernel dequantizes nibbles in-registers, which XLA cannot
    # (it materializes the unpacked operand; the int4 engine measured 3x
    # slower than int8 via XLA) — dispatch it for int4-quantized layers.
    # int4 v2 (column-packed, round 3): partial-sum dequant — ~5 VPU
    # ops/byte vs q4p's ~11; this is the int4 serving layout.
    if all("q4c" in m for m in mats):
        F = 2 * wg["q4c"].shape[1]
        gf = wd["scale"].shape[0]
        fb = min(BLOCK_F, F // 2)
        if (gf % 2 or (F // 2) % fb or fb % (F // gf)
                or fb // (F // gf) > 8):
            return None
        return mlp_int4c(x, layer_params)
    if all("q4p" in m for m in mats):
        F = wg["q4p"].shape[1]
        gd, gf = wg["scale"].shape[0], wd["scale"].shape[0]
        if gd % 2 or gf % 2 or (F // 2) % BLOCK_F or (BLOCK_F % (F // gf)):
            return None
        return mlp_int4(x, layer_params)
    return None
