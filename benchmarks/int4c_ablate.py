"""Attribute the int4c kernel's VPU cost: variants of the column-packed
matmul at the 8B gate shape (4096 -> 14336), scanned over 8 layers.

  full   current kernel: f32 floor-mul hi extraction, group-128 partials
  g512   group-512 scales (8 partial matmuls instead of 32)
  shift  hi extraction via i32 arithmetic shift (no f32 mul/floor)
  nohi   SKIP hi extraction (reuse raw bytes; wrong numerics) - isolates
         the extraction's VPU cost
  onemm  single mix matmul only (wrong numerics) - isolates the 2nd matmul
  cvt    bytes -> bf16 convert + one whole-K matmul (wrong numerics) -
         the int8-path structure lower bound
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, K, N = 8, 4096, 14336
HALF = N // 2
FB = 512
REPS = 16


def kernel(x_ref, w_ref, sl_ref, sh_ref, o_ref, *, mode, group):
    x = x_ref[:]
    w = w_ref[:]
    sl = sl_ref[:]
    sh = sh_ref[:]
    G = K // group
    if mode.startswith("vpu"):
        # B=1 vector-matrix on the VPU: elementwise multiply + sublane
        # reduction, no MXU. x broadcast as a (K, 1) column.
        xc = x.astype(jnp.float32).reshape(K, 1)
        acc_lo = acc_hi = None
        for g in range(G):
            wf = w[g * group:(g + 1) * group, :].astype(jnp.float32)
            xg = xc[g * group:(g + 1) * group, :]
            if mode == "vpu_cvt":
                p = jnp.sum(wf * xg, axis=0, keepdims=True) * sl[g:g + 1, :]
                acc_lo = p if acc_lo is None else acc_lo + p
                continue
            hi = jnp.floor(wf * (1.0 / 16.0))
            lo = wf - 16.0 * hi - 8.0
            pl_ = jnp.sum(lo * xg, axis=0, keepdims=True) * sl[g:g + 1, :]
            ph_ = jnp.sum(hi * xg, axis=0, keepdims=True) * sh[g:g + 1, :]
            acc_lo = pl_ if acc_lo is None else acc_lo + pl_
            acc_hi = ph_ if acc_hi is None else acc_hi + ph_
        o_ref[:] = acc_lo if mode == "vpu_cvt" else acc_lo + acc_hi
        return
    if mode == "cvt":
        y = jnp.dot(x, w.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        o_ref[:] = y * sl[0:1, :]
        return
    acc_lo = acc_hi = None
    xf = x.astype(jnp.float32)
    for g in range(G):
        xg = x[:, g * group:(g + 1) * group]
        fg = w[g * group:(g + 1) * group, :]
        y_mix = jnp.dot(xg, fg.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        if mode == "onemm":
            pl_ = y_mix * sl[g:g + 1, :]
            acc_lo = pl_ if acc_lo is None else acc_lo + pl_
            continue
        if mode == "nohi":
            y_hi = y_mix
        elif mode == "shift":
            hi_i = jax.lax.shift_right_arithmetic(
                fg.astype(jnp.int32), jnp.int32(4))
            y_hi = jnp.dot(xg, hi_i.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        else:
            hi_f = jnp.floor(fg.astype(jnp.float32) * (1.0 / 16.0))
            y_hi = jnp.dot(xg, hi_f.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        rs = jnp.sum(xf[:, g * group:(g + 1) * group], axis=1, keepdims=True)
        y_lo = y_mix - 16.0 * y_hi - 8.0 * rs
        pl_ = y_lo * sl[g:g + 1, :]
        ph_ = y_hi * sh[g:g + 1, :]
        acc_lo = pl_ if acc_lo is None else acc_lo + pl_
        acc_hi = ph_ if acc_hi is None else acc_hi + ph_
    if mode == "onemm":
        o_ref[:] = acc_lo
    else:
        o_ref[:] = acc_lo + acc_hi


@functools.partial(jax.jit, static_argnames=("mode", "group"))
def run_layer(x, w, s, *, mode, group):
    G = K // group
    steps = HALF // FB
    out = pl.pallas_call(
        functools.partial(kernel, mode=mode, group=group),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, FB), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, FB), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, FB), lambda j, s=steps: (0, s + j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, FB), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, HALF), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024)),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * HALF * 2, bytes_accessed=K * HALF + 4 * N,
            transcendentals=0),
        interpret=False,
    )(x, w, s, s)
    return out


def main():
    modes = sys.argv[1:] or ["full", "g512", "shift", "nohi", "onemm", "cvt"]
    wk = jax.jit(lambda k: jax.random.randint(
        k, (L, K, HALF), -128, 128, jnp.int8))(jax.random.PRNGKey(0))
    _ = float(wk[0, 0, 0])
    print("weights on device", flush=True)
    nbytes = L * K * HALF

    for mode in modes:
        group = 512 if mode == "g512" else 128
        G = K // group
        s = jnp.full((L, G, N), 0.01, jnp.float32)

        @jax.jit
        def step(x, wk, s, mode=mode, group=group):
            def body(x, wl):
                w, sl = wl
                y = run_layer(x, w, sl, mode=mode, group=group)
                return jnp.tanh(y[:, :K]).astype(jnp.bfloat16), None
            return jax.lax.scan(body, x, (wk, s))[0]

        x = jnp.ones((1, K), jnp.bfloat16)
        x = step(x, wk, s); _ = float(x[0, 0])
        x = step(x, wk, s); _ = float(x[0, 0])
        t0 = time.perf_counter()
        for _i in range(REPS):
            x = step(x, wk, s)
        _ = float(x[0, 0])
        dt = (time.perf_counter() - t0) / REPS
        print(f"{mode:<6s} {dt*1e3:7.2f} ms  {nbytes/dt/1e9:6.0f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
