"""Fused-MLP kernel vs XLA int8 path at 8B decode shapes (real TPU).

Measures a scan over L stacked layers (the decode loop's access pattern:
each layer's weights stream from HBM exactly once per step), dependency-
chained across REPS dispatches with one host-scalar fence at the end.

  python benchmarks/mlp_bench.py [--layers 32] [--reps 8] [--batch 1]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--block_f", type=int, default=512)
    p.add_argument("--block_f4", type=int, default=256)
    p.add_argument("--impl", default="both",
                   choices=["both", "xla", "fused", "fused4", "all"])
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     "/root/repo/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from videollm_online_tpu.models.llama import dense
    from videollm_online_tpu.ops import fused_mlp

    L, D, F, B = args.layers, 4096, 14336, args.batch
    key = jax.random.PRNGKey(0)

    # build stacked int8 weights directly on device (no tunnel upload)
    def qrand(k, shape, dout):
        q = jax.jit(lambda kk: jax.random.randint(kk, shape, -127, 128,
                                                  jnp.int8))(k)
        return {"q8": q, "scale": jnp.full((L, dout),
                                           0.02 / 127.0, jnp.float32)}

    ks = jax.random.split(key, 3)
    wg = qrand(ks[0], (L, D, F), F)
    wu = qrand(ks[1], (L, D, F), F)
    wd = qrand(ks[2], (L, F, D), D)
    _ = float(wd["q8"][0, 0, 0])
    print("weights on device", flush=True)

    nbytes = 3 * L * D * F  # int8

    def bench(name, step, nbytes, *weights):
        # weights as EXPLICIT jit args — closed-over device arrays embed as
        # HLO constants and the remote compile ships gigabytes (CLAUDE.md)
        x = jnp.ones((B, D), jnp.bfloat16)
        f = jax.jit(step)
        x = f(x, *weights); _ = float(x[0, 0])
        x = f(x, *weights); _ = float(x[0, 0])
        t0 = time.perf_counter()
        for _i in range(args.reps):
            x = f(x, *weights)
        _ = float(x[0, 0])
        dt = (time.perf_counter() - t0) / args.reps
        print(f"{name}: {dt*1e3:.2f} ms/step  {nbytes/dt/1e9:.0f} GB/s eff",
              flush=True)

    def xla_step(x, wg, wu, wd):
        def body(x, wl):
            g, u, d = wl
            y = dense(jax.nn.silu(dense(x, g)) * dense(x, u), d)
            return jnp.tanh(y), None
        return jax.lax.scan(body, x, (wg, wu, wd))[0]

    def fused_step(x, wg, wu, wd):
        def body(x, wl):
            g, u, d = wl
            y = fused_mlp.fused_mlp_int8(
                x, g["q8"], g["scale"], u["q8"], u["scale"], d["q8"],
                d["scale"], block_f=args.block_f)
            return jnp.tanh(y), None
        return jax.lax.scan(body, x, (wg, wu, wd))[0]

    def q4rand(k, d_in, d_out):
        from videollm_online_tpu.models.quant import INT4_GROUP
        q = jax.jit(lambda kk: jax.random.randint(
            kk, (L, d_in // 2, d_out), -128, 128, jnp.int8))(k)
        return {"q4p": q, "scale": jnp.full((L, d_in // INT4_GROUP, d_out),
                                            0.02 / 7.0, jnp.float32)}

    wg4 = q4rand(ks[0], D, F)
    wu4 = q4rand(ks[1], D, F)
    wd4 = q4rand(ks[2], F, D)
    _ = float(wd4["q4p"][0, 0, 0])
    nbytes4 = 3 * L * D * F // 2

    def fused4_step(x, wg4, wu4, wd4):
        def body(x, wl):
            g, u, d = wl
            y = fused_mlp.fused_mlp_int4(
                x, g["q4p"], g["scale"], u["q4p"], u["scale"], d["q4p"],
                d["scale"], block_f=args.block_f4)
            return jnp.tanh(y), None
        return jax.lax.scan(body, x, (wg4, wu4, wd4))[0]

    if args.impl in ("both", "all", "xla"):
        bench("XLA  int8 MLP scan", xla_step, nbytes, wg, wu, wd)
    if args.impl in ("both", "all", "fused"):
        bench("FUSED int8 MLP scan", fused_step, nbytes, wg, wu, wd)
    if args.impl in ("all", "fused4"):
        bench("FUSED int4 MLP scan", fused4_step, nbytes4, wg4, wu4, wd4)


if __name__ == "__main__":
    main()
