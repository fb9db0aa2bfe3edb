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
                   choices=["both", "xla", "fused", "fused4", "fused4c", "xla4c",
                            "all"])
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

    def q4crand(k, d_in, d_out):
        from videollm_online_tpu.models.quant import INT4_GROUP
        # any int8 byte decodes consistently under the column-packed scheme
        q = jax.jit(lambda kk: jax.random.randint(
            kk, (L, d_in, d_out // 2), -128, 128, jnp.int8))(k)
        return {"q4c": q, "scale": jnp.full((L, d_in // INT4_GROUP, d_out),
                                            0.02 / 7.0, jnp.float32)}

    wg4c = q4crand(ks[0], D, F)
    wu4c = q4crand(ks[1], D, F)
    wd4c = q4crand(ks[2], F, D)
    _ = float(wd4c["q4c"][0, 0, 0])

    def fused4c_step(x, wg4c, wu4c, wd4c):
        def body(x, wl):
            g, u, d = wl
            y = fused_mlp.fused_mlp_int4c(
                x, g["q4c"], g["scale"], u["q4c"], u["scale"], d["q4c"],
                d["scale"], block_f=args.block_f)
            return jnp.tanh(y), None
        return jax.lax.scan(body, x, (wg4c, wu4c, wd4c))[0]

    def xla4c_mm(x, q):
        # two-dot column-packed int4: each dot's operand is a pure
        # elementwise function of the SAME packed byte array (no
        # concatenate on the contraction side), so XLA fuses the
        # convert/floor/scale chain into the dot — nothing materializes.
        p, s = q["q4c"], q["scale"]
        K2, half2 = p.shape[-2], p.shape[-1]
        G2 = s.shape[-2]
        pf = p.astype(jnp.float32)
        hi = jnp.floor(pf * (1.0 / 16.0))
        lo = pf - 16.0 * hi - 8.0
        sl = s[..., :, :half2].astype(jnp.float32)
        sh = s[..., :, half2:].astype(jnp.float32)
        wl = (lo.reshape(G2, K2 // G2, half2) * sl[:, None, :]) \
            .reshape(K2, half2).astype(jnp.bfloat16)
        wh = (hi.reshape(G2, K2 // G2, half2) * sh[:, None, :]) \
            .reshape(K2, half2).astype(jnp.bfloat16)
        return jnp.concatenate([x @ wl, x @ wh], axis=-1)

    def xla4c_step(x, wg4c, wu4c, wd4c):
        def body(x, wl):
            g, u, d = wl
            y = xla4c_mm(jax.nn.silu(xla4c_mm(x, g)) * xla4c_mm(x, u), d)
            return jnp.tanh(y[:, :4096]).astype(jnp.bfloat16), None
        return jax.lax.scan(body, x, (wg4c, wu4c, wd4c))[0]

    if args.impl in ("both", "all", "xla"):
        bench("XLA  int8 MLP scan", xla_step, nbytes, wg, wu, wd)
    if args.impl in ("both", "all", "fused"):
        bench("FUSED int8 MLP scan", fused_step, nbytes, wg, wu, wd)
    if args.impl in ("all", "fused4"):
        bench("FUSED int4 MLP scan", fused4_step, nbytes4, wg4, wu4, wd4)
    if args.impl in ("all", "fused4c"):
        bench("FUSED int4c MLP scan", fused4c_step, nbytes4,
              wg4c, wu4c, wd4c)
    if args.impl in ("all", "xla4c"):
        bench("XLA2DOT int4c MLP scan", xla4c_step, nbytes4,
              wg4c, wu4c, wd4c)


if __name__ == "__main__":
    main()
