"""Audit: does ``lax.cond`` over a big KV buffer preserve in-place aliasing?

CLAUDE.md's rule ("lax.cond over a large carried array breaks XLA's
in-place aliasing — both branches force full-array copies") was measured
on ONE shape (the paged 8B forward, 45 -> 577 ms). VERDICT r3 #5 asks for
the precise boundary: the serving engines carry the ring cache / paged
pool through five ``lax.cond`` sites (serve/engine.py:549,731,765 —
respond arbitration; serve/multistream.py:622,667 — chunk-skip and
respond; models/llama.py:325 — paged slab write-back), all with an
identity false-branch. If XLA aliases the identity branch these are free;
if not, every dispatch silently copies gigabytes.

Method (per CLAUDE.md timing discipline): for each site pattern build the
buffer at serving scale, jit three programs with the buffer DONATED —

  ident   : buffer passes through untouched (dispatch-floor reference)
  uncond  : the true-branch update applied unconditionally
  cond(F) : ``lax.cond(pred, update, identity, buf)`` with pred=False
  cond(T) : same program, pred=True
  loopcond: the cond nested in a 4-iteration ``while_loop`` (the
            engine.py:731 / multistream.py:667 shape — cond over the
            LOOP CARRY, where copy-insertion runs under different rules)

chain ``iters`` dispatches on the donated buffer, fence ONCE via a host
scalar readback. A cond(F) time at the ident floor == aliasing preserved;
a cond(F) time ~= bytes/HBM-BW == full-buffer copy. Also prints the
compiled ``memory_analysis().temp_size_in_bytes`` — an extra buffer-sized
temp is the copy, visible without timing.

Run on the real chip:   python benchmarks/cond_alias_audit.py
CPU smoke:              python benchmarks/cond_alias_audit.py --platform cpu --small
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes (CPU smoke)")
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    iters = args.iters

    def bench(make_fn, buf, extra, label, gib):
        """Times fn(buf, *extra) chained on the donated buf; one fence."""
        fn = jax.jit(make_fn, donate_argnums=(0,))
        lowered = fn.lower(buf, *extra)
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        temp = getattr(ma, "temp_size_in_bytes", -1)
        buf2, s = compiled(jnp.copy(buf), *extra)  # donated: keep original
        # fence via host scalar (axon: block_until_ready can return early)
        _ = float(s)
        t0 = time.perf_counter()
        for _ in range(iters):
            buf2, s = compiled(buf2, *extra)
        _ = (float(s),
             float(buf2.ravel()[0].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / iters
        eff = gib / dt if dt > 0 else float("inf")
        print(f"  {label:<28} {dt * 1e3:8.2f} ms/dispatch   "
              f"temp={temp / 2**20:9.1f} MiB   "
              f"(full-copy-equiv {eff:6.1f} GiB/s)")
        return dt

    def site(name, buf, update, *, extra=()):
        """update(buf, *extra) -> buf  (the true branch)."""
        gib = buf.size * buf.dtype.itemsize / 2**30
        print(f"\n== {name}  buffer {gib:.2f} GiB {buf.dtype} "
              f"{buf.shape} ==")

        def ident(b, *e):
            # touch a scalar so the program isn't a pure pass-through
            return b, jnp.float32(0.0)

        def uncond(b, *e):
            return update(b, *e), jnp.float32(1.0)

        def condf(pred):
            def f(b, *e):
                out = lax.cond(pred, lambda x: update(x, *e),
                               lambda x: x, b)
                return out, jnp.float32(pred)
            return f

        def loopcond(b, *e):
            def body(st):
                i, x = st
                x = lax.cond(i % 2 == 0, lambda y: update(y, *e),
                             lambda y: y, x)
                return i + 1, x
            _, out = lax.while_loop(lambda st: st[0] < 4, body,
                                    (jnp.int32(0), b))
            return out, jnp.float32(2.0)

        def scan_uncond(b, *e):
            def body(x, i):
                return update(x, *e), i
            out, _ = lax.scan(body, b, jnp.arange(32))
            return out, jnp.float32(3.0)

        def scan_cond(b, *e):
            # the llama.py:325 context: a cond over the pool INSIDE the
            # per-layer scan — a copy here multiplies by num_layers
            def body(x, i):
                x = lax.cond(i < 0, lambda y: update(y, *e),
                             lambda y: y, x)
                return x, i
            out, _ = lax.scan(body, b, jnp.arange(32))
            return out, jnp.float32(4.0)

        t_id = bench(ident, buf, extra, "identity (floor)", gib)
        t_un = bench(uncond, buf, extra, "unconditional update", gib)
        t_cf = bench(condf(False), buf, extra, "cond(pred=False)", gib)
        t_ct = bench(condf(True), buf, extra, "cond(pred=True)", gib)
        t_lc = bench(loopcond, buf, extra, "cond in while_loop (4 it)", gib)
        t_su = bench(scan_uncond, buf, extra, "scan(32): uncond update", gib)
        t_sc = bench(scan_cond, buf, extra, "scan(32): cond(False)", gib)
        # a full-buffer copy costs ~= 2*bytes / HBM-BW; call it copying when
        # cond-False pays a meaningful fraction of that over the floor
        copy_t = 2 * gib / 700.0  # seconds at ~700 GiB/s effective
        floor = min(t_id, t_un)
        verdict = ("ALIASED (cond-False at the dispatch floor)"
                   if t_cf - floor < 0.35 * copy_t
                   else "COPYING (cond-False pays ~buffer bandwidth)")
        scan_verdict = ("ALIASED in scan"
                        if t_sc - min(t_su, floor) < 0.35 * copy_t * 32
                        else "COPYING per scan step")
        print(f"  -> {verdict}; {scan_verdict}")
        return dict(identity=t_id, uncond=t_un, cond_false=t_cf,
                    cond_true=t_ct, loop_cond=t_lc, scan_cond=t_sc)

    key = jax.random.PRNGKey(0)
    if args.small:
        L, Hkv, C, hd = 4, 2, 256, 32
        P, page = 16, 64
    else:
        # 8B serving shapes: ring capacity 8192, paged pool as the
        # multistream default (pool sized for 8 streams)
        L, Hkv, C, hd = 32, 8, 8192, 128
        P, page = 64, 512

    # --- site A: ring KV append (engine.py:549/731/765 respond conds) ----
    # true branch = one-token dynamic_update_slice append at offset (the
    # minimal RMW the respond branch performs many of)
    ring = jax.random.normal(key, (L, 1, Hkv, C, hd), jnp.bfloat16)
    row = jnp.ones((L, 1, Hkv, 1, hd), jnp.bfloat16)
    off = jnp.int32(17)

    def ring_update(b, r, o):
        return lax.dynamic_update_slice(b, r, (0, 0, 0, o, 0))

    site("ring KV (bf16) single-slot RMW", ring, ring_update,
         extra=(row, off))

    # --- site B: paged pool int8 page write (multistream.py:622/667,
    # llama.py:325) ---------------------------------------------------------
    pool = (jax.random.normal(key, (L, P, Hkv, page, hd)) * 16) \
        .astype(jnp.int8)
    pagebuf = jnp.ones((1, 1, Hkv, page, hd), jnp.int8)

    def pool_update(b, pg, pidx):
        return lax.dynamic_update_slice(b, pg, (3, pidx, 0, 0, 0))

    site("paged pool (int8) page RMW", pool, pool_update,
         extra=(pagebuf, jnp.int32(5)))

    # --- site C: cond whose true branch is a long while_loop of appends
    # (the respond/generate shape: cond -> while_loop(append)) -------------
    def gen_update(b, r, o):
        def body(st):
            i, x = st
            x = lax.dynamic_update_slice(x, r, (0, 0, 0, o + i, 0))
            return i + 1, x
        _, out = lax.while_loop(lambda st: st[0] < 8, body,
                                (jnp.int32(0), b))
        return out

    site("ring KV, cond->while_loop(8 appends)", ring, gen_update,
         extra=(row, off))


if __name__ == "__main__":
    main()
