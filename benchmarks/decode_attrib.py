"""Attribute the 8B int8 in-context decode step's time (VERDICT r2 item 1a).

The serving respond loop runs ~12 ms/token against a ~9.7 ms byte-roof
(int8 weights 6.6 GB + int8 lm_head 0.53 GB + KV at 750-800 GB/s). This
bench isolates each suspect on the real chip:

  full        one-token decode dispatch (embed -> 32 layers -> lm_head ->
              argmax), ring cache at a realistic serving offset
  while20     the SAME step iterated 20x by lax.while_loop inside ONE
              dispatch (the serving `ingest_stream` respond structure)
  nohead      full minus the lm_head matmul (return_hidden)
  headonly    the lm_head matmul alone
  ctx_small   full at a near-empty ring (attention valid-length cost)
  mm_roof     dependency-chained bare dense() over every decoder weight +
              lm_head (no norms/rope/attention/residuals) — the practical
              XLA weight-streaming roof

All variants chain iterations on a data dependency and fence ONCE via a
host scalar (CLAUDE.md: per-iteration fences measure tunnel RTT).

  python benchmarks/decode_attrib.py [--reps 32] [--ctx 8192] [--offset 5400]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=32)
    p.add_argument("--ctx", type=int, default=8192)
    p.add_argument("--offset", type=int, default=5400)
    p.add_argument("--model", default="8b")
    p.add_argument("--quant", default="int8", choices=["int8", "int4"])
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from videollm_online_tpu.core.config import LlamaConfig
    from videollm_online_tpu.models import llama, quant
    from videollm_online_tpu.ops.auto import auto_attention

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import MODEL_SIZES  # noqa: E402 (repo-root bench.py)

    cfg = LlamaConfig(**MODEL_SIZES[args.model], dtype="bfloat16")
    key = jax.random.PRNGKey(0)
    params = quant.random_quantized_llama_params(
        key, cfg, bits=4 if args.quant == "int4" else 8)
    _ = float(params["final_norm"][0])
    print("params on device", flush=True)

    L, D, F = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    V = cfg.vocab_size
    kvd = cfg.num_kv_heads * cfg.head_dim
    qd = cfg.num_heads * cfg.head_dim
    div = 2 if args.quant == "int4" else 1
    wbytes = L * (D * qd + 2 * D * kvd + D * qd + 3 * D * F) // div
    hbytes = D * V // div  # lm_head quantized alongside the decoder
    kvbytes = 2 * L * 2 * kvd * args.offset  # bf16 K+V valid region
    print(f"weights {wbytes/1e9:.2f} GB + lm_head {hbytes/1e9:.2f} GB "
          f"+ KV(valid) {kvbytes/1e9:.2f} GB", flush=True)

    def fresh_cache():
        c = llama.init_kv_cache(cfg, batch=1, capacity=args.ctx)
        return c._replace(offset=jnp.full((1,), args.offset, jnp.int32))

    def run(name, fn, state, iters=None, tokens_per_iter=1):
        iters = iters or args.reps
        state = fn(state)
        jax.tree.map(lambda x: x.block_until_ready(), state)
        _ = float(jnp.asarray(state[0]).reshape(-1)[0])
        state = fn(state)
        _ = float(jnp.asarray(state[0]).reshape(-1)[0])
        t0 = time.perf_counter()
        for _i in range(iters):
            state = fn(state)
        _ = float(jnp.asarray(state[0]).reshape(-1)[0])
        dt = (time.perf_counter() - t0) / (iters * tokens_per_iter)
        print(f"{name:<10s} {dt*1e3:7.2f} ms/token", flush=True)
        return dt

    # params as explicit jit args (closure constants would ship GB through
    # the remote compile, CLAUDE.md)
    def wrap(jitted):
        def fn(state):
            return jitted(params, state)
        return fn

    # -------------------------------------------------- A. full decode step
    @jax.jit
    def _full(prm, state):
        tok, cache = state
        emb = llama.embed_tokens(prm, tok[None, None], cfg)
        logits, cache = llama.forward(
            prm, cfg=cfg, inputs_embeds=emb, kv_cache=cache,
            last_logit_only=True, attn_impl=auto_attention)
        nxt = jnp.argmax(logits[0, -1]).astype(jnp.int32)
        return nxt % 1000, cache

    t_full = run("full", wrap(_full), (jnp.asarray(7, jnp.int32),
                                       fresh_cache()))

    # --------------------------------- B. 20-token while_loop (serving form)
    N_LOOP = 20

    @jax.jit
    def _while20(prm, state):
        tok, cache = state

        def body(c):
            i, tok, cache = c
            emb = llama.embed_tokens(prm, tok[None, None], cfg)
            logits, cache = llama.forward(
                prm, cfg=cfg, inputs_embeds=emb, kv_cache=cache,
                last_logit_only=True, attn_impl=auto_attention)
            nxt = jnp.argmax(logits[0, -1]).astype(jnp.int32)
            return i + 1, nxt % 1000, cache

        _, tok, cache = jax.lax.while_loop(
            lambda c: c[0] < N_LOOP, body, (jnp.zeros((), jnp.int32), tok,
                                            cache))
        # rewind the ring so context length stays pinned across reps
        cache = cache._replace(
            offset=jnp.full((1,), args.offset, jnp.int32))
        return tok, cache

    run("while20", wrap(_while20), (jnp.asarray(7, jnp.int32), fresh_cache()),
        iters=max(args.reps // 8, 4), tokens_per_iter=N_LOOP)

    # ------------------------------------------------------- C. no lm_head
    @jax.jit
    def _nohead(prm, state):
        tok, cache = state
        emb = llama.embed_tokens(prm, tok[None, None], cfg)
        h, cache = llama.forward(
            prm, cfg=cfg, inputs_embeds=emb, kv_cache=cache,
            last_logit_only=True, attn_impl=auto_attention,
            return_hidden=True)
        nxt = jnp.argmax(h[0, -1]).astype(jnp.int32)
        return nxt % 1000, cache

    t_nohead = run("nohead", wrap(_nohead), (jnp.asarray(7, jnp.int32),
                                             fresh_cache()))

    # ------------------------------------------------------ D. lm_head only
    @jax.jit
    def _headonly(prm, state):
        x, = state
        y = llama.lm_head(prm, x, cfg)
        nxt = jnp.argmax(y[0, -1]) % D
        x = x * 0.999 + jnp.zeros_like(x).at[0, 0, nxt].set(1e-3)
        return (x,)

    t_head = run("headonly", wrap(_headonly),
                 (jnp.ones((1, 1, D), jnp.bfloat16),))

    # ----------------------------------------------- E. small-context decode
    def small_cache():
        c = llama.init_kv_cache(cfg, batch=1, capacity=args.ctx)
        return c._replace(offset=jnp.full((1,), 256, jnp.int32))

    t_small = run("ctx_small", wrap(_full), (jnp.asarray(7, jnp.int32),
                                             small_cache()))

    # -------------------------------------------------------- F. matmul roof
    @jax.jit
    def _mmroof(prm, state):
        x, = state
        h = x  # (1, 1, D)

        def body(h, wl):
            q = llama.dense(h, wl["wq"])
            k = llama.dense(h, wl["wk"])
            v = llama.dense(h, wl["wv"])
            o = llama.dense(q, wl["wo"])
            g = llama.dense(h, wl["w_gate"])
            u = llama.dense(h, wl["w_up"])
            dn = llama.dense(jax.nn.silu(g) * u, wl["w_down"])
            mix = (o + dn + k.sum() + v.sum()).astype(h.dtype)
            return mix, None

        h, _ = jax.lax.scan(body, h, prm["layers"])
        y = llama.lm_head(prm, h, cfg)
        nxt = jnp.argmax(y[0, -1]) % D
        x = x * 0.999 + jnp.zeros_like(x).at[0, 0, nxt].set(1e-3)
        return (x,)

    t_roof = run("mm_roof", wrap(_mmroof), (jnp.ones((1, 1, D), jnp.bfloat16),))

    # ---------------- while-loop variants: the serving structure pays NO
    # per-dispatch cost, so deltas between loop variants are pure compute
    def loop_of(step_body, rewind=None):
        @jax.jit
        def fn(prm, state):
            def body(c):
                i, s = c
                return i + 1, step_body(prm, s)
            _, s = jax.lax.while_loop(lambda c: c[0] < N_LOOP, body,
                                      (jnp.zeros((), jnp.int32), state))
            if rewind is not None:
                s = (s[0], s[1]._replace(
                    offset=jnp.full((1,), rewind, jnp.int32)))
            return s
        return fn

    def body_nohead(prm, state):
        tok, cache = state
        emb = llama.embed_tokens(prm, tok[None, None], cfg)
        h, cache = llama.forward(
            prm, cfg=cfg, inputs_embeds=emb, kv_cache=cache,
            last_logit_only=True, attn_impl=auto_attention,
            return_hidden=True)
        return jnp.argmax(h[0, -1]).astype(jnp.int32) % 1000, cache

    def body_mmroof(prm, state):
        x, = state

        def lyr(h, wl):
            q = llama.dense(h, wl["wq"])
            k = llama.dense(h, wl["wk"])
            v = llama.dense(h, wl["wv"])
            o = llama.dense(q, wl["wo"])
            g = llama.dense(h, wl["w_gate"])
            u = llama.dense(h, wl["w_up"])
            dn = llama.dense(jax.nn.silu(g) * u, wl["w_down"])
            return (o + dn + k.sum() + v.sum()).astype(h.dtype), None

        h, _ = jax.lax.scan(lyr, x, prm["layers"])
        y = llama.lm_head(prm, h, cfg)
        nxt = jnp.argmax(y[0, -1]) % D
        return (x * 0.999 + jnp.zeros_like(x).at[0, 0, nxt].set(1e-3),)

    li = max(args.reps // 8, 4)
    t_lh = run("loop_nohd", wrap(loop_of(body_nohead, rewind=args.offset)),
               (jnp.asarray(7, jnp.int32), fresh_cache()), iters=li,
               tokens_per_iter=N_LOOP)
    t_lr = run("loop_roof", wrap(loop_of(body_mmroof)),
               (jnp.ones((1, 1, D), jnp.bfloat16),), iters=li,
               tokens_per_iter=N_LOOP)

    def body_full(prm, state):
        tok, cache = state
        emb = llama.embed_tokens(prm, tok[None, None], cfg)
        logits, cache = llama.forward(
            prm, cfg=cfg, inputs_embeds=emb, kv_cache=cache,
            last_logit_only=True, attn_impl=auto_attention)
        return jnp.argmax(logits[0, -1]).astype(jnp.int32) % 1000, cache

    sc = llama.init_kv_cache(cfg, batch=1, capacity=args.ctx)
    sc = sc._replace(offset=jnp.full((1,), 256, jnp.int32))
    t_ls = run("loop_sml", wrap(loop_of(body_full, rewind=256)),
               (jnp.asarray(7, jnp.int32), sc), iters=li,
               tokens_per_iter=N_LOOP)

    # ------------------------------------------------------------- summary
    print("\nattribution (ms/token):", flush=True)
    print(f"  lm_head epilogue      : {(t_full - t_nohead)*1e3:6.2f} "
          f"(isolated head: {t_head*1e3:.2f})")
    print(f"  attention ctx {args.offset:5d}   : "
          f"{(t_full - t_small)*1e3:6.2f} (vs ctx 256)")
    print(f"  non-matmul overhead   : {(t_small - t_roof)*1e3:6.2f} "
          f"(ctx_small - mm_roof; norms/rope/scatter/attn@256)")
    print(f"  mm_roof (weights+head): {t_roof*1e3:6.2f}")
    print("\nin-loop (serving-form, no per-dispatch cost; ms/token):",
          flush=True)
    t_lf = None  # while20 above IS loop_full at args.offset
    print(f"  loop lm_head          : see loop_nohd delta vs while20")
    print(f"  loop attention Δctx   : while20 - loop_sml")
    print(f"  loop roof             : {t_lr*1e3:6.2f} "
          f"({(wbytes+hbytes)/t_lr/1e9:.0f} GB/s eff)")


if __name__ == "__main__":
    main()
