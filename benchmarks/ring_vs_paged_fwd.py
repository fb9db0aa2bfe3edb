"""Isolate ring-vs-paged per-forward cost at the multistream serving shapes.

Round-3 finding driver: the fused multistream tick runs ~37% faster with
the paged pool than with the static ring at IDENTICAL tick counts
(serve_bench fused: 91.2 vs 124.6 aggregate FPS, 9 ticks each). This
microbenchmark times llama.forward alone — chunk-shaped (S=44) and
verify-shaped (S=8) appends at B=8 — on both cache layouts to attribute
the gap (append path? attention kernel? carry handling?).
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from videollm_online_tpu.core.config import LiveConfig, LlamaConfig
from videollm_online_tpu.models import live, llama, quant
from videollm_online_tpu.ops.auto import auto_attention
from bench import MODEL_SIZES

print("backend:", jax.default_backend())
llama_cfg = LlamaConfig(**MODEL_SIZES["8b"], dtype="bfloat16")
cfg = LiveConfig(llama=llama_cfg, lora=None)
key = jax.random.PRNGKey(0)
params = {"llama": quant.random_quantized_llama_params(key, cfg.llama, bits=8)}

B, C, page = 8, 2560, 512
D = cfg.llama.hidden_size


def bench(fwd, mk_cache, emb, iters=24):
    nv = jnp.full((B,), emb.shape[1], jnp.int32)
    logits, cache = fwd(params["llama"], emb, mk_cache(), nv)  # compile
    jax.block_until_ready(logits)
    _ = float(logits[0, 0, 0])  # fence
    # restart from a fresh cache (the compile call donated its input),
    # chain iterations on a data dependency
    cache = mk_cache()
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(iters):
        logits, cache = fwd(params["llama"], emb, cache, nv)
        emb = emb + 0.0 * logits[:, :1, :1].astype(emb.dtype)  # dependency
    acc = float(logits[0, 0, 0])
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3


def fwd_fn(p, emb, cache, nv):
    logits, cache = llama.forward(
        p, cfg=cfg.llama, inputs_embeds=emb, kv_cache=cache, num_valid=nv,
        attn_impl=auto_attention,
        logit_gather_positions=jnp.clip(nv - 1, 0, None))
    return logits, cache


jfwd = jax.jit(fwd_fn, donate_argnums=(2,))

for S in (44, 8):
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, S, D), jnp.bfloat16)

    def mk_ring():
        # mid-stream offsets so attention reads realistic block counts
        ring = llama.init_kv_cache(cfg.llama, B, C)
        return ring._replace(offset=jnp.full((B,), 1024, jnp.int32))

    t_ring = bench(jfwd, mk_ring, emb)

    maxp = C // page

    def mk_paged():
        paged = llama.init_paged_kv_cache(
            cfg.llama, B, pool_pages=B * maxp + 1,
            pages_per_stream=maxp, page_size=page)
        table = 1 + np.arange(B)[:, None] * maxp + np.arange(maxp)[None]
        return paged._replace(table=jnp.asarray(table, jnp.int32),
                              offset=jnp.full((B,), 1024, jnp.int32))

    t_paged = bench(jfwd, mk_paged, emb)
    print(f"S={S}: ring {t_ring:.2f} ms/fwd | paged {t_paged:.2f} ms/fwd "
          f"| ratio {t_ring / t_paged:.2f}x")


# ---- ablations: where does the ring's extra cost come from? ----
def jfwd_nocache():
    def f(p, emb):
        logits, _ = llama.forward(p, cfg=cfg.llama, inputs_embeds=emb,
                                  kv_cache=None, attn_impl=auto_attention,
                                  last_logit_only=True)
        return logits
    return jax.jit(f)


def bench_nocache(emb, iters=24):
    f = jfwd_nocache()
    logits = f(params["llama"], emb)
    _ = float(logits[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        logits = f(params["llama"], emb)
        emb = emb + 0.0 * logits[:, :1, :1].astype(emb.dtype)
    _ = float(logits[0, 0, 0])
    return (time.perf_counter() - t0) / iters * 1e3


S = 44
emb = jax.random.normal(jax.random.PRNGKey(1), (B, S, D), jnp.bfloat16)
print(f"S=44 no-cache fwd: {bench_nocache(emb):.2f} ms (compute+weights floor)")

jfwd_xla = jax.jit(
    lambda p, emb, cache, nv: llama.forward(
        p, cfg=cfg.llama, inputs_embeds=emb, kv_cache=cache, num_valid=nv,
        attn_impl=None, logit_gather_positions=jnp.clip(nv - 1, 0, None)),
    donate_argnums=(2,))

def mk_ring_c(cap):
    def mk():
        r = llama.init_kv_cache(cfg.llama, B, cap)
        return r._replace(offset=jnp.full((B,), min(1024, cap - 256),
                                          jnp.int32))
    return mk

print(f"S=44 ring C=2560 XLA-attn: {bench(jfwd_xla, mk_ring_c(2560), emb):.2f} ms")
print(f"S=44 ring C=1024 pallas:   {bench(jfwd, mk_ring_c(1024), emb):.2f} ms")
print(f"S=44 ring C=5120 pallas:   {bench(jfwd, mk_ring_c(5120), emb):.2f} ms")
