"""Weight-only int8 quantization for serving.

The 8B decoder in bf16 (16 GB) exceeds a single v5e chip's 15.75 GB HBM;
per-channel symmetric int8 weights halve that (8 GB) and also halve the
weight-streaming HBM traffic that dominates batch-1 decode. Computation
stays bf16 on the MXU: int8 blocks are converted on the fly and the
per-output-channel scale folds into the matmul epilogue (XLA fuses both).

Quantized leaves are ``{"q8": int8 (in, out), "scale": (out,) f32}`` dicts;
models.llama.dense/embed_tokens/lm_head transparently accept them. The
connector, norms and LoRA adapters stay in bf16 (tiny)."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

QUANT_KEY = "q8"


def is_quantized(leaf) -> bool:
    return isinstance(leaf, dict) and QUANT_KEY in leaf


def quantize_weight(w: jax.Array, axis: int = 0) -> Dict[str, jax.Array]:
    """Symmetric per-channel int8 over the reduction ``axis`` (scales have
    the shape of the non-reduced dims)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {QUANT_KEY: q, "scale": jnp.squeeze(scale, axis=axis)}


def dequantize_weight(qw: Dict[str, jax.Array], axis: int = 0,
                      dtype=jnp.bfloat16) -> jax.Array:
    scale = jnp.expand_dims(qw["scale"], axis)
    return (qw[QUANT_KEY].astype(jnp.float32) * scale).astype(dtype)


def quantized_matmul(x: jax.Array, qw: Dict[str, jax.Array]) -> jax.Array:
    """x (.., in) @ q8 (in, out) * scale (out,) in x.dtype — XLA path.

    SETTLED (round 2, v5e, RTT-corrected measurements): XLA's fused
    convert-matmul streams int8 weights at ~700-770 GB/s effective (round
    1's "371 GB/s" was a tunnel-latency artifact). A tuned Pallas dequant
    kernel beat it in STANDALONE microbenchmarks (885 vs 700 GB/s at
    4096x4096 with >=2KB DMA row segments) but LOST the full decode step by
    +4.9 ms/token (19.5 vs 14.6): each pallas_call is a fusion barrier that
    forfeits XLA's cross-op weight-prefetch overlap, ~22 us x 224 calls per
    token. A per-matmul kernel cannot win the decode path; the winning shape
    would be one fused whole-layer kernel. The kernel was deleted (see git
    history / BENCH_NOTES.md)."""
    w = qw[QUANT_KEY].astype(x.dtype)
    y = x @ w
    return y * qw["scale"].astype(x.dtype)


def quantize_llama_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize all big decoder matrices; everything else passes through."""
    out = {}
    out["embed"] = quantize_weight(params["embed"], axis=1)  # per-row
    out["final_norm"] = params["final_norm"]
    layers = {}
    for name, w in params["layers"].items():
        if name in ("attn_norm", "mlp_norm"):
            layers[name] = w
        else:
            # stacked (L, in, out): reduce over in (axis=1)
            layers[name] = quantize_weight(w, axis=1)
    out["layers"] = layers
    if "lm_head" in params:
        out["lm_head"] = quantize_weight(params["lm_head"], axis=0)
    return out


def quantize_live_params(params: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(params)
    out["llama"] = quantize_llama_params(params["llama"])
    return out


def param_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))


def random_quantized_llama_params(key: jax.Array, cfg) -> Dict[str, Any]:
    """Build an int8-quantized decoder DIRECTLY (no bf16 staging copy) —
    random init for serving benchmarks of models whose bf16 form would not
    fit HBM (8B on one 16 GiB v5e)."""
    import numpy as np

    L, D, F = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size

    def qrand(k, shape, fan_in):
        q = jax.random.randint(k, shape, -127, 128, jnp.int8)
        scale = jnp.full(shape[:-2] + (shape[-1],),
                         0.02 / 127.0 / np.sqrt(fan_in / D), jnp.float32)
        return {QUANT_KEY: q, "scale": scale}

    keys = jax.random.split(key, 10)
    dims = {
        "wq": (D, cfg.q_dim), "wk": (D, cfg.kv_dim), "wv": (D, cfg.kv_dim),
        "wo": (cfg.q_dim, D), "w_gate": (D, F), "w_up": (D, F),
        "w_down": (F, D),
    }
    layers = {
        "attn_norm": jnp.ones((L, D), jnp.bfloat16),
        "mlp_norm": jnp.ones((L, D), jnp.bfloat16),
    }
    for i, (name, (din, dout)) in enumerate(dims.items()):
        layers[name] = qrand(keys[i], (L, din, dout), din)
    V = cfg.vocab_size
    return {
        "embed": {QUANT_KEY: jax.random.randint(keys[7], (V, D), -127, 128,
                                                jnp.int8),
                  "scale": jnp.full((V,), 0.02 / 127.0, jnp.float32)},
        "layers": layers,
        "final_norm": jnp.ones((D,), jnp.bfloat16),
        "lm_head": qrand(keys[8], (D, V), D),
    }
