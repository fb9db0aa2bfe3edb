"""Functional SigLIP ViT encoder (google/siglip-large-patch16-384 family).

Replaces the reference's torch vision tower + feature post-processing
(models/vision_live.py:10-30): patch-embed (conv as one matmul — MXU-friendly),
pre-LN transformer, post-LN, attention-pooling head (``pooler_output``), and
the frame-feature epilogue producing CLS + adaptive-avg-pooled spatial tokens
(1 + 3x3 = 10 tokens x 1024 dims per frame for live1+).

The full encode is a single jittable function over a batch of frames — the
offline feature-extraction job (reference data/utils.py:86-104) and the online
serving encoder both call it.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..core.config import LiveConfig, VisionConfig

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# init


def _linear_init(key, din, dout, dtype):
    k1, k2 = jax.random.split(key)
    lim = 1.0 / math.sqrt(din)
    return {
        "w": jax.random.uniform(k1, (din, dout), minval=-lim, maxval=lim).astype(dtype),
        "b": jnp.zeros((dout,), dtype),
    }


def _ln_init(dim, dtype):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init_params(key: jax.Array, cfg: VisionConfig) -> Params:
    dtype = jnp.dtype(cfg.dtype)
    D, F = cfg.hidden_size, cfg.intermediate_size
    patch_dim = 3 * cfg.patch_size * cfg.patch_size
    keys = jax.random.split(key, 12)

    def layer(k):
        ks = jax.random.split(k, 6)
        return {
            "ln1": _ln_init(D, dtype), "ln2": _ln_init(D, dtype),
            "q": _linear_init(ks[0], D, D, dtype),
            "k": _linear_init(ks[1], D, D, dtype),
            "v": _linear_init(ks[2], D, D, dtype),
            "o": _linear_init(ks[3], D, D, dtype),
            "fc1": _linear_init(ks[4], D, F, dtype),
            "fc2": _linear_init(ks[5], F, D, dtype),
        }

    layer_keys = jax.random.split(keys[0], cfg.num_layers)
    layers = jax.tree.map(lambda *xs: jnp.stack(xs), *[layer(k) for k in layer_keys])

    hk = jax.random.split(keys[2], 4)
    return {
        "patch_embed": _linear_init(keys[1], patch_dim, D, dtype),
        "pos_embed": (jax.random.normal(keys[3], (cfg.num_patches, D)) * 0.02).astype(dtype),
        "layers": layers,
        "post_ln": _ln_init(D, dtype),
        "head": {
            "probe": (jax.random.normal(hk[0], (1, D)) * 0.02).astype(dtype),
            "in_proj_w": _linear_init(hk[1], D, 3 * D, dtype)["w"],
            "in_proj_b": jnp.zeros((3 * D,), dtype),
            "out_proj": _linear_init(hk[2], D, D, dtype),
            "ln": _ln_init(D, dtype),
            "fc1": _linear_init(hk[3], D, F, dtype),
            "fc2": _linear_init(jax.random.split(hk[3])[0], F, D, dtype),
        },
    }


# ---------------------------------------------------------------------------
# forward


def _layer_norm(x, p, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _linear(x, p):
    return x @ p["w"] + p["b"]


def _mha(q, k, v, num_heads):
    """(B, Tq, D) x (B, Tk, D) -> (B, Tq, D), fp32 softmax.

    SETTLED (round 2, v5e, SURVEY §7.2's "fused encoder kernel"): at the
    SigLIP-large shapes (T=576, head_dim=64) attention runs ~20-23 TF/s on
    EVERY implementation tried — this XLA einsum path (fp32 or bf16
    logits), and the Pallas flash kernel with tokens padded to 640 and a
    static kv_valid mask (single- and multi-block). head_dim 64 halves the
    MXU contraction dim and the per-(batch, head) matmul structure is
    fill-bound; there is no fusion win left (the non-attention 91% of
    encoder FLOPs already run near the chip's 150 TF/s matmul rate,
    ~99 TF/s end-to-end, 263 imgs/s = 131 concurrent 2fps streams). A
    bespoke kernel is not profitable; keeping the XLA path."""
    B, Tq, D = q.shape
    Tk = k.shape[1]
    hd = D // num_heads
    q = q.reshape(B, Tq, num_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, Tk, num_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, Tk, num_heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    return out.transpose(0, 2, 1, 3).reshape(B, Tq, D)


def patchify(pixels: jax.Array, patch: int) -> jax.Array:
    """NCHW pixels -> (B, num_patches, C*patch*patch), channel-major per
    patch (matches torch Conv2d weight layout flattening)."""
    B, C, H, W = pixels.shape
    gh, gw = H // patch, W // patch
    x = pixels.reshape(B, C, gh, patch, gw, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # B, gh, gw, C, p, p
    return x.reshape(B, gh * gw, C * patch * patch)


def encode(params: Params, pixels: jax.Array, cfg: VisionConfig
           ) -> Tuple[jax.Array, jax.Array]:
    """pixels: (B, 3, H, W), already normalized. Returns
    (last_hidden_state (B, P, D), pooler_output (B, D))."""
    x = _linear(patchify(pixels.astype(params["pos_embed"].dtype), cfg.patch_size),
                params["patch_embed"])
    x = x + params["pos_embed"][None]

    def body(h, lp):
        r = h
        y = _layer_norm(h, lp["ln1"], cfg.layer_norm_eps)
        attn = _mha(_linear(y, lp["q"]), _linear(y, lp["k"]),
                    _linear(y, lp["v"]), cfg.num_heads)
        h = r + _linear(attn, lp["o"])
        r = h
        y = _layer_norm(h, lp["ln2"], cfg.layer_norm_eps)
        y = _linear(jax.nn.gelu(_linear(y, lp["fc1"]), approximate=True),
                    lp["fc2"])
        return r + y, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = _layer_norm(x, params["post_ln"], cfg.layer_norm_eps)
    pooled = _attention_pool(params["head"], x, cfg)
    return x, pooled


def _attention_pool(head: Params, hidden: jax.Array, cfg: VisionConfig) -> jax.Array:
    """SiglipMultiheadAttentionPoolingHead: learned probe cross-attends the
    patch tokens, then LN + MLP residual; output token 0."""
    B = hidden.shape[0]
    D = cfg.hidden_size
    probe = jnp.broadcast_to(head["probe"][None], (B, 1, D)).astype(hidden.dtype)
    wq, wk, wv = (head["in_proj_w"][:, :D], head["in_proj_w"][:, D:2 * D],
                  head["in_proj_w"][:, 2 * D:])
    bq, bk, bv = head["in_proj_b"][:D], head["in_proj_b"][D:2 * D], head["in_proj_b"][2 * D:]
    q = probe @ wq + bq
    k = hidden @ wk + bk
    v = hidden @ wv + bv
    attn = _mha(q, k, v, cfg.num_heads)
    x = _linear(attn, head["out_proj"])
    r = x
    y = _layer_norm(x, head["ln"], cfg.layer_norm_eps)
    y = _linear(jax.nn.gelu(_linear(y, head["fc1"]), approximate=True), head["fc2"])
    return (r + y)[:, 0]


# ---------------------------------------------------------------------------
# frame features (the live1/live1+ token layout)


def preprocess(frames_uint8: jax.Array, cfg: VisionConfig) -> jax.Array:
    """uint8 NCHW -> normalized float (vision_live.py:10-13)."""
    mean = jnp.asarray(cfg.mean, jnp.float32).reshape(1, 3, 1, 1)
    std = jnp.asarray(cfg.std, jnp.float32).reshape(1, 3, 1, 1)
    x = frames_uint8.astype(jnp.float32) * cfg.rescale_factor
    return (x - mean) / std


def _adaptive_pool_matrix(n_in: int, n_out: int) -> jax.Array:
    """(n_out, n_in) averaging matrix with torch adaptive_avg_pool1d bin
    semantics: bin i covers [floor(i*n/o), ceil((i+1)*n/o))."""
    import numpy as np
    m = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        start = (i * n_in) // n_out
        end = -(-(i + 1) * n_in // n_out)
        m[i, start:end] = 1.0 / (end - start)
    return jnp.asarray(m)


def spatial_pool(last_hidden: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """adaptive_avg_pool2d of the patch grid (vision_live.py:16-23).
    last_hidden: (B, S*S, D) -> (B, oh*ow, D). Exact torch bin semantics for
    any grid/output combination (24x24 -> 3x3 is the live1+ case)."""
    B, P, D = last_hidden.shape
    s = int(math.isqrt(P))
    oh, ow = out_hw
    x = last_hidden.reshape(B, s, s, D)
    mh = _adaptive_pool_matrix(s, oh).astype(x.dtype)
    mw = _adaptive_pool_matrix(s, ow).astype(x.dtype)
    x = jnp.einsum("hs,bswd->bhwd", mh, x)
    x = jnp.einsum("wt,bhtd->bhwd", mw, x)
    return x.reshape(B, oh * ow, D)


def frame_features(params: Params, pixels: jax.Array, cfg: VisionConfig,
                   live_cfg: LiveConfig) -> jax.Array:
    """(B, 3, H, W) normalized pixels -> (B, tokens_per_frame, D):
    [CLS?, pooled spatial...] per vision_live.py:10-30."""
    last_hidden, pooled = encode(params, pixels, cfg)
    parts = []
    if live_cfg.frame_token_cls:
        parts.append(pooled[:, None])
    if live_cfg.frame_token_pooled:
        parts.append(spatial_pool(last_hidden, tuple(live_cfg.frame_token_pooled)))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
