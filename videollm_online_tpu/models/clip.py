"""Functional CLIP ViT vision tower (laion / openai CLIP variants).

The reference supports CLIP encoders alongside SigLIP
(models/vision_live.py:32-52: ``_clip_vision_encode`` — OPENAI mean/std
normalization, CLS token = last_hidden_state[:, 0], spatial tokens pooled
from patches excluding the class token). Architectural differences from
SigLIP: a learned class embedding prepended to the patches, a pre-encoder
LayerNorm, quick-GELU activations (openai) or GELU (laion), and positional
embeddings covering CLS+patches."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..core.config import LiveConfig, VisionConfig
from .siglip import _layer_norm, _linear, _mha, patchify, spatial_pool

Params = Dict[str, Any]

OPENAI_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_vision_config(**overrides) -> VisionConfig:
    kw = dict(image_size=336, patch_size=14, hidden_size=1024,
              intermediate_size=4096, num_layers=24, num_heads=16,
              layer_norm_eps=1e-5, mean=OPENAI_MEAN, std=OPENAI_STD,
              family="clip")
    kw.update(overrides)
    return VisionConfig(**kw)


def encode(params: Params, pixels: jax.Array, cfg: VisionConfig,
           quick_gelu: bool = True) -> Tuple[jax.Array, jax.Array]:
    """pixels (B, 3, H, W) normalized -> (last_hidden (B, 1+P, D),
    pooled CLS (B, D) = post-LN class token, matching
    CLIPVisionModel.pooler_output)."""
    B = pixels.shape[0]
    D = cfg.hidden_size
    x = _linear(patchify(pixels.astype(params["pos_embed"].dtype),
                         cfg.patch_size), params["patch_embed"])
    cls = jnp.broadcast_to(params["class_embed"][None, None], (B, 1, D))
    x = jnp.concatenate([cls.astype(x.dtype), x], axis=1)
    x = x + params["pos_embed"][None]
    x = _layer_norm(x, params["pre_ln"], cfg.layer_norm_eps)

    def act(y):
        if quick_gelu:
            return y * jax.nn.sigmoid(1.702 * y)
        return jax.nn.gelu(y, approximate=False)

    def body(h, lp):
        r = h
        y = _layer_norm(h, lp["ln1"], cfg.layer_norm_eps)
        attn = _mha(_linear(y, lp["q"]), _linear(y, lp["k"]),
                    _linear(y, lp["v"]), cfg.num_heads)
        h = r + _linear(attn, lp["o"])
        r = h
        y = _layer_norm(h, lp["ln2"], cfg.layer_norm_eps)
        return r + _linear(act(_linear(y, lp["fc1"])), lp["fc2"]), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    pooled = _layer_norm(x[:, :1], params["post_ln"], cfg.layer_norm_eps)[:, 0]
    return x, pooled


def preprocess(frames_uint8: jax.Array, cfg: VisionConfig) -> jax.Array:
    mean = jnp.asarray(cfg.mean, jnp.float32).reshape(1, 3, 1, 1)
    std = jnp.asarray(cfg.std, jnp.float32).reshape(1, 3, 1, 1)
    x = frames_uint8.astype(jnp.float32) * cfg.rescale_factor
    return (x - mean) / std


def frame_features(params: Params, pixels: jax.Array, cfg: VisionConfig,
                   live_cfg: LiveConfig, quick_gelu: bool = True) -> jax.Array:
    """Reference _clip_vision_encode layout (vision_live.py:32-52): CLS =
    raw last_hidden[:, 0]; spatial pool over patches excluding CLS."""
    last_hidden, _ = encode(params, pixels, cfg, quick_gelu)
    parts = []
    if live_cfg.frame_token_cls:
        parts.append(last_hidden[:, :1])
    if live_cfg.frame_token_pooled:
        parts.append(spatial_pool(last_hidden[:, 1:],
                                  tuple(live_cfg.frame_token_pooled)))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def init_params(key: jax.Array, cfg: VisionConfig) -> Params:
    """Random init with the CLIP layout (structure-compatible with
    params_from_state_dict)."""
    from .siglip import _linear_init, _ln_init

    dtype = jnp.dtype(cfg.dtype)
    D, F = cfg.hidden_size, cfg.intermediate_size
    patch_dim = 3 * cfg.patch_size * cfg.patch_size
    keys = jax.random.split(key, 6)

    def layer(k):
        ks = jax.random.split(k, 6)
        return {"ln1": _ln_init(D, dtype), "ln2": _ln_init(D, dtype),
                "q": _linear_init(ks[0], D, D, dtype),
                "k": _linear_init(ks[1], D, D, dtype),
                "v": _linear_init(ks[2], D, D, dtype),
                "o": _linear_init(ks[3], D, D, dtype),
                "fc1": _linear_init(ks[4], D, F, dtype),
                "fc2": _linear_init(ks[5], F, D, dtype)}

    layers = [layer(k) for k in jax.random.split(keys[0], cfg.num_layers)]
    return {
        "patch_embed": _linear_init(keys[1], patch_dim, D, dtype),
        "class_embed": (jax.random.normal(keys[2], (D,)) * 0.02).astype(dtype),
        "pos_embed": (jax.random.normal(keys[3], (cfg.num_patches + 1, D))
                      * 0.02).astype(dtype),
        "pre_ln": _ln_init(D, dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "post_ln": _ln_init(D, dtype),
    }


def params_from_state_dict(sd, cfg: VisionConfig, dtype=None) -> Params:
    """Convert HF CLIPVisionModel weights."""
    import re
    from .convert import _to_np

    dtype = jnp.dtype(dtype or cfg.dtype)
    sd = {re.sub(r"^(vision_model\.)", "", k): v for k, v in sd.items()}

    def get(name):
        return _to_np(sd[name])

    def lin(prefix):
        return {"w": jnp.asarray(get(prefix + ".weight").T, dtype),
                "b": jnp.asarray(get(prefix + ".bias"), dtype)}

    def ln(prefix):
        return {"scale": jnp.asarray(get(prefix + ".weight"), dtype),
                "bias": jnp.asarray(get(prefix + ".bias"), dtype)}

    def layer(i):
        p = f"encoder.layers.{i}."
        return {"ln1": ln(p + "layer_norm1"), "ln2": ln(p + "layer_norm2"),
                "q": lin(p + "self_attn.q_proj"),
                "k": lin(p + "self_attn.k_proj"),
                "v": lin(p + "self_attn.v_proj"),
                "o": lin(p + "self_attn.out_proj"),
                "fc1": lin(p + "mlp.fc1"), "fc2": lin(p + "mlp.fc2")}

    conv_w = _to_np(sd["embeddings.patch_embedding.weight"])
    D = conv_w.shape[0]
    layers = [layer(i) for i in range(cfg.num_layers)]
    return {
        "patch_embed": {"w": jnp.asarray(conv_w.reshape(D, -1).T, dtype),
                        # CLIP's patch conv has no bias
                        "b": jnp.zeros((D,), dtype)},
        "class_embed": jnp.asarray(get("embeddings.class_embedding"), dtype),
        "pos_embed": jnp.asarray(get("embeddings.position_embedding.weight"),
                                 dtype),
        "pre_ln": ln("pre_layrnorm"),  # (sic) HF attribute name
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "post_ln": ln("post_layernorm"),
    }
