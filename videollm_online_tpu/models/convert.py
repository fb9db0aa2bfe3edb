"""HF checkpoint -> JAX parameter-tree conversion (host-side, one-time).

The reference always re-fetches the Llama-3-8B base from the HF hub and
applies a PEFT adapter on top (models/modeling_live.py:184-222, README.md:47).
Here the base weights are converted once into the stacked-layer pytree of
models/llama.py; LoRA/connector checkpoints live in Orbax (train/checkpoints).

Accepts either a torch ``state_dict`` (tensors or numpy arrays) or a
safetensors file path.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from ..core.config import LlamaConfig, VisionConfig


def _to_np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    if hasattr(t, "detach"):
        t = t.detach()
        if t.dtype is not None and str(t.dtype) == "torch.bfloat16":
            t = t.float()
        return t.cpu().numpy()
    return np.asarray(t)


def llama_params_from_state_dict(sd: Mapping[str, Any], cfg: LlamaConfig,
                                 dtype=None) -> Dict[str, Any]:
    """Convert an HF ``LlamaForCausalLM`` state dict to our stacked pytree."""
    dtype = jnp.dtype(dtype or cfg.dtype)
    sd = {k.removeprefix("model."): v for k, v in sd.items()}
    L = cfg.num_layers

    def get(name):
        return _to_np(sd[name])

    def stack(fmt, transpose=True):
        mats = [get(fmt.format(i)) for i in range(L)]
        if transpose:
            mats = [m.T for m in mats]
        return jnp.asarray(np.stack(mats), dtype)

    params = {
        "embed": jnp.asarray(get("embed_tokens.weight"), dtype),
        "layers": {
            "attn_norm": stack("layers.{}.input_layernorm.weight", transpose=False),
            "mlp_norm": stack("layers.{}.post_attention_layernorm.weight", transpose=False),
            "wq": stack("layers.{}.self_attn.q_proj.weight"),
            "wk": stack("layers.{}.self_attn.k_proj.weight"),
            "wv": stack("layers.{}.self_attn.v_proj.weight"),
            "wo": stack("layers.{}.self_attn.o_proj.weight"),
            "w_gate": stack("layers.{}.mlp.gate_proj.weight"),
            "w_up": stack("layers.{}.mlp.up_proj.weight"),
            "w_down": stack("layers.{}.mlp.down_proj.weight"),
        },
        "final_norm": jnp.asarray(get("norm.weight"), dtype),
    }
    if cfg.attention_bias:  # Qwen2 family: q/k/v bias vectors
        params["layers"]["bq"] = stack(
            "layers.{}.self_attn.q_proj.bias", transpose=False)
        params["layers"]["bk"] = stack(
            "layers.{}.self_attn.k_proj.bias", transpose=False)
        params["layers"]["bv"] = stack(
            "layers.{}.self_attn.v_proj.bias", transpose=False)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(get("lm_head.weight").T, dtype)
    return params


def siglip_params_from_state_dict(sd: Mapping[str, Any], cfg: VisionConfig,
                                  dtype=None) -> Dict[str, Any]:
    """Convert HF ``SiglipVisionModel``(.vision_model) weights.

    Layout target: models/siglip.py. Handles both ``vision_model.``-prefixed
    (full SiglipModel) and bare vision-tower state dicts.
    """
    dtype = jnp.dtype(dtype or cfg.dtype)
    sd = {re.sub(r"^(vision_model\.)", "", k): v for k, v in sd.items()}
    L = cfg.num_layers

    def get(name):
        return _to_np(sd[name])

    def lin(prefix):
        return {
            "w": jnp.asarray(get(prefix + ".weight").T, dtype),
            "b": jnp.asarray(get(prefix + ".bias"), dtype),
        }

    def ln(prefix):
        return {
            "scale": jnp.asarray(get(prefix + ".weight"), dtype),
            "bias": jnp.asarray(get(prefix + ".bias"), dtype),
        }

    def stack_tree(fn):
        trees = [fn(i) for i in range(L)]
        import jax
        return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)

    def layer(i):
        p = f"encoder.layers.{i}."
        return {
            "ln1": ln(p + "layer_norm1"),
            "ln2": ln(p + "layer_norm2"),
            "q": lin(p + "self_attn.q_proj"),
            "k": lin(p + "self_attn.k_proj"),
            "v": lin(p + "self_attn.v_proj"),
            "o": lin(p + "self_attn.out_proj"),
            "fc1": lin(p + "mlp.fc1"),
            "fc2": lin(p + "mlp.fc2"),
        }

    # patch embedding: HF conv weight (D, 3, P, P) -> matmul (P*P*3, D)
    conv_w = _to_np(sd["embeddings.patch_embedding.weight"])
    D = conv_w.shape[0]
    patch_w = conv_w.reshape(D, -1).T  # (3*P*P, D), channel-major like conv

    params = {
        "patch_embed": {
            "w": jnp.asarray(patch_w, dtype),
            "b": jnp.asarray(get("embeddings.patch_embedding.bias"), dtype),
        },
        "pos_embed": jnp.asarray(get("embeddings.position_embedding.weight"), dtype),
        "layers": stack_tree(layer),
        "post_ln": ln("post_layernorm"),
    }
    # SigLIP attention-pooling head (pooler_output source, vision_live.py:27)
    if "head.probe" in sd:
        params["head"] = {
            "probe": jnp.asarray(_to_np(sd["head.probe"])[0], dtype),  # (1, D)
            "in_proj_w": jnp.asarray(get("head.attention.in_proj_weight").T, dtype),
            "in_proj_b": jnp.asarray(get("head.attention.in_proj_bias"), dtype),
            "out_proj": lin("head.attention.out_proj"),
            "ln": ln("head.layernorm"),
            "fc1": lin("head.mlp.fc1"),
            "fc2": lin("head.mlp.fc2"),
        }
    return params


def load_safetensors_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read one file or a sharded directory of ``*.safetensors``."""
    from safetensors import safe_open  # lazy; available via transformers dep

    files = []
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".safetensors")
        )
    else:
        files = [path]
    sd: Dict[str, np.ndarray] = {}
    for f in files:
        with safe_open(f, framework="np") as fp:
            for k in fp.keys():
                sd[k] = fp.get_tensor(k)
    return sd
