"""Generate a synthetic HF-layout Llama-3-8B (or SigLIP) safetensors
checkpoint with FULL production shapes, for driving the convert -> quantize
-> serve path without hub access (VERDICT r1 item 2; the real weights need
network egress this environment doesn't have).

Weights are small-scale gaussians — the MODEL IS NOT USEFUL, but every
shape, dtype, name and sharding detail matches what
tools/convert_weights.py must eat from a genuine checkpoint.

  python tools/make_synthetic_checkpoint.py --family llama --out /tmp/llama8b_hf
  python tools/make_synthetic_checkpoint.py --family siglip --out /tmp/siglip_hf
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _save_shard(tensors, path):
    from safetensors.torch import save_file

    save_file(tensors, path)
    return os.path.getsize(path)


def make_llama(out_dir: str, seed: int = 0, scale: float = 0.02,
               size: str = "8b"):
    """HF LlamaForCausalLM state-dict layout, bf16, sharded like the hub
    checkpoint (~4 shards for 8b). Matches
    models/convert.llama_params_from_state_dict key expectations.
    ``size='tiny'`` emits the same layout at test scale (the artifact-
    contract dry test chains it through convert_weights -> serve)."""
    import torch

    from videollm_online_tpu.core.config import LlamaConfig
    from videollm_online_tpu.models.builder import PROXY_SIZES

    cfg = LlamaConfig(**PROXY_SIZES[size])
    g = torch.Generator().manual_seed(seed)

    def t(*shape):
        return (torch.randn(*shape, generator=g) * scale).to(torch.bfloat16)

    def ones(*shape):
        return torch.ones(*shape, dtype=torch.bfloat16)

    os.makedirs(out_dir, exist_ok=True)
    D, F, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    qd, kvd = cfg.num_heads * cfg.head_dim, cfg.num_kv_heads * cfg.head_dim

    weight_map = {}
    shard, shard_bytes, shard_idx = {}, 0, 1
    SHARD_LIMIT = 5 * 2**30

    def emit(name, tensor):
        nonlocal shard, shard_bytes, shard_idx
        shard[name] = tensor
        shard_bytes += tensor.numel() * tensor.element_size()
        if shard_bytes >= SHARD_LIMIT:
            flush()

    def flush():
        nonlocal shard, shard_bytes, shard_idx
        if not shard:
            return
        fname = f"model-{shard_idx:05d}.safetensors"
        _save_shard(shard, os.path.join(out_dir, fname))
        for k in shard:
            weight_map[k] = fname
        print(f"wrote {fname} ({shard_bytes / 2**30:.2f} GiB)")
        shard, shard_bytes, shard_idx = {}, 0, shard_idx + 1

    emit("model.embed_tokens.weight", t(V, D))
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        emit(p + "input_layernorm.weight", ones(D))
        emit(p + "post_attention_layernorm.weight", ones(D))
        emit(p + "self_attn.q_proj.weight", t(qd, D))
        emit(p + "self_attn.k_proj.weight", t(kvd, D))
        emit(p + "self_attn.v_proj.weight", t(kvd, D))
        emit(p + "self_attn.o_proj.weight", t(D, qd))
        emit(p + "mlp.gate_proj.weight", t(F, D))
        emit(p + "mlp.up_proj.weight", t(F, D))
        emit(p + "mlp.down_proj.weight", t(D, F))
    emit("model.norm.weight", ones(D))
    emit("lm_head.weight", t(V, D))
    flush()

    with open(os.path.join(out_dir, "model.safetensors.index.json"), "w") as f:
        json.dump({"metadata": {}, "weight_map": weight_map}, f)
    n = sum(os.path.getsize(os.path.join(out_dir, f))
            for f in os.listdir(out_dir)) / 2**30
    print(f"synthetic llama ({size}) checkpoint at {out_dir} ({n:.1f} GiB)")


def make_siglip(out_dir: str, seed: int = 0, scale: float = 0.02):
    """HF SiglipVisionModel layout (so-400m/large-style per VisionConfig)."""
    import torch

    from videollm_online_tpu.core.config import VisionConfig

    cfg = VisionConfig()
    g = torch.Generator().manual_seed(seed)

    def t(*shape):
        return (torch.randn(*shape, generator=g) * scale).to(torch.bfloat16)

    def ones(*shape):
        return torch.ones(*shape, dtype=torch.bfloat16)

    def zeros(*shape):
        return torch.zeros(*shape, dtype=torch.bfloat16)

    D, F, P = cfg.hidden_size, cfg.intermediate_size, cfg.patch_size
    n_pos = (cfg.image_size // P) ** 2
    sd = {
        "vision_model.embeddings.patch_embedding.weight": t(D, 3, P, P),
        "vision_model.embeddings.patch_embedding.bias": zeros(D),
        "vision_model.embeddings.position_embedding.weight": t(n_pos, D),
        "vision_model.post_layernorm.weight": ones(D),
        "vision_model.post_layernorm.bias": zeros(D),
        "vision_model.head.probe": t(1, 1, D),
        "vision_model.head.attention.in_proj_weight": t(3 * D, D),
        "vision_model.head.attention.in_proj_bias": zeros(3 * D),
        "vision_model.head.attention.out_proj.weight": t(D, D),
        "vision_model.head.attention.out_proj.bias": zeros(D),
        "vision_model.head.layernorm.weight": ones(D),
        "vision_model.head.layernorm.bias": zeros(D),
        "vision_model.head.mlp.fc1.weight": t(F, D),
        "vision_model.head.mlp.fc1.bias": zeros(F),
        "vision_model.head.mlp.fc2.weight": t(D, F),
        "vision_model.head.mlp.fc2.bias": zeros(D),
    }
    for i in range(cfg.num_layers):
        p = f"vision_model.encoder.layers.{i}."
        sd.update({
            p + "layer_norm1.weight": ones(D),
            p + "layer_norm1.bias": zeros(D),
            p + "layer_norm2.weight": ones(D),
            p + "layer_norm2.bias": zeros(D),
            p + "self_attn.q_proj.weight": t(D, D),
            p + "self_attn.q_proj.bias": zeros(D),
            p + "self_attn.k_proj.weight": t(D, D),
            p + "self_attn.k_proj.bias": zeros(D),
            p + "self_attn.v_proj.weight": t(D, D),
            p + "self_attn.v_proj.bias": zeros(D),
            p + "self_attn.out_proj.weight": t(D, D),
            p + "self_attn.out_proj.bias": zeros(D),
            p + "mlp.fc1.weight": t(F, D),
            p + "mlp.fc1.bias": zeros(F),
            p + "mlp.fc2.weight": t(D, F),
            p + "mlp.fc2.bias": zeros(D),
        })
    os.makedirs(out_dir, exist_ok=True)
    _save_shard(sd, os.path.join(out_dir, "model.safetensors"))
    n = os.path.getsize(os.path.join(out_dir, "model.safetensors")) / 2**30
    print(f"synthetic siglip checkpoint at {out_dir} ({n:.2f} GiB)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="llama", choices=["llama", "siglip"])
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--size", default="8b", choices=["8b", "tiny"],
                   help="llama only: full production shapes or test scale")
    args = p.parse_args()
    if args.family == "llama":
        make_llama(args.out, args.seed, size=args.size)
    else:
        make_siglip(args.out, args.seed)
