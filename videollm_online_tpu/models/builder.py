"""Model + tokenizer factory.

Equivalent of the reference's ``build_live`` / ``build_model_and_tokenizer``
(models/modeling_live.py:184-222, models/__init__.py:4): resolves the
tokenizer (adding ``<v>``), loads or initializes the base Llama weights (HF
safetensors convert or random proxy), attaches LoRA + connector, and
optionally restores an adapter checkpoint for inference."""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax

from ..core.arguments import LiveTrainingArguments
from ..core.config import LiveConfig, LlamaConfig
from ..tokenizer.live_tokenizer import LiveTokenizer, build_live_tokenizer
from ..tokenizer.tiny import ByteTokenizer
from ..train import checkpoints
from . import convert, live

PROXY_SIZES = {
    "tiny": dict(vocab_size=2048, hidden_size=256, intermediate_size=512,
                 num_layers=4, num_heads=8, num_kv_heads=4, head_dim=32),
    "1b": dict(vocab_size=128256, hidden_size=2048, intermediate_size=8192,
               num_layers=16, num_heads=32, num_kv_heads=8, head_dim=64),
    "8b": dict(),  # the LlamaConfig defaults are Llama-3-8B
}


def build_model_and_tokenizer(
    args: LiveTrainingArguments,
    *,
    is_training: bool = True,
    seed: int = 0,
) -> Tuple[Dict[str, Any], LiveTokenizer, LiveConfig]:
    cfg = args.to_live_config()
    if args.model_size:
        llama_cfg = LlamaConfig(**PROXY_SIZES[args.model_size],
                                dtype="bfloat16" if args.bf16 else "float32")
        cfg = cfg.replace(llama=llama_cfg)
    elif args.bf16:
        cfg = cfg.replace(llama=cfg.llama)
    if getattr(args, "mlp_chunk", 0):
        import dataclasses
        cfg = cfg.replace(llama=dataclasses.replace(
            cfg.llama, mlp_chunk=args.mlp_chunk))
    if not is_training:
        pass  # LoRA stays attached; adapter restore below

    # tokenizer
    if args.tokenizer_path:
        from transformers import AutoTokenizer
        tok = build_live_tokenizer(
            AutoTokenizer.from_pretrained(args.tokenizer_path,
                                          use_fast=True,
                                          padding_side="left"), cfg)
    else:
        tok = LiveTokenizer(ByteTokenizer(), cfg)
    cfg = tok.cfg

    # base weights
    from . import llama as llama_mod
    key = jax.random.PRNGKey(seed)
    if args.llm_weights:
        sd = convert.load_safetensors_state_dict(args.llm_weights)
        base = convert.llama_params_from_state_dict(sd, cfg.llama)
        params = {
            "llama": base,
            "connector": live.init_connector(key, cfg),
        }
        if cfg.lora is not None:
            params["lora"] = llama_mod.init_lora_params(
                jax.random.fold_in(key, 1), cfg.llama, cfg.lora)
    else:
        params = live.init_params(key, cfg)

    if args.resume_from_checkpoint:
        adapter_path = args.resume_from_checkpoint
        if os.path.isdir(os.path.join(adapter_path, "adapter")):
            adapter_path = os.path.join(adapter_path, "adapter")
        params = checkpoints.load_adapter_into(params, adapter_path)
    if getattr(args, "quantize_base", ""):
        # QLoRA-analog (--quantize_base int8): the frozen base decoder is
        # stored weight-only int8; LoRA + connector stay bf16 trainable.
        # Gradients flow THROUGH the dequantizing matmuls (w is constant),
        # so training semantics match bf16-base within quant noise
        # (tests/test_train_e2e.py loss-trace parity).
        assert args.quantize_base == "int8", args.quantize_base
        assert cfg.lora is not None, (
            "--quantize_base needs LoRA: an int8 base cannot take "
            "gradient updates itself")
        from . import quant
        params["llama"] = quant.quantize_llama_params(params["llama"],
                                                      bits=8)
    return params, tok, cfg
