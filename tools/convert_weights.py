"""One-time HF -> JAX weight conversion CLI.

The reference re-downloads the base model from the HF hub at every launch
(models/modeling_live.py:184); here conversion runs once and the result is
an Orbax tree trainers/servers load directly.

  python tools/convert_weights.py --src /path/llama3-8b \
      --dst /path/llama3-8b-jax --family llama --size 8b [--int8]
  python tools/convert_weights.py --src /path/siglip --dst ... --family siglip
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True,
                   help="safetensors file/dir (HF checkpoint)")
    p.add_argument("--dst", required=True, help="output Orbax dir")
    p.add_argument("--family", default="llama",
                   choices=["llama", "mistral", "qwen2", "siglip"])
    p.add_argument("--size", default="8b",
                   choices=["8b", "7b", "1b", "tiny"])
    p.add_argument("--int8", action="store_true",
                   help="store the decoder weight-only int8 (serving)")
    p.add_argument("--int4", action="store_true",
                   help="store the decoder weight-only int4 (group-128 "
                        "scales; embedding stays int8)")
    args = p.parse_args()

    from videollm_online_tpu.core.config import (LlamaConfig, VisionConfig,
                                                 mistral_7b_config,
                                                 qwen2_7b_config)
    from videollm_online_tpu.models import convert, quant
    from videollm_online_tpu.train.checkpoints import save_params

    sd = convert.load_safetensors_state_dict(args.src)
    if args.family == "siglip":
        params = convert.siglip_params_from_state_dict(sd, VisionConfig())
    else:
        if args.family == "mistral":
            cfg = mistral_7b_config()
        elif args.family == "qwen2":
            cfg = qwen2_7b_config()
        else:
            # the size presets match the serve CLI / builder proxies, so a
            # converted tiny checkpoint serves with --model_size tiny
            from videollm_online_tpu.models.builder import PROXY_SIZES
            cfg = LlamaConfig(**PROXY_SIZES[args.size])
        params = convert.llama_params_from_state_dict(sd, cfg)
        if args.int4:
            params = quant.quantize_llama_params(params, bits=4)
        elif args.int8:
            params = quant.quantize_llama_params(params)
    save_params(args.dst, params)
    n = sum(x.size for x in __import__("jax").tree.leaves(params))
    print(f"converted {n/1e9:.2f}B params -> {args.dst}")


if __name__ == "__main__":
    main()
