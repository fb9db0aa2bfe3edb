"""CLI streaming demo: paced frame feed + live dialogue + FPS accounting.

Equivalent of the reference CLI (demo/cli.py): preprocess/load a video, seed
an initial query, then tick frame-by-frame calling the engine and measuring
per-frame wall time -> "Average Processing FPS"; the conversation history is
dumped as JSON at the end (demo/cli.py:31-49).

Usage:
  python -m videollm_online_tpu.serve.cli --video path.{mp4,npy,pt} \
      [--checkpoint ORBAX_DIR] [--model_size tiny|1b|8b] \
      [--query "Please narrate the video in real time."] \
      [--num_ticks 100] [--output out.json]

Without a checkpoint a randomly-initialized model is used (smoke/perf mode).
"""

from __future__ import annotations

import argparse
import json
import time



def build_model(args):
    """Params/tokenizer/config loading shared by every serving surface
    (single-stream CLI engine, web demo, multi-session web server) —
    returns (params, tok, cfg, vision_params) without allocating any
    engine KV state."""
    import jax
    from ..core.config import LiveConfig, LlamaConfig, live1_plus_config
    from ..models import live
    from ..tokenizer.live_tokenizer import LiveTokenizer
    from ..tokenizer.tiny import ByteTokenizer

    sizes = {
        "tiny": dict(vocab_size=2048, hidden_size=256, intermediate_size=512,
                     num_layers=4, num_heads=8, num_kv_heads=4, head_dim=32),
        "1b": dict(vocab_size=128256, hidden_size=2048, intermediate_size=8192,
                   num_layers=16, num_heads=32, num_kv_heads=8, head_dim=64),
        "8b": dict(),
    }
    llama_cfg = LlamaConfig(**sizes[args.model_size], dtype=args.dtype)
    cfg = live1_plus_config(llama=llama_cfg, lora=None)

    if args.tokenizer:
        import os
        from ..tokenizer.live_tokenizer import build_live_tokenizer
        tk_json = os.path.join(args.tokenizer, "tokenizer.json")
        if os.path.isdir(args.tokenizer) and os.path.exists(tk_json) \
                and not os.path.exists(os.path.join(args.tokenizer,
                                                    "tokenizer_config.json")):
            # bare tokenizer.json asset (e.g. tools/build_tokenizer.py)
            from transformers import PreTrainedTokenizerFast
            hf = PreTrainedTokenizerFast(
                tokenizer_file=tk_json, bos_token="<|begin_of_text|>",
                eos_token="<|eot_id|>")
        else:
            from transformers import AutoTokenizer
            hf = AutoTokenizer.from_pretrained(args.tokenizer)
        tok = build_live_tokenizer(hf, cfg)
    else:
        tok = LiveTokenizer(ByteTokenizer(), cfg)
    cfg = tok.cfg

    if args.checkpoint:
        from ..train.checkpoints import restore_params
        params = restore_params(args.checkpoint)
        if "llama" not in params:
            # bare decoder tree (tools/convert_weights.py output): the
            # connector normally rides in the adapter checkpoint
            # (reference modules_to_save=['connector'])
            params = {"llama": params,
                      "connector": live.init_connector(
                          jax.random.PRNGKey(args.seed), cfg)}
        if getattr(args, "quantize", "") in ("int8", "int4"):
            from ..models import quant
            params = quant.quantize_live_params(
                params, bits=4 if args.quantize == "int4" else 8)
    elif getattr(args, "quantize", "") in ("int8", "int4") \
            or args.model_size == "8b":
        # 8B bf16 exceeds one 16GB chip; serve int8/int4 (random init
        # without a checkpoint — smoke/perf mode)
        from ..models import quant
        key = jax.random.PRNGKey(args.seed)
        bits = 4 if getattr(args, "quantize", "") == "int4" else 8
        params = {
            "llama": quant.random_quantized_llama_params(key, cfg.llama,
                                                         bits=bits),
            "connector": live.init_connector(jax.random.fold_in(key, 1), cfg),
        }
    else:
        params = live.init_params(jax.random.PRNGKey(args.seed), cfg)

    vision_params = None
    if args.vision_checkpoint:
        from ..train.checkpoints import restore_params
        vision_params = restore_params(args.vision_checkpoint)
    elif args.with_vision:
        from ..models import siglip
        vision_params = siglip.init_params(jax.random.PRNGKey(1), cfg.vision)

    return params, tok, cfg, vision_params


def build_engine(args):
    from ..serve.engine import LiveInferEngine

    params, tok, cfg, vision_params = build_model(args)
    stream_tokens = getattr(args, "stream_tokens", 0) or None
    on_delta = None
    if stream_tokens:
        # live token streaming to the terminal (first text after S tokens)
        if cfg.max_response_tokens % stream_tokens:
            cfg = cfg.replace(max_response_tokens=(
                cfg.max_response_tokens // stream_tokens) * stream_tokens)

        def on_delta(delta, done):
            print(delta, end="\n" if done else "", flush=True)
    return LiveInferEngine(params, tok, cfg, vision_params=vision_params,
                           kv_capacity=args.kv_capacity,
                           speculative=getattr(args, "speculative", False),
                           pipelined=getattr(args, "pipelined", False),
                           kv_quant=getattr(args, "kv_quant", "") or None,
                           spec_decode=getattr(args, "spec_decode", False),
                           spec_draft=getattr(args, "spec_draft", None) or None,
                           stream_tokens=stream_tokens, on_delta=on_delta,
                           ), cfg


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--video", required=True,
                   help="mp4 (needs ffmpeg), .avi (rawvideo/MJPEG, first-party"
                        " reader), or .npy/.pt features")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--vision_checkpoint", default="")
    p.add_argument("--tokenizer", default="",
                   help="HF tokenizer path (omit for the byte test tokenizer)")
    p.add_argument("--model_size", default="tiny",
                   choices=["tiny", "1b", "8b"])
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--quantize", default="", choices=["", "int8", "int4"],
                   help="weight-only int8/int4 (int8 implied for "
                        "--model_size 8b without a checkpoint)")
    p.add_argument("--with_vision", action="store_true")
    p.add_argument("--query", default="Please narrate the video in real time.")
    p.add_argument("--num_ticks", type=int, default=100)
    p.add_argument("--warmup_ticks", type=int, default=2,
                   help="ticks excluded from the FPS average (first-use jit "
                        "compiles dominate them)")
    p.add_argument("--kv_capacity", type=int, default=16384)
    p.add_argument("--kv_quant", default="", choices=["", "int8"],
                   help="int8 KV cache: halves KV memory (2x stream "
                        "capacity) and attention KV HBM reads; slight "
                        "quantization noise on transcripts")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output", default="cli_history.json")
    p.add_argument("--speculative", action="store_true",
                   help="pipelined per-frame ingest: dispatch the next frame "
                        "before reading the previous gate (rolls back on "
                        "fire); hides readback RTT on tunneled TPUs")
    p.add_argument("--spec_decode", action="store_true",
                   help="n-gram speculative decoding inside response "
                        "generation: verify up to 7 drafted tokens per "
                        "weight-streaming forward (drafts from a device "
                        "token-history ring); transcripts byte-identical "
                        "to greedy")
    p.add_argument("--spec_draft", type=int, default=0,
                   help="drafted tokens per verify step (0 = default; "
                        "decode is weight-bound so larger K is nearly "
                        "free — K study in BENCH_NOTES.md)")
    p.add_argument("--pipelined", action="store_true",
                   help="sustained-mode dispatch pipelining: the next burst "
                        "dispatches before the previous packed readback, "
                        "chained through the device-resident prepend (the "
                        "throughput serving mode; docs/SERVING.md)")
    p.add_argument("--stream_tokens", type=int, default=0,
                   help="S > 0: token-streaming responses — partial text "
                        "prints after every S decoded tokens (the latency "
                        "serving mode; composes with --spec_decode, "
                        "excludes --pipelined/--speculative)")
    args = p.parse_args(argv)

    engine, cfg = build_engine(args)
    engine.load_video(args.video)
    engine.input_query_stream(args.query, video_time=0.0)

    fps = engine.frame_fps
    history = {"video": args.video, "messages": []}
    times = []
    max_time = engine.num_video_frames / fps
    for i in range(args.num_ticks):
        t = i / fps
        if t > max_time:
            break
        start = time.perf_counter()
        engine.input_video_stream(t)
        query, response = engine()
        dt = time.perf_counter() - start
        if i >= args.warmup_ticks:
            times.append(dt)
        for role, msg in (("user", query), ("assistant", response)):
            if msg:
                history["messages"].append(
                    {"role": role, "content": msg, "fps": 1.0 / dt})
                print(msg)
    for query, response in engine.flush():  # speculative tail, if any
        for role, msg in (("user", query), ("assistant", response)):
            if msg:
                history["messages"].append({"role": role, "content": msg})
                print(msg)
    avg_fps = len(times) / sum(times) if times else 0.0
    history["average_processing_fps"] = avg_fps
    print(f"Average Processing FPS: {avg_fps:.2f}")
    with open(args.output, "w") as f:
        json.dump(history, f, indent=1)


if __name__ == "__main__":
    main()
