"""Offline-evaluation throughput on the real chip (VERDICT r4 #5).

The reference's primary offline deliverable is ``evaluate.py`` driving
``stream_evaluate`` over benchmark datasets (reference evaluate.py:7-33,
engine/trainer_with_gen2eval.py:5-21, models/modeling_live.py:44-168) and
beam-search LTA generation (data/ego4d/lta.py:13: 5 beams, 512 new
tokens).  Correctness is golden-tested against the executed reference
(tests/test_stream_evaluate.py, tests/test_generation.py); this bench adds
the missing TPU *throughput* numbers:

  * stream_evaluate over a live1+-shaped 10-minute narration video at the
    flagship 8B QLoRA-analog config (int8 base + bf16 LoRA/connector):
    s/video, ms/turn, videos/hour;
  * the rollforward branch (model never fires inside a turn ->
    trim-and-append future frames, modeling_live.py:116-148) timed
    separately — it is data-dependent and absent from the happy path;
  * one beam-search LTA sample (5 beams, 512 new tokens).

Sample synthesis runs the REAL data path (chat template -> learn ranges ->
collator), not hand-built ids, so T and the turn structure match what
``evaluate_entry.py`` would feed.  All samples share one (T, capacity)
shape: the first call compiles, later calls measure (BeamSearcher buckets
its capacity for the same reason).

Timing discipline (CLAUDE.md): StreamEvaluator.__call__ already fences on
host readbacks of the four stat vectors (its turn scan is host-side), so
wall time per call IS the per-video latency an evaluate_entry run pays.

Run on the real chip:
  python benchmarks/eval_bench.py --model 8b --minutes 10
  python benchmarks/eval_bench.py --model tiny --minutes 1 --platform cpu
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.train_bench import MODEL_SIZES  # noqa: E402


def make_sample(tok, cfg, n_frames: int, turn_every: int, seed: int):
    """A live1+-shaped narration eval sample through the real data path.
    Fixed per-turn text keeps T identical across seeds (zero recompiles);
    only the frame features vary."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import synth_narration
    from videollm_online_tpu.data.collator import collate

    rng = np.random.RandomState(seed)
    texts = synth_narration(np.random.RandomState(0), n_frames // turn_every)
    conv = [{"role": "system", "content": "You are a narrator."}]
    for i in range(n_frames // turn_every):
        conv.append({"role": "stream", "num_frames": turn_every,
                     "learn": True})
        # fixed width: pad every narration to one shape-stable string
        conv.append({"role": "assistant", "content": f"{texts[i]:<40}",
                     "learn": True})
    frames = rng.randn(n_frames, cfg.frame_num_tokens,
                       cfg.vision_hidden_size).astype(np.float32)
    text = tok.apply_chat_template(conv)
    ranges = tok.get_learn_ranges(conv)
    return collate([(text, frames, ranges, 0, None)], tokenizer=tok)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="8b", choices=sorted(MODEL_SIZES))
    ap.add_argument("--minutes", type=float, default=10.0,
                    help="video length (frames = minutes * 60 * frame_fps)")
    ap.add_argument("--turn_every", type=int, default=10,
                    help="narration turn every N frames (reference Ego4D "
                         "narration cadence ~ every 4-6 s at 2 fps)")
    ap.add_argument("--samples", type=int, default=3,
                    help="timed stream_evaluate calls after the compile run")
    ap.add_argument("--threshold", type=float, default=0.725,
                    help="frame_token_interval_threshold "
                         "(reference demo/inference.py:31)")
    ap.add_argument("--quantize_base", default=None,
                    help="'' | int8 (default: int8 for 8b, '' otherwise)")
    ap.add_argument("--beams", type=int, default=5)
    ap.add_argument("--beam_new", type=int, default=512,
                    help="LTA beam-search new tokens (data/ego4d/lta.py:13)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from videollm_online_tpu.core.config import (LiveConfig, LlamaConfig,
                                                 LoraConfig)
    from videollm_online_tpu.eval.generation import BeamSearcher
    from videollm_online_tpu.eval.stream_evaluate import StreamEvaluator
    from videollm_online_tpu.models import live, llama, quant
    from videollm_online_tpu.tokenizer.live_tokenizer import LiveTokenizer
    from videollm_online_tpu.tokenizer.tiny import ByteTokenizer

    qbase = args.quantize_base
    if qbase is None:
        qbase = "int8" if args.model == "8b" else ""

    llama_cfg = LlamaConfig(**MODEL_SIZES[args.model], dtype="bfloat16")
    cfg = LiveConfig(llama=llama_cfg, lora=LoraConfig())
    tok = LiveTokenizer(ByteTokenizer(), cfg)
    cfg = tok.cfg

    key = jax.random.PRNGKey(0)
    if qbase:
        base = quant.random_quantized_llama_params(key, cfg.llama, bits=8)
    else:
        base = llama.init_params(key, cfg.llama)
    params = {
        "llama": base,
        "connector": live.init_connector(jax.random.fold_in(key, 1), cfg),
        "lora": llama.init_lora_params(jax.random.fold_in(key, 2),
                                       cfg.llama, cfg.lora),
    }

    n_frames = int(args.minutes * 60 * cfg.frame_fps)
    n_frames -= n_frames % args.turn_every
    n_turns = n_frames // args.turn_every
    sample0 = make_sample(tok, cfg, n_frames, args.turn_every, seed=0)
    T = sample0["input_ids"].shape[1]
    print(f"model={args.model} qbase={qbase or 'bf16'} "
          f"video={args.minutes:g}min frames={n_frames} turns={n_turns} "
          f"T={T} param_bytes={quant.param_bytes(params)/2**30:.2f}GiB")

    ev = StreamEvaluator(params, cfg)

    def run(sample):
        t0 = time.perf_counter()
        out = ev(sample["input_ids"], sample["labels"], sample["frames"],
                 frame_token_interval_threshold=args.threshold)
        return time.perf_counter() - t0, out

    dt_c, out = run(sample0)  # compile + warmup
    print(f"stream_evaluate compile+first: {dt_c:.1f} s "
          f"[ppl {out[0]:.2f} diff {out[1]:.2f} flu {out[2]:.3f} "
          f"corr {out[3]:.3f}]")
    times = []
    for s in range(args.samples):
        sample = make_sample(tok, cfg, n_frames, args.turn_every,
                             seed=s + 1) if s else sample0
        dt, out = run(sample)
        times.append(dt)
        print(f"  sample {s}: {dt:.2f} s")
    dt = float(np.median(times))
    print(f"stream_evaluate: {dt:.2f} s/video  {dt/n_turns*1e3:.1f} ms/turn"
          f"  {3600/dt:,.0f} videos/hour ({args.minutes:g}-min videos)")

    # ---- rollforward branch -------------------------------------------------
    # Data-dependent (gate never fires inside a turn); time the branch
    # directly on a capacity-matched ring — numerics are irrelevant to the
    # cost, which is copy(ring) + one chunked forward over the appended
    # frame units + the gate scan (stream_evaluate._rollforward).
    to_append = args.turn_every - 1
    fnt = cfg.frame_num_tokens
    per = fnt + (1 if ev.use_interval else 0)
    cap = T + to_append * per
    cache = llama.init_kv_cache(cfg.llama, batch=1, capacity=cap,
                                dtype=jnp.dtype(cfg.llama.dtype))
    cache = llama.KVCache(k=cache.k, v=cache.v,
                          offset=jnp.full_like(cache.offset, T),
                          pos_base=cache.pos_base,
                          k_scale=cache.k_scale, v_scale=cache.v_scale)
    frames_np = np.asarray(sample0["frames"])
    ev._rollforward(cache, T - to_append * per, frames_np,
                    n_frames - to_append, to_append, args.threshold)
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        ev._rollforward(cache, T - to_append * per, frames_np,
                        n_frames - to_append, to_append, args.threshold)
    dt_roll = (time.perf_counter() - t0) / reps
    print(f"rollforward branch ({to_append} frames appended onto a {T}-entry"
          f" ring): {dt_roll*1e3:.0f} ms/occurrence")

    # ---- beam-search LTA sample --------------------------------------------
    # One LTA-shaped prompt (frames + a forecasting query), 5 beams x 512
    # new tokens (reference data/ego4d/lta.py:13). Random weights rarely
    # emit EOS, so this is the WORST-case (full-budget) beam cost.
    lta_frames = 32
    conv = [{"role": "system", "content": "You are an anticipator."},
            {"role": "stream", "num_frames": lta_frames, "learn": False},
            {"role": "user", "content": "What will happen next?"}]
    from videollm_online_tpu.data.collator import collate
    text = tok.apply_chat_template(conv, add_generation_prompt=True)
    ranges = tok.get_learn_ranges(conv)
    fr = np.random.RandomState(9).randn(
        lta_frames, fnt, cfg.vision_hidden_size).astype(np.float32)
    batch = collate([(text, fr, ranges, 0, None)], tokenizer=tok)
    searcher = BeamSearcher(params, cfg, num_beams=args.beams)
    t0 = time.perf_counter()
    outs = searcher.search(batch["input_ids"], batch["frames"],
                           max_new_tokens=args.beam_new,
                           num_return_sequences=args.beams)
    dt_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = searcher.search(batch["input_ids"], batch["frames"],
                           max_new_tokens=args.beam_new,
                           num_return_sequences=args.beams)
    dt_b = time.perf_counter() - t0
    n_tok = sum(len(o) for o in outs)
    print(f"beam search (LTA, {args.beams} beams x {args.beam_new} new): "
          f"compile+first {dt_c:.1f} s, steady {dt_b:.2f} s "
          f"({max(len(o) for o in outs)} steps, "
          f"{n_tok} returned tokens, {n_tok/dt_b:,.0f} tok/s)")


if __name__ == "__main__":
    main()
