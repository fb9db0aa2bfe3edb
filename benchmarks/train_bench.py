"""Training-step benchmark + attribution on the real chip.

Measures the full jitted train step (fwd + bwd + AdamW on LoRA/connector)
at flagship shapes, and with ``--attrib`` decomposes it into forward /
backward / optimizer+update phases to attribute where the time goes
(VERDICT r3 #8: the 1B proxy step sat at ~50% of the chip's matmul
ceiling, unattributed).

The QLoRA-analog configuration (``--quantize_base int8``, default for
--model 8b) freezes the base decoder as weight-only int8 so the
reference's actual deliverable — an 8B LoRA fine-tune
(/root/reference/models/modeling_live.py:184-222,
scripts/ego4d/live1+.sh) — becomes measurable on ONE chip (VERDICT r3 #4).

Timing discipline (CLAUDE.md): dispatches chain on a data dependency
(the donated TrainState for the step; a 1e-30-scaled output folded back
into the trainable tree for the fwd/bwd probes — a real dependency XLA
cannot fold away), fenced ONCE by a host scalar readback.

Run on the real chip:
  python benchmarks/train_bench.py --model 1b --seq 4096 --attrib
  python benchmarks/train_bench.py --model 8b --seq 4096   # QLoRA-analog
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODEL_SIZES = {
    "tiny": dict(vocab_size=2048, hidden_size=256, intermediate_size=512,
                 num_layers=4, num_heads=8, num_kv_heads=4, head_dim=32),
    "1b": dict(vocab_size=128256, hidden_size=2048, intermediate_size=8192,
               num_layers=16, num_heads=32, num_kv_heads=8, head_dim=64),
    "8b": dict(vocab_size=128256, hidden_size=4096, intermediate_size=14336,
               num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128),
}


def synthetic_batch(cfg, seq: int, rng: np.random.RandomState):
    """A live1+-shaped training sample: a short text prefix, then repeated
    [interval, <v> x frame_num_tokens] frame groups; assistant-style
    supervision on the interval slots + a text span (collator label
    semantics, data/collator.py)."""
    fnt = cfg.frame_num_tokens
    group = fnt + 1
    text_len = 64
    n_frames = (seq - text_len) // group
    ids = np.zeros((1, seq), np.int32)
    labels = np.full((1, seq), -100, np.int32)
    ids[0, :text_len] = rng.randint(4, min(cfg.llama.vocab_size, 30000),
                                    (text_len,))
    labels[0, 8:text_len] = ids[0, 8:text_len]
    pos = text_len
    for _ in range(n_frames):
        ids[0, pos] = cfg.frame_token_interval_id
        labels[0, pos] = cfg.frame_token_interval_id
        ids[0, pos + 1:pos + 1 + fnt] = cfg.v_placeholder_id
        pos += group
    frames = rng.randn(n_frames, fnt, cfg.vision_hidden_size) \
        .astype(np.float32)
    return {"input_ids": ids, "labels": labels, "frames": frames}, n_frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="1b", choices=sorted(MODEL_SIZES))
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--quantize_base", default=None,
                    help="'' | int8 (default: int8 for 8b, '' otherwise)")
    ap.add_argument("--attrib", action="store_true",
                    help="decompose step time into fwd/bwd/optimizer")
    ap.add_argument("--offload", action="store_true",
                    help="host-offloaded optimizer moments "
                         "(train/offload.py, the ZeRO-2-offload analog) — "
                         "frees ~3 GiB of HBM for the 8B recipe; required "
                         "to fit T=12288 on one 16 GiB chip (without it "
                         "the step needs 17.11G, measured)")
    ap.add_argument("--remat_group", type=int, default=1,
                    help="checkpoint every N layers (nested grouped remat); "
                         "2 shrinks the saved-activation buffer 2x for one "
                         "extra fwd recompute — with --offload this fits "
                         "8B x T=12288 on one chip")
    ap.add_argument("--loss_chunk", type=int, default=0,
                    help="chunk size override for chunked_loss (0 = "
                         "live.LOSS_CHUNK=1024); measured not to move the "
                         "8B x T=12288 fit (15.80G OOM at 1024 and 512 — "
                         "saved activations dominate; --remat_group 2 is "
                         "the knob that fits)")
    ap.add_argument("--mlp_chunk", type=int, default=0,
                    help="compute each layer's MLP in N-position sequence "
                         "slices (exact; caps the bwd working set at one "
                         "chunk's (N, intermediate) temps — "
                         "LlamaConfig.mlp_chunk)")
    ap.add_argument("--mu_dtype", default="",
                    help="Adam first-moment dtype ('' = param dtype). "
                         "No-op for the bf16 LoRA/connector trainables "
                         "(moments are already bf16: bfloat16 reproduces "
                         "the same 15.99G OOM at T=12288 rg=2)")
    ap.add_argument("--chunked_loss", default=None,
                    choices=["0", "1"],
                    help="stream the CE through LOSS_CHUNK-position lm_head "
                         "chunks (default: on for full-vocab models at "
                         "seq > 4096 — the (T,128256) f32 logits alone are "
                         "~5.9 GiB at T=8192)")
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
    from videollm_online_tpu.models import live, llama, quant
    from videollm_online_tpu.ops.auto import auto_attention
    from videollm_online_tpu.tokenizer.live_tokenizer import LiveTokenizer
    from videollm_online_tpu.tokenizer.tiny import ByteTokenizer
    from videollm_online_tpu.train import optim, step as step_mod

    qbase = args.quantize_base
    if qbase is None:
        qbase = "int8" if args.model == "8b" else ""
    if args.chunked_loss is None:
        chunked = args.model != "tiny" and args.seq > 4096
    else:
        chunked = args.chunked_loss == "1"

    llama_cfg = LlamaConfig(**MODEL_SIZES[args.model], dtype="bfloat16",
                            mlp_chunk=args.mlp_chunk)
    cfg = LiveConfig(llama=llama_cfg, lora=LoraConfig())
    tok = LiveTokenizer(ByteTokenizer(), cfg)
    cfg = tok.cfg

    key = jax.random.PRNGKey(0)
    if qbase:
        # build the base DIRECTLY quantized: the bf16 staging copy of an
        # 8B base (16 GB) must never exist on the 16 GB chip
        base = quant.random_quantized_llama_params(key, cfg.llama, bits=8)
    else:
        base = llama.init_params(key, cfg.llama)
    params = {
        "llama": base,
        "connector": live.init_connector(jax.random.fold_in(key, 1), cfg),
        "lora": llama.init_lora_params(jax.random.fold_in(key, 2),
                                       cfg.llama, cfg.lora),
    }

    rng = np.random.RandomState(0)
    batch_np, n_frames = synthetic_batch(cfg, args.seq, rng)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    tokens = args.seq

    tx = optim.make_optimizer(optim.OptimConfig(total_steps=1000,
                                                mu_dtype=args.mu_dtype))
    state, frozen = step_mod.init_train_state(params, tx)
    lchunk = args.loss_chunk or None
    if args.offload:
        from videollm_online_tpu.train import offload
        state = offload.offload_state(state)
        step = offload.make_offload_train_step(cfg, tx, accum_steps=1,
                                               attn_impl=auto_attention,
                                               chunked_loss=chunked,
                                               loss_chunk=lchunk,
                                               remat_group=args.remat_group)
    else:
        step = step_mod.make_jitted_train_step(cfg, tx, accum_steps=1,
                                               attn_impl=auto_attention,
                                               chunked_loss=chunked,
                                               loss_chunk=lchunk,
                                               remat_group=args.remat_group)

    n_tr = optim.count_params(state.trainable)
    n_fr = optim.count_params(frozen)
    print(f"model={args.model} qbase={qbase or 'bf16'} seq={tokens} "
          f"frames={n_frames} chunked_loss={int(chunked)} "
          f"offload={int(args.offload)} rg={args.remat_group} "
          f"mu={args.mu_dtype or 'f32'} mlpc={args.mlp_chunk} "
          f"trainable={n_tr/1e6:.1f}M frozen={n_fr/1e6:.1f}M "
          f"param_bytes={quant.param_bytes(params)/2**30:.2f}GiB")

    # ---- full step --------------------------------------------------------
    state, metrics = step(state, frozen, batch)   # compile + warmup
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, frozen, batch)  # chains via state
    loss = float(metrics["loss"])                    # the single fence
    dt = (time.perf_counter() - t0) / args.steps
    print(f"train_step: {dt*1e3:.1f} ms/step  "
          f"{tokens/dt:,.0f} tokens/s  loss={loss:.3f}")

    if not args.attrib:
        return

    # ---- attribution probes ------------------------------------------------
    # Each probe folds a 1e-30-scaled scalar of its output back into the
    # trainable tree: a genuine data dependency (numerically negligible,
    # not constant-foldable), so K probe dispatches chain like real steps.
    def _fold(tree, s):
        return jax.tree.map(
            lambda p: p + (s * 1e-30).astype(p.dtype), tree)

    # match the real step's LoRA-dropout semantics (train_step folds a
    # per-step rbg key; probes pin step 0) so "optimizer+update" is not
    # polluted by the dropout masks' cost
    drng = jax.random.fold_in(jax.random.key(0x10ad, impl="rbg"), 0)

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
    def fwd_probe(trainable, frozen, batch, dropout: bool):
        loss = step_mod.loss_fn(trainable, frozen, cfg, batch,
                                attn_impl=auto_attention,
                                dropout_rng=drng if dropout else None,
                                chunked_loss=chunked, loss_chunk=lchunk,
                                remat_group=args.remat_group)
        return _fold(trainable, loss), loss

    import optax

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
    def grad_probe(trainable, frozen, batch, dropout: bool):
        loss, grads = jax.value_and_grad(step_mod.loss_fn)(
            trainable, frozen, cfg, batch, attn_impl=auto_attention,
            dropout_rng=drng if dropout else None,
            chunked_loss=chunked, loss_chunk=lchunk,
            remat_group=args.remat_group)
        return _fold(trainable, optax.global_norm(grads)), loss

    def timed(fn, trainable, label, *extra):
        trainable, loss = fn(trainable, frozen, batch, *extra)  # compile
        _ = float(loss)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            trainable, loss = fn(trainable, frozen, batch, *extra)
        _ = float(loss)
        dt = (time.perf_counter() - t0) / args.steps
        print(f"{label}: {dt*1e3:.1f} ms")
        return dt

    trainable = jax.tree.map(jnp.copy, state.trainable)
    t_fwd = timed(fwd_probe, trainable, "forward only (remat fwd)", True)
    trainable = jax.tree.map(jnp.copy, state.trainable)
    t_grad = timed(grad_probe, trainable, "forward+backward", True)
    trainable = jax.tree.map(jnp.copy, state.trainable)
    t_grad_nd = timed(grad_probe, trainable, "forward+backward (no LoRA "
                      "dropout)", False)
    t_full = dt
    t_bwd = max(t_grad - t_fwd, 0) * 1e3
    t_opt = max(t_full - t_grad, 0) * 1e3
    print(f"attribution: fwd {t_fwd*1e3:.1f} | bwd {t_bwd:.1f} | "
          f"optimizer+update {t_opt:.1f} ms (full {t_full*1e3:.1f}; "
          f"LoRA-dropout cost {max(t_grad - t_grad_nd, 0)*1e3:.1f})")
    # model-FLOPs-equivalent rate: 6*N*T for fwd+bwd over frozen+trainable
    n_all = n_tr + n_fr
    tf = 6 * n_all * tokens / t_grad / 1e12
    print(f"fwd+bwd model-FLOPs rate: {tf:.1f} TF/s-equiv "
          f"(chip matmul ceiling ~150 TF/s)")


if __name__ == "__main__":
    main()
