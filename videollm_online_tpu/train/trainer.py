"""LiveTrainer: the training/evaluation driver.

Replaces HF Trainer + TrainerWithGenToEval + DeepSpeed (reference train.py,
engine/trainer_with_gen2eval.py, configs/deepspeed/*): a pjit train step over
a (data, model) mesh, host-side grad-accum batching, cosine LR, Orbax
checkpointing, TensorBoard-compatible metric logging, and an eval loop that
dispatches each dataset's evaluator (stream_evaluate / generate /
generate_after_embed) and feeds gathered predictions to the dataset's
``compute_metrics`` (trainer_with_gen2eval.py:5-21)."""

from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional

import numpy as np

import jax.numpy as jnp

from ..core.arguments import LiveTrainingArguments
from ..core.config import LiveConfig
from ..data.loader import DataLoader
from ..eval.generation import beam_generate, greedy_from_embeds
from ..eval.stream_evaluate import StreamEvaluator
from ..parallel.mesh import make_mesh, maybe_mesh
from ..utils.logging import MetricLogger
from . import checkpoints, optim, step as step_mod


class LiveTrainer:
    def __init__(self, *, params: Dict[str, Any], cfg: LiveConfig,
                 tokenizer, args: LiveTrainingArguments,
                 train_dataset=None, eval_dataset_dict=None,
                 compute_metrics_dict=None, collate_fn=None, mesh=None,
                 attn_impl=None):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.args = args
        self.train_dataset = train_dataset
        self.eval_dataset_dict = eval_dataset_dict or {}
        self.compute_metrics_dict = compute_metrics_dict or {}
        self.collate_fn = collate_fn
        self.mesh = mesh
        if self.mesh is None and args.mesh_model_axis > 1:
            self.mesh = make_mesh(data=-1, model=args.mesh_model_axis)
        if isinstance(attn_impl, str) and attn_impl.startswith("sp_"):
            # sequence-parallel attention over the model axis: 'sp_ring'
            # (ppermute ring, ops/ring_attention.py) or 'sp_ulysses'
            # (all-to-all head/sequence repartition, ops/ulysses_attention.py)
            # — for sequences too long for one chip's activations (the
            # reference truncates instead, models/arguments_live.py:37,47)
            from ..parallel.mesh import MODEL_AXIS
            assert self.mesh is not None and self.mesh.shape[MODEL_AXIS] > 1, (
                f"attn_implementation={attn_impl!r} needs mesh_model_axis > 1")
            if attn_impl == "sp_ring":
                from ..ops.ring_attention import make_ring_attn
                attn_impl = make_ring_attn(self.mesh, MODEL_AXIS)
            else:
                from ..ops.ulysses_attention import make_ulysses_attn
                attn_impl = make_ulysses_attn(self.mesh, MODEL_AXIS)
        self.attn_impl = attn_impl
        self.logger = MetricLogger(args.output_dir)

        # steps bookkeeping
        if train_dataset is not None:
            steps_per_epoch = max(
                len(train_dataset) // (args.per_device_train_batch_size
                                       * args.gradient_accumulation_steps), 1)
            self.total_steps = (args.max_steps or
                                int(steps_per_epoch * args.num_train_epochs))
        else:
            self.total_steps = max(args.max_steps, 1)

        self.tx = optim.make_optimizer(optim.OptimConfig(
            learning_rate=args.learning_rate,
            warmup_ratio=args.warmup_ratio,
            total_steps=self.total_steps))
        if self.mesh is not None:
            params = step_mod.shard_params(params, self.mesh,
                                           args.sharding_policy)
        self.state, self.frozen = step_mod.init_train_state(params, self.tx)
        if getattr(args, "offload_optimizer", False):
            # ZeRO-2 CPU-offload analog: moments live in pinned host
            # memory between steps (train/offload.py)
            from . import offload
            self.state = offload.offload_state(self.state)
            self._step = offload.make_offload_train_step(
                cfg, self.tx,
                accum_steps=args.gradient_accumulation_steps,
                attn_impl=attn_impl,
                chunked_loss=getattr(args, "chunked_loss", False),
                loss_chunk=getattr(args, "loss_chunk", 0) or None,
                remat_group=getattr(args, "remat_group", 1))
        else:
            self._step = step_mod.make_jitted_train_step(
                cfg, self.tx, accum_steps=args.gradient_accumulation_steps,
                attn_impl=attn_impl,
                chunked_loss=getattr(args, "chunked_loss", False),
                loss_chunk=getattr(args, "loss_chunk", 0) or None,
                remat_group=getattr(args, "remat_group", 1))

    # ------------------------------------------------------------- training
    def _microbatch_stack(self, batches: List[dict]) -> dict:
        """Stack accum_steps collated microbatches along a leading axis,
        padding token dims to the max across the group."""
        accum = len(batches)
        T = max(b["input_ids"].shape[1] for b in batches)
        F = max((b["frames"].shape[0] if b["frames"] is not None else 0)
                for b in batches)
        B = batches[0]["input_ids"].shape[0]
        pad_id = self.tokenizer.pad_token_id
        ids = np.full((accum, B, T), pad_id, np.int32)
        labels = np.full((accum, B, T), -100, np.int32)
        fdim = None
        for b in batches:
            if b["frames"] is not None:
                fdim = b["frames"].shape[1:]
                break
        frames = (np.zeros((accum, max(F, 1)) + fdim, np.float32)
                  if fdim else None)
        for a, b in enumerate(batches):
            t = b["input_ids"].shape[1]
            # right-padded sequences stay left-aligned
            ids[a, :, :t] = b["input_ids"]
            labels[a, :, :t] = b["labels"]
            if frames is not None and b["frames"] is not None:
                frames[a, :b["frames"].shape[0]] = b["frames"]
        out = {"input_ids": ids, "labels": labels}
        if frames is not None:
            out["frames"] = frames
        return out

    def train(self):
        args = self.args
        import jax
        loader = DataLoader(
            self.train_dataset,
            batch_size=args.per_device_train_batch_size,
            collate_fn=self.collate_fn, shuffle=True, seed=args.seed,
            num_workers=args.dataloader_num_workers,
            process_index=jax.process_index(),
            process_count=jax.process_count())
        accum = args.gradient_accumulation_steps
        micro: List[dict] = []
        t0 = time.time()
        done = False
        while not done:
            for batch in loader:
                micro.append(batch)
                if len(micro) < accum:
                    continue
                stacked = self._microbatch_stack(micro)
                micro = []
                if accum == 1:
                    stacked = {k: v[0] for k, v in stacked.items()
                               if v is not None}
                if self.mesh is not None:
                    # put the batch on the mesh so the data axis actually
                    # splits work (GSPMD propagates from argument shardings)
                    jbatch = step_mod.shard_batch(
                        {k: v for k, v in stacked.items() if v is not None},
                        self.mesh, accum_axis=accum > 1)
                else:
                    jbatch = {k: jnp.asarray(v) for k, v in stacked.items()
                              if v is not None}
                with maybe_mesh(self.mesh):
                    self.state, metrics = self._step(self.state, self.frozen,
                                                     jbatch)
                step = int(metrics["step"]) + 1
                if step % args.logging_steps == 0:
                    self.logger.log(step, {
                        "loss": float(metrics["loss"]),
                        "grad_norm": float(metrics["grad_norm"]),
                        "steps_per_sec": args.logging_steps / max(
                            time.time() - t0, 1e-9),
                    })
                    t0 = time.time()
                if (args.save_strategy == "steps" and args.save_steps
                        and step % args.save_steps == 0):
                    self.save_model(os.path.join(args.output_dir,
                                                 f"checkpoint-{step}"))
                if step >= self.total_steps:
                    done = True
                    break
            if args.save_strategy == "epoch" and not done:
                self.save_model(os.path.join(
                    args.output_dir, f"checkpoint-epoch{loader.epoch}"))
        return self.state

    def save_model(self, path: Optional[str] = None):
        path = path or self.args.output_dir
        checkpoints.save_adapter(os.path.join(path, "adapter"),
                                 {**self.frozen, **self.state.trainable})

    @property
    def params(self) -> Dict[str, Any]:
        return optim.merge_params(self.state.trainable, self.frozen)

    # ------------------------------------------------------------ evaluation
    def evaluate(self, dataset_name: Optional[str] = None, *,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None) -> Dict[str, dict]:
        """Run each eval dataset through its evaluator and compute metrics
        (reference trainer_with_gen2eval.py + train.py:27-36).

        Multi-process: samples are striped ``process_index::process_count``
        and predictions gathered across processes before ``compute_metrics``
        — the HF eval-loop gather the reference relies on
        (engine/trainer_with_gen2eval.py:20-21). The kwargs exist so tests
        can exercise the striding without multiple processes."""
        import jax
        if process_index is None:
            process_index = jax.process_index()
        if process_count is None:
            process_count = jax.process_count()
        results = {}
        names = ([dataset_name] if dataset_name
                 else list(self.eval_dataset_dict))
        params = self.params
        for name in names:
            ds = self.eval_dataset_dict[name]
            predictions, sample_idxs = [], []
            stream_eval = None
            for i in range(process_index, len(ds), process_count):
                text, frames, learn_ranges, idx, ekw = ds[i]
                from ..data.collator import collate
                # bucket sequence lengths so XLA compiles per bucket, not per
                # sample; right padding never enters attention (packing)
                batch = collate([(text, frames, learn_ranges, idx, ekw)],
                                tokenizer=self.tokenizer,
                                pad_to_multiple=max(self.args.pad_to_multiple,
                                                    1))
                num_valid = int(batch["attention_mask"][0].sum())
                evaluator = (ekw or {}).get("evaluator", "stream_evaluate")
                if evaluator == "stream_evaluate":
                    if stream_eval is None:
                        stream_eval = StreamEvaluator(params, self.cfg,
                                                      attn_impl=self.attn_impl)
                    pred = stream_eval(
                        batch["input_ids"], batch["labels"], batch["frames"],
                        self.args.frame_token_interval_threshold)
                elif evaluator == "generate":
                    pred = beam_generate(
                        params, self.cfg, batch["input_ids"], batch["frames"],
                        num_beams=ekw.get("num_beams", 1),
                        max_new_tokens=ekw.get("max_new_tokens", 512),
                        num_return_sequences=ekw.get("num_return_sequences"),
                        num_valid=num_valid,
                    ).reshape(-1)
                elif evaluator == "generate_after_embed":
                    pred = greedy_from_embeds(
                        params, self.cfg, batch["input_ids"], batch["frames"],
                        max_new_tokens=ekw.get("max_new_tokens", 512),
                        num_valid=num_valid,
                    ).reshape(-1)
                else:
                    raise ValueError(f"unknown evaluator {evaluator}")
                predictions.append(np.asarray(pred))
                sample_idxs.append(idx)
            # pad rows to a rectangle like the HF gather does
            L = max((len(p) for p in predictions), default=1)
            if jax.process_count() > 1 and process_count == jax.process_count():
                # agree on a global width, then gather rows + idxs over DCN
                from jax.experimental import multihost_utils as mhu
                L = int(np.max(mhu.process_allgather(np.asarray([L]))))
            rect = np.full((len(predictions), L), -100.0
                           if predictions and predictions[0].dtype.kind == "f"
                           else -100)
            for i, p in enumerate(predictions):
                rect[i, :len(p)] = p
            if jax.process_count() > 1 and process_count == jax.process_count():
                from jax.experimental import multihost_utils as mhu
                # ragged per-process counts: pad to the max count, gather,
                # then drop the padding rows via a validity mask
                counts = mhu.process_allgather(np.asarray([len(predictions)]))
                cmax = int(np.max(counts))
                rect_p = np.full((cmax, L), -100, rect.dtype)
                rect_p[:len(predictions)] = rect
                idx_p = np.full((cmax,), -1, np.int64)
                idx_p[:len(sample_idxs)] = np.asarray(sample_idxs, np.int64)
                all_rect = mhu.process_allgather(rect_p).reshape(-1, L)
                all_idx = mhu.process_allgather(idx_p).reshape(-1)
                keep = all_idx >= 0
                rect, sample_idxs = all_rect[keep], list(all_idx[keep])
            fn = self.compute_metrics_dict.get(name)
            if fn is None and hasattr(ds, "compute_metrics"):
                fn = lambda preds, idxs: ds.compute_metrics(
                    preds, idxs, tokenizer=self.tokenizer,
                    output_dir=self.args.output_dir)
            results[name] = fn(rect, np.asarray(sample_idxs)) if fn else {}
            self.logger.log_dict(f"eval/{name}", results[name])
        return results
