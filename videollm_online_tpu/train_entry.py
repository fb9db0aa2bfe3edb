"""Training entry point (reference train.py:7-40).

  python -m videollm_online_tpu.train_entry --live_version live1+ \
      --train_datasets coin_step_train --eval_datasets coin_step_test \
      --model_size tiny --max_steps 20 --output_dir outputs/run1

Builds model+tokenizer, train/eval datasets, trains, saves the adapter, then
evaluates each eval dataset with its evaluator."""

from __future__ import annotations

import json
import os

from .core.arguments import parse_args
from .data.collator import make_collator
from .data.registry import (build_concat_train_dataset,
                            build_eval_dataset_dict)
from .models.builder import build_model_and_tokenizer
from .train.trainer import LiveTrainer


def train(argv=None):
    args = parse_args(argv)
    params, tokenizer, cfg = build_model_and_tokenizer(args, is_training=True)
    data_kwargs = dict(
        tokenizer=tokenizer, system_prompt=args.system_prompt,
        augmentation=args.augmentation, max_num_frames=args.max_num_frames,
        vision_pretrained=args.vision_pretrained, embed_mark=args.embed_mark,
        frame_fps=args.frame_fps)
    train_dataset = build_concat_train_dataset(args.train_datasets,
                                               **data_kwargs)
    eval_dict = build_eval_dataset_dict(args.eval_datasets, **data_kwargs)

    from .ops.auto import resolve_attn_impl
    attn_impl = resolve_attn_impl(args.attn_implementation)

    trainer = LiveTrainer(
        params=params, cfg=cfg, tokenizer=tokenizer, args=args,
        train_dataset=train_dataset, eval_dataset_dict=eval_dict,
        collate_fn=make_collator(tokenizer,
                                 pad_to_multiple=args.pad_to_multiple),
        attn_impl=attn_impl)
    if train_dataset is not None:
        trainer.train()
        trainer.save_model()
    if eval_dict:
        metrics = trainer.evaluate()
        print(json.dumps(metrics, indent=1))
        with open(os.path.join(args.output_dir, "eval_results.json"), "w") as f:
            json.dump(metrics, f, indent=1)
    return trainer


if __name__ == "__main__":
    train()
