"""Evaluation entry point (reference evaluate.py:7-33): same as training
without the train loop; loads the adapter from --resume_from_checkpoint.

  python -m videollm_online_tpu.evaluate_entry --live_version live1+ \
      --eval_datasets coin_step_test --resume_from_checkpoint outputs/run1
"""

from __future__ import annotations

import json
import os

from .core.arguments import parse_args
from .data.collator import make_collator
from .data.registry import build_eval_dataset_dict
from .models.builder import build_model_and_tokenizer
from .train.trainer import LiveTrainer


def evaluate(argv=None):
    args = parse_args(argv)
    params, tokenizer, cfg = build_model_and_tokenizer(args,
                                                       is_training=False)
    data_kwargs = dict(
        tokenizer=tokenizer, system_prompt=args.system_prompt,
        augmentation=False, max_num_frames=args.max_num_frames,
        vision_pretrained=args.vision_pretrained, embed_mark=args.embed_mark,
        frame_fps=args.frame_fps)
    eval_dict = build_eval_dataset_dict(args.eval_datasets, **data_kwargs)
    trainer = LiveTrainer(
        params=params, cfg=cfg, tokenizer=tokenizer, args=args,
        eval_dataset_dict=eval_dict,
        collate_fn=make_collator(tokenizer))
    metrics = trainer.evaluate()
    print(json.dumps(metrics, indent=1))
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "eval_results.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    return metrics


if __name__ == "__main__":
    evaluate()
