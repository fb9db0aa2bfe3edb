"""Manual dataset/collator inspection + metric sanity smoke.

Equivalent of the reference's only test artifact (test/dataloader.py):
(a) iterate the train loader printing decoded input_ids/labels and tracking
max/avg sequence length; (b) for eval datasets, feed ground-truth labels as
predictions through compute_metrics — accuracy-style metrics must come out
~100%.

  python tools/inspect_dataloader.py --live_version live1+ \
      --train_datasets coin_step_train --eval_datasets coin_step_test ...
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from videollm_online_tpu.core.arguments import parse_args
    from videollm_online_tpu.data.collator import make_collator
    from videollm_online_tpu.data.loader import DataLoader
    from videollm_online_tpu.data.registry import (
        build_concat_train_dataset, build_eval_dataset_dict)
    from videollm_online_tpu.models.builder import build_model_and_tokenizer

    args = parse_args()
    _, tokenizer, cfg = build_model_and_tokenizer(args, is_training=True)
    kw = dict(tokenizer=tokenizer, system_prompt=args.system_prompt,
              augmentation=args.augmentation,
              max_num_frames=args.max_num_frames,
              vision_pretrained=args.vision_pretrained,
              embed_mark=args.embed_mark, frame_fps=args.frame_fps)

    train = build_concat_train_dataset(args.train_datasets, **kw)
    if train is not None:
        loader = DataLoader(train, batch_size=1,
                            collate_fn=make_collator(tokenizer),
                            shuffle=False, num_workers=0)
        lengths = []
        for i, batch in enumerate(loader):
            ids, labels = batch["input_ids"][0], batch["labels"][0]
            lengths.append(int(batch["attention_mask"][0].sum()))
            if i < 3:
                print("=" * 30, f"sample {i}", "=" * 30)
                print("INPUT :", tokenizer.decode(ids,
                                                  skip_special_tokens=False)[:400])
                sup = labels[labels != -100]
                print("LABELS:", tokenizer.decode(sup)[:200])
            if i >= 50:
                break
        print(f"seq len: max={max(lengths)} avg={np.mean(lengths):.1f}")

    eval_dict = build_eval_dataset_dict(args.eval_datasets, **kw) or {}
    for name, ds in eval_dict.items():
        if not hasattr(ds, "labels"):
            print(f"{name}: no closed-label set; skipping gt-as-pred smoke")
            continue
        preds, idxs = [], []
        for i in range(len(ds)):
            label = ds.labels[i]
            text = (label if isinstance(label, str)
                    else "\n".join(f"{j+1}. {s.capitalize()}."
                                   for j, s in enumerate(label)))
            if isinstance(label, str):
                text = label.capitalize() + "."
            preds.append(np.asarray(tokenizer.encode(text)))
            idxs.append(i)
        L = max(len(p) for p in preds)
        rect = np.full((len(preds), L), -100)
        for i, p in enumerate(preds):
            rect[i, :len(p)] = p
        m = ds.compute_metrics(rect, idxs, tokenizer=tokenizer)
        print(f"{name}: ground-truth-as-prediction -> {m}")


if __name__ == "__main__":
    main()
