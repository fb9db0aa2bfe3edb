#!/usr/bin/env bash
# Long-term action anticipation finetune (reference scripts/ego4d/lta/live1+.sh: zero1)
python -m videollm_online_tpu.train_entry \
    --live_version live1+ \
    --train_datasets ego4d_lta_train \
    --eval_datasets ego4d_lta_val \
    --num_train_epochs 2 \
    --gradient_accumulation_steps 8 \
    --gradient_checkpointing true \
    --learning_rate 0.0002 --warmup_ratio 0.05 --logging_steps 10 \
    --dataloader_num_workers 16 --bf16 true \
    --output_dir outputs/ego4d_lta/live1+ \
    "$@"
