#!/usr/bin/env bash
# Narration-only streaming training, live1 preset (reference
# scripts/ego4d/narration/live1.sh: zero2, 2 epochs, lr 2e-4, accum 8).
python -m videollm_online_tpu.train_entry \
    --live_version live1 \
    --train_datasets ego4d_narration_stream_train \
    --eval_datasets ego4d_narration_stream_val \
    --num_train_epochs 2 \
    --per_device_train_batch_size 1 \
    --gradient_accumulation_steps 8 \
    --gradient_checkpointing true \
    --learning_rate 0.0002 --warmup_ratio 0.05 --logging_steps 10 \
    --dataloader_num_workers 16 --bf16 true \
    --output_dir outputs/ego4d_narration_train/live1 \
    "$@"
