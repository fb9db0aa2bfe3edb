#!/usr/bin/env bash
# live1 preset: 1 CLS token/frame, 1h @2fps streams (reference scripts/ego4d/live1.sh)
python -m videollm_online_tpu.train_entry \
    --live_version live1 \
    --train_datasets ego4d_refined_narration_stream_train ego4d_refined_narration_stream_val robustness \
    --num_train_epochs 2 \
    --per_device_train_batch_size 1 \
    --gradient_accumulation_steps 8 \
    --gradient_checkpointing true \
    --learning_rate 0.0002 --warmup_ratio 0.05 --logging_steps 10 \
    --dataloader_num_workers 16 --bf16 true \
    --output_dir outputs/ego4d_narration/live1 \
    "$@"
