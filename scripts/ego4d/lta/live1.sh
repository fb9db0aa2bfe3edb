#!/usr/bin/env bash
# Long-term action anticipation finetune, live1 preset (reference
# scripts/ego4d/lta/live1.sh: zero1, 6 epochs, lr 2e-4, accum 8).
python -m videollm_online_tpu.train_entry \
    --live_version live1 \
    --train_datasets ego4d_lta_train \
    --eval_datasets ego4d_lta_test_unannotated \
    --num_train_epochs 6 \
    --per_device_train_batch_size 1 \
    --gradient_accumulation_steps 8 \
    --gradient_checkpointing true \
    --learning_rate 0.0002 --warmup_ratio 0.05 --logging_steps 10 \
    --dataloader_num_workers 16 --bf16 true \
    --output_dir outputs/ego4d_lta_train/live1 \
    "$@"
