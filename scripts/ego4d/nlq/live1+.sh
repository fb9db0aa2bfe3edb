#!/usr/bin/env bash
# NLQ temporal grounding as streaming (data/ego4d/nlq.py)
python -m videollm_online_tpu.train_entry \
    --live_version live1+ \
    --train_datasets ego4d_nlq_stream_train \
    --eval_datasets ego4d_nlq_stream_val \
    --num_train_epochs 2 \
    --gradient_accumulation_steps 8 \
    --gradient_checkpointing true \
    --learning_rate 0.0002 --warmup_ratio 0.05 --logging_steps 10 \
    --dataloader_num_workers 16 --bf16 true \
    --output_dir outputs/ego4d_nlq/live1+ \
    "$@"
