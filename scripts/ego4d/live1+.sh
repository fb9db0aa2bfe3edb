#!/usr/bin/env bash
# Ego4D streaming dialogue training, live1+ preset (reference
# scripts/ego4d/live1+.sh; DeepSpeed zero2 -> fsdp_tp shardings).
# Multi-host: run once per TPU-VM worker (jax.distributed auto-init).
python -m videollm_online_tpu.train_entry \
    --live_version live1+ \
    --train_datasets ego4d_goalstep_livechat_trainval ego4d_refined_narration_stream_train ego4d_refined_narration_stream_val robustness \
    --num_train_epochs 2 \
    --per_device_train_batch_size 1 \
    --gradient_accumulation_steps 8 \
    --gradient_checkpointing true \
    --save_strategy no \
    --learning_rate 0.0002 \
    --warmup_ratio 0.05 \
    --logging_steps 10 \
    --dataloader_num_workers 16 \
    --bf16 true \
    --sharding_policy fsdp_tp \
    --output_dir outputs/ego4d_narration+goalstep_livechat+robustness/live1+ \
    "$@"
