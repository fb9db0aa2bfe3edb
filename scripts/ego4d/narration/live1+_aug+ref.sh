#!/usr/bin/env bash
# Refined-narration trainval + frame-dropout augmentation, live1+ preset
# (reference scripts/ego4d/narration/live1+_aug+ref.sh: refined train+val
# splits both used for training, --augmentation True, zero2, 2 epochs).
python -m videollm_online_tpu.train_entry \
    --live_version live1+ \
    --train_datasets ego4d_refined_narration_stream_train ego4d_refined_narration_stream_val \
    --num_train_epochs 2 \
    --per_device_train_batch_size 1 \
    --gradient_accumulation_steps 8 \
    --gradient_checkpointing true \
    --learning_rate 0.0002 --warmup_ratio 0.05 --logging_steps 10 \
    --dataloader_num_workers 16 --bf16 true \
    --augmentation true \
    --output_dir outputs/ego4d_refined_narration_stream_trainval+augmentation/live1+ \
    "$@"
