#!/usr/bin/env bash
# COIN benchmarks finetune (reference scripts/coin/live1+.sh: lr 1e-4,
# epoch checkpoints)
python -m videollm_online_tpu.train_entry \
    --live_version live1+ \
    --train_datasets coin_step_train coin_next_train coin_task_train coin_procedure_train coin_taskprocedure_train \
    --num_train_epochs 6 \
    --gradient_accumulation_steps 8 \
    --gradient_checkpointing true \
    --save_strategy epoch \
    --learning_rate 0.0001 --warmup_ratio 0.05 --logging_steps 10 \
    --dataloader_num_workers 16 --bf16 true \
    --output_dir outputs/coin/live1+ \
    "$@"
