#!/usr/bin/env bash
# COIN evaluation (reference scripts/coin/live1+_evaluate.sh)
python -m videollm_online_tpu.evaluate_entry \
    --live_version live1+ \
    --eval_datasets coin_step_test coin_next_test coin_task_test coin_procedure_test coin_taskprocedure_test \
    --output_dir outputs/coin/live1+ \
    --resume_from_checkpoint outputs/coin/live1+ \
    "$@"
