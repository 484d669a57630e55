#!/bin/bash
# DPG-Bench + GenEval generation for BitDance-14B-64x
# (parity with reference scripts/eval/eval_bitdance_14b_64x.sh: DPG cfg 7.5,
#  GenEval cfg 13.0 w/ long prompts, both 50 steps at 1024x1024)
set -e
MODEL_PATH=${1:-models/BitDance-14B-64x}

python -m bitdance_tpu.eval.dpg \
  --model_path "$MODEL_PATH" \
  --data_path eval_assets/dpg/prompts.json \
  --save_dir results/dpg \
  --guidance_scale 7.5 --num_sampling_steps 50 --image_size 1024 1024

python -m bitdance_tpu.eval.geneval \
  --model_path "$MODEL_PATH" \
  --data_path eval_assets/geneval/evaluation_metadata_long.jsonl \
  --save_dir results/geneval \
  --guidance_scale 13.0 --num_sampling_steps 50 --image_size 1024 1024
