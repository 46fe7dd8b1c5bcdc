#!/usr/bin/env bash
# Qwen2.5-VL pairwise batch eval — the reference's
# eval/batch_inference_rm_qwen.sh equivalent (add --cls_based for
# non-pairwise classification datasets).
set -e
python eval_batch_inference.py \
  --model_type qwen \
  --pretrain "${PRETRAIN:-Qwen/Qwen2.5-VL-7B-Instruct}" \
  --pm_path "${PM_PATH:?set PM_PATH to a reward artifact dir}" \
  --dataset "${DATASET:-data/sample_test/pairwise_sample.json}" \
  --image_root . --max_samples 500000 --micro_batch_size 1 "$@"
