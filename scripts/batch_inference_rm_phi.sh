#!/usr/bin/env bash
# Pairwise batch eval on the bundled sample data — the reference's
# eval/batch_inference_rm_phi.sh smoke check.
set -e
python eval_batch_inference.py \
  --model_type phi3v \
  --pretrain "${PRETRAIN:-microsoft/Phi-3.5-vision-instruct}" \
  --pm_path "${PM_PATH:?set PM_PATH to a reward artifact dir}" \
  --dataset data/sample_test/pairwise_sample.json \
  --image_root . --micro_batch_size 4 "$@"
