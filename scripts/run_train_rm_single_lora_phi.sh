#!/usr/bin/env bash
# Phi-3.5-V GPM LoRA reward training — mirrors the reference's
# scripts/run_train_rm_single_lora_phi.sh config (README.md:78-108):
# LoRA r=128 a=256, SkipCA, GPM dim-2, bf16, grad ckpt, cosine+3% warmup.
#
# CLS=1 selects the pointwise safety-classifier variant the reference keeps
# as a commented config (run_train_rm_single_lora_phi.sh:63-92): it drops
# --is_general_preference (the CLS/BT eval path must not route through the
# GPM dim-2 scoring) and uses value_head_dim 1 + --cls_based.
set -e
PRETRAIN=${PRETRAIN:-microsoft/Phi-3.5-vision-instruct}
DATASET=${DATASET:-data/imagereward_train.json}
if [ "${CLS:-0}" = "1" ]; then
  HEAD_FLAGS=(--cls_based --value_head_dim 1)
else
  HEAD_FLAGS=(--is_general_preference --value_head_dim 2 --general_preference_tau 0.1)
fi
python train_llava_reward.py \
  --model_type phi3v \
  --pretrain "$PRETRAIN" \
  --dataset "$DATASET" \
  --image_root "${IMAGE_ROOT:-.}" \
  "${HEAD_FLAGS[@]}" \
  --add_cross_attention --ft_projector \
  --lora_rank 128 --lora_alpha 256 --lora_dropout 0.05 \
  --bf16 --gradient_checkpointing --flash_attn \
  --micro_train_batch_size 4 --accumulated_gradient 4 \
  --learning_rate 2e-4 --max_norm 1.0 --max_epochs 2 \
  --zero_stage 3 --seq_len 2944 \
  --save_path ./ckpt/phi35v_rm --ckpt_path ./ckpt/phi35v_rm/resume \
  --logging_steps 10 --save_steps 500 "$@"

# CLS example — synthetic UnsafeBench-schema data ships at data/Unsafebench/
# (regenerate at any scale: data/gen_safety_fixtures.py):
#   CLS=1 DATASET=data/Unsafebench/Unsafebench_cap_train.json IMAGE_ROOT=data \
#     scripts/run_train_rm_single_lora_phi.sh
