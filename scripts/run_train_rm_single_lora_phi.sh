#!/usr/bin/env bash
# Phi-3.5-V GPM LoRA reward training — mirrors the reference's
# scripts/run_train_rm_single_lora_phi.sh config (README.md:78-108):
# LoRA r=128 a=256, SkipCA, GPM dim-2, bf16, grad ckpt, cosine+3% warmup.
set -e
PRETRAIN=${PRETRAIN:-microsoft/Phi-3.5-vision-instruct}
DATASET=${DATASET:-data/imagereward_train.json}
python train_llava_reward.py \
  --model_type phi3v \
  --pretrain "$PRETRAIN" \
  --dataset "$DATASET" \
  --image_root "${IMAGE_ROOT:-.}" \
  --is_general_preference --value_head_dim 2 --general_preference_tau 0.1 \
  --add_cross_attention --ft_projector \
  --lora_rank 128 --lora_alpha 256 --lora_dropout 0.05 \
  --bf16 --gradient_checkpointing --flash_attn \
  --micro_train_batch_size 4 --accumulated_gradient 4 \
  --learning_rate 2e-4 --max_norm 1.0 --max_epochs 2 \
  --zero_stage 3 --seq_len 2944 \
  --save_path ./ckpt/phi35v_rm --ckpt_path ./ckpt/phi35v_rm/resume \
  --logging_steps 10 --save_steps 500 "$@"

# Pointwise safety-classifier (CLS) variant — the reference keeps this as a
# commented config (run_train_rm_single_lora_phi.sh:63-92: value_head_dim 1,
# UnsafeBench pointwise data). Synthetic UnsafeBench-schema data ships at
# data/Unsafebench/ (regenerate at any scale: data/gen_safety_fixtures.py):
#   DATASET=data/Unsafebench/Unsafebench_cap_train.json IMAGE_ROOT=data \
#     scripts/run_train_rm_single_lora_phi.sh --cls_based --value_head_dim 1
