#!/usr/bin/env bash
# LLaVA-v1.6-vicuna-13B LoRA reward training — mirrors the reference's
# scripts/run_train_rm_single_lora_llava.sh configs (BT / GPM / CLS variants
# selected via flags; the GPM config shown here is its middle block).
set -e
python train_llava_reward.py \
  --model_type llava \
  --pretrain "${PRETRAIN:-llava-hf/llava-v1.6-vicuna-13b-hf}" \
  --dataset "${DATASET:-data/imagereward_train.json}" \
  --image_root "${IMAGE_ROOT:-.}" \
  --is_general_preference --value_head_dim 2 --general_preference_tau 0.1 \
  --freeze_vision_model --ft_projector \
  --lora_rank 128 --lora_alpha 256 --lora_dropout 0.05 \
  --bf16 --gradient_checkpointing --flash_attn \
  --micro_train_batch_size 1 --accumulated_gradient 1 \
  --learning_rate 2e-4 --max_epochs 1 --max_len 2048 \
  --zero_stage 2 --group_size 1 --train_split_ratio 1 \
  --save_best_model 2 --save_steps 500 --logging_steps 1 \
  --save_path ./ckpt/llava16_rm --ckpt_path ./ckpt/llava16_rm/resume "$@"
