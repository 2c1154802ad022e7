#!/bin/bash
# Projector-only finetune variant (reference:
# run_finetune_vision_proj_only.sh — no LoRA, tune_mm_mlp_adapter True).
set -e
BASE_PATH=$(cd "$(dirname "$0")"; pwd); BASE_PATH=${BASE_PATH%%/scripts*}
cd $BASE_PATH
MODEL_BASE=${MODEL_BASE:-/path/to/vicuna-7b-v1.5}
DATA_FILE=${DATA_FILE:-data/train/llava_v1_5_mix665k_mm_vision_image_only.json}
PRETRAIN_ADAPTER_PATH=${PRETRAIN_ADAPTER_PATH:-checkpoints/modelcompose-vision-pretrain/mm_projector.safetensors}

python -m modelcompose_tpu.train.train_multimodal \
    --tune_mm_mlp_adapter True \
    --model_name_or_path $MODEL_BASE \
    --version v1 \
    --data_path $DATA_FILE \
    --mm_vision_encoder openai/clip-vit-large-patch14-336 \
    --mm_vision_select_layer -2 \
    --pretrain_mm_mlp_adapter $PRETRAIN_ADAPTER_PATH \
    --mm_projector_type mlp2x_gelu \
    --image_aspect_ratio pad \
    --bf16 True \
    --gradient_checkpointing True \
    --output_dir ./checkpoints/modelcompose-vision-finetune-proj-only \
    --num_train_epochs 1 \
    --per_device_train_batch_size 4 \
    --learning_rate 2e-5 \
    --warmup_ratio 0.03 \
    --logging_steps 1 \
    --model_max_length 2048
