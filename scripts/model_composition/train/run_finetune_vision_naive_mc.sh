#!/bin/bash
# NaiveMC variant: one shared adapter (reference:
# run_finetune_vision_naive_mc.sh — only --lora_strategy same differs).
set -e
DIR=$(cd "$(dirname "$0")"; pwd)
export EXTRA_STRATEGY=same
BASE_PATH=${DIR%%/scripts*}
cd $BASE_PATH
MODEL_BASE=${MODEL_BASE:-/path/to/vicuna-7b-v1.5}
DATA_FILE=${DATA_FILE:-data/train/llava_v1_5_mix665k_mm_vision_image_only.json}
PRETRAIN_ADAPTER_PATH=${PRETRAIN_ADAPTER_PATH:-checkpoints/modelcompose-vision-pretrain/mm_projector.safetensors}

python -m modelcompose_tpu.train.train_multimodal \
    --lora_strategy same --lora_r 128 --lora_alpha 256 \
    --mm_projector_lr 2e-5 \
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
    --output_dir ./checkpoints/modelcompose-vision-finetune-naive-mc \
    --num_train_epochs 1 \
    --per_device_train_batch_size 4 \
    --learning_rate 2e-4 \
    --warmup_ratio 0.03 \
    --logging_steps 1 \
    --model_max_length 2048
