#!/bin/bash
# Stage-2 vision DAMC finetune (reference hyperparameters:
# /root/reference/scripts/model_composition/train/run_finetune_vision_damc.sh).
set -e
BASE_PATH=$(cd "$(dirname "$0")"; pwd); BASE_PATH=${BASE_PATH%%/scripts*}
cd $BASE_PATH
MODEL_BASE=${MODEL_BASE:-/path/to/vicuna-7b-v1.5}
DATA_FILE=${DATA_FILE:-data/train/llava_v1_5_mix665k_mm_vision_image_only.json}
PRETRAIN_ADAPTER_PATH=${PRETRAIN_ADAPTER_PATH:-checkpoints/modelcompose-vision-pretrain/mm_projector.safetensors}

python -m modelcompose_tpu.train.train_multimodal \
    --lora_strategy modal+language --lora_r 128 --lora_alpha 256 \
    --mm_projector_lr 2e-5 --mm_language_lr 1e-5 \
    --local_prefix_tokens 5 --local_suffix_tokens 5 \
    --model_name_or_path $MODEL_BASE \
    --version v1 \
    --data_path $DATA_FILE \
    --mm_vision_encoder openai/clip-vit-large-patch14-336 \
    --mm_vision_select_layer -2 \
    --pretrain_mm_mlp_adapter $PRETRAIN_ADAPTER_PATH \
    --mm_projector_type mlp2x_gelu \
    --image_aspect_ratio pad \
    --group_by_modality_length False \
    --bf16 True \
    --gradient_checkpointing True \
    --output_dir ./checkpoints/modelcompose-vision-finetune-damc \
    --num_train_epochs 1 \
    --per_device_train_batch_size 4 \
    --save_steps 50000 \
    --learning_rate 2e-4 \
    --weight_decay 0. \
    --warmup_ratio 0.03 \
    --logging_steps 1 \
    --model_max_length 2048
