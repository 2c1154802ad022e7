#!/bin/bash
# Stage-2 video DAMC finetune (reference: run_finetune_video_damc.sh —
# LanguageBind 8-frame tower, projector initialized from
# Video-LLaVA-Pretrain-7B).
set -e
BASE_PATH=$(cd "$(dirname "$0")"; pwd); BASE_PATH=${BASE_PATH%%/scripts*}
cd $BASE_PATH
MODEL_BASE=${MODEL_BASE:-/path/to/vicuna-7b-v1.5}
DATA_FILE=${DATA_FILE:-data/train/valley_llavaimage_mm_video_only.json}
VIDEO_TOWER=${VIDEO_TOWER:-model/LanguageBind_Video_merge}
PRETRAIN_ADAPTER_PATH=${PRETRAIN_ADAPTER_PATH:-model/Video-LLaVA-Pretrain-7B/multimodal_video_projector.safetensors}

python -m modelcompose_tpu.train.train_multimodal \
    --lora_strategy modal+language --lora_r 128 --lora_alpha 256 \
    --mm_projector_lr 2e-5 --mm_language_lr 1e-5 \
    --local_prefix_tokens 5 --local_suffix_tokens 5 \
    --model_name_or_path $MODEL_BASE \
    --version v1 \
    --data_path $DATA_FILE \
    --mm_video_encoder $VIDEO_TOWER \
    --mm_video_select_layer -2 \
    --mm_video_projector_type mlp2x_gelu \
    --pretrain_mm_mlp_adapter $PRETRAIN_ADAPTER_PATH \
    --bf16 True \
    --gradient_checkpointing True \
    --output_dir ./checkpoints/modelcompose-video-finetune-damc \
    --num_train_epochs 1 \
    --per_device_train_batch_size 4 \
    --learning_rate 2e-4 \
    --warmup_ratio 0.03 \
    --logging_steps 1 \
    --model_max_length 2048
