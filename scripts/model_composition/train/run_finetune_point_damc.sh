#!/bin/bash
# Stage-2 point-cloud DAMC finetune (reference: run_finetune_point_damc.sh —
# PointBERT v1.2, 8192x6 npy inputs).
set -e
BASE_PATH=$(cd "$(dirname "$0")"; pwd); BASE_PATH=${BASE_PATH%%/scripts*}
cd $BASE_PATH
MODEL_BASE=${MODEL_BASE:-/path/to/vicuna-7b-v1.5}
DATA_FILE=${DATA_FILE:-data/train/pointllm_mm_point.json}
POINT_CKPT=${POINT_CKPT:-model/point_bert_v1.2.pt}
PRETRAIN_ADAPTER_PATH=${PRETRAIN_ADAPTER_PATH:-checkpoints/modelcompose-point-pretrain/mm_projector.safetensors}

python -m modelcompose_tpu.train.train_multimodal \
    --lora_strategy modal+language --lora_r 128 --lora_alpha 256 \
    --mm_projector_lr 2e-5 --mm_language_lr 1e-5 \
    --local_prefix_tokens 5 --local_suffix_tokens 5 \
    --model_name_or_path $MODEL_BASE \
    --version v1 \
    --data_path $DATA_FILE \
    --mm_point_encoder $POINT_CKPT \
    --mm_point_projector_type mlp2x_gelu \
    --pretrain_mm_mlp_adapter $PRETRAIN_ADAPTER_PATH \
    --bf16 True \
    --gradient_checkpointing True \
    --output_dir ./checkpoints/modelcompose-point-finetune-damc \
    --num_train_epochs 1 \
    --per_device_train_batch_size 4 \
    --learning_rate 2e-4 \
    --warmup_ratio 0.03 \
    --logging_steps 1 \
    --model_max_length 2048
