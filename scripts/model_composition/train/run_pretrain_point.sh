#!/bin/bash
# Stage-1 point projector pretrain (reference: run_pretrain_point.sh, lr 2e-3).
set -e
BASE_PATH=$(cd "$(dirname "$0")"; pwd); BASE_PATH=${BASE_PATH%%/scripts*}
cd $BASE_PATH
MODEL_BASE=${MODEL_BASE:-/path/to/vicuna-7b-v1.5}
DATA_FILE=${DATA_FILE:-data/train/pointllm_pretrain_mm_point.json}
POINT_CKPT=${POINT_CKPT:-model/point_bert_v1.2.pt}

python -m modelcompose_tpu.train.train_multimodal \
    --model_name_or_path $MODEL_BASE \
    --version plain \
    --data_path $DATA_FILE \
    --mm_point_encoder $POINT_CKPT \
    --mm_point_projector_type mlp2x_gelu \
    --tune_mm_mlp_adapter True \
    --bf16 True \
    --gradient_checkpointing True \
    --output_dir ./checkpoints/modelcompose-point-pretrain \
    --num_train_epochs 1 \
    --per_device_train_batch_size 16 \
    --learning_rate 2e-3 \
    --warmup_ratio 0.03 \
    --logging_steps 1 \
    --model_max_length 2048
