#!/bin/bash
# Stage-1 vision projector pretrain (reference hyperparameters:
# /root/reference/scripts/model_composition/train/run_pretrain_vision.sh).
set -e
BASE_PATH=$(cd "$(dirname "$0")"; pwd); BASE_PATH=${BASE_PATH%%/scripts*}
cd $BASE_PATH
MODEL_BASE=${MODEL_BASE:-/path/to/vicuna-7b-v1.5}
DATA_FILE=${DATA_FILE:-data/train/blip_laion_cc_sbu_558k_mm_vision.json}

python -m modelcompose_tpu.train.train_multimodal \
    --model_name_or_path $MODEL_BASE \
    --version plain \
    --data_path $DATA_FILE \
    --mm_vision_encoder openai/clip-vit-large-patch14-336 \
    --mm_projector_type mlp2x_gelu \
    --tune_mm_mlp_adapter True \
    --bf16 True \
    --gradient_checkpointing True \
    --output_dir ./checkpoints/modelcompose-vision-pretrain \
    --num_train_epochs 1 \
    --per_device_train_batch_size 32 \
    --save_steps 24000 \
    --learning_rate 1e-3 \
    --weight_decay 0. \
    --warmup_ratio 0.03 \
    --logging_steps 1 \
    --model_max_length 2048
