#!/bin/bash
# Stage-1 audio Q-Former pretrain (reference: run_pretrain_audio.sh, lr 1e-4).
set -e
BASE_PATH=$(cd "$(dirname "$0")"; pwd); BASE_PATH=${BASE_PATH%%/scripts*}
cd $BASE_PATH
MODEL_BASE=${MODEL_BASE:-/path/to/vicuna-7b-v1.5}
DATA_FILE=${DATA_FILE:-data/train/audio_pretrain_mm_audio.json}
BEATS_CKPT=${BEATS_CKPT:-model/BEATs_iter3_plus_AS2M.pt}

python -m modelcompose_tpu.train.train_multimodal \
    --model_name_or_path $MODEL_BASE \
    --version plain \
    --data_path $DATA_FILE \
    --mm_audio_encoder $BEATS_CKPT \
    --mm_audio_projector_type qformer_32N_2L \
    --tune_mm_mlp_adapter True \
    --bf16 True \
    --gradient_checkpointing True \
    --output_dir ./checkpoints/modelcompose-audio-pretrain \
    --num_train_epochs 1 \
    --per_device_train_batch_size 16 \
    --learning_rate 1e-4 \
    --warmup_ratio 0.03 \
    --logging_steps 1 \
    --model_max_length 2048
