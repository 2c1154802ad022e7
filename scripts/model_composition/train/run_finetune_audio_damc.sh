#!/bin/bash
# Stage-2 audio DAMC finetune (reference:
# run_finetune_audio_damc.sh — BEATs tower + qformer_32N_2L, lr 1e-5).
set -e
BASE_PATH=$(cd "$(dirname "$0")"; pwd); BASE_PATH=${BASE_PATH%%/scripts*}
cd $BASE_PATH
MODEL_BASE=${MODEL_BASE:-/path/to/vicuna-7b-v1.5}
DATA_FILE=${DATA_FILE:-data/train/audio_caption_mm_audio.json}
BEATS_CKPT=${BEATS_CKPT:-model/BEATs_iter3_plus_AS2M.pt}
PRETRAIN_ADAPTER_PATH=${PRETRAIN_ADAPTER_PATH:-checkpoints/modelcompose-audio-pretrain/mm_projector.safetensors}

python -m modelcompose_tpu.train.train_multimodal \
    --lora_strategy modal+language --lora_r 128 --lora_alpha 256 \
    --mm_projector_lr 2e-5 --mm_language_lr 1e-5 \
    --local_prefix_tokens 5 --local_suffix_tokens 5 \
    --model_name_or_path $MODEL_BASE \
    --version v1 \
    --data_path $DATA_FILE \
    --mm_audio_encoder $BEATS_CKPT \
    --mm_audio_projector_type qformer_32N_2L \
    --pretrain_mm_mlp_adapter $PRETRAIN_ADAPTER_PATH \
    --bf16 True \
    --gradient_checkpointing True \
    --output_dir ./checkpoints/modelcompose-audio-finetune-damc \
    --num_train_epochs 1 \
    --per_device_train_batch_size 16 \
    --learning_rate 1e-5 \
    --warmup_ratio 0.03 \
    --logging_steps 1 \
    --model_max_length 2048
