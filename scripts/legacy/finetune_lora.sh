#!/bin/bash
# Legacy LLaVA LoRA finetune (reference: /root/reference/scripts/
# finetune_lora.sh) — one shared adapter, the 'same' strategy here.
set -e
BASE_PATH=$(cd "$(dirname "$0")"; pwd); BASE_PATH=${BASE_PATH%%/scripts*}
cd $BASE_PATH
MODEL_BASE=${MODEL_BASE:-/path/to/vicuna-7b}
DATA_FILE=${DATA_FILE:-data/llava_instruct_80k.json}

# NOTE: legacy LLaVA data ({'image': ..., 'conversations': ...})
# must first be converted to the modal_inputs format:
#   python -m modelcompose_tpu.data.convert_to_multimodal \
#     --input llava_data.json --output $DATA_FILE --media-root <image_folder>
python -m modelcompose_tpu.train.train_multimodal \
    --model_name_or_path $MODEL_BASE \
    --version v1 \
    --data_path $DATA_FILE \
    --mm_vision_encoder openai/clip-vit-large-patch14 \
    --mm_vision_select_layer -2 \
    --pretrain_mm_mlp_adapter ./checkpoints/llava-pretrain/mm_projector.bin \
    --lora_strategy same \
    --bf16 True \
    --gradient_checkpointing True \
    --output_dir ./checkpoints/llava-finetune_lora \
    --num_train_epochs 1 \
    --per_device_train_batch_size 16 \
    --save_steps 50000 \
    --learning_rate 2e-5 \
    --weight_decay 0. \
    --warmup_ratio 0.03 \
    --logging_steps 1 \
    --model_max_length 2048
