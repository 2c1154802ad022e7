#!/bin/bash
# ScienceQA chunked eval fan-out (reference: /root/reference/scripts/
# sqa_eval_batch.sh — one background process per chunk; here chunks are
# CPU-process shards against the one-chip TPU relay, or use
# run_chunked_eval.sh for the mesh-sharded single-process path).
set -e
CHUNKS=${CHUNKS:-8}
MODEL_PATH=${MODEL_PATH:-./checkpoints/llava-finetune_sqa-multimodal}
SQA_DIR=${SQA_DIR:-data/scienceqa}

for IDX in $(seq 0 $((CHUNKS-1))); do
    python -m modelcompose_tpu.eval.model_vqa_science \
        --model-path $MODEL_PATH \
        --question-file $SQA_DIR/llava_test_QCM-LEA.json \
        --image-folder $SQA_DIR/images/test \
        --answers-file ./sqa-chunk${IDX}.jsonl \
        --num-chunks $CHUNKS \
        --chunk-idx $IDX \
        --single-pred-prompt \
        --conv-mode llava_v1 &
done
wait
