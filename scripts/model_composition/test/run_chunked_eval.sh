#!/bin/bash
# Shared chunked-eval harness (reference pattern:
# /root/reference/scripts/model_composition/test/avqa.sh:41-71): split the
# question file into N chunks, run one eval process per chunk (on TPU one
# chip serves all chunks, so chunks mainly bound memory per process; the
# loader itself batches), concatenate the answer jsonls, score.
#
# Args (env): CHUNK_LIST CKPT MODEL_BASE TASK QUESTION_FILE ANN_FILE \
#             SCORER (eval_avqa|eval_music_avqa) [MODAL]
set -ex

BASE_PATH=$(cd "$(dirname "$0")"; pwd)
BASE_PATH=${BASE_PATH%%/scripts*}
cd $BASE_PATH

IFS=',' read -ra CHUNK_IDS <<< "$CHUNK_LIST"
CHUNKS=${#CHUNK_IDS[@]}

if [[ "$CKPT" != /* ]]; then
    CKPT="./checkpoints/$CKPT"
fi
ANS_CKPT=$(basename $CKPT)
OUT_DIR=./playground/data/eval/answers/$ANS_CKPT/$TASK
mkdir -p "$OUT_DIR"

SUFFIX=${MODAL:+_$MODAL}
SCORE_FILE=$OUT_DIR/score$SUFFIX.txt

for IDX in "${CHUNK_IDS[@]}"; do
    COMMAND="python -m modelcompose_tpu.eval.model_multimodal_qa_loader \
        --model-path $CKPT \
        --model-base ${MODEL_BASE:-None} \
        --question-file $QUESTION_FILE \
        --answers-file $OUT_DIR/${CHUNKS}_${IDX}.jsonl \
        --num-chunks $CHUNKS \
        --chunk-idx $IDX \
        --temperature 0 \
        --conv-mode vicuna_v1"
    if [ $CHUNKS -gt 1 ]; then
        eval $COMMAND &
    else
        eval $COMMAND
    fi
done
wait

output_file=$OUT_DIR/merge$SUFFIX.jsonl
> "$output_file"
for IDX in "${CHUNK_IDS[@]}"; do
    cat $OUT_DIR/${CHUNKS}_${IDX}.jsonl >> "$output_file"
done

python -m modelcompose_tpu.eval.$SCORER --answers $ANN_FILE --output $output_file | tee $SCORE_FILE
