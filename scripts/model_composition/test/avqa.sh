#!/bin/bash
# AVQA choice accuracy per modality subset (reference:
# /root/reference/scripts/model_composition/test/avqa.sh).
# Usage: avqa.sh <chunk_list e.g. 0,1,2,3> <CKPT> [MODAL=video] [MODEL_BASE]
DIR=$(cd "$(dirname "$0")"; pwd)
export CHUNK_LIST=$1 CKPT=$2 MODAL=${3:-video} MODEL_BASE=$4
export TASK="AVQA"
export QUESTION_FILE=data/test/avqa-test_mm_${MODAL}.json
export ANN_FILE=data/test/avqa-test_mm_answer.json
export SCORER=eval_avqa
bash $DIR/run_chunked_eval.sh
