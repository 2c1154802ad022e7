#!/bin/bash
# MCUB-3 (each 3-modal combination) (reference: MCUB-3.sh).
# Usage: MCUB-3.sh <chunk_list> <CKPT> <COMBO e.g. image+audio+video> [MODEL_BASE]
DIR=$(cd "$(dirname "$0")"; pwd)
export CHUNK_LIST=$1 CKPT=$2 MODAL=$3 MODEL_BASE=$4
export TASK="MCUB-3"
export QUESTION_FILE=data/test/MCUB-3_${MODAL}.json
export ANN_FILE=data/test/MCUB-answer.json
export SCORER=eval_avqa
bash $DIR/run_chunked_eval.sh
