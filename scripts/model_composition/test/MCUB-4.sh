#!/bin/bash
# MCUB-4 (image+audio+video+point) choice accuracy (reference: MCUB-4.sh).
# Usage: MCUB-4.sh <chunk_list> <CKPT> [MODEL_BASE]
DIR=$(cd "$(dirname "$0")"; pwd)
export CHUNK_LIST=$1 CKPT=$2 MODEL_BASE=$3 MODAL=""
export TASK="MCUB-4"
export QUESTION_FILE=data/test/MCUB-4.json
export ANN_FILE=data/test/MCUB-answer.json
export SCORER=eval_avqa
bash $DIR/run_chunked_eval.sh
