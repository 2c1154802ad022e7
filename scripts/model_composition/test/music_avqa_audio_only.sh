#!/bin/bash
# MUSIC-AVQA (audio_only) EvalAI-normalized accuracy (reference:
# music_avqa_audio_only.sh).  Usage: <chunk_list> <CKPT> [MODEL_BASE]
DIR=$(cd "$(dirname "$0")"; pwd)
export CHUNK_LIST=$1 CKPT=$2 MODEL_BASE=$3 MODAL="audio_only"
export TASK="MUSIC-AVQA"
export QUESTION_FILE=data/test/music_avqa_mm_audio_only.json
export ANN_FILE=data/test/music_avqa_answer.json
export SCORER=eval_music_avqa
bash $DIR/run_chunked_eval.sh
