#!/bin/bash
# Gather ScienceQA eval chunks and score (reference: /root/reference/
# scripts/sqa_eval_gather.sh).
set -e
CHUNKS=${CHUNKS:-8}
SQA_DIR=${SQA_DIR:-data/scienceqa}
output_file=${OUTPUT_FILE:-sqa-answers.jsonl}

> "$output_file"
for idx in $(seq 0 $((CHUNKS-1))); do
  cat "./sqa-chunk${idx}.jsonl" >> "$output_file"
done

python -m modelcompose_tpu.eval.eval_science_qa \
    --base-dir $SQA_DIR \
    --result-file "$output_file" \
    --output-file sqa_output.json \
    --output-result sqa_result.json
