#!/usr/bin/env bash
# One-command real-weights accuracy-parity runbook (BASELINE.md gate #4).
#
# Blocked in the build environment (no released weights, no network, no
# sentencepiece); this script is the ready-to-run closure for the day a
# machine has them.  It (a) merges the released per-modality ModelCompose
# checkpoints with the paper's equal coefficients, (b) runs the SAME
# AVQA + MCUB-4 eval harness this repo ships (identical CLI/jsonl to the
# reference's scripts/model_composition/test/avqa.sh:41-71), and
# (c) diffs answers jsonl-for-jsonl against the reference stack's output.
#
# Preconditions (pass as env vars):
#   CKPT_ROOT   dir with the released unimodal DAMC checkpoints, e.g.
#               $CKPT_ROOT/{vision,audio,video,point}  (HF Adu2021/ModelCompose)
#   VICUNA      Vicuna-7B v1.5 base dir (HF safetensors + tokenizer.model)
#   DATA_ROOT   eval data root: data/test/avqa-test_mm_*.json, MCUB json,
#               and the referenced media files (symlink into ./data)
#   REF_ANSWERS (optional) dir with the reference stack's merge_*.jsonl
#               answer files, produced by running the reference's own
#               avqa.sh / MCUB-4.sh on GPU with the same CKPT_ROOT.
#               When absent, step (c) is skipped and our answers are
#               left under ./playground/data/eval/answers for later diff.
#   MODALS      modality subsets for AVQA (default: the paper's seven)
#
# Everything this calls is tested: merge CLI (tests/test_composition_e2e),
# the loaders/scorers (tests/test_eval*), the chunked harness shells
# (verified file-by-file vs the reference), and the differ + this glue
# (tests/test_parity_runbook.py dry run).
set -euo pipefail
cd "$(dirname "$0")/.."

# PARITY_DRY_RUN=1: print each command instead of executing (lets the
# test suite pin the constructed CLI — e.g. the checkpoint list — without
# weights present)
run() { if [ -n "${PARITY_DRY_RUN:-}" ]; then echo "DRYRUN: $*"; else "$@"; fi; }

: "${CKPT_ROOT:?set CKPT_ROOT to the released checkpoints dir}"
: "${VICUNA:?set VICUNA to the Vicuna-7B v1.5 base dir}"
: "${DATA_ROOT:?set DATA_ROOT to the eval data root}"
MODALS=${MODALS:-"audio image video image+audio image+video video+audio video+image+audio"}
# absolute path: run_chunked_eval.sh prefixes ./checkpoints/ onto
# relative CKPT args
MERGED=${MERGED:-$(pwd)/checkpoints/merged-multimodal-parity}

# (dry-run leaves the repo untouched — no symlink)
[ -n "${PARITY_DRY_RUN:-}" ] || [ -e data ] || ln -s "$DATA_ROOT" data

# (a) compose: equal-coefficient online-merge-reset over the available
# unimodal checkpoints (paper protocol: 1/n per modality, README.md:83-91)
mods=()
for m in vision audio video point; do
  [ -d "$CKPT_ROOT/$m" ] && mods+=("$m")
done
n=${#mods[@]}
[ "$n" -ge 2 ] || { echo "need >=2 unimodal checkpoints in $CKPT_ROOT"; exit 2; }
coef=$(python -c "print(1.0/$n)")
strategy="online-merge-reset-$(printf "default-%s=${coef}," "${mods[@]}" | sed 's/,$//')"
# NB: expand the root once per modality (printf would recycle a 2-slot
# format across leftover args and pair checkpoints with each other)
root=$(cd "$CKPT_ROOT" && pwd)
ckpts=""
for m in "${mods[@]}"; do ckpts+=" $root/$m"; done
echo "[parity] merging:$ckpts -> $MERGED ($strategy)"
run python -m modelcompose_tpu.compose.merge \
    $ckpts -o "$MERGED" --strategy "$strategy"

# (b) the shipped chunked harness — one chunk per run on a single chip
for MODAL in $MODALS; do
  run bash scripts/model_composition/test/avqa.sh 0 "$MERGED" "$MODAL" "$VICUNA"
done
run bash scripts/model_composition/test/MCUB-4.sh 0 "$MERGED" "$VICUNA"

# (c) answer-for-answer diff vs the reference stack
ANS_CKPT=$(basename "$MERGED")
OURS=./playground/data/eval/answers/$ANS_CKPT
if [ -n "${REF_ANSWERS:-}" ]; then
  fail=0
  for f in "$OURS"/AVQA/merge_*.jsonl "$OURS"/MCUB-4/merge*.jsonl; do
    rel=${f#"$OURS"/}
    ref="$REF_ANSWERS/$rel"
    if [ ! -f "$ref" ]; then echo "[parity] MISSING ref $rel"; fail=1; continue; fi
    echo "[parity] diff $rel"
    python scripts/diff_answers.py "$f" "$ref" || fail=1
  done
  exit $fail
else
  echo "[parity] REF_ANSWERS not set — our answers are under $OURS;"
  echo "         run the reference's avqa.sh/MCUB-4.sh on GPU, then"
  echo "         re-run with REF_ANSWERS=<their answers dir> to diff."
fi
