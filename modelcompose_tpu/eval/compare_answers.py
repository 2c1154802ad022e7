"""Before/after-merge answer comparison.

Clean rebuild of the reference's interactive ``analysis.py`` (reference:
scripts/model_composition/analysis.py:228-248): given two answer jsonl
files and the gold answers, list the questions a composition fixed and the
ones it broke (EvalAI-normalized comparison).

Usage: python -m modelcompose_tpu.eval.compare_answers \
    --before a.jsonl --after b.jsonl --answers gold.json
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, List, Tuple

from .m4c_evaluator import EvalAIAnswerProcessor


def load_answers_jsonl(path: str) -> Dict:
    answers = [json.loads(line) for line in open(path)]
    return {a["question_id"]: a["text"] for a in answers}


def load_gold(path: str) -> Dict:
    data = json.load(open(path))
    out = {}
    for rec in data:
        qid = rec.get("question_id", rec.get("id"))
        if "conversations" in rec:
            out[qid] = rec["conversations"][-1]["value"]
        else:  # reference avqa-test format ('anser' typo included)
            out[qid] = rec.get("anser", rec.get("answer"))
    return out


def compare(before: Dict, after: Dict, gold: Dict
            ) -> Tuple[List, List]:
    proc = EvalAIAnswerProcessor()
    fixed, broken = [], []
    for qid in before:
        if qid not in after or qid not in gold:
            continue
        ref = proc(str(gold[qid]))
        b = proc(str(before[qid]))
        a = proc(str(after[qid]))
        if ref == a and ref != b:
            fixed.append((qid, ref, before[qid], after[qid]))
        elif ref == b and ref != a:
            broken.append((qid, ref, before[qid], after[qid]))
    return fixed, broken


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--before", required=True)
    parser.add_argument("--after", required=True)
    parser.add_argument("--answers", required=True)
    args = parser.parse_args()
    fixed, broken = compare(load_answers_jsonl(args.before),
                            load_answers_jsonl(args.after),
                            load_gold(args.answers))
    print(f"fixed by composition: {len(fixed)}")
    for qid, ref, b, a in fixed[:20]:
        print(f"  {qid}: gold={ref!r} before={b!r} after={a!r}")
    print(f"broken by composition: {len(broken)}")
    for qid, ref, b, a in broken[:20]:
        print(f"  {qid}: gold={ref!r} before={b!r} after={a!r}")


if __name__ == "__main__":
    main()
