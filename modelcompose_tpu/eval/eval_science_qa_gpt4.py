"""Score ScienceQA predictions against GPT-4 reference answers.

Rebuild of the reference's ``eval_science_qa_gpt4.py`` (reference:
modelcompose/eval/eval_science_qa_gpt4.py:1-104): both our jsonl
predictions and the GPT-4 result file are parsed for ``The answer is X.``;
an unparseable answer falls back to a random choice index, a failed GPT-4
answer falls back to OUR prediction; prints accuracy, the ours|gpt4 upper
bound, and the GPT-4 parse-failure rate.

Usage: python -m modelcompose_tpu.eval.eval_science_qa_gpt4 \
    --base-dir sqa/ --gpt4-result gpt4.json --our-result ours.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import random
import re
from collections import defaultdict

OPTIONS = ["A", "B", "C", "D", "E"]
_ANSWER_RE = re.compile(r"The answer is ([A-Z]).")


def parse_letter(text: str) -> str:
    res = _ANSWER_RE.findall(text)
    return res[0] if len(res) == 1 else "FAILED"


def get_pred_idx(prediction: str, choices, options=OPTIONS) -> int:
    """Option letter -> choice index; unparsed -> random guess
    (reference: eval_science_qa_gpt4.py:28-35)."""
    if prediction in options[:len(choices)]:
        return options.index(prediction)
    return random.choice(range(len(choices)))


def evaluate(split_problems: dict, our_predictions: dict,
             gpt4_predictions: dict, options=OPTIONS):
    results = defaultdict(lambda: 0)
    for prob_id, prob in split_problems.items():
        if prob_id not in our_predictions or prob_id not in gpt4_predictions:
            continue
        our_answer = parse_letter(our_predictions[prob_id]["text"])
        gpt4_answer = parse_letter(gpt4_predictions[prob_id])

        our_pred_idx = get_pred_idx(our_answer, prob["choices"], options)
        gpt4_pred_idx = get_pred_idx(gpt4_answer, prob["choices"], options)

        if gpt4_answer == "FAILED":
            results["gpt4_failed"] += 1
            gpt4_pred_idx = our_pred_idx  # fall back to our prediction

        if gpt4_pred_idx == prob["answer"]:
            results["correct"] += 1
        else:
            results["incorrect"] += 1

        if gpt4_pred_idx == prob["answer"] or our_pred_idx == prob["answer"]:
            results["correct_upperbound"] += 1
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--base-dir", required=True)
    parser.add_argument("--gpt4-result", required=True)
    parser.add_argument("--our-result", required=True)
    parser.add_argument("--split", default="test")
    args = parser.parse_args()

    split_indices = json.load(
        open(os.path.join(args.base_dir, "pid_splits.json")))[args.split]
    problems = json.load(open(os.path.join(args.base_dir, "problems.json")))
    our_predictions = {p["question_id"]: p for p in
                       (json.loads(line) for line in open(args.our_result))}
    split_problems = {idx: problems[idx] for idx in split_indices}
    gpt4_predictions = json.load(open(args.gpt4_result))["outputs"]

    results = evaluate(split_problems, our_predictions, gpt4_predictions)
    correct = results["correct"]
    total = results["correct"] + results["incorrect"]
    print(f"Total: {total}, Correct: {correct}, "
          f"Accuracy: {correct / total * 100:.2f}%")
    print(f"Total: {total}, Correct (upper): "
          f"{results['correct_upperbound']}, Accuracy: "
          f"{results['correct_upperbound'] / total * 100:.2f}%")
    print(f"Total: {total}, GPT-4 NO-ANS (RANDOM): "
          f"{results['gpt4_failed']}, Percentage: "
          f"{results['gpt4_failed'] / total * 100:.2f}%")


if __name__ == "__main__":
    main()
