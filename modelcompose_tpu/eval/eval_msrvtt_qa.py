"""MSRVTT-QA scorer: substring-match accuracy + cross-model mismatch dump.

Rebuild of the reference's ``eval_msrvtt_qa.py`` (reference:
modelcompose/eval/eval_msrvtt_qa.py:1-87): ground truth is a JSON list of
``{id, conversations}`` (last turn = expected answer); a prediction counts
when the expected answer appears case-insensitively inside the generated
text.  The second mode diffs three answer files (e.g. vision-only /
audio-only / merged) and reports questions only the merged model got —
the composition-win analysis.

Usage: python -m modelcompose_tpu.eval.eval_msrvtt_qa \
    --answers gt.json --output pred.jsonl
"""

from __future__ import annotations

import argparse
import json


def calculate_accuracy(answers_data, output_data, verbose=False):
    answers_by_id = {a["id"]: a["conversations"][-1]["value"]
                     for a in answers_data}
    correct = 0
    total = len(output_data)
    for item in output_data:
        expected = answers_by_id.get(item["question_id"])
        if expected is None:
            continue
        if verbose:
            print(expected.lower(), item["text"].lower())
        if expected.lower() in item["text"].lower():
            correct += 1
    return (correct / total * 100) if total > 0 else 0.0


def find_mismatched_questions(answers_data, x_data, y_data, z_data):
    """Questions where only the merged model (z) contains the expected
    answer (reference: eval_msrvtt_qa.py:33-64)."""
    answers_by_id = {a["id"]: (a["conversations"][0]["value"],
                               a["conversations"][-1]["value"])
                     for a in answers_data}
    mismatched = []
    for x_item, y_item, z_item in zip(x_data, y_data, z_data):
        qid = x_item["question_id"]
        if qid not in answers_by_id:
            continue
        question, expected = answers_by_id[qid]
        exp = expected.lower()
        if exp not in x_item["text"].lower() and \
                exp not in y_item["text"].lower() and \
                exp in z_item["text"].lower():
            mismatched.append({"question": question,
                               "expected_answer": expected,
                               "x": x_item["text"], "y": y_item["text"],
                               "z": z_item["text"]})
    return mismatched


def _load_jsonl(path):
    return [json.loads(line) for line in open(path)]


def main():
    parser = argparse.ArgumentParser(
        description="Calculate accuracy based on answers and output.")
    parser.add_argument("--answers", required=True)
    parser.add_argument("--output", required=False)
    parser.add_argument("--x", required=False)
    parser.add_argument("--y", required=False)
    parser.add_argument("--z", required=False)
    args = parser.parse_args()

    answers_data = json.load(open(args.answers))
    if args.output is not None:
        acc = calculate_accuracy(answers_data, _load_jsonl(args.output),
                                 verbose=True)
        print(f"Accuracy: {acc:.2f}%")
    else:
        mismatched = find_mismatched_questions(
            answers_data, _load_jsonl(args.x), _load_jsonl(args.y),
            _load_jsonl(args.z))
        print("Mismatched Questions:")
        for q in mismatched:
            print(f"[Question]: {q['question']}")
            print(f"[Expected Answer]: {q['expected_answer']}")
            print(f"[Vision Answer]: {q['x']}")
            print(f"[Audio  Answer]: {q['y']}")
            print(f"[Merged Answer]: {q['z']}")
            print()


if __name__ == "__main__":
    main()
