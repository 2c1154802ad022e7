"""Score ScienceQA with a GPT-4 requery pass layered over our predictions.

Rebuild of the reference's ``eval_science_qa_gpt4_requery.py`` (reference:
modelcompose/eval/eval_science_qa_gpt4_requery.py:1-149): three answer
sources per problem — ours, GPT-4, and a requery file; the final
per-problem prediction is the requery answer when it parses, else ours,
and a result JSON (``acc``/``correct``/``count``/``results``) is written.

Usage: python -m modelcompose_tpu.eval.eval_science_qa_gpt4_requery \
    --base-dir sqa/ --gpt4-result gpt4.json --requery-result rq.jsonl \
    --our-result ours.jsonl --output-result out.json
"""

from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict

from .eval_science_qa_gpt4 import OPTIONS, get_pred_idx, parse_letter


def evaluate(split_problems: dict, our_predictions: dict,
             requery_predictions: dict, gpt4_predictions: dict,
             options=OPTIONS, verbose: bool = False):
    results = defaultdict(lambda: 0)
    sqa_results = {"acc": None, "correct": None, "count": None,
                   "results": {}, "outputs": {}}

    for prob_id, prob in split_problems.items():
        assert prob_id in our_predictions, prob_id
        assert prob_id in gpt4_predictions, prob_id
        our_pred = our_predictions[prob_id]["text"]
        gpt4_pred = gpt4_predictions[prob_id]
        if prob_id not in requery_predictions:
            results["missing_requery"] += 1
            requery_pred = "MISSING"
        else:
            requery_pred = requery_predictions[prob_id]["text"]

        our_answer = parse_letter(our_pred)
        requery_answer = parse_letter(requery_pred)
        gpt4_answer = parse_letter(gpt4_pred)

        our_pred_idx = get_pred_idx(our_answer, prob["choices"], options)
        gpt4_pred_idx = get_pred_idx(gpt4_answer, prob["choices"], options)
        requery_pred_idx = get_pred_idx(requery_answer, prob["choices"],
                                        options)

        results["total"] += 1

        if gpt4_answer == "FAILED":
            results["gpt4_failed"] += 1
            if gpt4_pred_idx == prob["answer"]:
                results["gpt4_correct"] += 1
            if our_pred_idx == prob["answer"]:
                results["gpt4_ourvisual_correct"] += 1
        elif gpt4_pred_idx == prob["answer"]:
            results["gpt4_correct"] += 1
            results["gpt4_ourvisual_correct"] += 1

        if our_pred_idx == prob["answer"]:
            results["our_correct"] += 1

        if requery_answer == "FAILED":
            sqa_results["results"][prob_id] = our_pred_idx
            if our_pred_idx == prob["answer"]:
                results["requery_correct"] += 1
        else:
            sqa_results["results"][prob_id] = requery_pred_idx
            if requery_pred_idx == prob["answer"]:
                results["requery_correct"] += 1
            elif verbose:
                print(f"Question ({options[prob['answer']]}): "
                      f"{our_predictions[prob_id]['prompt']}\n"
                      f"Our ({our_answer}): {our_pred}\n"
                      f"GPT-4 ({gpt4_answer}): {gpt4_pred}\n"
                      f"Requery ({requery_answer}): {requery_pred}\n"
                      "=====================================")

        if gpt4_pred_idx == prob["answer"] or our_pred_idx == prob["answer"]:
            results["correct_upperbound"] += 1

    total = results["total"]
    sqa_results["acc"] = results["requery_correct"] / total * 100
    sqa_results["correct"] = results["requery_correct"]
    sqa_results["count"] = total
    return results, sqa_results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--base-dir", required=True)
    parser.add_argument("--gpt4-result", required=True)
    parser.add_argument("--requery-result", required=True)
    parser.add_argument("--our-result", required=True)
    parser.add_argument("--output-result", required=True)
    parser.add_argument("--split", default="test")
    args = parser.parse_args()

    split_indices = json.load(
        open(os.path.join(args.base_dir, "pid_splits.json")))[args.split]
    problems = json.load(open(os.path.join(args.base_dir, "problems.json")))
    our_predictions = {p["question_id"]: p for p in
                       (json.loads(line) for line in open(args.our_result))}
    requery_predictions = {
        p["question_id"]: p for p in
        (json.loads(line) for line in open(args.requery_result))}
    split_problems = {idx: problems[idx] for idx in split_indices}
    gpt4_predictions = json.load(open(args.gpt4_result))["outputs"]

    results, sqa_results = evaluate(split_problems, our_predictions,
                                    requery_predictions, gpt4_predictions,
                                    verbose=True)
    total = results["total"]
    for label, key in [("Our-Correct", "our_correct"),
                       ("GPT-4-Correct", "gpt4_correct"),
                       ("GPT-4 NO-ANS (RANDOM)", "gpt4_failed"),
                       ("GPT-4-OursVisual-Correct", "gpt4_ourvisual_correct"),
                       ("Requery-Correct", "requery_correct"),
                       ("Correct upper", "correct_upperbound")]:
        word = "Percentage" if key == "gpt4_failed" else "Accuracy"
        print(f"Total: {total}, {label}: {results[key]}, "
              f"{word}: {results[key] / total * 100:.2f}%")

    with open(args.output_result, "w") as f:
        json.dump(sqa_results, f, indent=2)


if __name__ == "__main__":
    main()
