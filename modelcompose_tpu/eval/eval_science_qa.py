"""ScienceQA multiple-choice scorer (reference: modelcompose/eval/
eval_science_qa.py): parse the predicted option letter ('A', 'A. ...', or
'The answer is X.'), report overall and multimodal accuracy."""

from __future__ import annotations

import argparse
import json
import os
import re

OPTIONS = ["A", "B", "C", "D", "E"]


def parse_answer(pred_text: str, options=OPTIONS) -> str:
    if pred_text in options:
        return pred_text
    if len(pred_text) >= 3 and pred_text[0] in options and \
            pred_text[1:3] == ". ":
        return pred_text[0]
    res = re.compile(r"The answer is ([A-Z]).").findall(pred_text)
    if len(res) == 1:
        return res[0]
    return "FAILED"


def get_pred_idx(prediction: str, choices, options=OPTIONS) -> int:
    if prediction in options[:len(choices)]:
        return options.index(prediction)
    return -1


def evaluate(problems: dict, split_indices, predictions: dict,
             options=OPTIONS):
    results = {"correct": [], "incorrect": []}
    sqa = {"results": {}, "outputs": {}}
    for prob_id in split_indices:
        prob = problems[prob_id]
        pred = predictions.get(prob_id, {"text": "FAILED",
                                         "prompt": "Unknown"})
        answer = parse_answer(pred["text"], options)
        pred_idx = get_pred_idx(answer, prob["choices"], options)
        analysis = {
            "question_id": prob_id,
            "parsed_ans": answer,
            "ground_truth": options[prob["answer"]],
            "question": pred.get("prompt", ""),
            "pred": pred["text"],
            "is_multimodal": "<image>" in pred.get("prompt", ""),
        }
        sqa["results"][prob_id] = pred_idx
        sqa["outputs"][prob_id] = pred["text"]
        if pred_idx == prob["answer"]:
            results["correct"].append(analysis)
        else:
            results["incorrect"].append(analysis)

    correct = len(results["correct"])
    total = correct + len(results["incorrect"])
    mm = [x for x in results["correct"] + results["incorrect"]
          if x["is_multimodal"]]
    mm_correct = len([x for x in results["correct"] if x["is_multimodal"]])
    sqa["acc"] = correct / max(total, 1) * 100
    sqa["correct"] = correct
    sqa["count"] = total
    print(f"Total: {total}, Correct: {correct}, "
          f"Accuracy: {sqa['acc']:.2f}%, "
          f"IMG-Accuracy: {mm_correct / max(len(mm), 1) * 100:.2f}%")
    return results, sqa


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--base-dir", type=str, required=True)
    parser.add_argument("--result-file", type=str, required=True)
    parser.add_argument("--output-file", type=str, default=None)
    parser.add_argument("--output-result", type=str, default=None)
    parser.add_argument("--split", type=str, default="test")
    args = parser.parse_args()

    split_indices = json.load(
        open(os.path.join(args.base_dir, "pid_splits.json")))[args.split]
    problems = json.load(open(os.path.join(args.base_dir, "problems.json")))
    predictions = {p["question_id"]: p for p in
                   (json.loads(l) for l in open(args.result_file))}
    results, sqa = evaluate(problems, split_indices, predictions)
    if args.output_file:
        json.dump(results, open(args.output_file, "w"), indent=2)
    if args.output_result:
        json.dump(sqa, open(args.output_result, "w"), indent=2)


if __name__ == "__main__":
    main()
