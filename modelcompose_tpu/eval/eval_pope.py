"""POPE yes/no hallucination scorer (reference: modelcompose/eval/
eval_pope.py): first-sentence yes/no normalization, then TP/FP/TN/FN,
accuracy/precision/recall/F1 per category."""

from __future__ import annotations

import argparse
import json
import os


def normalize_answer(text: str) -> str:
    if text.find(".") != -1:
        text = text.split(".")[0]
    text = text.replace(",", "")
    words = text.split(" ")
    return "no" if ("No" in words or "not" in words or "no" in words) \
        else "yes"


def eval_pope(answers, label_file, verbose: bool = True):
    label_list = [json.loads(q)["label"] for q in open(label_file)]
    preds = [0 if normalize_answer(a["text"]) == "no" else 1
             for a in answers]
    labels = [0 if l == "no" else 1 for l in label_list]

    TP = sum(p == 1 and l == 1 for p, l in zip(preds, labels))
    FP = sum(p == 1 and l == 0 for p, l in zip(preds, labels))
    TN = sum(p == 0 and l == 0 for p, l in zip(preds, labels))
    FN = sum(p == 0 and l == 1 for p, l in zip(preds, labels))
    precision = TP / max(TP + FP, 1)
    recall = TP / max(TP + FN, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)
    # confusion-matrix total, like the reference (eval_pope.py:56) — a
    # preds/labels length mismatch must not silently deflate accuracy
    acc = (TP + TN) / max(TP + TN + FP + FN, 1)
    yes_ratio = preds.count(1) / max(len(preds), 1)
    if verbose:
        print("TP\tFP\tTN\tFN\t")
        print(f"{TP}\t{FP}\t{TN}\t{FN}")
        print(f"Accuracy: {acc}")
        print(f"Precision: {precision}")
        print(f"Recall: {recall}")
        print(f"F1 score: {f1}")
        print(f"Yes ratio: {yes_ratio}")
    return {"accuracy": acc, "precision": precision, "recall": recall,
            "f1": f1, "yes_ratio": yes_ratio}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--annotation-dir", type=str, required=True)
    parser.add_argument("--question-file", type=str, required=True)
    parser.add_argument("--result-file", type=str, required=True)
    args = parser.parse_args()
    questions = [json.loads(line) for line in open(args.question_file)]
    questions = {q["question_id"]: q for q in questions}
    answers = [json.loads(line) for line in open(args.result_file)]
    for file in os.listdir(args.annotation_dir):
        if not (file.startswith("coco_pope_") and file.endswith(".json")):
            continue
        category = file[10:-5]
        cur = [a for a in answers
               if questions[a["question_id"]]["category"] == category]
        print(f'Category: {category}, # samples: {len(cur)}')
        eval_pope(cur, os.path.join(args.annotation_dir, file))
        print("====================================")


if __name__ == "__main__":
    main()
