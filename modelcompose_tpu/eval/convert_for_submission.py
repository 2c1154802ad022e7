"""Benchmark submission/eval-format converters — one CLI, six formats.

Consolidates the reference's per-benchmark converter scripts (reference:
scripts/convert_gqa_for_eval.py, convert_mmvet_for_eval.py,
convert_vizwiz_for_submission.py, convert_vqav2_for_submission.py,
convert_seed_for_submission.py, convert_mmbench_for_submission.py) into
subcommands with the same output formats:

  python -m modelcompose_tpu.eval.convert_for_submission gqa \
      --src answers.jsonl --dst testdev_balanced_predictions.json
  ... mmvet --src a.jsonl --dst results.json
  ... vizwiz --annotation-file test.jsonl --result-file a.jsonl \
      --result-upload-file upload.json
  ... vqav2  (same flags; missing question ids get empty answers)
  ... seed --annotation-file SEED-Bench.json --result-file a.jsonl
      (prints per-type and total accuracy for the image split)
  ... mmbench --annotation-file dev.tsv --result-dir DIR \
      --upload-dir OUT --experiment NAME
"""

from __future__ import annotations

import argparse
import json
import os

from .m4c_evaluator import EvalAIAnswerProcessor


def _read_jsonl(path):
    rows, errors = [], 0
    for line in open(path):
        try:
            rows.append(json.loads(line))
        except json.JSONDecodeError:
            errors += 1
    return rows, errors


def convert_gqa(src: str, dst: str) -> list:
    """jsonl answers -> GQA eval list (reference: convert_gqa_for_eval.py)."""
    out = [{"questionId": r["question_id"],
            "prediction": r["text"].rstrip(".").lower()}
           for r in _read_jsonl(src)[0]]
    with open(dst, "w") as f:
        json.dump(out, f)
    return out


def convert_mmvet(src: str, dst: str) -> dict:
    """jsonl -> {'v1_{qid}': text} (reference: convert_mmvet_for_eval.py)."""
    out = {f'v1_{r["question_id"]}': r["text"]
           for r in _read_jsonl(src)[0]}
    with open(dst, "w") as f:
        json.dump(out, f, indent=2)
    return out


def convert_vizwiz(annotation_file: str, result_file: str,
                   result_upload_file: str) -> list:
    """EvalAI-normalized {'image', 'answer'} per test row (reference:
    convert_vizwiz_for_submission.py — every test id must be answered)."""
    results, _ = _read_jsonl(result_file)
    results = {r["question_id"]: r["text"] for r in results}
    proc = EvalAIAnswerProcessor()
    out = []
    for x in _read_jsonl(annotation_file)[0]:
        if x["question_id"] not in results:
            raise KeyError(f"missing answer for {x['question_id']}")
        out.append({"image": x["image"],
                    "answer": proc(results[x["question_id"]])})
    os.makedirs(os.path.dirname(result_upload_file) or ".", exist_ok=True)
    with open(result_upload_file, "w") as f:
        json.dump(out, f)
    return out


def convert_vqav2(annotation_file: str, result_file: str,
                  result_upload_file: str) -> list:
    """{'question_id', 'answer'} per test row, empty for missing ids
    (reference: convert_vqav2_for_submission.py)."""
    results, errors = _read_jsonl(result_file)
    results = {r["question_id"]: r["text"] for r in results}
    proc = EvalAIAnswerProcessor()
    out = []
    for x in _read_jsonl(annotation_file)[0]:
        out.append({"question_id": x["question_id"],
                    "answer": proc(results[x["question_id"]])
                    if x["question_id"] in results else ""})
    os.makedirs(os.path.dirname(result_upload_file) or ".", exist_ok=True)
    with open(result_upload_file, "w") as f:
        json.dump(out, f)
    return out


def seed_accuracy(annotation_file: str, result_file: str,
                  eval_only_type: str = "image") -> dict:
    """Per-question-type + total accuracy for SEED-Bench (reference:
    convert_seed_for_submission.py eval_single)."""
    data = json.load(open(annotation_file))
    type_names = {i: n for n, i in data["question_type"].items()}
    results = {}
    for r in _read_jsonl(result_file)[0]:
        results[r["question_id"]] = r
    type_counts: dict = {}
    correct: dict = {}
    for q in data["questions"]:
        if eval_only_type is not None and q["data_type"] != eval_only_type:
            continue
        t = q["question_type_id"]
        type_counts[t] = type_counts.get(t, 0) + 1
        try:
            qid = int(q["question_id"])
        except (TypeError, ValueError):
            qid = q["question_id"]
        if qid not in results:
            correct[t] = correct.get(t, 0)
            continue
        if results[qid]["text"] == q["answer"]:
            correct[t] = correct.get(t, 0) + 1
        else:
            correct[t] = correct.get(t, 0)
    per_type = {type_names[t]: round(correct[t] / type_counts[t] * 100, 2)
                for t in sorted(type_counts)}
    total = round(sum(correct.values()) / max(sum(type_counts.values()), 1)
                  * 100, 2)
    return {"per_type": per_type, "total": total}


def convert_mmbench(annotation_file: str, result_dir: str, upload_dir: str,
                    experiment: str) -> str:
    """MMBench upload table: the dev TSV minus metadata columns plus a
    'prediction' column (reference: convert_mmbench_for_submission.py —
    which writes xlsx via pandas/openpyxl; absent those, a TSV with the
    same columns is written)."""
    import csv

    with open(annotation_file) as f:
        csv.field_size_limit(2 ** 31 - 1)  # base64 image cells
        reader = csv.DictReader(f, delimiter="\t")
        rows = list(reader)
        drop = {"hint", "category", "source", "image", "comment",
                "l2-category"}
        cols = [c for c in reader.fieldnames if c not in drop]
    preds = {}
    with open(os.path.join(result_dir, f"{experiment}.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            preds[str(r["question_id"])] = r["text"]
    os.makedirs(upload_dir, exist_ok=True)
    out_path = os.path.join(upload_dir, f"{experiment}.tsv")
    with open(out_path, "w", newline="") as f:
        writer = csv.writer(f, delimiter="\t")
        writer.writerow(cols + ["prediction"])
        for row in rows:
            writer.writerow([row[c] for c in cols]
                            + [preds.get(str(row["index"]), "")])
    return out_path


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="benchmark", required=True)
    for name in ("gqa", "mmvet"):
        p = sub.add_parser(name)
        p.add_argument("--src", required=True)
        p.add_argument("--dst", required=True)
    for name in ("vizwiz", "vqav2"):
        p = sub.add_parser(name)
        p.add_argument("--annotation-file", required=True)
        p.add_argument("--result-file", required=True)
        p.add_argument("--result-upload-file", required=True)
    p = sub.add_parser("seed")
    p.add_argument("--annotation-file", required=True)
    p.add_argument("--result-file", required=True)
    p.add_argument("--eval-only-type", default="image")
    p = sub.add_parser("mmbench")
    p.add_argument("--annotation-file", required=True)
    p.add_argument("--result-dir", required=True)
    p.add_argument("--upload-dir", required=True)
    p.add_argument("--experiment", required=True)
    args = parser.parse_args()

    if args.benchmark == "gqa":
        convert_gqa(args.src, args.dst)
    elif args.benchmark == "mmvet":
        convert_mmvet(args.src, args.dst)
    elif args.benchmark == "vizwiz":
        convert_vizwiz(args.annotation_file, args.result_file,
                       args.result_upload_file)
    elif args.benchmark == "vqav2":
        convert_vqav2(args.annotation_file, args.result_file,
                      args.result_upload_file)
    elif args.benchmark == "seed":
        scores = seed_accuracy(args.annotation_file, args.result_file,
                               args.eval_only_type)
        for name, acc in scores["per_type"].items():
            print(f"{name}: {acc:.2f}%")
        print(f"Total Accuracy: {scores['total']:.2f}%")
    elif args.benchmark == "mmbench":
        convert_mmbench(args.annotation_file, args.result_dir,
                        args.upload_dir, args.experiment)


if __name__ == "__main__":
    main()
