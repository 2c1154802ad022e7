"""Score aggregation across eval output dirs (reference:
scripts/model_composition/collect_scores.py:7-60): scrape score*.txt files
under playground/data/eval/answers/{ckpt}/{task}/ into one table."""

from __future__ import annotations

import argparse
import os
import re
from pathlib import Path

ACC_RE = re.compile(r".*[Aa]ccuracy: (\d+\.?\d*)%")


def parse_scores(score_path: Path) -> str:
    all_scores = {}
    for fn in sorted(os.listdir(score_path)):
        if not fn.endswith(".txt"):
            continue
        try:
            lines = open(score_path / fn).read().strip().split("\n")
            for line in reversed(lines):
                m = ACC_RE.match(line)
                if m:
                    all_scores[fn.replace("score", "").strip("_")[:-4]
                               or "score"] = m.group(1)
                    break
        except OSError:
            pass
    if not all_scores:
        return "None"
    if len(all_scores) == 1:
        return next(iter(all_scores.values()))
    return " ".join(f"{v}({k})" for k, v in all_scores.items())


def collect(answer_dir: str):
    rows = []
    root = Path(answer_dir)
    for ckpt in sorted(os.listdir(root)):
        ckpt_dir = root / ckpt
        if not ckpt_dir.is_dir():
            continue
        for task in sorted(os.listdir(ckpt_dir)):
            task_dir = ckpt_dir / task
            if task_dir.is_dir():
                rows.append((ckpt, task, parse_scores(task_dir)))
    return rows


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--answer-dir", type=str,
                        default="./playground/data/eval/answers")
    args = parser.parse_args()
    rows = collect(args.answer_dir)
    width = max((len(r[0]) for r in rows), default=10)
    for ckpt, task, score in rows:
        print(f"{ckpt:<{width}}  {task:<16} {score}")


if __name__ == "__main__":
    main()
