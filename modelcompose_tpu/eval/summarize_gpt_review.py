"""Summarize GPT pairwise-review jsonls into per-category relative scores.

Rebuild of the reference's aggregator (reference:
modelcompose/eval/summarize_gpt_review.py): per review file, group score
tuples by category, print ``category  ratio%  score1x10  score2x10`` where
ratio = mean(score2)/mean(score1)*100 — the LLaVA-bench relative metric.

Usage: python -m modelcompose_tpu.eval.summarize_gpt_review \
    -d reviews_dir [-f file.jsonl ...] [-s select ...] [-i ignore_qid ...]
"""

from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict

import numpy as np


def summarize_file(path, ignore=()):
    """-> {category: (ratio_pct, mean1_x10, mean2_x10)} (reference:
    summarize_gpt_review.py:40-59)."""
    scores = defaultdict(list)
    with open(path) as f:
        for line in f:
            review = json.loads(line)
            if review.get("question_id") in ignore:
                continue
            pair = review.get("tuple", review.get("scores",
                                                  review.get("score")))
            if "category" in review:
                scores[review["category"]].append(pair)
            scores["all"].append(pair)
    out = {}
    for k, v in sorted(scores.items()):
        stats = np.asarray(v, dtype=np.float64).mean(0)
        out[k] = (round(float(stats[1] / stats[0]) * 100, 1),
                  round(float(stats[0]) * 10, 1),
                  round(float(stats[1]) * 10, 1))
    return out


def main():
    parser = argparse.ArgumentParser(
        description="ChatGPT-based QA evaluation.")
    parser.add_argument("-d", "--dir", default=None)
    parser.add_argument("-f", "--files", nargs="*", default=[])
    parser.add_argument("-s", "--select", nargs="*", default=None)
    parser.add_argument("-i", "--ignore", nargs="*", default=[])
    args = parser.parse_args()
    ignore = {int(x) for x in args.ignore}

    if args.files:
        review_files = args.files
    else:
        review_files = [x for x in os.listdir(args.dir)
                        if x.endswith(".jsonl") and "review" in x]
    for review_file in sorted(review_files):
        config = os.path.basename(review_file).replace(".jsonl", "")
        if args.select is not None and \
                any(x not in config for x in args.select):
            continue
        path = os.path.join(args.dir, review_file) if args.dir else \
            review_file
        print(config)
        for k, (ratio, s1, s2) in summarize_file(path, ignore).items():
            print(k, ratio, s1, s2)
        print("=" * 17)


if __name__ == "__main__":
    main()
