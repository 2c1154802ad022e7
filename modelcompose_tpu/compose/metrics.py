"""Merge-interference diagnostics (L2 / cosine / soft-sign dissimilarity).

Numpy rebuild of the reference's ``calculate_metrics.py`` (reference:
scripts/model_composition/calculate_metrics.py:28-77); reads the
``merge_info.txt`` provenance written by the merge CLI and writes
``merge_metrics.txt`` next to the merged checkpoint.
"""

from __future__ import annotations

import argparse
import os
import re
from collections import defaultdict
from pathlib import Path

import numpy as np

from .state_io import load_adapter_dir
from .ties import convert_delta_to_ft, state_dict_to_vector, topk_values_mask


def parse_merge_info(file):
    pattern = r"Inputs:\n(.*?)\n\nOutput\((.*?)\):(.*?)$"
    match = re.search(pattern, open(file).read().strip(), re.DOTALL)
    if match:
        return match.group(1).split("\n"), match.group(2), match.group(3)
    return None, None, None


def l2_distance(xy: np.ndarray) -> float:
    return float(np.sqrt(((xy[0] - xy[1]) ** 2).sum()))


def cosine_dissimilarity(xy: np.ndarray) -> float:
    a, b = xy[0], xy[1]
    return float(1 - (a @ b) / max(np.linalg.norm(a) * np.linalg.norm(b),
                                   1e-30))


def soft_sign_dissimilarity(xy: np.ndarray) -> float:
    abs_sum = np.abs(xy).sum(axis=0)
    xy_sum = xy.sum(axis=0)
    mask = abs_sum != 0
    return float(1 - np.abs(xy_sum[mask] / abs_sum[mask]).mean())


def calculate_metrics(merged_ckpt: str, reset_thresh: float = 50):
    filepaths, _, _ = parse_merge_info(Path(merged_ckpt) / "merge_info.txt")
    weights = defaultdict(list)
    for fp in filepaths:
        for k, v in load_adapter_dir(fp).items():
            weights[k].append(np.asarray(v, np.float32))
    ft_checks, _ = convert_delta_to_ft(weights)
    flat = np.stack([state_dict_to_vector(c) for c in ft_checks])
    trimmed = topk_values_mask(flat, K=reset_thresh)

    results = {
        "L2": l2_distance(flat),
        "Cosine": cosine_dissimilarity(flat),
        "SSD": soft_sign_dissimilarity(flat),
        "TSSD": soft_sign_dissimilarity(trimmed),
    }
    with open(Path(merged_ckpt) / "merge_metrics.txt", "w") as f:
        for k, v in results.items():
            f.write(f"{k}: {v}\n")
            print(f"{k}: {v}\n")
    return results


def main():
    parser = argparse.ArgumentParser(
        description="Calculate parameter interference metrics")
    parser.add_argument("merged_ckpt")
    parser.add_argument("--reset-thresh", type=float, default=50)
    args = parser.parse_args()
    calculate_metrics(args.merged_ckpt, args.reset_thresh)


if __name__ == "__main__":
    main()
