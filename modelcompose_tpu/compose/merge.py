"""Offline composition CLI — merge unimodal DAMC checkpoints.

Same CLI surface and semantics as the reference's
``scripts/model_composition/merge_unimodal_modelcompose.py`` (reference:
:28-162), pure numpy:

- ``sum`` / ``mean``: elementwise over aligned keys.
- ``ties-{sum,mean,max}``: trim/elect/disjoint-aggregate shared keys;
  unique keys pass through (reference: :76-93).
- ``online-merge-*``: unique keys pass through; shared keys (which must be
  ``default`` adapters) are renamed ``default-{modal}`` and all kept; the
  suffix is stamped into the merged config — ``online-merge-reset-<spec>``
  writes ``reset_scaling_weights``, anything else writes
  ``merge_default_weights`` (reference: :94-103, :124-129).
- ``convert-<inner>``: upgrade NaiveMC ('same'-strategy) checkpoints to the
  DAMC layout by duplicating 'default' adapter keys per modality, then apply
  <inner> (reference: :42-72).

Outputs ``adapter_model.safetensors`` (+ ``.bin`` when torch is importable,
for reference-toolchain round-trips), a union ``config.json`` with per-modal
``{modal}_lora_{r,alpha}`` stamps, and ``merge_info.txt`` provenance
(reference: :131-144).

Usage:
    python -m modelcompose_tpu.compose.merge ckptA ckptB -o OUT \
        --strategy online-merge-reset-default-vision=0.5,default-audio=0.5
"""

from __future__ import annotations

import argparse
import copy
import json
import os
from collections import defaultdict
from typing import Dict, List

import numpy as np

from .state_io import load_adapter_dir, save_state
from .ties import convert_delta_to_ft, do_merging

# Config keys that identify a checkpoint's modality (reference: :15-21).
MODAL_DICT = {
    "mm_vision_encoder": "vision",
    "mm_vision_tower": "vision",
    "mm_vision2_encoder": "vision2",
    "mm_vision2_tower": "vision2",
    "mm_video_encoder": "video",
    "mm_audio_encoder": "audio",
    "mm_point_encoder": "point",
}


def get_modal_from_config(config: dict) -> str:
    for key, modal in MODAL_DICT.items():
        if isinstance(config.get(key), str) and config[key]:
            return modal
    raise AssertionError("No modality is recognized, please check the config.")


def merge_checkpoints(filepaths: List[str], output_path: str,
                      strategy: str = "sum", K: float = 20) -> None:
    configs = []
    merged_weights = None
    weights_to_merge: Dict[str, List[np.ndarray]] = defaultdict(list)
    for filepath in filepaths:
        adapter = load_adapter_dir(filepath)
        with open(os.path.join(filepath, "config.json")) as f:
            configs.append(json.load(f))
        for key, val in adapter.items():
            weights_to_merge[key].append(val)

    if strategy.startswith("convert-"):
        # NaiveMC ('same') -> DAMC upgrade (reference: :42-72).
        strategy = strategy.replace("convert-", "")
        for config in configs:
            if "lora_strategy" in config:
                assert config["lora_strategy"] == "same"
                config["lora_strategy"] = "modal+language"
        modal_types = [get_modal_from_config(c) for c in configs]
        converted: Dict[str, List[np.ndarray]] = defaultdict(list)
        for key in weights_to_merge:
            if ".default" in key:
                for i, modal in enumerate(modal_types):
                    converted[key.replace("default", modal)].append(
                        copy.deepcopy(weights_to_merge[key][i]))
        if strategy.startswith("drop-"):
            # Shared 'default' keys get TIES-merged; the per-modal copies
            # pass through untouched (reference: :61-69).  The strategy
            # string stays "drop-..." in merge_info.txt.
            merge_func = strategy.replace("drop-", "dis-")
            ft_checks, uniques = convert_delta_to_ft(weights_to_merge)
            merged_weights = do_merging(ft_checks, K=K, merge_func=merge_func)
            merged_weights.update(uniques)
            merged_weights.update({k: v[0] for k, v in converted.items()})
        else:
            weights_to_merge.update(converted)

    if merged_weights is not None:
        pass
    elif strategy.startswith("ties-"):
        func = strategy.replace("ties-", "")
        assert func in ("sum", "mean", "max")
        ft_checks, uniques = convert_delta_to_ft(weights_to_merge)
        merged_weights = do_merging(ft_checks, K=K, merge_func=f"dis-{func}")
        merged_weights.update(uniques)
        strategy = f"dis-{func}-{K}"
        assert sorted(weights_to_merge) == sorted(merged_weights), \
            "the keys should be the same"
    elif strategy.startswith("online-merge-"):
        merged_weights = {}
        modal_names = [get_modal_from_config(c) for c in configs]
        for key, vals in weights_to_merge.items():
            if len(vals) == 1:
                merged_weights[key] = vals[0]
            else:
                assert "default" in key, key
                for modal, w in zip(modal_names, vals):
                    merged_weights[key.replace(
                        "default", f"default-{modal}")] = w
    elif strategy == "sum":
        merged_weights = {k: np.sum(v, axis=0) for k, v in
                          weights_to_merge.items()}
    elif strategy == "mean":
        merged_weights = {k: np.sum(v, axis=0) / len(v) for k, v in
                          weights_to_merge.items()}
    else:
        # the reference prints "DO NOTHING" here with the raise commented
        # out (merge_unimodal_modelcompose.py:114-115) and then writes an
        # EMPTY checkpoint that fails far downstream — raise at the CLI
        raise ValueError(f"Merge strategy [{strategy}] not implemented")

    # Union config; True-ish values win on conflicts (reference: :117-129).
    merged_configs: dict = {}
    for config in configs:
        for key, val in config.items():
            if key in merged_configs:
                merged_configs[key] = merged_configs[key] or val
            else:
                merged_configs[key] = val
        if strategy and strategy.startswith("online-merge-"):
            strategy = strategy.replace("online-merge-", "")
            if strategy.startswith("reset-"):
                merged_configs["reset_scaling_weights"] = strategy.replace(
                    "reset-", "")
            else:
                merged_configs["merge_default_weights"] = strategy

    for config in configs:
        modal = get_modal_from_config(config)
        merged_configs[f"{modal}_lora_alpha"] = config.get("lora_alpha")
        merged_configs[f"{modal}_lora_r"] = config.get("lora_r")

    os.makedirs(output_path, exist_ok=True)
    save_state(merged_weights,
               os.path.join(output_path, "adapter_model.safetensors"))
    try:  # round-trip compatibility with the reference toolchain
        save_state(merged_weights,
                   os.path.join(output_path, "adapter_model.bin"))
    except ImportError:
        pass
    with open(os.path.join(output_path, "config.json"), "w") as f:
        json.dump(merged_configs, f, indent=4)
    with open(os.path.join(output_path, "merge_info.txt"), "w") as f:
        inputs = "\n".join(filepaths)
        f.write(f"Inputs:\n{inputs}\n\nOutput({strategy}):{output_path}")
    print(f"Merged checkpoints saved to {output_path}")


def main():
    parser = argparse.ArgumentParser(
        description="Merge multiple adapter checkpoints")
    parser.add_argument("filepaths", nargs="+")
    parser.add_argument("-o", "--output", default="merged_checkpoint")
    parser.add_argument("--strategy", default="sum")
    parser.add_argument("-K", default=20, type=int,
                        help="K for ties-merging (int, as in the reference "
                             "CLI — keeps the 'dis-mean-20' provenance "
                             "stamp format in merge_info.txt)")
    args = parser.parse_args()
    merge_checkpoints(args.filepaths, args.output, args.strategy, args.K)


if __name__ == "__main__":
    main()
