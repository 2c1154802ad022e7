"""Cross-modal retrieval evaluation by LM scoring.

Plays the role of the reference's retrieval evals (reference:
modelcompose/eval/eval_audioclip_mm.py and eval_msrvtt_mm.py — ad-hoc
generate-over-candidates scripts): for each media clip, score every
candidate caption by the model's masked CE over the answer span and report
Recall@{1,5,10} and median rank of the gold caption.

Question file format:
  [{"id", "conversations": [...prompt with modal token...],
    "modal_inputs": {...}, "candidates": ["caption a", "caption b", ...],
    "gold": 0}]

Usage: python -m modelcompose_tpu.eval.retrieval --model-path ckpt \
    --model-base vicuna --question-file msrvtt_retrieval.json
"""

from __future__ import annotations

import argparse
import copy
import json
import os
from typing import Dict, List

import numpy as np

from ..data import conversation as conversation_lib
from ..data.conversation import conv_templates
from ..data.dataset import DataCollatorForSupervisedDataset
from ..data.preprocess import preprocess


def rank_candidates(model, tokenizer, record: dict, modal_processors,
                    batch_size: int = 8) -> List[float]:
    """CE loss of each candidate caption as the assistant answer."""
    collator = DataCollatorForSupervisedDataset(
        tokenizer, modal_processors,
        {"vision": {"image_aspect_ratio": "pad"}})
    losses = []
    base_convs = record["conversations"]
    # load + decode the media ONCE per record: only the candidate answer
    # text changes per iteration — reloading inside the loop re-ran the
    # PIL decode and the encoder tower per CANDIDATE (~1000x redundant
    # tower forwards per MSRVTT clip)
    media = _load_media(record)
    for cand in record["candidates"]:
        convs = copy.deepcopy(base_convs)
        if len(convs) == 1:
            convs.append({"from": "gpt", "value": cand})
        else:
            convs[-1]["value"] = cand
        data = preprocess([convs], tokenizer, has_image=True)
        sample = {"input_ids": data["input_ids"][0],
                  "labels": data["labels"][0],
                  "modal_inputs": media}
        batch = collator([sample])
        loss = model.loss(batch["input_ids"], batch["labels"],
                          batch.get("modal_inputs", {}))
        losses.append(float(loss))
    return losses


def _load_media(record):
    from ..data.dataset import MultimodalDataset
    return MultimodalDataset.get_modal_inputs(
        dict(record.get("modal_inputs", {})))


def recall_metrics(ranks: List[int]) -> Dict[str, float]:
    arr = np.asarray(ranks)
    n = max(len(arr), 1)
    return {
        "R@1": float((arr < 1).mean()) * 100,
        "R@5": float((arr < 5).mean()) * 100,
        "R@10": float((arr < 10).mean()) * 100,
        "MedR": float(np.median(arr) + 1) if len(arr) else float("nan"),
    }


def eval_retrieval(args, loaded=None) -> Dict[str, float]:
    if loaded is None:
        from ..models.loader import load_pretrained_model
        model_name = os.path.basename(args.model_path.rstrip("/"))
        loaded = load_pretrained_model(args.model_path, args.model_base,
                                       model_name)
    tokenizer, model, modal_processors, _ = loaded
    conversation_lib.default_conversation = conv_templates[args.conv_mode]
    tokenizer.pad_token_id = tokenizer.eos_token_id

    records = json.load(open(args.question_file))
    ranks = []
    for rec in records:
        losses = rank_candidates(model, tokenizer, rec, modal_processors)
        order = np.argsort(losses)  # lower loss = better match
        rank = int(np.where(order == rec.get("gold", 0))[0][0])
        ranks.append(rank)
    metrics = recall_metrics(ranks)
    for k, v in metrics.items():
        print(f"{k}: {v:.2f}")
    return metrics


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", required=True)
    parser.add_argument("--model-base", default=None)
    parser.add_argument("--question-file", required=True)
    parser.add_argument("--conv-mode", default="vicuna_v1")
    args = parser.parse_args()
    eval_retrieval(args)


if __name__ == "__main__":
    main()
