"""Mean-loss evaluation: average CE of gold answers under the model.

Rebuild of the reference's ``model_vqa_loss.py`` (reference:
modelcompose/eval/model_vqa_loss.py:98-134) generalized to all modalities:
for each sample the conversation (with the gold answer) is preprocessed with
answer-span labels, and the mean masked CE across the dataset is reported.

Usage: python -m modelcompose_tpu.eval.model_multimodal_loss \
    --model-path ckpt --model-base vicuna --question-file qa.json
"""

from __future__ import annotations

import argparse
import os


from ..data import conversation as conversation_lib
from ..data.conversation import conv_templates
from ..data.dataset import (ChunkedMultimodalDataset,
                            DataCollatorForSupervisedDataset)
from ..models.loader import load_pretrained_model


def eval_loss(args, loaded=None):
    if loaded is None:
        model_name = os.path.basename(args.model_path.rstrip("/"))
        loaded = load_pretrained_model(args.model_path, args.model_base,
                                       model_name)
    tokenizer, model, modal_processors, _ = loaded
    conversation_lib.default_conversation = conv_templates[args.conv_mode]
    tokenizer.pad_token_id = tokenizer.eos_token_id

    dataset = ChunkedMultimodalDataset(
        args.question_file, tokenizer, None, modal_processors,
        num_chunks=args.num_chunks, chunk_idx=args.chunk_idx)
    collator = DataCollatorForSupervisedDataset(
        tokenizer, modal_processors,
        {"vision": {"image_aspect_ratio": "pad"}})

    total, count = 0.0, 0
    B = args.batch_size
    for start in range(0, len(dataset), B):
        batch = collator([dataset[i] for i in
                          range(start, min(start + B, len(dataset)))])
        loss = model.loss(batch["input_ids"], batch["labels"],
                          batch.get("modal_inputs", {}))
        total += float(loss) * len(batch["input_ids"])
        count += len(batch["input_ids"])
    mean = total / max(count, 1)
    print(mean)
    return mean


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", type=str, required=True)
    parser.add_argument("--model-base", type=str, default=None)
    parser.add_argument("--question-file", type=str, required=True)
    parser.add_argument("--conv-mode", type=str, default="vicuna_v1")
    parser.add_argument("--num-chunks", type=int, default=1)
    parser.add_argument("--chunk-idx", type=int, default=0)
    parser.add_argument("--batch-size", type=int, default=1)
    args = parser.parse_args()
    eval_loss(args)


if __name__ == "__main__":
    main()
