"""Batched-loader VQA eval: media decode overlapped with generation.

Rebuild of the reference's ``model_vqa_loader.py`` (reference:
modelcompose/eval/model_vqa_loader.py:1-153) — the variant whose torch
DataLoader workers decode/tokenize the NEXT sample while the current one
generates.  Here the same overlap comes from ``data.loader.PrefetchLoader``
threads.  Differences from ``model_vqa.py``: questions may carry a LIST of
images per row, and ``--no_add_image_token`` serves rows whose prompt
already contains the modal token.

Usage: python -m modelcompose_tpu.eval.model_vqa_loader \
    --model-path ckpt --model-base vicuna --question-file q.jsonl \
    --image-folder imgs --answers-file out.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import uuid

import numpy as np

from ..data import conversation as conversation_lib
from ..data.conversation import conv_templates
from ..data.dataset import get_chunk
from ..data.loader import PrefetchLoader
from ..data.tokenization import tokenizer_modal_token


class _QuestionDataset:
    """(input_ids, image_batch) per question row (reference:
    model_vqa_loader.py:30-67)."""

    def __init__(self, questions, image_folder, tokenizer, processor,
                 conv_mode, add_image_token=True):
        self.questions = questions
        self.image_folder = image_folder
        self.tokenizer = tokenizer
        self.processor = processor
        self.conv_mode = conv_mode
        self.add_image_token = add_image_token

    def __len__(self):
        return len(self.questions)

    def __getitem__(self, index):
        from PIL import Image
        from ..data.image_processing import process_images

        line = self.questions[index]
        qs = line["text"]
        image_file = line["image"]
        files = image_file if isinstance(image_file, list) else [image_file]
        if self.add_image_token:
            qs = "<image>\n" * len(files) + qs
        conv = conv_templates[self.conv_mode].copy()
        conv.append_message(conv.roles[0], qs)
        conv.append_message(conv.roles[1], None)
        ids = np.asarray(tokenizer_modal_token(conv.get_prompt(),
                                               self.tokenizer), np.int64)
        imgs = [Image.open(os.path.join(self.image_folder, fn))
                .convert("RGB") for fn in files]
        pixels = process_images(imgs, self.processor,
                                image_aspect_ratio="pad")
        return ids, pixels


def eval_model(args, loaded=None):
    if loaded is None:
        from ..models.loader import load_pretrained_model
        model_name = os.path.basename(args.model_path.rstrip("/"))
        loaded = load_pretrained_model(args.model_path, args.model_base,
                                       model_name)
    tokenizer, model, processors, _ = loaded
    conversation_lib.default_conversation = conv_templates[args.conv_mode]
    model_id = os.path.basename(args.model_path.rstrip("/"))

    questions = [json.loads(line) for line in open(args.question_file)]
    questions = get_chunk(questions, args.num_chunks, args.chunk_idx)
    os.makedirs(os.path.dirname(args.answers_file) or ".", exist_ok=True)

    from .generation_utils import stop_str_for
    stop_str = stop_str_for(conv_templates[args.conv_mode])

    dataset = _QuestionDataset(questions, args.image_folder, tokenizer,
                               processors["vision"], args.conv_mode,
                               add_image_token=not args.no_add_image_token)
    loader = PrefetchLoader(dataset, range(len(dataset)), batch_size=1,
                            collate=lambda xs: xs[0],
                            num_workers=args.num_workers)

    import jax
    rng = jax.random.PRNGKey(0)
    with open(args.answers_file, "w") as ans_file:
        for (ids, pixels), line in zip(loader, questions):
            rng, sub = jax.random.split(rng)
            tokens = model.generate(
                [ids], {"vision": pixels},
                max_new_tokens=args.max_new_tokens,
                temperature=args.temperature
                if args.temperature > 1e-4 else 0.0,
                num_beams=getattr(args, "num_beams", 1),
                top_p=getattr(args, "top_p", 1.0), rng=sub)[0]
            text = tokenizer.decode(tokens, skip_special_tokens=True).strip()
            if stop_str and text.endswith(stop_str):
                text = text[:-len(stop_str)]
            ans_file.write(json.dumps({
                "question_id": line["question_id"],
                "prompt": line["text"],
                "text": text.strip(),
                "answer_id": uuid.uuid4().hex[:22],
                "model_id": model_id,
                "metadata": {},
            }) + "\n")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", required=True)
    parser.add_argument("--model-base", default=None)
    parser.add_argument("--image-folder", default="")
    parser.add_argument("--question-file", required=True)
    parser.add_argument("--answers-file", default="answer.jsonl")
    parser.add_argument("--conv-mode", default="llava_v1")
    parser.add_argument("--num-chunks", type=int, default=1)
    parser.add_argument("--chunk-idx", type=int, default=0)
    parser.add_argument("--temperature", type=float, default=0.2)
    parser.add_argument("--num-beams", "--num_beams",
                        dest="num_beams", type=int, default=1)
    parser.add_argument("--top-p", "--top_p", dest="top_p",
                        type=float, default=1.0)
    parser.add_argument("--max-new-tokens", type=int, default=128)
    parser.add_argument("--num-workers", type=int, default=4)
    parser.add_argument("--no_add_image_token", action="store_true")
    args = parser.parse_args()
    eval_model(args)


if __name__ == "__main__":
    main()
