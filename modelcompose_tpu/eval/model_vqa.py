"""LLaVA-legacy VQA loader: jsonl questions + image folder.

Rebuild of the reference's ``model_vqa.py`` / ``model_vqa_loader.py``
(reference: modelcompose/eval/model_vqa.py:1-112): question jsonl rows
``{"question_id", "image", "text"}``, answers written in the same format as
the multimodal loader.  Used by the LLaVA-suite evals (POPE, TextVQA,
ScienceQA images, ...).

Usage: python -m modelcompose_tpu.eval.model_vqa --model-path ckpt \
    --model-base vicuna --question-file q.jsonl --image-folder imgs \
    --answers-file out.jsonl
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
from .generation_utils import generate_text, stop_str_for


def eval_model(args, loaded=None):
    if loaded is None:
        from ..models.loader import load_pretrained_model
        model_name = os.path.basename(args.model_path.rstrip("/"))
        loaded = load_pretrained_model(args.model_path, args.model_base,
                                       model_name)
    tokenizer, model, processors, _ = loaded
    conversation_lib.default_conversation = conv_templates[args.conv_mode]

    questions = [json.loads(line) for line in open(args.question_file)]
    questions = get_chunk(questions, args.num_chunks, args.chunk_idx)
    os.makedirs(os.path.dirname(args.answers_file) or ".", exist_ok=True)

    conv_template = conv_templates[args.conv_mode]
    stop_str = stop_str_for(conv_template)

    from PIL import Image
    from ..data.image_processing import process_images

    import jax
    rng = jax.random.PRNGKey(0)
    with open(args.answers_file, "w") as ans_file:
        for q in questions:
            qs = q["text"]
            modal_inputs = {}
            if q.get("image"):
                img = Image.open(os.path.join(args.image_folder,
                                              q["image"])).convert("RGB")
                modal_inputs["vision"] = process_images(
                    [img], processors["vision"], image_aspect_ratio="pad")
                if "<image>" not in qs:
                    qs = "<image>\n" + qs
            conv = conv_template.copy()
            conv.append_message(conv.roles[0], qs)
            conv.append_message(conv.roles[1], None)
            rng, sub = jax.random.split(rng)
            text = generate_text(model, tokenizer, conv.get_prompt(),
                                 modal_inputs,
                                 temperature=args.temperature,
                                 max_new_tokens=args.max_new_tokens,
                                 rng=sub, stop_str=stop_str,
                                 num_beams=getattr(args, "num_beams", 1),
                                 top_p=getattr(args, "top_p", 1.0))
            ans_file.write(json.dumps({
                "question_id": q["question_id"],
                "prompt": q["text"],
                "text": text,
                "answer_id": uuid.uuid4().hex[:22],
                "model_id": os.path.basename(args.model_path.rstrip("/")),
                "metadata": {},
            }) + "\n")
            ans_file.flush()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", required=True)
    parser.add_argument("--model-base", default=None)
    parser.add_argument("--question-file", required=True)
    parser.add_argument("--image-folder", default="")
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
    args = parser.parse_args()
    eval_model(args)


if __name__ == "__main__":
    main()
