"""ScienceQA loader with the chain-of-thought answer re-query loop.

Rebuild of the reference's ``model_vqa_science.py`` (reference:
modelcompose/eval/model_vqa_science.py:1-147): questions are a JSON list of
``{id, conversations, image?}``; each sample generates a (possibly long)
reasoning answer, and with ``--answer-prompter`` the model is re-queried
with ``<prompt + reasoning + ' ###\\nANSWER:'>`` for a short option letter,
the final text becoming ``reasoning + '\\n The answer is <letter>'`` — the
two-turn CoT protocol the SQA-GPT4 scorers consume.

Usage: python -m modelcompose_tpu.eval.model_vqa_science \
    --model-path ckpt --model-base vicuna --question-file problems.json \
    --image-folder imgs --answers-file out.jsonl --single-pred-prompt
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
    model_id = os.path.basename(args.model_path.rstrip("/"))

    questions = json.load(open(args.question_file))
    questions = get_chunk(questions, args.num_chunks, args.chunk_idx)
    os.makedirs(os.path.dirname(args.answers_file) or ".", exist_ok=True)

    conv_template = conv_templates[args.conv_mode]
    stop_str = stop_str_for(conv_template)

    from PIL import Image
    from ..data.image_processing import process_images

    import jax
    rng = jax.random.PRNGKey(0)
    with open(args.answers_file, "w") as ans_file:
        for line in questions:
            idx = line["id"]
            question = line["conversations"][0]
            qs = question["value"].replace("<image>", "").strip()
            cur_prompt = qs

            modal_inputs = {}
            if "image" in line:
                img = Image.open(os.path.join(args.image_folder,
                                              line["image"])).convert("RGB")
                modal_inputs["vision"] = process_images(
                    [img], processors["vision"], image_aspect_ratio="pad")
                qs = "<image>\n" + qs
                cur_prompt = "<image>\n" + cur_prompt

            if args.single_pred_prompt:
                tail = ("\nAnswer with the option's letter from the given "
                        "choices directly.")
                qs = qs + tail
                cur_prompt = cur_prompt + tail

            conv = conv_template.copy()
            conv.append_message(conv.roles[0], qs)
            conv.append_message(conv.roles[1], None)
            prompt = conv.get_prompt()
            rng, sub = jax.random.split(rng)
            outputs = generate_text(model, tokenizer, prompt, modal_inputs,
                                    temperature=args.temperature,
                                    max_new_tokens=args.max_new_tokens,
                                    rng=sub, stop_str=stop_str,
                                    num_beams=getattr(args, "num_beams", 1),
                                    top_p=getattr(args, "top_p", 1.0))

            if args.answer_prompter:
                # second turn: re-query for the bare option letter
                # (reference: model_vqa_science.py:99-121)
                outputs_reasoning = outputs
                rng, sub = jax.random.split(rng)
                answer = generate_text(
                    model, tokenizer,
                    prompt + outputs_reasoning + " ###\nANSWER:",
                    modal_inputs, temperature=args.temperature,
                    max_new_tokens=64, rng=sub, stop_str=stop_str)
                outputs = outputs_reasoning + "\n The answer is " + answer

            ans_file.write(json.dumps({
                "question_id": idx,
                "prompt": cur_prompt,
                "text": outputs,
                "answer_id": uuid.uuid4().hex[:22],
                "model_id": model_id,
                "metadata": {},
            }) + "\n")
            ans_file.flush()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", required=True)
    parser.add_argument("--model-base", default=None)
    parser.add_argument("--image-folder", default="")
    parser.add_argument("--question-file", required=True)
    parser.add_argument("--answers-file", default="answer.jsonl")
    parser.add_argument("--conv-mode", default="llava_v0")
    parser.add_argument("--num-chunks", type=int, default=1)
    parser.add_argument("--chunk-idx", type=int, default=0)
    parser.add_argument("--temperature", type=float, default=0.2)
    parser.add_argument("--num-beams", "--num_beams",
                        dest="num_beams", type=int, default=1)
    parser.add_argument("--top-p", "--top_p", dest="top_p",
                        type=float, default=1.0)
    parser.add_argument("--max-new-tokens", type=int, default=1024)
    parser.add_argument("--answer-prompter", action="store_true")
    parser.add_argument("--single-pred-prompt", action="store_true")
    args = parser.parse_args()
    eval_model(args)


if __name__ == "__main__":
    main()
