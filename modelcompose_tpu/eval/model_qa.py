"""Text-only QA answer generation (no media towers).

Rebuild of the reference's ``model_qa.py`` (reference:
modelcompose/eval/model_qa.py:1-85): jsonl questions
``{question_id, text, category}``, the default conversation template,
sampled decoding (temperature 0.7), generation cut at the first separator
after the prompt.

Usage: python -m modelcompose_tpu.eval.model_qa --model-path ckpt \
    --model-base vicuna --question-file q.jsonl --answers-file out.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import uuid

import numpy as np

from ..data import conversation as conversation_lib
from ..data.tokenization import tokenizer_modal_token


def eval_model(args, loaded=None):
    if loaded is None:
        from ..models.loader import load_pretrained_model
        model_name = os.path.basename(args.model_path.rstrip("/"))
        loaded = load_pretrained_model(args.model_path, args.model_base,
                                       model_name)
    tokenizer, model, _, _ = loaded
    model_id = os.path.basename(args.model_path.rstrip("/"))
    os.makedirs(os.path.dirname(args.answers_file) or ".", exist_ok=True)

    import jax
    rng = jax.random.PRNGKey(0)
    with open(args.question_file) as ques_file, \
            open(args.answers_file, "w") as ans_file:
        for line in ques_file:
            q = json.loads(line)
            conv = conversation_lib.default_conversation.copy()
            conv.append_message(conv.roles[0], q["text"])
            conv.append_message(conv.roles[1], None)
            ids = np.asarray(tokenizer_modal_token(conv.get_prompt(),
                                                   tokenizer), np.int64)
            rng, sub = jax.random.split(rng)
            tokens = model.generate(
                [ids], {}, max_new_tokens=args.max_new_tokens,
                temperature=args.temperature, rng=sub)[0]
            text = tokenizer.decode(tokens, skip_special_tokens=True)
            # cut at the first separator, the reference's keyword stop
            # (reference: model_qa.py:62-68)
            if conv.sep and conv.sep in text:
                text = text[:text.index(conv.sep)]
            ans_file.write(json.dumps({
                "question_id": q["question_id"],
                "text": text.strip(),
                "answer_id": uuid.uuid4().hex[:22],
                "model_id": model_id,
                "metadata": {},
            }) + "\n")
            ans_file.flush()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", "--model-name", required=True,
                        dest="model_path")
    parser.add_argument("--model-base", default=None)
    parser.add_argument("--question-file", required=True)
    parser.add_argument("--answers-file", default="answer.jsonl")
    parser.add_argument("--temperature", type=float, default=0.7)
    parser.add_argument("--max-new-tokens", type=int, default=1024)
    args = parser.parse_args()
    eval_model(args)


if __name__ == "__main__":
    main()
