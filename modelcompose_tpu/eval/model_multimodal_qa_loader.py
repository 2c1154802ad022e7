"""Batched multimodal QA generation — the eval entry point.

Rebuild of the reference's chunked QA loader (reference: modelcompose/eval/
model_multimodal_qa_loader.py:55-144): load a composed checkpoint, run
greedy decode over a (chunked) question file, write the same answer-jsonl
format for the same scorers.  Where the reference forks one process per GPU
and chunks the question file, this loader keeps the chunk interface (so the
shell harness is drop-in) but also supports --batch-size > 1 since the
packing is static-shape.

Usage:
    python -m modelcompose_tpu.eval.model_multimodal_qa_loader \
        --model-path ckpts/merged-multimodal --model-base vicuna-7b-v1.5 \
        --question-file q.json --answers-file out.jsonl --conv-mode vicuna_v1
"""

from __future__ import annotations

import argparse
import json
import os
import uuid

from ..data import conversation as conversation_lib
from ..data.conversation import conv_templates
from ..data.dataset import (ChunkedMultimodalDataset,
                            DataCollatorForSupervisedDataset, get_chunk)
from ..models.loader import load_pretrained_model
from .generation_utils import stop_str_for


def eval_model(args):
    model_path = os.path.expanduser(args.model_path)
    model_name = os.path.basename(model_path.rstrip("/"))
    tokenizer, model, modal_processors, context_len = load_pretrained_model(
        model_path, args.model_base, model_name)

    conversation_lib.default_conversation = conv_templates[args.conv_mode]
    tokenizer.pad_token_id = tokenizer.eos_token_id

    answers_file = os.path.expanduser(args.answers_file)
    os.makedirs(os.path.dirname(answers_file) or ".", exist_ok=True)

    dataset = ChunkedMultimodalDataset(
        args.question_file, tokenizer, None, modal_processors,
        num_chunks=args.num_chunks, chunk_idx=args.chunk_idx)
    collator = DataCollatorForSupervisedDataset(
        tokenizer, modal_processors,
        {"vision": {"image_aspect_ratio": "pad"}})
    questions = get_chunk(json.load(open(args.question_file)),
                          args.num_chunks, args.chunk_idx)

    # Prompt protocol note: like the reference, the dataset tokenizes the
    # FULL conversation through the training preprocess — benchmark
    # question files carry a None/empty gpt turn (gold lives in the
    # separate ANN file, see avqa.sh), which renders a prompt ending in
    # 'ASSISTANT:'; a question file that DID embed gold would leak it in
    # both stacks identically.
    conv = conv_templates[args.conv_mode]
    stop_str = stop_str_for(conv)

    import jax
    rng = jax.random.PRNGKey(0)
    with open(answers_file, "w") as ans_file:
        B = args.batch_size if getattr(args, "num_beams", 1) <= 1 else 1
        for start in range(0, len(dataset), B):
            batch = collator([dataset[i] for i in
                              range(start, min(start + B, len(dataset)))])
            rng, sub = jax.random.split(rng)  # fresh stream per batch
            outputs = model.generate(
                batch["input_ids"], batch.get("modal_inputs", {}),
                max_new_tokens=args.max_new_tokens,
                temperature=args.temperature,
                num_beams=getattr(args, "num_beams", 1),
                top_p=getattr(args, "top_p", 1.0),
                compact_adapters=getattr(args, "compact_adapters", False),
                rng=sub if args.temperature > 0 else None)
            for j, token_ids in enumerate(outputs):
                text = tokenizer.decode(token_ids,
                                        skip_special_tokens=True).strip()
                if text.endswith(stop_str):
                    text = text[:-len(stop_str)]
                text = text.strip()
                q = questions[start + j]
                ans_file.write(json.dumps({
                    "question_id": q["id"],
                    "prompt": q["conversations"][0]["value"],
                    "text": text,
                    "answer_id": uuid.uuid4().hex[:22],
                    "model_id": model_name,
                    "metadata": {},
                }) + "\n")
                ans_file.flush()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", type=str, required=True)
    parser.add_argument("--model-base", type=str, default=None)
    parser.add_argument("--question-file", type=str, required=True)
    parser.add_argument("--answers-file", type=str, default="answer.jsonl")
    parser.add_argument("--conv-mode", type=str, default="llava_v1")
    parser.add_argument("--num-chunks", type=int, default=1)
    parser.add_argument("--chunk-idx", type=int, default=0)
    parser.add_argument("--temperature", type=float, default=0.2)
    parser.add_argument("--num-beams", "--num_beams",
                        dest="num_beams", type=int, default=1)
    parser.add_argument("--top-p", "--top_p", dest="top_p",
                        type=float, default=1.0)
    parser.add_argument("--compact-adapters", action="store_true",
                        help="gather adapter stacks to the batch-active "
                             "columns before prefill (golden-pinned "
                             "token-identical; ~5%% composed-prefill win)")
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--max-new-tokens", type=int, default=128)
    parser.add_argument(
        "--protocol", type=str, default=None, choices=["benchmark"],
        help="'benchmark' pins the shell-harness eval protocol — "
             "--conv-mode vicuna_v1 --temperature 0 (greedy), exactly what "
             "avqa.sh/MCUB-*.sh/music_avqa_*.sh pass (reference: "
             "scripts/model_composition/test/avqa.sh:49-50); a bare CLI "
             "run with argparse defaults would NOT reproduce the paper "
             "protocol")
    args = parser.parse_args()
    if args.protocol == "benchmark":
        args.conv_mode = "vicuna_v1"
        args.temperature = 0.0
    if args.model_base in ("", "None"):
        args.model_base = None
    eval_model(args)


if __name__ == "__main__":
    main()
