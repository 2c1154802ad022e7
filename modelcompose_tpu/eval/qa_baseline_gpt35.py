"""Generate baseline answers with GPT-3.5 (the comparison arm for the
GPT-judge pairwise evals).

Rebuild of the reference's ``qa_baseline_gpt35.py`` (reference:
modelcompose/eval/qa_baseline_gpt35.py:1-74): jsonl questions answered by
a chat model over a 32-thread pool, 3 attempts per question with
``#ERROR#`` fallback, answers sorted by question_id.  The OpenAI client is
gated — ``answer_fn`` can be injected (tests, zero-egress environments).

Usage: python -m modelcompose_tpu.eval.qa_baseline_gpt35 \
    -q question.jsonl -o answer.jsonl
"""

from __future__ import annotations

import argparse
import concurrent.futures
import json
import os
import time
import uuid

MODEL = "gpt-3.5-turbo"
MODEL_ID = "gpt-3.5-turbo:20230327"
SYSTEM_PROMPT = "You are a helpful assistant."


def default_answer_fn(question: str, max_tokens: int) -> str:
    try:
        import openai
    except ImportError as e:
        raise RuntimeError(
            "no OpenAI client in this environment; inject answer_fn or run "
            "where the openai package is available") from e
    client = openai.OpenAI()
    resp = client.chat.completions.create(
        model=MODEL,
        messages=[{"role": "system", "content": SYSTEM_PROMPT},
                  {"role": "user", "content": question}],
        max_tokens=max_tokens)
    return resp.choices[0].message.content


def get_answer(question_id, question: str, max_tokens: int, answer_fn,
               sleep_fn=time.sleep):
    """3 attempts, '#ERROR#' text on failure (reference: :16-41)."""
    ans = {"answer_id": uuid.uuid4().hex[:22], "question_id": question_id,
           "model_id": MODEL_ID}
    for _ in range(3):
        try:
            ans["text"] = answer_fn(question, max_tokens)
            return ans
        except Exception as e:  # noqa: BLE001 — judge APIs throw everything
            print("[ERROR]", e)
            ans["text"] = "#ERROR#"
            sleep_fn(1)
    return ans


def run(questions: dict, max_tokens: int, answer_fn, max_workers: int = 32):
    answers = []
    with concurrent.futures.ThreadPoolExecutor(
            max_workers=max_workers) as executor:
        futures = [executor.submit(get_answer, qid, question, max_tokens,
                                   answer_fn)
                   for qid, question in questions.items()]
        for future in concurrent.futures.as_completed(futures):
            answers.append(future.result())
    answers.sort(key=lambda x: x["question_id"])
    return answers


def main():
    parser = argparse.ArgumentParser(
        description="ChatGPT answer generation.")
    parser.add_argument("-q", "--question", required=True)
    parser.add_argument("-o", "--output", required=True)
    parser.add_argument("--max-tokens", type=int, default=1024)
    args = parser.parse_args()

    questions = {}
    with open(os.path.expanduser(args.question)) as f:
        for line in f:
            if not line.strip():
                continue
            q = json.loads(line)
            questions[q["question_id"]] = q["text"]

    answers = run(questions, args.max_tokens, default_answer_fn)
    with open(os.path.expanduser(args.output), "w") as f:
        f.write("\n".join(json.dumps(a) for a in answers))


if __name__ == "__main__":
    main()
