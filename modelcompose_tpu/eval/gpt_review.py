"""GPT-judge scoring with retry backoff.

Rebuild of the reference's GPT-judge evals (reference: modelcompose/eval/
eval_gpt_review*.py and scripts/model_composition/test/
eval_point_tasks_gpt.py:17-40 — the exponential-backoff retry is the
resilience mechanism SURVEY.md §5 calls out).  The OpenAI client is gated:
in a zero-egress environment ``judge_fn`` can be injected (tests), and the
CLI fails with a clear message if no client is available.

Usage: python -m modelcompose_tpu.eval.gpt_review \
    --question q.jsonl --answer-list a1.jsonl a2.jsonl --rule rule.json \
    --output review.jsonl
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Callable, Optional

NUM_SECONDS_TO_SLEEP = 0.5


def call_with_backoff(fn: Callable[[], str], max_retries: int = 5,
                      base_sleep: float = NUM_SECONDS_TO_SLEEP,
                      sleep_fn=time.sleep, max_sleep: float = 60.0) -> str:
    """Exponential-backoff retry (reference: eval_point_tasks_gpt.py:17-40).
    Sleeps are capped at ``max_sleep``: uncapped doubling with the
    40-retry call sites would sleep for days on a persistently failing
    judge instead of erroring."""
    last_err: Optional[Exception] = None
    for attempt in range(max_retries):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — judge APIs throw everything
            last_err = e
            sleep_fn(min(base_sleep * (2 ** attempt), max_sleep))
    raise RuntimeError(f"judge failed after {max_retries} retries: "
                       f"{last_err}")


def default_judge(system_prompt: str, content: str, model: str,
                  max_tokens: int) -> str:
    try:
        import openai
    except ImportError as e:
        raise RuntimeError(
            "no OpenAI client in this environment; inject judge_fn or run "
            "where the openai package is available") from e
    client = openai.OpenAI()
    resp = client.chat.completions.create(
        model=model,
        messages=[{"role": "system", "content": system_prompt},
                  {"role": "user", "content": content}],
        temperature=0.2, max_tokens=max_tokens)
    return resp.choices[0].message.content


def http_judge(system_prompt: str, content: str, model: str,
               max_tokens: int, url: str, auth=None) -> str:
    """Judge via an OpenAI-format HTTP relay endpoint — the role of the
    reference's ``eval_gpt_review_bench_thumt.py`` (reference:
    modelcompose/eval/eval_gpt_review_bench_thumt.py:35-55), which routes
    bench reviews through a proxied chat endpoint instead of the OpenAI
    SDK.  Credentials come from the environment
    (GPT_REVIEW_USER/GPT_REVIEW_PASSWORD), never hardcoded."""
    import requests
    data = json.dumps({
        "model": model,
        "messages": [{"role": "system", "content": system_prompt},
                     {"role": "user", "content": content}],
        "max_tokens": max_tokens})
    resp = requests.post(
        url=url, data=data, auth=auth, timeout=100,
        headers={"Content-Type": "application/json"})
    if resp.status_code != 200:
        raise RuntimeError(
            f"judge relay HTTP {resp.status_code}: {resp.text[:500]}")
    body = resp.json()
    return body["choices"][0]["message"]["content"]


def parse_score(review: str):
    """First line 'x y' -> [x, y] (reference: eval_gpt_review.py)."""
    try:
        score_pair = review.split("\n")[0].replace(",", " ")
        sp = score_pair.split()  # robust to "8, 7" double spaces
        if len(sp) == 2:
            return [float(sp[0]), float(sp[1])]
        return [-1, -1]
    except Exception:
        return [-1, -1]


REVIEWER_SYSTEM_PROMPT = ("You are a helpful and precise assistant for "
                          "checking the quality of the answer.")
# the judge's OpenAI SYSTEM message is this fixed reviewer instruction
# (reference: eval_gpt_review.py:20, eval_gpt_review_bench.py:18,
# eval_gpt_review_visual.py:18); rule['role'] only labels the
# [Assistant 1/2] content blocks


def review_pairs(questions, answers1, answers2, rule: dict,
                 judge_fn: Callable[[str, str], str]):
    """Yield review records for answer pairs under a judging rule."""
    for q, a1, a2 in zip(questions, answers1, answers2):
        content = (f"[Question]\n{q['text']}\n\n"
                   f"[Assistant 1]\n{a1['text']}\n\n[End of Assistant 1]\n\n"
                   f"[Assistant 2]\n{a2['text']}\n\n[End of Assistant 2]\n\n"
                   f"[System]\n{rule['prompt']}\n\n")
        review = call_with_backoff(
            lambda c=content: judge_fn(REVIEWER_SYSTEM_PROMPT, c))
        yield {"question_id": q.get("question_id", q.get("id")),
               "review": review, "scores": parse_score(review)}


def review_with_context(questions, answers1, answers2, rule_dict, contexts,
                        judge_fn, mode: str = "bench", done: int = 0):
    """The bench/visual review flow (reference: eval_gpt_review_bench.py:
    55-120, eval_gpt_review_visual.py): per-question category rule lookup,
    image caption (+ bbox for 'visual') context block, resumable records
    with the reference's jsonl schema."""
    image_to_context = {c["image"]: c for c in contexts}
    for idx, (q, a1, a2) in enumerate(zip(questions, answers1, answers2)):
        if idx < done:  # resume: already reviewed
            continue
        inst = image_to_context[q["image"]]
        if mode == "visual":
            cap_str = "\n".join(inst["captions"])
            box_str = "\n".join(f'{i["category"]}: {i["bbox"]}'
                                for i in inst["instances"])
            context_block = f"[Context]\n{cap_str}\n\n{box_str}\n\n"
            category = q["category"]
        else:
            cap = inst["caption"]
            cap_str = "\n".join(cap) if isinstance(cap, list) else cap
            context_block = f"[Context]\n{cap_str}\n\n"
            category = "llava_bench_" + q["category"]
        if category not in rule_dict:
            raise KeyError(
                f"Visual QA category not found in rule file: {category}.")
        rule = rule_dict[category]
        role = rule["role"]
        content = (context_block
                   + f'[Question]\n{q["text"]}\n\n'
                   f'[{role} 1]\n{a1["text"]}\n\n[End of {role} 1]\n\n'
                   f'[{role} 2]\n{a2["text"]}\n\n[End of {role} 2]\n\n'
                   f'[System]\n{rule["prompt"]}\n\n')
        review = call_with_backoff(
            lambda c=content: judge_fn(REVIEWER_SYSTEM_PROMPT, c))
        yield {"id": idx + 1,
               "question_id": q["question_id"],
               "answer1_id": a1.get("answer_id", a1.get("question_id")),
               "answer2_id": a2.get("answer_id"),
               "category": category,
               "content": review,
               "tuple": parse_score(review)}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--question", required=True)
    parser.add_argument("--answer-list", nargs=2, required=True)
    parser.add_argument("--rule", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--context", default=None,
                        help="image-context jsonl; enables the bench/"
                             "visual category-rule flow")
    parser.add_argument("--mode", choices=["pairs", "bench", "visual"],
                        default="pairs")
    parser.add_argument("--model", default="gpt-4")
    parser.add_argument("--max-tokens", type=int, default=1024)
    parser.add_argument("--judge-url", default=None,
                        help="OpenAI-format HTTP relay endpoint (the "
                             "bench_thumt flow); basic-auth credentials "
                             "via GPT_REVIEW_USER/GPT_REVIEW_PASSWORD")
    args = parser.parse_args()

    questions = [json.loads(l) for l in open(args.question)]
    a1 = [json.loads(l) for l in open(args.answer_list[0])]
    a2 = [json.loads(l) for l in open(args.answer_list[1])]
    rule = json.load(open(args.rule))

    if args.judge_url:
        import os as _os
        auth = None
        user = _os.environ.get("GPT_REVIEW_USER")
        if user:
            auth = (user, _os.environ.get("GPT_REVIEW_PASSWORD", ""))

        def judge(system, content):
            return http_judge(system, content, args.model, args.max_tokens,
                              args.judge_url, auth=auth)
    else:
        def judge(system, content):
            return default_judge(system, content, args.model,
                                 args.max_tokens)

    if args.mode == "pairs":
        with open(args.output, "w") as f:
            for rec in review_pairs(questions, a1, a2, rule, judge):
                f.write(json.dumps(rec) + "\n")
                f.flush()
        return
    # bench/visual: resumable append (reference: eval_gpt_review_bench.py)
    import os
    done = 0
    if os.path.isfile(args.output):
        done = sum(1 for _ in open(args.output))
    contexts = [json.loads(l) for l in open(args.context)]
    with open(args.output, "a") as f:
        for rec in review_with_context(questions, a1, a2, rule, contexts,
                                       judge, mode=args.mode, done=done):
            f.write(json.dumps(rec) + "\n")
            f.flush()


if __name__ == "__main__":
    main()
