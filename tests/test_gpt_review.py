"""GPT-judge review harness with injected judge (reference:
modelcompose/eval/eval_gpt_review.py + backoff from
eval_point_tasks_gpt.py)."""

import pytest

from modelcompose_tpu.eval.gpt_review import (call_with_backoff, parse_score,
                                              review_pairs)


def test_parse_score():
    assert parse_score("8 7\nexplanation") == [8.0, 7.0]
    assert parse_score("8, 7\nwhy") == [8.0, 7.0]
    assert parse_score("garbage") == [-1, -1]


def test_backoff_retries_then_succeeds():
    calls = {"n": 0}
    sleeps = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("judge down")
        return "9 8\nok"

    out = call_with_backoff(flaky, max_retries=5, base_sleep=1.0,
                            sleep_fn=sleeps.append)
    assert out == "9 8\nok"
    assert sleeps == [1.0, 2.0]  # exponential


def test_backoff_gives_up():
    with pytest.raises(RuntimeError, match="after 2 retries"):
        call_with_backoff(lambda: (_ for _ in ()).throw(ValueError("x")),
                          max_retries=2, sleep_fn=lambda s: None)


def test_review_pairs_flow():
    qs = [{"question_id": 1, "text": "what?"}]
    a1 = [{"text": "ans1"}]
    a2 = [{"text": "ans2"}]
    rule = {"prompt": "judge fairly", "role": "Assistant"}
    recs = list(review_pairs(qs, a1, a2, rule,
                             judge_fn=lambda sys, c: "7 9\nreason"))
    assert recs[0]["scores"] == [7.0, 9.0]
    assert recs[0]["question_id"] == 1
