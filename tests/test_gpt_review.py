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


def test_review_with_context_bench_and_visual(tmp_path):
    """Category-rule lookup + context block + resume (reference:
    eval_gpt_review_bench.py:55-120 / eval_gpt_review_visual.py)."""
    from modelcompose_tpu.eval.gpt_review import review_with_context

    questions = [{"question_id": 1, "image": "a.jpg", "category": "conv",
                  "text": "What color?"},
                 {"question_id": 2, "image": "b.jpg", "category": "detail",
                  "text": "Describe."}]
    a1 = [{"question_id": 1, "answer_id": "x1", "text": "red"},
          {"question_id": 2, "answer_id": "x2", "text": "a cat"}]
    a2 = [{"question_id": 1, "answer_id": "y1", "text": "blue"},
          {"question_id": 2, "answer_id": "y2", "text": "a dog"}]
    rules = {"llava_bench_conv": {"role": "Assistant", "prompt": "judge"},
             "llava_bench_detail": {"role": "Assistant", "prompt": "judge"},
             "conv": {"role": "Assistant", "prompt": "judge"},
             "detail": {"role": "Assistant", "prompt": "judge"}}
    contexts_bench = [{"image": "a.jpg", "caption": "a red ball"},
                      {"image": "b.jpg", "caption": ["two lines",
                                                     "of caption"]}]
    contents = []

    def judge(role, content):
        contents.append(content)
        return "7 9\nAssistant 2 better."

    recs = list(review_with_context(questions, a1, a2, rules,
                                    contexts_bench, judge, mode="bench"))
    assert [r["category"] for r in recs] == ["llava_bench_conv",
                                             "llava_bench_detail"]
    assert recs[0]["tuple"] == [7.0, 9.0]
    assert recs[0]["answer1_id"] == "x1" and recs[0]["answer2_id"] == "y1"
    assert "[Context]\na red ball" in contents[0]
    assert "two lines\nof caption" in contents[1]

    # visual mode: captions list + bbox instances, bare category
    contexts_vis = [{"image": "a.jpg", "captions": ["c1", "c2"],
                     "instances": [{"category": "ball",
                                    "bbox": [1, 2, 3, 4]}]},
                    {"image": "b.jpg", "captions": ["c3"], "instances": []}]
    contents.clear()
    recs = list(review_with_context(questions, a1, a2, rules, contexts_vis,
                                    judge, mode="visual"))
    assert recs[0]["category"] == "conv"
    assert "ball: [1, 2, 3, 4]" in contents[0]

    # resume: done=1 skips the first record
    recs = list(review_with_context(questions, a1, a2, rules, contexts_vis,
                                    judge, mode="visual", done=1))
    assert [r["id"] for r in recs] == [2]


def test_summarize_gpt_review(tmp_path):
    import json
    from modelcompose_tpu.eval.summarize_gpt_review import summarize_file
    p = tmp_path / "review_run.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"question_id": 1, "category": "conv",
                            "tuple": [8, 4]}) + "\n")
        f.write(json.dumps({"question_id": 2, "category": "conv",
                            "tuple": [8, 8]}) + "\n")
        f.write(json.dumps({"question_id": 3, "category": "detail",
                            "tuple": [5, 10]}) + "\n")
    out = summarize_file(str(p))
    assert out["conv"] == (75.0, 80.0, 60.0)       # 6/8, 8x10, 6x10
    assert out["detail"] == (200.0, 50.0, 100.0)
    assert out["all"] == (round(100 * (22 / 3) / (21 / 3), 1), 70.0,
                          73.3)
    # ignore list drops rows
    out2 = summarize_file(str(p), ignore={3})
    assert "detail" not in out2


def test_backoff_sleep_is_capped():
    """Uncapped exponential doubling with 40-retry call sites would sleep
    for days on a persistently dead judge; sleeps cap at max_sleep."""
    sleeps = []
    with pytest.raises(RuntimeError):
        call_with_backoff(lambda: (_ for _ in ()).throw(ValueError("x")),
                          max_retries=12, base_sleep=1.0,
                          sleep_fn=sleeps.append, max_sleep=8.0)
    assert max(sleeps) == 8.0
    assert sleeps[:4] == [1.0, 2.0, 4.0, 8.0]
