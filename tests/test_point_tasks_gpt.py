"""Point-task GPT-judge harness tests (fake judge, zero egress).

Covers the three task types of the reference harness (reference:
scripts/model_composition/test/eval_point_tasks_gpt.py): response parsing,
accuracy/clean-accuracy/average-score aggregation, the output/resume JSON
schemas, the synthetic close-set mode, and the CLI entry."""

import json
import os
import subprocess
import sys

import pytest

from modelcompose_tpu.eval.eval_point_tasks_gpt import (
    PointTaskEvaluator, load_categories, parse_captioning, parse_close_set,
    parse_open_free_form, start_evaluation)


def _resp(text, pt=10, ct=5):
    return {"choices": [{"message": {"content": text}}],
            "usage": {"prompt_tokens": pt, "completion_tokens": ct}}


def _judge_from_script(script):
    """judge_fn returning scripted responses keyed by model_output."""
    def judge(messages):
        content = messages[0]["content"]
        for key, reply in script.items():
            if key in content:
                return _resp(reply)
        raise AssertionError(f"no scripted reply for: {content[-120:]}")
    return judge


# ---------------------------------------------------------------- parsing

def test_parse_open_free_form():
    assert parse_open_free_form("T#Both are chairs.") == \
        (1, "T", "Both are chairs.", False)
    assert parse_open_free_form("F#Different.") == \
        (0, "F", "Different.", False)
    acc, cls, _, invalid = parse_open_free_form("maybe?")
    assert (acc, cls, invalid) == (0, "INVALID", True)


def test_parse_close_set():
    acc, idx, label, reason, invalid = parse_close_set(
        "7#car#Closest match.", ground_truth=7, num_categories=40)
    assert (acc, idx, label, invalid) == (1, 7, "car", False)
    # leading chatter is stripped by the regex (reference: :497-500)
    acc, idx, label, _, invalid = parse_close_set(
        "Sure! The answer is 26#plant#leaf.", 7, 40)
    assert (acc, idx, label, invalid) == (0, 26, "plant", False)
    # -1 / NA -> invalid, random fallback class
    acc, idx, label, _, invalid = parse_close_set(
        "-1#NA#Cannot infer.", 7, 40)
    assert invalid and label == "INVALID" and 0 <= idx < 40


def test_parse_captioning():
    assert parse_captioning("50#mentions white.") == \
        (50, "mentions white.", False)
    score, _, invalid = parse_captioning("150#too big")
    assert (score, invalid) == (-1, True)
    score, _, invalid = parse_captioning("garbage")
    assert (score, invalid) == (-1, True)


def test_categories_indexing_matches_prompt_examples():
    names = load_categories()
    assert len(names) == 40
    assert names[7] == "car" and names[26] == "plant" \
        and names[33] == "table"


# ------------------------------------------------------------- evaluators

def _inputs(rows):
    return {"prompt": "What is this object?", "results": rows}


def test_open_free_form_accuracy_and_schema(tmp_path):
    rows = [{"object_id": "a", "ground_truth": "a chair",
             "model_output": "wooden chair"},
            {"object_id": "b", "ground_truth": "a car",
             "model_output": "an airplane"},
            {"object_id": "c", "ground_truth": "a lamp",
             "model_output": "unsure"}]
    judge = _judge_from_script({"wooden chair": "T#Both chairs.",
                                "an airplane": "F#Different.",
                                "unsure": "??"})
    ev = start_evaluation(_inputs(rows), str(tmp_path), "out.json",
                          "open-free-form-classification",
                          model_type="gpt-4-0613", parallel=False,
                          judge_fn=judge)
    saved = json.load(open(tmp_path / "out.json"))
    # accuracy excludes invalid rows from the denominator (reference :392)
    assert saved["accuracy"] == "50.00%"
    assert saved["total_predictions"] == 3
    assert saved["correct_predictions"] == 1
    assert saved["invalid_responses"] == 1
    assert saved["prompt_tokens"] == 30 and saved["completion_tokens"] == 15
    assert saved["GPT_cost"] == pytest.approx(
        30 * 0.03 / 1000 + 15 * 0.06 / 1000)
    assert [r["gpt_cls_result"] for r in saved["results"]] == \
        ["T", "F", "INVALID"]
    assert not os.path.exists(tmp_path / "out_processed_temp.json")
    assert ev.inference_prompt == "What is this object?"


def test_close_set_clean_accuracy(tmp_path):
    rows = [{"object_id": 1, "ground_truth": 7, "label_name": "car",
             "model_output": "a red truck"},
            {"object_id": 2, "ground_truth": 26, "label_name": "plant",
             "model_output": "a verdant fern"},
            {"object_id": 3, "ground_truth": 33, "label_name": "table",
             "model_output": "mystery object"}]
    judge = _judge_from_script({"a red truck": "7#car#truck is a car.",
                                "a verdant fern": "0#airplane#wrong.",
                                "mystery object": "-1#NA#Cannot infer."})
    start_evaluation(_inputs(rows), str(tmp_path), "cs.json",
                     "modelnet-close-set-classification",
                     model_type="gpt-4-0613", parallel=False, judge_fn=judge)
    saved = json.load(open(tmp_path / "cs.json"))
    # accuracy over ALL rows; clean accuracy drops invalid rows
    assert saved["invalid_responses"] == 1
    assert saved["total_predictions"] == 3
    correct = saved["correct_predictions"]
    lucky = saved["invalid_correct_predictions"]
    assert saved["accuracy"] == f"{correct / 3 * 100:.2f}%"
    assert saved["clean_accuracy"] == f"{(correct - lucky) / 2 * 100:.2f}%"
    # the judge prompt embeds the 40-category list + model_output slot
    assert "0: airplane" in saved["prompt"] and "39: xbox" in saved["prompt"]


def test_close_set_synthetic_mode(tmp_path):
    rows = [{"object_id": 1, "ground_truth": 7, "label_name": "car",
             "model_output": "This is a CAR model."},
            {"object_id": 2, "ground_truth": 26, "label_name": "plant",
             "model_output": "no idea"}]
    start_evaluation(_inputs(rows), str(tmp_path), "syn.json",
                     "modelnet-close-set-classification",
                     model_type="gpt-4-0613", parallel=False,
                     judge_fn=None, synthetic=True)
    saved = json.load(open(tmp_path / "syn.json"))
    assert saved["correct_predictions"] == 1
    assert saved["prompt_tokens"] == 0


def test_captioning_average_score(tmp_path):
    rows = [{"object_id": "x", "ground_truth": "white skeleton",
             "model_output": "an automaton"},
            {"object_id": "y", "ground_truth": "blue car",
             "model_output": "blue vehicle"},
            {"object_id": "z", "ground_truth": "a dog",
             "model_output": "???"}]
    judge = _judge_from_script({"an automaton": "50#partial.",
                                "blue vehicle": "90#close.",
                                "???": "not scoreable"})
    start_evaluation(_inputs(rows), str(tmp_path), "cap.json",
                     "object-captioning", model_type="gpt-4-0613",
                     parallel=False, judge_fn=judge)
    saved = json.load(open(tmp_path / "cap.json"))
    assert saved["average_score"] == "70.00"  # (50+90)/2, invalid excluded
    assert saved["total_score"] == "140.00"
    assert saved["invalid_responses"] == 1
    assert saved["results"][0]["gpt_score"] == 50


def test_resume_from_temp_file(tmp_path):
    """A crash mid-run persists the temp file; rerunning skips processed
    object_ids and folds in the saved tallies (reference: :246-276)."""
    rows = [{"object_id": "a", "ground_truth": "chair",
             "model_output": "chair out"},
            {"object_id": "b", "ground_truth": "car",
             "model_output": "boom out"},
            {"object_id": "c", "ground_truth": "lamp",
             "model_output": "lamp out"}]
    calls = []

    def flaky(messages):
        content = messages[0]["content"]
        calls.append(content)
        if "boom out" in content:
            raise KeyboardInterrupt
        return _resp("T#match.")

    ev = PointTaskEvaluator(_inputs(rows), str(tmp_path), "r.json",
                            "open-free-form-classification",
                            judge_fn=flaky)
    with pytest.raises(KeyboardInterrupt):
        ev.evaluate(parallel=False)
    assert os.path.exists(tmp_path / "r_processed_temp.json")

    done = _judge_from_script({"boom out": "F#no.", "lamp out": "T#yes."})
    ev2 = PointTaskEvaluator(_inputs(rows), str(tmp_path), "r.json",
                             "open-free-form-classification", judge_fn=done)
    ev2.evaluate(parallel=False)
    saved = json.load(open(tmp_path / "r.json"))
    assert saved["total_predictions"] == 3
    assert {r["object_id"] for r in saved["results"]} == {"a", "b", "c"}
    assert saved["correct_predictions"] == 2
    assert not os.path.exists(tmp_path / "r_processed_temp.json")


def test_cli_entry(tmp_path):
    """CLI runs end-to-end in synthetic mode (no judge client needed)."""
    rows = [{"object_id": 1, "ground_truth": 7, "label_name": "car",
             "model_output": "a car"}]
    results_path = tmp_path / "modelnet_results.json"
    json.dump(_inputs(rows), open(results_path, "w"))
    r = subprocess.run(
        [sys.executable, "-m",
         "modelcompose_tpu.eval.eval_point_tasks_gpt",
         "--results_path", str(results_path),
         "--eval_type", "modelnet-close-set-classification", "--synthetic"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-500:]
    saved = json.load(open(tmp_path / "modelnet_results_evaluated_synth"
                                      ".json"))
    assert saved["accuracy"] == "100.00%"


def test_close_set_summary_counts_fallback_hits(tmp_path):
    """clean_total==0 must not zero the raw accuracy when random-fallback
    guesses were counted (denominator total_predictions)."""
    ev = PointTaskEvaluator(_inputs([]), str(tmp_path), "r.json",
                            eval_type="modelnet-close-set-classification")
    ev.total_predictions = 10
    ev.invalid_responses = 10
    ev.correct_predictions = 1
    ev.invalid_correct_predictions = 1
    s = ev.summary()
    assert s["accuracy"] == "10.00%"
    assert s["clean_accuracy"] == "0.00%"
