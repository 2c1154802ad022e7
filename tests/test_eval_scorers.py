"""Extra scorers: POPE, ScienceQA, TextVQA, collect_scores, converters
(reference: modelcompose/eval/*, scripts/model_composition/collect_scores)."""

import json
import os

import numpy as np
import pytest

from modelcompose_tpu.data.convert_to_multimodal import convert_record
from modelcompose_tpu.eval.collect_scores import collect, parse_scores
from modelcompose_tpu.eval.eval_pope import eval_pope, normalize_answer
from modelcompose_tpu.eval.eval_science_qa import (evaluate, get_pred_idx,
                                                   parse_answer)
from modelcompose_tpu.eval.eval_textvqa import eval_single, prompt_processor
from modelcompose_tpu.eval.m4c_evaluator import TextVQAAccuracyEvaluator


def test_pope_normalization_and_metrics(tmp_path):
    assert normalize_answer("No, there is not.") == "no"
    assert normalize_answer("Yes it is") == "yes"
    assert normalize_answer("it is not a dog") == "no"
    labels = tmp_path / "labels.jsonl"
    labels.write_text("\n".join(json.dumps({"label": l})
                                for l in ["yes", "no", "yes", "no"]))
    answers = [{"text": t} for t in ["Yes.", "No.", "No.", "Yes."]]
    res = eval_pope(answers, str(labels), verbose=False)
    assert res["accuracy"] == 0.5
    assert res["yes_ratio"] == 0.5


def test_science_qa_answer_parsing():
    assert parse_answer("B") == "B"
    assert parse_answer("C. something") == "C"
    assert parse_answer("blah The answer is D. blah") == "D"
    assert parse_answer("no idea") == "FAILED"
    assert get_pred_idx("B", ["x", "y", "z"]) == 1
    assert get_pred_idx("E", ["x", "y"]) == -1


def test_science_qa_evaluate():
    problems = {"p1": {"choices": ["a", "b"], "answer": 0},
                "p2": {"choices": ["a", "b"], "answer": 1}}
    preds = {"p1": {"text": "A", "prompt": "<image> q"},
             "p2": {"text": "A", "prompt": "q"}}
    results, sqa = evaluate(problems, ["p1", "p2"], preds)
    assert sqa["correct"] == 1 and sqa["count"] == 2


def test_textvqa_prompt_processor_and_eval(tmp_path):
    assert prompt_processor("What is this?\nShort answer:") == \
        "what is this?"
    ann = {"data": [{"image_id": "im1", "question": "what is this?",
                     "answers": ["cat"] * 10}]}
    ann_f = tmp_path / "ann.json"
    ann_f.write_text(json.dumps(ann))
    res_f = tmp_path / "res.jsonl"
    res_f.write_text(json.dumps({
        "question_id": "im1", "prompt": "What is this?\nShort answer:",
        "text": "The cat."}) + "\n")
    acc = eval_single(str(ann_f), str(res_f))
    assert acc == 100.0


def test_textvqa_soft_accuracy():
    ev = TextVQAAccuracyEvaluator()
    # 2/10 annotators say 'cat': per-annotator min(#matching-others/3, 1)
    # averages to (2*(1/3) + 8*(2/3)) / 10 = 0.6
    pred_list = [{"pred_answer": "cat",
                  "gt_answers": ["cat"] * 2 + ["dog"] * 8}]
    acc = ev.eval_pred_list(pred_list)
    np.testing.assert_allclose(acc, 0.6, rtol=1e-6)


def test_collect_scores(tmp_path):
    d = tmp_path / "ckptA" / "AVQA"
    d.mkdir(parents=True)
    (d / "score_video.txt").write_text("blah\nAccuracy: 61.50%\n")
    (d / "score_audio.txt").write_text("Accuracy: 55.00%\n")
    rows = collect(str(tmp_path))
    assert rows[0][0] == "ckptA" and rows[0][1] == "AVQA"
    assert "61.50" in rows[0][2] and "55.00" in rows[0][2]
    assert parse_scores(d) != "None"


def test_convert_record_vision_and_audio():
    rec = {"id": 1, "image": "a.jpg",
           "conversations": [{"from": "human", "value": "<image>\nq"}]}
    out = convert_record(rec, "vision", media_root="/root/imgs")
    assert out["modal_inputs"]["vision"] == ["/root/imgs/a.jpg"]
    assert "image" not in out

    rec2 = {"id": 2, "audio": "x.wav",
            "conversations": [{"from": "human", "value": "<image>\nq"}]}
    out2 = convert_record(rec2, "audio")
    assert out2["modal_inputs"]["audio"] == ["x.wav"]
    assert out2["conversations"][0]["value"].startswith("<audio>")


def test_compare_answers(tmp_path):
    from modelcompose_tpu.eval.compare_answers import (compare, load_gold,
                                                       load_answers_jsonl)
    before = tmp_path / "before.jsonl"
    after = tmp_path / "after.jsonl"
    before.write_text("\n".join(json.dumps({"question_id": i, "text": t})
                                for i, t in [(1, "cat"), (2, "dog"),
                                             (3, "bird")]))
    after.write_text("\n".join(json.dumps({"question_id": i, "text": t})
                               for i, t in [(1, "fish"), (2, "dog"),
                                            (3, "horse")]))
    gold = tmp_path / "gold.json"
    gold.write_text(json.dumps([
        {"question_id": 1, "anser": "fish"},
        {"question_id": 2, "anser": "dog"},
        {"question_id": 3, "anser": "bird"}]))
    fixed, broken = compare(load_answers_jsonl(str(before)),
                            load_answers_jsonl(str(after)),
                            load_gold(str(gold)))
    assert [f[0] for f in fixed] == [1]
    assert [b[0] for b in broken] == [3]


def test_pope_accuracy_uses_confusion_total(tmp_path):
    """Accuracy divides by TP+TN+FP+FN like the reference (eval_pope.py:56)
    — a preds/labels length mismatch (zip-truncated) must not deflate it."""
    labels = tmp_path / "labels.jsonl"
    labels.write_text(json.dumps({"label": "yes"}) + "\n"
                      + json.dumps({"label": "no"}))
    answers = [{"text": t} for t in ["Yes.", "No.", "Yes.", "Yes."]]
    res = eval_pope(answers, str(labels), verbose=False)
    assert res["accuracy"] == 1.0  # 2 scored pairs, both correct
