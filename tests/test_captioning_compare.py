"""Captioning metrics + delta comparison tools."""

import json

import numpy as np
import pytest

from modelcompose_tpu.eval.eval_captioning import (cider_d, corpus_bleu,
                                                   evaluate_captions,
                                                   _tokenize)


def test_bleu_perfect_match():
    h = [_tokenize("a cat sits on the mat")]
    r = [[_tokenize("a cat sits on the mat")]]
    bleu = corpus_bleu(h, r)
    np.testing.assert_allclose(bleu, [1.0] * 4, atol=1e-9)


def test_bleu_partial():
    h = [_tokenize("the cat sat")]
    r = [[_tokenize("a cat sat on the mat")]]
    bleu = corpus_bleu(h, r)
    assert 0 < bleu[1] < bleu[0] <= 1.0
    # pycocoevalcap-exact: no 4-gram match -> only the tiny=1e-15
    # numerator guard survives, not a smoothed value
    assert 0 < bleu[3] < 1e-3


def test_cider_identical_beats_unrelated():
    refs = [[_tokenize("a dog runs in the park")],
            [_tokenize("two people ride bikes")]]
    good = [_tokenize("a dog runs in the park"),
            _tokenize("two people ride bikes")]
    bad = [_tokenize("quantum flux capacitors everywhere"),
           _tokenize("purple monkey dishwasher")]
    assert cider_d(good, refs) > cider_d(bad, refs)


def test_evaluate_captions_files(tmp_path):
    res = tmp_path / "res.jsonl"
    res.write_text(json.dumps({"question_id": 1,
                               "text": "a cat on a mat"}) + "\n" +
                   json.dumps({"question_id": 2,
                               "text": "a dog in a park"}) + "\n")
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps({"annotations": [
        {"image_id": 1, "caption": "a cat on a mat"},
        {"image_id": 1, "caption": "cat sitting on the mat"},
        {"image_id": 2, "caption": "a dog in a park"}]}))
    out = evaluate_captions(str(res), str(ann), verbose=False)
    assert out["BLEU-1"] > 0.9
    # CIDEr needs >1 document for non-degenerate idf
    assert out["CIDEr-D"] > 0


def test_compare_checkpoints(tmp_path):
    from modelcompose_tpu.compose.compare import compare_checkpoints
    from modelcompose_tpu.compose.state_io import save_state
    import os
    rs = np.random.RandomState(0)
    for name, modal, seed in [("a", "vision", 0), ("b", "audio", 1)]:
        d = tmp_path / name
        os.makedirs(d)
        r = np.random.RandomState(seed)
        save_state({
            "model.layers.0.self_attn.q_proj.lora_A."
            f"{modal}.weight": r.randn(2, 8).astype(np.float32),
            "model.layers.0.self_attn.q_proj.lora_B."
            f"{modal}.weight": r.randn(8, 2).astype(np.float32),
        }, str(d / "adapter_model.safetensors"))
        json.dump({"mm_vision_encoder" if modal == "vision" else
                   "mm_audio_encoder": "x", "lora_r": 2, "lora_alpha": 4},
                  open(d / "config.json", "w"))
    res = compare_checkpoints(str(tmp_path / "a"), str(tmp_path / "b"))
    assert res["L2"] > 0 and 0 <= res["SSD"] <= 1


# ------------------------------------------------- METEOR / ROUGE-L

def test_rouge_l_hand_computed():
    from modelcompose_tpu.eval.eval_captioning import rouge_l
    h = "the cat sat".split()
    r = "the cat sat on the mat".split()
    # LCS=3 -> P=1, R=0.5, beta=1.2: F = (1+1.44)*0.5 / (0.5+1.44)
    want = (1 + 1.2 ** 2) * 1.0 * 0.5 / (0.5 + 1.2 ** 2 * 1.0)
    assert abs(rouge_l([h], [[r]]) - want) < 1e-9
    # identical -> 1; disjoint -> 0; max over refs picks the better one
    assert rouge_l([h], [[h]]) == 1.0
    assert rouge_l([h], [["dog".split()[0]]]) == 0.0
    assert rouge_l([h], [[["x"], h]]) == 1.0


def test_meteor_hand_computed():
    from modelcompose_tpu.eval.eval_captioning import meteor
    h = "the cat sat".split()
    # identical: m=3, F=1, chunks=1 -> 1 - 0.5*(1/3)^3
    assert abs(meteor([h], [[h]]) - (1 - 0.5 / 27)) < 1e-9
    assert meteor([h], [[["dog"]]]) == 0.0
    # reordering fragments the alignment -> lower score than identical
    shuffled = ["sat", "the", "cat"]
    assert meteor([shuffled], [[h]]) < meteor([h], [[h]])


def test_evaluate_captions_reports_all_metrics(tmp_path):
    import json
    from modelcompose_tpu.eval.eval_captioning import evaluate_captions
    res = tmp_path / "res.jsonl"
    ann = tmp_path / "ann.json"
    with open(res, "w") as f:
        f.write(json.dumps({"question_id": 1,
                            "text": "a cat on a mat"}) + "\n")
    json.dump({"annotations": [{"image_id": 1,
                                "caption": "a cat sits on a mat"}]},
              open(ann, "w"))
    out = evaluate_captions(str(res), str(ann), verbose=False)
    for key in ("BLEU-1", "BLEU-4", "METEOR", "ROUGE-L", "CIDEr-D"):
        assert key in out
    assert 0 < out["ROUGE-L"] <= 1 and 0 < out["METEOR"] <= 1
