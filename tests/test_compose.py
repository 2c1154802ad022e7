"""Merge toolchain semantics vs the reference's state-dict arithmetic
(reference: scripts/model_composition/{merge_unimodal_modelcompose,
ties_merging,calculate_metrics}.py)."""

import json
import os

import numpy as np
import pytest

from modelcompose_tpu.compose.delta import get_delta_weight, load_delta_weights
from modelcompose_tpu.compose.merge import get_modal_from_config, merge_checkpoints
from modelcompose_tpu.compose.metrics import calculate_metrics
from modelcompose_tpu.compose.state_io import load_adapter_dir, load_state, save_state
from modelcompose_tpu.compose.ties import (convert_delta_to_ft, do_merging,
                                           resolve_sign, state_dict_to_vector,
                                           topk_values_mask,
                                           vector_to_state_dict)


# ---------------------------------------------------------------- TIES unit

def test_ties_demo_golden():
    # The reference's tiny-tensor demo (ties_merging.py:253-256).
    ft_a = {"x": np.array([1., 2, 3]), "y": np.array([4., 5, 6])}
    ft_b = {"x": np.array([-1., 2, 3]), "y": np.array([0., 0, 0])}
    merged = do_merging([ft_a, ft_b], K=0.9)
    np.testing.assert_allclose(merged["x"], [1, 2, 3])
    np.testing.assert_allclose(merged["y"], [4, 5, 6])


def test_topk_mask_keeps_top_magnitude():
    # Reference semantics (ties_merging.py:88-108): with K=50 on d=4, the
    # threshold is the (d - int(d*K/100))-th smallest |.| and the mask is
    # ``abs >= threshold`` — so 3 of 4 entries survive here, not 2.
    m = np.array([[1., -5, 2, 0.5]])
    out = topk_values_mask(m, K=50)
    np.testing.assert_allclose(out, [[1, -5, 2, 0]])
    # K=25 -> threshold = 3rd smallest (2.0) -> keep |x| >= 2
    np.testing.assert_allclose(topk_values_mask(m, K=25), [[0, -5, 2, 0]])


def test_resolve_sign_majority_fills_zeros():
    mat = np.array([[1., -1, 2], [1., 1, -2]])
    # col sums: 2, 0, 0 -> signs 1, 0, 0; majority = sign(1) = 1
    np.testing.assert_allclose(resolve_sign(mat), [1, 1, 1])


def test_disjoint_mean_counts_nonzero_only():
    ft_a = {"x": np.array([2., -2])}
    ft_b = {"x": np.array([4., 2])}
    merged = do_merging([ft_a, ft_b], K=100, merge_func="dis-mean")
    # col0: signs +, both kept -> mean 3; col1: sum 0 -> sign majority +
    # -> keep only +2 -> mean 2
    np.testing.assert_allclose(merged["x"], [3, 2])


def test_ties_max():
    ft_a = {"x": np.array([2., -5])}
    ft_b = {"x": np.array([4., 1])}
    merged = do_merging([ft_a, ft_b], K=100, merge_func="dis-max")
    # col1: sum -4 -> sign -, keep -5 only, max |.| = 5 * sign = -5
    np.testing.assert_allclose(merged["x"], [4, -5])


def test_vector_roundtrip():
    sd = {"b": np.arange(6, dtype=np.float32).reshape(2, 3),
          "a": np.array([7., 8])}
    vec = state_dict_to_vector(sd)
    assert vec.tolist() == [7, 8, 0, 1, 2, 3, 4, 5]  # sorted keys: a, b
    back = vector_to_state_dict(vec, sd)
    np.testing.assert_allclose(back["b"], sd["b"])


def test_convert_delta_to_ft_splits_uniques():
    delta = {"shared": [np.ones(2), np.zeros(2)], "solo": [np.full(2, 3.0)]}
    ft, uniq = convert_delta_to_ft(delta)
    assert len(ft) == 2 and "shared" in ft[0] and "solo" not in ft[0]
    assert list(uniq) == ["solo"]


# ------------------------------------------------------------- merge CLI

def _write_ckpt(tmp_path, name, weights, config):
    d = tmp_path / name
    os.makedirs(d, exist_ok=True)
    save_state(weights, str(d / "adapter_model.safetensors"))
    with open(d / "config.json", "w") as f:
        json.dump(config, f)
    return str(d)


VIS_CFG = {"mm_vision_encoder": "clip-vit", "lora_r": 4, "lora_alpha": 8,
           "lora_strategy": "modal+language"}
AUD_CFG = {"mm_audio_encoder": "beats", "lora_r": 4, "lora_alpha": 8,
           "lora_strategy": "modal+language"}


def test_get_modal_from_config():
    assert get_modal_from_config(VIS_CFG) == "vision"
    assert get_modal_from_config(AUD_CFG) == "audio"
    with pytest.raises(AssertionError):
        get_modal_from_config({"mm_vision_encoder": ""})


def test_online_merge_reset(tmp_path):
    k_def = "model.layers.0.self_attn.q_proj.lora_A.default.weight"
    k_vis = "model.layers.0.self_attn.q_proj.lora_A.vision.weight"
    k_aud = "model.layers.0.self_attn.q_proj.lora_A.audio.weight"
    a = _write_ckpt(tmp_path, "vis", {k_def: np.ones((4, 8), np.float32),
                                      k_vis: np.full((4, 8), 2, np.float32)},
                    VIS_CFG)
    b = _write_ckpt(tmp_path, "aud", {k_def: np.full((4, 8), 3, np.float32),
                                      k_aud: np.full((4, 8), 4, np.float32)},
                    AUD_CFG)
    out = str(tmp_path / "merged")
    merge_checkpoints([a, b], out,
                      "online-merge-reset-default-vision=0.5,default-audio=0.5")
    merged = load_adapter_dir(out)
    # unique keys pass through; shared default renamed per modality
    # (reference: merge_unimodal_modelcompose.py:94-103)
    assert k_vis in merged and k_aud in merged and k_def not in merged
    np.testing.assert_allclose(
        merged[k_def.replace("default", "default-vision")], 1)
    np.testing.assert_allclose(
        merged[k_def.replace("default", "default-audio")], 3)
    cfg = json.load(open(os.path.join(out, "config.json")))
    assert cfg["reset_scaling_weights"] == \
        "default-vision=0.5,default-audio=0.5"
    assert cfg["vision_lora_r"] == 4 and cfg["audio_lora_alpha"] == 8
    assert cfg["mm_vision_encoder"] == "clip-vit"
    assert cfg["mm_audio_encoder"] == "beats"
    assert os.path.exists(os.path.join(out, "merge_info.txt"))


def test_sum_and_mean(tmp_path):
    k = "model.mm_projector.0.weight"
    a = _write_ckpt(tmp_path, "a", {k: np.full((2, 2), 1.0, np.float32)}, VIS_CFG)
    b = _write_ckpt(tmp_path, "b", {k: np.full((2, 2), 5.0, np.float32)}, AUD_CFG)
    merge_checkpoints([a, b], str(tmp_path / "s"), "sum")
    np.testing.assert_allclose(load_adapter_dir(str(tmp_path / "s"))[k], 6)
    merge_checkpoints([a, b], str(tmp_path / "m"), "mean")
    np.testing.assert_allclose(load_adapter_dir(str(tmp_path / "m"))[k], 3)


def test_ties_merge_cli(tmp_path):
    shared = "model.layers.0.q.lora_A.default.weight"
    a = _write_ckpt(tmp_path, "a",
                    {shared: np.array([1., 2, 3], np.float32),
                     "uniq.vision": np.array([9.], np.float32)}, VIS_CFG)
    b = _write_ckpt(tmp_path, "b",
                    {shared: np.array([-1., 2, 3], np.float32)}, AUD_CFG)
    out = str(tmp_path / "t")
    merge_checkpoints([a, b], out, "ties-mean", K=90)
    merged = load_adapter_dir(out)
    np.testing.assert_allclose(merged[shared], [1, 2, 3])
    np.testing.assert_allclose(merged["uniq.vision"], [9])
    info = open(os.path.join(out, "merge_info.txt")).read()
    assert "dis-mean-90" in info


def test_convert_upgrades_naive_mc(tmp_path):
    k_def = "model.layers.0.q.lora_A.default.weight"
    cfg_a = dict(VIS_CFG, lora_strategy="same")
    cfg_b = dict(AUD_CFG, lora_strategy="same")
    a = _write_ckpt(tmp_path, "a", {k_def: np.ones(3, np.float32)}, cfg_a)
    b = _write_ckpt(tmp_path, "b", {k_def: np.full(3, 2.0, np.float32)}, cfg_b)
    out = str(tmp_path / "c")
    merge_checkpoints([a, b], out, "convert-online-merge-mean")
    merged = load_adapter_dir(out)
    # per-modal duplicates created, then online-merge keeps them + renames
    # the shared default rows (reference: :42-71)
    np.testing.assert_allclose(merged[k_def.replace("default", "vision")], 1)
    np.testing.assert_allclose(merged[k_def.replace("default", "audio")], 2)
    np.testing.assert_allclose(
        merged[k_def.replace("default", "default-vision")], 1)
    cfg = json.load(open(os.path.join(out, "config.json")))
    assert cfg["lora_strategy"] == "modal+language"
    assert cfg["merge_default_weights"] == "mean"


# --------------------------------------------------------------- metrics

def test_calculate_metrics(tmp_path):
    k = "model.layers.0.q.lora_A.default.weight"
    a = _write_ckpt(tmp_path, "a", {k: np.array([1., 0], np.float32)}, VIS_CFG)
    b = _write_ckpt(tmp_path, "b", {k: np.array([0., 1], np.float32)}, AUD_CFG)
    out = str(tmp_path / "mg")
    merge_checkpoints([a, b], out, "sum")
    res = calculate_metrics(out)
    assert abs(res["L2"] - np.sqrt(2)) < 1e-6
    assert abs(res["Cosine"] - 1.0) < 1e-6  # orthogonal task vectors
    assert os.path.exists(os.path.join(out, "merge_metrics.txt"))


# ----------------------------------------------------------------- delta

def test_delta_weights(tmp_path):
    a = np.random.RandomState(0).randn(2, 8).astype(np.float32)  # [r, in]
    b = np.random.RandomState(1).randn(6, 2).astype(np.float32)  # [out, r]
    d = get_delta_weight(a, b, 2.0)
    np.testing.assert_allclose(d, (b @ a) * 2.0, rtol=1e-6)
    ckpt = _write_ckpt(
        tmp_path, "d",
        {"model.layers.0.q_proj.lora_A.vision.weight": a,
         "model.layers.0.q_proj.lora_B.vision.weight": b}, VIS_CFG)
    deltas = load_delta_weights(ckpt)
    np.testing.assert_allclose(
        deltas["vision"]["model.layers.0.q_proj.weight"], (b @ a) * 2.0,
        rtol=1e-6)


# ------------------------------------------------------------- state IO

def test_state_io_roundtrip_formats(tmp_path):
    sd = {"w": np.random.RandomState(0).randn(3, 4).astype(np.float32)}
    for name in ("x.safetensors", "x.npz", "x.bin"):
        p = str(tmp_path / name)
        save_state(sd, p)
        back = load_state(p)
        np.testing.assert_allclose(back["w"], sd["w"])


def test_modal_lora_stamps_honored_in_scales():
    """The merge CLI stamps {modal}_lora_{r,alpha} into config.json; the
    runtime honors the per-modal alpha/r scale (the reference drops the
    stamps and mis-scales heterogeneous-alpha compositions) and rejects a
    stamped rank it cannot represent."""
    import numpy as np
    import pytest
    from modelcompose_tpu.config import ModelConfig, ROUTE_CLASS_INDEX

    d = ModelConfig(lora_strategy="modal+language", lora_r=4, lora_alpha=8,
                    mm_vision_encoder="x", mm_audio_encoder="y").to_dict()
    d["vision_lora_r"] = 4
    d["vision_lora_alpha"] = 16  # heterogeneous alpha
    d["audio_lora_r"] = 4
    d["audio_lora_alpha"] = 8
    cfg = ModelConfig.from_dict(d)
    table = cfg.routing_table()
    names = cfg.adapter_names()
    assert table[ROUTE_CLASS_INDEX["vision"],
                 names.index("vision")] == pytest.approx(16 / 4)
    assert table[ROUTE_CLASS_INDEX["audio"],
                 names.index("audio")] == pytest.approx(8 / 4)
    # roundtrips through config.json
    cfg2 = ModelConfig.from_dict(cfg.to_dict())
    assert cfg2.modal_lora_params == cfg.modal_lora_params
    # heterogeneous RANK is not representable -> loud error
    d["vision_lora_r"] = 8
    with pytest.raises(ValueError, match="rank-heterogeneous"):
        ModelConfig.from_dict(d).routing_table()


def test_metrics_three_way_mean_pairwise(tmp_path):
    """3+-way merges average L2/cosine over ALL pairs (the reference
    hard-codes rows 0 and 1, silently ignoring row 2+)."""
    from modelcompose_tpu.compose.metrics import (cosine_dissimilarity,
                                                  l2_distance)
    xy = np.array([[1., 0, 0], [0., 1, 0], [0., 0, 1]], np.float32)
    assert abs(l2_distance(xy) - np.sqrt(2)) < 1e-6  # every pair sqrt(2)
    assert abs(cosine_dissimilarity(xy) - 1.0) < 1e-6  # all orthogonal
    # two-row parity with the reference formula is exact
    two = np.array([[3., 0], [0., 4]], np.float32)
    assert abs(l2_distance(two) - 5.0) < 1e-6


def test_calculate_metrics_malformed_info(tmp_path):
    d = tmp_path / "bad"
    d.mkdir()
    (d / "merge_info.txt").write_text("not the merge CLI format")
    with pytest.raises(ValueError, match="malformed merge_info"):
        calculate_metrics(str(d))


def test_delta_weights_honor_modal_stamps(tmp_path):
    """Per-modality alpha stamps written by the merge CLI
    ({modal}_lora_alpha) scale the analyzed delta like the runtime does
    (config.ModelConfig.modal_scale)."""
    a = np.random.RandomState(0).randn(4, 8).astype(np.float32)
    b = np.random.RandomState(1).randn(6, 4).astype(np.float32)
    cfg = dict(VIS_CFG)
    cfg.update({"mm_audio_encoder": "beats",
                "audio_lora_alpha": 16, "audio_lora_r": 4})
    ckpt = _write_ckpt(
        tmp_path, "stamped",
        {"model.layers.0.q_proj.lora_A.vision.weight": a,
         "model.layers.0.q_proj.lora_B.vision.weight": b,
         "model.layers.0.q_proj.lora_A.audio.weight": a,
         "model.layers.0.q_proj.lora_B.audio.weight": b}, cfg)
    deltas = load_delta_weights(ckpt)
    base = "model.layers.0.q_proj.weight"
    np.testing.assert_allclose(deltas["vision"][base], (b @ a) * 2.0,
                               rtol=1e-6)  # global 8/4
    np.testing.assert_allclose(deltas["audio"][base], (b @ a) * 4.0,
                               rtol=1e-6)  # stamped 16/4


def test_adapter_dir_strips_peft_prefix(tmp_path):
    """Converted LLaVA-LoRA checkpoints carry peft's 'base_model.model.'
    wrapper prefix; load_adapter_dir strips it so loader/merge/metrics
    match on reference 'model.layers.*' keys."""
    d = tmp_path / "peft"
    d.mkdir()
    save_state(
        {"base_model.model.model.layers.0.self_attn.q_proj"
         ".lora_A.vision.weight": np.ones((4, 8), np.float32),
         "prefix_tokens.vision": np.zeros((1, 2, 8), np.float32)},
        str(d / "adapter_model.safetensors"))
    out = load_adapter_dir(str(d))
    assert "model.layers.0.self_attn.q_proj.lora_A.vision.weight" in out
    assert "prefix_tokens.vision" in out
