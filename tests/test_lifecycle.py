"""Lifecycle utilities (reference: modelcompose/model/{apply_delta,
make_delta,consolidate}.py, scripts/merge_mm_projectors.py)."""

import numpy as np

from modelcompose_tpu.compose.lifecycle import (apply_delta, consolidate,
                                                extract_projector,
                                                make_delta, merge_projectors)
from modelcompose_tpu.compose.state_io import load_state, save_state


def test_delta_roundtrip(tmp_path):
    base = {"w": np.ones((2, 2), np.float32)}
    target = {"w": np.full((2, 2), 3.0, np.float32),
              "model.mm_projector.0.weight": np.ones(4, np.float32)}
    save_state(base, str(tmp_path / "base.safetensors"))
    save_state(target, str(tmp_path / "target.safetensors"))
    make_delta(str(tmp_path / "base.safetensors"),
               str(tmp_path / "target.safetensors"),
               str(tmp_path / "delta.safetensors"))
    delta = load_state(str(tmp_path / "delta.safetensors"))
    np.testing.assert_allclose(delta["w"], 2.0)
    apply_delta(str(tmp_path / "base.safetensors"),
                str(tmp_path / "delta.safetensors"),
                str(tmp_path / "rebuilt.safetensors"))
    rebuilt = load_state(str(tmp_path / "rebuilt.safetensors"))
    np.testing.assert_allclose(rebuilt["w"], target["w"])
    np.testing.assert_allclose(rebuilt["model.mm_projector.0.weight"], 1.0)


def test_consolidate_and_extract(tmp_path):
    d = tmp_path / "shards"
    d.mkdir()
    save_state({"a": np.ones(2, np.float32)}, str(d / "s1.safetensors"))
    save_state({"model.modal_projectors.vision.0.weight":
                np.ones(3, np.float32)}, str(d / "s2.safetensors"))
    consolidate(str(d), str(tmp_path / "all.safetensors"))
    allw = load_state(str(tmp_path / "all.safetensors"))
    assert set(allw) == {"a", "model.modal_projectors.vision.0.weight"}
    extract_projector(str(tmp_path / "all.safetensors"),
                      str(tmp_path / "proj.safetensors"))
    proj = load_state(str(tmp_path / "proj.safetensors"))
    assert list(proj) == ["model.modal_projectors.vision.0.weight"]


def test_merge_projectors_union_later_wins(tmp_path):
    save_state({"x": np.zeros(2, np.float32)}, str(tmp_path / "a.safetensors"))
    save_state({"x": np.ones(2, np.float32),
                "y": np.ones(2, np.float32)}, str(tmp_path / "b.safetensors"))
    merge_projectors([str(tmp_path / "a.safetensors"),
                      str(tmp_path / "b.safetensors")],
                     str(tmp_path / "m.safetensors"))
    m = load_state(str(tmp_path / "m.safetensors"))
    np.testing.assert_allclose(m["x"], 1.0)
