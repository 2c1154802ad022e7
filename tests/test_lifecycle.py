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


def test_merge_lora_to_dense(tmp_path, monkeypatch):
    """merge-lora: composed checkpoint -> dense standalone weights with
    the default-route adapter deltas folded in."""
    import jax
    import jax.numpy as jnp
    from modelcompose_tpu.compose.lifecycle import merge_lora_to_dense
    import modelcompose_tpu.compose.lifecycle as lc
    from modelcompose_tpu.config import tiny_test_config
    from modelcompose_tpu.models.model import MultimodalLM

    cfg = tiny_test_config(mm_vision_encoder="test:32x2", mm_hidden_size=32,
                           mm_projector_type="mlp2x_gelu")
    model = MultimodalLM.random_init(cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    p = model.params["layers"]["attn"]["q"]
    p["lora_b"] = jax.random.normal(key, p["lora_b"].shape) * 0.1

    def fake_loader(mp, mb, name, load_tokenizer_fn=None):
        return None, model, {}, 2048

    import modelcompose_tpu.models.loader as loader_mod
    monkeypatch.setattr(loader_mod, "load_pretrained_model", fake_loader)
    # lifecycle imports inside the function body -> patch the module ref
    merge_lora_to_dense.__globals__  # noqa: B018 — function uses late import
    monkeypatch.setattr(
        "modelcompose_tpu.models.loader.load_pretrained_model", fake_loader)

    out_dir = str(tmp_path / "dense")
    merge_lora_to_dense("ckpt-multimodal", "base", out_dir)
    dense = load_state(out_dir + "/model.safetensors")
    # q_proj weight includes the default-adapter delta
    table = cfg.routing_table()
    w = np.asarray(model.params["layers"]["attn"]["q"]["w"][0])
    la = np.asarray(p["lora_a"][0], np.float32)
    lb = np.asarray(p["lora_b"][0], np.float32)
    delta = np.einsum("a,air,aro->io", table[0], la, lb)
    np.testing.assert_allclose(
        dense["model.layers.0.self_attn.q_proj.weight"], (w + delta).T,
        atol=1e-5)
