"""Sharded HF-checkpoint loading smoke: ``pytorch_model-0000x-of-0000y.bin``
+ ``pytorch_model.bin.index.json`` (the layout released Vicuna shards use),
safetensors shards + index, and the ``mm_projector.bin`` fallback
(reference load path: model/builder.py:140-168)."""

import json
import os

import numpy as np
import pytest

from modelcompose_tpu.compose.state_io import save_state
from modelcompose_tpu.config import ModelConfig
from modelcompose_tpu.constants import MODAL_TOKEN_INDEXES
from modelcompose_tpu.models.loader import (load_hf_llama_dir,
                                            load_pretrained_model)

H, NL, NH, V, I = 16, 2, 2, 64, 32


def _cfg_dict():
    return ModelConfig(
        vocab_size=V, hidden_size=H, intermediate_size=I,
        num_hidden_layers=NL, num_attention_heads=NH, num_key_value_heads=NH,
        max_position_embeddings=64, lora_r=2, lora_alpha=4,
        lora_strategy="modal+language", dtype="float32",
        mm_vision_encoder="test:8x1", mm_hidden_size=8,
        mm_projector_type="mlp2x_gelu").to_dict()


def _base_state():
    rs = np.random.RandomState(0)

    def w(*shape):
        return rs.randn(*shape).astype(np.float32) * 0.1

    state = {"model.embed_tokens.weight": w(V, H),
             "model.norm.weight": np.ones(H, np.float32),
             "lm_head.weight": w(V, H)}
    for i in range(NL):
        p = f"model.layers.{i}"
        state.update({
            f"{p}.input_layernorm.weight": np.ones(H, np.float32),
            f"{p}.post_attention_layernorm.weight": np.ones(H, np.float32),
            f"{p}.self_attn.q_proj.weight": w(H, H),
            f"{p}.self_attn.k_proj.weight": w(H, H),
            f"{p}.self_attn.v_proj.weight": w(H, H),
            f"{p}.self_attn.o_proj.weight": w(H, H),
            f"{p}.mlp.gate_proj.weight": w(I, H),
            f"{p}.mlp.up_proj.weight": w(I, H),
            f"{p}.mlp.down_proj.weight": w(H, I),
        })
    return state


def _write_sharded(state, model_dir, fmt):
    """Two shards + HF index.json (bin or safetensors naming)."""
    os.makedirs(model_dir, exist_ok=True)
    keys = sorted(state)
    half = len(keys) // 2
    if fmt == "bin":
        shards = ["pytorch_model-00001-of-00002.bin",
                  "pytorch_model-00002-of-00002.bin"]
        index = "pytorch_model.bin.index.json"
    else:
        shards = ["model-00001-of-00002.safetensors",
                  "model-00002-of-00002.safetensors"]
        index = "model.safetensors.index.json"
    weight_map = {}
    for shard, ks in zip(shards, (keys[:half], keys[half:])):
        save_state({k: state[k] for k in ks},
                   os.path.join(model_dir, shard))
        weight_map.update({k: shard for k in ks})
    with open(os.path.join(model_dir, index), "w") as f:
        json.dump({"metadata": {"total_size": 0},
                   "weight_map": weight_map}, f)


def _write_adapter(ckpt_dir, basename="adapter_model.bin"):
    os.makedirs(ckpt_dir, exist_ok=True)
    rs = np.random.RandomState(1)
    adapter = {}
    for i in range(NL):
        for grp, projs, d_out in (("self_attn", ["q_proj", "o_proj"], H),
                                  ("mlp", ["down_proj"], H)):
            for proj in projs:
                d_in = I if proj == "down_proj" else H
                base = f"model.layers.{i}.{grp}.{proj}"
                for name in ("default", "vision"):
                    adapter[f"{base}.lora_A.{name}.weight"] = \
                        rs.randn(2, d_in).astype(np.float32) * 0.1
                    adapter[f"{base}.lora_B.{name}.weight"] = \
                        rs.randn(d_out, 2).astype(np.float32) * 0.1
    # projector (mlp2x_gelu: Sequential indexes 0 and 2)
    pp = "model.modal_projectors.vision"
    adapter[f"{pp}.0.weight"] = rs.randn(H, 8).astype(np.float32) * 0.1
    adapter[f"{pp}.0.bias"] = np.zeros(H, np.float32)
    adapter[f"{pp}.2.weight"] = rs.randn(H, H).astype(np.float32) * 0.1
    adapter[f"{pp}.2.bias"] = np.zeros(H, np.float32)
    save_state(adapter, os.path.join(ckpt_dir, basename))
    with open(os.path.join(ckpt_dir, "config.json"), "w") as f:
        json.dump(_cfg_dict(), f)
    return adapter


@pytest.mark.parametrize("fmt", ["bin", "safetensors"])
def test_sharded_base_load_roundtrip(fmt, tmp_path):
    state = _base_state()
    sharded = tmp_path / f"vicuna-sharded-{fmt}"
    flat = tmp_path / "vicuna-flat"
    _write_sharded(state, str(sharded), fmt)
    flat.mkdir()
    save_state(state, str(flat / "pytorch_model.bin"))

    got = load_hf_llama_dir(str(sharded))
    want = load_hf_llama_dir(str(flat))
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])


def test_index_with_missing_shard_key_raises(tmp_path):
    state = _base_state()
    d = tmp_path / "broken"
    _write_sharded(state, str(d), "bin")
    with open(d / "pytorch_model.bin.index.json") as f:
        index = json.load(f)
    index["weight_map"]["model.ghost.weight"] = \
        "pytorch_model-00001-of-00002.bin"
    with open(d / "pytorch_model.bin.index.json", "w") as f:
        json.dump(index, f)
    with pytest.raises(KeyError):
        load_hf_llama_dir(str(d))


@pytest.mark.slow
def test_load_pretrained_over_sharded_base_generates(tmp_path):
    base = tmp_path / "vicuna-tiny"
    ckpt = tmp_path / "multimodal-tiny"
    _write_sharded(_base_state(), str(base), "bin")
    _write_adapter(str(ckpt))

    _, model, _, ctx = load_pretrained_model(
        str(ckpt), str(base), "multimodal-tiny",
        load_tokenizer_fn=lambda p: None)
    assert ctx == 2048
    ids = np.array([1, 5, MODAL_TOKEN_INDEXES["vision"], 7])
    pixels = np.zeros((1, 28, 28, 3), np.float32)
    out = model.generate([ids], {"vision": pixels}, max_new_tokens=3)
    assert len(out[0]) <= 3


def test_mm_projector_bin_fallback(tmp_path):
    """Stage-1 checkpoints carry only mm_projector.bin (reference:
    builder.py:157-163 fallback; train_multimodal.py:216-234)."""
    base = tmp_path / "vicuna-tiny"
    ckpt = tmp_path / "multimodal-proj-only"
    _write_sharded(_base_state(), str(base), "bin")
    ckpt.mkdir()
    rs = np.random.RandomState(2)
    proj = {"model.modal_projectors.vision.0.weight":
            rs.randn(H, 8).astype(np.float32),
            "model.modal_projectors.vision.0.bias": np.zeros(H, np.float32),
            "model.modal_projectors.vision.2.weight":
            rs.randn(H, H).astype(np.float32),
            "model.modal_projectors.vision.2.bias": np.zeros(H, np.float32)}
    save_state(proj, str(ckpt / "mm_projector.bin"))
    with open(ckpt / "config.json", "w") as f:
        json.dump(_cfg_dict(), f)

    _, model, _, _ = load_pretrained_model(
        str(ckpt), str(base), "multimodal-proj-only",
        load_tokenizer_fn=lambda p: None)
    got = np.asarray(model.projectors["vision"]["layers"][0]["w"])
    np.testing.assert_allclose(
        got, proj["model.modal_projectors.vision.0.weight"].T, atol=1e-6)


def test_load_8bit_and_fold_decode(tmp_path):
    """Reference builder's load_8bit role + the production dense fold:
    backbone weights load as int8 dicts, routing table rebases (default
    row zero), and generation still runs end-to-end."""
    base = tmp_path / "vicuna-tiny"
    ckpt = tmp_path / "multimodal-tiny"
    _write_sharded(_base_state(), str(base), "bin")
    _write_adapter(str(ckpt))

    _, model, _, _ = load_pretrained_model(
        str(ckpt), str(base), "multimodal-tiny",
        load_tokenizer_fn=lambda p: None,
        load_8bit=True, fold_decode_dense=True)
    w = model.params["layers"]["attn"]["q"]["w"]
    assert isinstance(w, dict) and w["q"].dtype == np.int8
    assert np.allclose(np.asarray(model.routing_table)[0], 0.0)
    ids = np.array([1, 5, MODAL_TOKEN_INDEXES["vision"], 7])
    out = model.generate([ids], {"vision": np.zeros((1, 28, 28, 3),
                                                    np.float32)},
                         max_new_tokens=3)
    assert len(out[0]) <= 3


@pytest.mark.slow
def test_loader_tp_sharded_generation_matches(tmp_path):
    """loader(tp=4): Megatron-sharded backbone on a (1,4) mesh generates
    the same greedy tokens as the single-device load — the production
    TP serving configuration (parallel/mesh.param_pspecs; driver twin:
    __graft_entry__.decode_mesh_check)."""
    base = tmp_path / "vicuna-tiny"
    ckpt = tmp_path / "multimodal-tiny"
    _write_sharded(_base_state(), str(base), "bin")
    _write_adapter(str(ckpt))

    kw = dict(load_tokenizer_fn=lambda p: None)
    _, m1, _, _ = load_pretrained_model(
        str(ckpt), str(base), "multimodal-tiny", **kw)
    _, m4, _, _ = load_pretrained_model(
        str(ckpt), str(base), "multimodal-tiny", tp=4, **kw)
    # the sharded tree is committed to 4 devices
    w = m4.params["layers"]["attn"]["q"]["w"]
    assert len(w.sharding.device_set) == 4

    pixels = np.linspace(-1, 1, 28 * 28 * 3,
                         dtype=np.float32).reshape(1, 28, 28, 3)
    ids = [np.array([1, MODAL_TOKEN_INDEXES["vision"], 7, 8, 9])]
    t1 = m1.generate(ids, {"vision": pixels}, max_new_tokens=6)
    t4 = m4.generate(ids, {"vision": pixels}, max_new_tokens=6)
    assert t1 == t4


def test_loader_tp_with_int8_and_fold(tmp_path):
    """tp composes with --load-8bit + --fold-decode (quantized leaves get
    q sharded / scales replicated in parallel/mesh.shard_params)."""
    base = tmp_path / "vicuna-tiny"
    ckpt = tmp_path / "multimodal-tiny"
    _write_sharded(_base_state(), str(base), "bin")
    _write_adapter(str(ckpt))

    kw = dict(load_tokenizer_fn=lambda p: None, load_8bit=True,
              fold_decode_dense=True)
    _, m1, _, _ = load_pretrained_model(
        str(ckpt), str(base), "multimodal-tiny", **kw)
    _, m4, _, _ = load_pretrained_model(
        str(ckpt), str(base), "multimodal-tiny", tp=4, **kw)
    w = m4.params["layers"]["attn"]["q"]["w"]
    assert len(w["q"].sharding.device_set) == 4

    pixels = np.linspace(-1, 1, 28 * 28 * 3,
                         dtype=np.float32).reshape(1, 28, 28, 3)
    ids = [np.array([1, MODAL_TOKEN_INDEXES["vision"], 7, 8, 9])]
    t1 = m1.generate(ids, {"vision": pixels}, max_new_tokens=6)
    t4 = m4.generate(ids, {"vision": pixels}, max_new_tokens=6)
    assert t1 == t4
