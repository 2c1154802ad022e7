"""Checkpoint conversion fidelity: HF Llama base parity + adapter roundtrip
(reference layouts per modelcompose/train/train_multimodal.py:516-521 and
scripts/evaluate_delta_weights.py:24-30)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from modelcompose_tpu.compose.convert import (hf_llama_to_params,
                                              load_adapter_into_params,
                                              params_to_adapter,
                                              projector_from_reference,
                                              projector_to_reference)
from modelcompose_tpu.config import ModelConfig, tiny_test_config
from modelcompose_tpu.core.llama import forward, init_params
from modelcompose_tpu.models.projectors import apply_projector, init_projector


@pytest.fixture(scope="module")
def tiny_hf_llama():
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    hf_cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        attn_implementation="eager")
    model = LlamaForCausalLM(hf_cfg)
    model.eval()
    return model


def test_hf_llama_logits_parity(tiny_hf_llama):
    model = tiny_hf_llama
    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, dtype="float32", lora_r=2, lora_alpha=4)
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    params = hf_llama_to_params(state, cfg)

    ids = torch.randint(0, 128, (2, 10))
    with torch.no_grad():
        want = model(ids).logits.numpy()

    embeds = jnp.take(params["embed_tokens"], jnp.asarray(ids.numpy()), axis=0)
    got, _ = forward(params, cfg, embeds)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_adapter_roundtrip():
    cfg = tiny_test_config(mm_vision_encoder="clip", mm_hidden_size=8,
                           local_prefix_tokens=2, local_suffix_tokens=1)
    params = init_params(cfg, jax.random.PRNGKey(0))
    # randomize lora_b (zero-init otherwise -> roundtrip would be trivial)
    key = jax.random.PRNGKey(1)
    for grp in ("attn", "mlp"):
        for name in params["layers"][grp]:
            p = params["layers"][grp][name]
            key, sub = jax.random.split(key)
            p["lora_b"] = jax.random.normal(sub, p["lora_b"].shape,
                                            jnp.float32)
    params["prefix_tokens"]["vision"] = jnp.full((2, cfg.hidden_size), 0.5)

    exported = params_to_adapter(params, cfg)
    # keys follow the reference layout
    assert "model.layers.0.self_attn.q_proj.lora_A.default.weight" in exported
    assert "model.layers.1.mlp.down_proj.lora_B.vision.weight" in exported
    assert exported["prefix_tokens.vision"].shape == (1, 2, cfg.hidden_size)
    # torch layouts: lora_A [r, in], lora_B [out, r]
    assert exported[
        "model.layers.0.self_attn.q_proj.lora_A.default.weight"].shape == \
        (cfg.lora_r, cfg.hidden_size)

    fresh = init_params(cfg, jax.random.PRNGKey(9))
    leftovers = load_adapter_into_params(fresh, exported, cfg)
    assert leftovers == []
    np.testing.assert_allclose(
        np.asarray(fresh["layers"]["attn"]["q"]["lora_b"]),
        np.asarray(params["layers"]["attn"]["q"]["lora_b"]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(fresh["prefix_tokens"]["vision"]), 0.5)


def test_unknown_adapter_key_is_leftover_not_error():
    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    leftovers = load_adapter_into_params(
        params, {"model.layers.0.self_attn.q_proj.lora_A.bogus.weight":
                 np.zeros((4, 64), np.float32),
                 "something.else": np.zeros(3, np.float32)}, cfg)
    assert len(leftovers) == 2


def test_projector_roundtrip_qformer():
    spec = "qformer_4N_2L"
    p = init_projector(spec, jax.random.PRNGKey(0), 16, 32)
    flat = projector_to_reference(spec, p, "model.modal_projectors.audio")
    assert "model.modal_projectors.audio.audio_query_tokens" in flat
    assert ("model.modal_projectors.audio.audio_Qformer.bert.encoder."
            "layer.1.crossattention.self.key.weight") in flat
    back = projector_from_reference(spec, flat, "model.modal_projectors.audio")
    x = jnp.ones((1, 5, 16))
    np.testing.assert_allclose(np.asarray(apply_projector(spec, p, x)),
                               np.asarray(apply_projector(spec, back, x)),
                               atol=1e-6)


def test_projector_roundtrip_mlp():
    spec = "mlp2x_gelu"
    p = init_projector(spec, jax.random.PRNGKey(0), 8, 12)
    flat = projector_to_reference(spec, p, "model.modal_projectors.vision")
    assert "model.modal_projectors.vision.0.weight" in flat
    assert "model.modal_projectors.vision.2.weight" in flat
    assert flat["model.modal_projectors.vision.0.weight"].shape == (12, 8)
    back = projector_from_reference(spec, flat,
                                    "model.modal_projectors.vision")
    x = jnp.ones((2, 3, 8))
    np.testing.assert_allclose(np.asarray(apply_projector(spec, p, x)),
                               np.asarray(apply_projector(spec, back, x)),
                               atol=1e-6)


def test_adapter_load_fills_projector_params():
    cfg = tiny_test_config(mm_vision_encoder="clip", mm_hidden_size=8,
                           mm_projector_type="mlp2x_gelu")
    params = init_params(cfg, jax.random.PRNGKey(0))
    proj = init_projector("mlp2x_gelu", jax.random.PRNGKey(1), 8,
                          cfg.hidden_size)
    flat = params_to_adapter(params, cfg, projector_params={"vision": proj})
    fresh_proj = {}
    leftovers = load_adapter_into_params(
        init_params(cfg, jax.random.PRNGKey(2)), flat, cfg,
        projector_params=fresh_proj)
    assert leftovers == []
    x = jnp.ones((1, 4, 8))
    np.testing.assert_allclose(
        np.asarray(apply_projector("mlp2x_gelu", proj, x)),
        np.asarray(apply_projector("mlp2x_gelu", fresh_proj["vision"], x)),
        atol=1e-6)


def test_params_to_hf_llama_roundtrip():
    """Full-finetune export path: params -> HF state -> params is exact
    on the base weights (compose/convert.params_to_hf_llama)."""
    import jax
    import numpy as np

    from modelcompose_tpu.compose.convert import (hf_llama_to_params,
                                                  params_to_hf_llama)
    from modelcompose_tpu.config import tiny_test_config
    from modelcompose_tpu.core.llama import init_params

    cfg = tiny_test_config(mm_vision_encoder="x", mm_hidden_size=8,
                           dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(0))
    state = params_to_hf_llama(params, cfg)
    assert "model.embed_tokens.weight" in state
    assert "model.layers.0.self_attn.q_proj.weight" in state
    back = hf_llama_to_params(state, cfg)
    for path in (("embed_tokens",), ("norm",), ("lm_head",)):
        a, b = params, back
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(params["layers"]["mlp"]["down"]["w"]),
        np.asarray(back["layers"]["mlp"]["down"]["w"]))
