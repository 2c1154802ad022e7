"""The framework's signature flow end-to-end on tiny dims:

train vision DAMC -> train audio DAMC -> merge (online-merge-reset) ->
load composed checkpoint -> routed generation with both modalities
(reference flow: README.md:69-91 + SURVEY.md §3.3/§3.4)."""

import json
import os

import numpy as np
import pytest
from PIL import Image


from tests.fake_tokenizer import FakeLlamaTokenizer as TinyTokenizer



def _tiny_cfg_patch(monkeypatch):
    import modelcompose_tpu.train.train_multimodal as tm
    orig = tm.build_model_config

    def tiny_cfg(a):
        cfg = orig(a)
        cfg.vocab_size, cfg.hidden_size = 256, 64
        cfg.intermediate_size, cfg.num_hidden_layers = 128, 2
        cfg.num_attention_heads = cfg.num_key_value_heads = 4
        return cfg

    monkeypatch.setattr(tm, "build_model_config", tiny_cfg)


def _train_unimodal(tmp_path, modal, monkeypatch):
    from modelcompose_tpu.train.train_multimodal import build_arg_parser, \
        train
    if modal == "vision":
        img = tmp_path / "img.png"
        Image.fromarray((np.random.RandomState(0).rand(32, 32, 3) * 255)
                        .astype(np.uint8)).save(img)
        data = [{"id": i, "conversations": [
            {"from": "human", "value": "<image>\nwhat"},
            {"from": "gpt", "value": f"ans {i}"}],
            "modal_inputs": {"vision": [str(img)]}} for i in range(2)]
        extra = ["--mm_vision_encoder", "test:32x2",
                 "--mm_projector_type", "mlp2x_gelu",
                 "--mm_vision_select_layer", "-2"]
    else:
        wav = tmp_path / "a.npy"
        np.save(wav, np.random.RandomState(1).randn(8000).astype(np.float32))
        data = [{"id": i, "conversations": [
            {"from": "human", "value": "<audio>\nwhat"},
            {"from": "gpt", "value": f"snd {i}"}],
            "modal_inputs": {"audio": [str(wav)]}} for i in range(2)]
        extra = ["--mm_audio_encoder", "test:16x2",
                 "--mm_audio_projector_type", "qformer_4N_2L"]
    data_path = tmp_path / f"{modal}.json"
    data_path.write_text(json.dumps(data))

    out = str(tmp_path / f"ckpt-{modal}")
    args = build_arg_parser().parse_args([
        "--model_name_or_path", str(tmp_path / "none"),
        "--version", "v1", "--data_path", str(data_path),
        "--output_dir", out,
        "--lora_strategy", "modal+language", "--lora_r", "4",
        "--lora_alpha", "8", "--local_prefix_tokens", "1",
        "--local_suffix_tokens", "1",
        "--per_device_train_batch_size", "2", "--max_steps", "2",
        "--learning_rate", "1e-3", "--bf16", "False",
        "--save_steps", "100", "--logging_steps", "1",
        "--random_init_backbone"] + extra)
    train(args, tokenizer=TinyTokenizer())
    return out


@pytest.mark.slow
def test_full_composition_flow(tmp_path, monkeypatch):
    _tiny_cfg_patch(monkeypatch)
    vis_ckpt = _train_unimodal(tmp_path, "vision", monkeypatch)
    aud_ckpt = _train_unimodal(tmp_path, "audio", monkeypatch)

    # --- merge: the composition step (zero retraining) ---
    from modelcompose_tpu.compose.merge import merge_checkpoints
    merged = str(tmp_path / "merged-multimodal")
    merge_checkpoints(
        [vis_ckpt, aud_ckpt], merged,
        "online-merge-reset-default-vision=0.5,default-audio=0.5")

    cfg_json = json.load(open(os.path.join(merged, "config.json")))
    assert cfg_json["reset_scaling_weights"] == \
        "default-vision=0.5,default-audio=0.5"
    assert cfg_json["mm_vision_encoder"] and cfg_json["mm_audio_encoder"]

    # --- the merged config spawns default-{modal} adapter rows ---
    from modelcompose_tpu.config import ModelConfig
    cfg = ModelConfig.from_dict(cfg_json)
    # both towers present after union
    assert set(cfg.modalities()) == {"audio", "vision"}
    names = cfg.adapter_names()
    assert "default-vision" in names and "default-audio" in names
    table = cfg.routing_table()
    # default route class mixes the reset rows with 0.5 coefficients
    dv = names.index("default-vision")
    np.testing.assert_allclose(table[0, dv],
                               cfg.lora_alpha / cfg.lora_r * 0.5)

    # --- load the composition with a base and generate multimodally ---
    # base weights: export tiny HF-layout state from random params
    import jax
    from safetensors.numpy import save_file
    from modelcompose_tpu.core.llama import init_params
    base_dir = tmp_path / "vicuna-tiny"
    base_dir.mkdir()
    params = init_params(cfg, jax.random.PRNGKey(0))

    def t(x):
        return np.asarray(x, np.float32)

    state = {"model.embed_tokens.weight": t(params["embed_tokens"]),
             "model.norm.weight": t(params["norm"]),
             "lm_head.weight": t(params["lm_head"]).T}
    layer_map = {"self_attn.q_proj": ("attn", "q"),
                 "self_attn.k_proj": ("attn", "k"),
                 "self_attn.v_proj": ("attn", "v"),
                 "self_attn.o_proj": ("attn", "o"),
                 "mlp.gate_proj": ("mlp", "gate"),
                 "mlp.up_proj": ("mlp", "up"),
                 "mlp.down_proj": ("mlp", "down")}
    for i in range(cfg.num_hidden_layers):
        for tname, (grp, ours) in layer_map.items():
            state[f"model.layers.{i}.{tname}.weight"] = \
                t(params["layers"][grp][ours]["w"][i]).T
        state[f"model.layers.{i}.input_layernorm.weight"] = \
            t(params["layers"]["input_layernorm"][i])
        state[f"model.layers.{i}.post_attention_layernorm.weight"] = \
            t(params["layers"]["post_attention_layernorm"][i])
    save_file({k: np.ascontiguousarray(v) for k, v in state.items()},
              str(base_dir / "model.safetensors"))

    import modelcompose_tpu.models.loader as loader_mod
    monkeypatch.setattr(loader_mod, "load_tokenizer",
                        lambda mb: TinyTokenizer())
    tokenizer, model, processors, _ = loader_mod.load_pretrained_model(
        merged, str(base_dir))
    assert set(model.encoders) == {"audio", "vision"}
    assert model.cfg.routing_active()

    # generate on a mixed image+audio prompt
    from modelcompose_tpu.constants import MODAL_TOKEN_INDEXES
    ids = np.array([1, MODAL_TOKEN_INDEXES["vision"], 9,
                    MODAL_TOKEN_INDEXES["audio"], 11])
    pixels = np.random.RandomState(2).rand(1, 28, 28, 3).astype(np.float32)
    audio = {"audio_inputs":
             np.random.RandomState(3).randn(1, 16, 8).astype(np.float32),
             "audio_padding_mask": np.zeros((1, 16), bool)}
    out = model.generate([ids], {"vision": pixels, "audio": audio},
                         max_new_tokens=4, bucket_len=32)
    assert len(out[0]) > 0

    # decode-time 'default' mix actually uses the reset rows: changing the
    # coefficients changes the output
    cfg2 = ModelConfig.from_dict(dict(
        cfg_json,
        reset_scaling_weights="default-vision=500.0,default-audio=500.0"))
    from modelcompose_tpu.core.llama import forward
    from modelcompose_tpu.models.model import MultimodalLM
    model2 = MultimodalLM(cfg2, model.params, model.encoders,
                          model.projectors)
    embeds, plan = model.prepare_batch([ids],
                                       {"vision": pixels, "audio": audio},
                                       bucket_len=32)
    import jax.numpy as jnp
    logits1, _ = forward(model.params, cfg, embeds,
                         route_ids=jnp.asarray(plan.route_ids),
                         routing_table=jnp.asarray(model.routing_table),
                         segment_ids=jnp.asarray(plan.segment_ids))
    logits2, _ = forward(model.params, cfg2, embeds,
                         route_ids=jnp.asarray(plan.route_ids),
                         routing_table=jnp.asarray(model2.routing_table),
                         segment_ids=jnp.asarray(plan.segment_ids))
    last = plan.lengths[0] - 1
    diff = float(jnp.abs(logits1[0, last] - logits2[0, last]).max())
    assert diff > 1e-6, \
        "reset coefficients had no effect on the default-route logits"
