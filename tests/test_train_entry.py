"""End-to-end training entry: tiny dataset -> stage-1 then stage-2 ->
checkpoint exports load back through the eval loader
(reference flow: modelcompose/train/train_multimodal.py + model/builder.py)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from modelcompose_tpu.train.sampler import (
    get_length_grouped_indices, get_modality_length_grouped_indices,
    split_to_even_chunks)


from tests.fake_tokenizer import FakeLlamaTokenizer as TinyTokenizer



# ------------------------------------------------------------- samplers

def test_split_to_even_chunks_balances_mass():
    idx = list(range(8))
    lengths = [8, 7, 6, 5, 4, 3, 2, 1]
    chunks = split_to_even_chunks(idx, lengths, 2)
    assert sorted(sum(chunks, [])) == idx
    m0 = sum(lengths[i] for i in chunks[0])
    m1 = sum(lengths[i] for i in chunks[1])
    assert abs(m0 - m1) <= 4


def test_modality_grouped_indices_cover_all():
    lengths = [10, -5, 20, -3, 15, 8, -2, 12]
    rng = np.random.default_rng(0)
    order = get_modality_length_grouped_indices(lengths, 2, 1, rng)
    assert sorted(order) == list(range(8))


def test_length_grouped_indices_cover_all():
    order = get_length_grouped_indices([3, 1, 2, 5, 4, 6], 2, 1,
                                       np.random.default_rng(0))
    assert sorted(order) == list(range(6))


# -------------------------------------------------------------- full run

@pytest.fixture()
def tiny_dataset(tmp_path):
    img = tmp_path / "img.png"
    Image.fromarray((np.random.RandomState(0).rand(32, 32, 3) * 255)
                    .astype(np.uint8)).save(img)
    data = []
    for i in range(4):
        data.append({
            "id": i,
            "conversations": [
                {"from": "human", "value": "<image>\nwhat is it"},
                {"from": "gpt", "value": f"thing {i}"}],
            "modal_inputs": {"vision": [str(img)]}})
    data.append({"id": 99, "conversations": [
        {"from": "human", "value": "hello there"},
        {"from": "gpt", "value": "hi"}]})
    path = tmp_path / "train.json"
    path.write_text(json.dumps(data))
    return str(path)


def _args(tmp_path, data_path, **over):
    from modelcompose_tpu.train.train_multimodal import build_arg_parser
    base = [
        "--model_name_or_path", str(tmp_path / "nonexistent-base"),
        "--version", "v1",
        "--data_path", data_path,
        "--output_dir", str(tmp_path / "out"),
        "--mm_vision_encoder", "test:32x2",
        "--mm_projector_type", "mlp2x_gelu",
        "--mm_vision_select_layer", "-2",
        "--per_device_train_batch_size", "2",
        "--max_steps", "3",
        "--learning_rate", "1e-3",
        "--bf16", "False",
        "--save_steps", "2",
        "--logging_steps", "1",
        "--random_init_backbone",
    ]
    for k, v in over.items():
        base += [f"--{k}", str(v)]
    args = build_arg_parser().parse_args(base)
    return args


@pytest.mark.slow
def test_stage2_train_and_reload(tmp_path, tiny_dataset, monkeypatch):
    from modelcompose_tpu.train.train_multimodal import train
    args = _args(tmp_path, tiny_dataset, lora_strategy="modal+language",
                 lora_r="4", lora_alpha="8", local_prefix_tokens="1",
                 local_suffix_tokens="1", group_by_modality_length="True")
    # shrink the backbone for test speed
    import modelcompose_tpu.train.train_multimodal as tm
    orig = tm.build_model_config

    def tiny_cfg(a):
        cfg = orig(a)
        cfg.vocab_size, cfg.hidden_size = 256, 64
        cfg.intermediate_size, cfg.num_hidden_layers = 128, 2
        cfg.num_attention_heads = cfg.num_key_value_heads = 4
        return cfg

    monkeypatch.setattr(tm, "build_model_config", tiny_cfg)
    result = train(args, tokenizer=TinyTokenizer())
    assert result["steps"] == 3
    assert all(np.isfinite(result["losses"]))
    out = str(tmp_path / "out")
    assert os.path.exists(os.path.join(out, "adapter_model.safetensors"))
    assert os.path.exists(os.path.join(out, "config.json"))
    assert os.path.exists(os.path.join(out, "checkpoint-2"))

    # exported adapter keys follow the reference layout
    from modelcompose_tpu.compose.state_io import load_adapter_dir
    adapter = load_adapter_dir(out)
    assert any("lora_A.vision" in k for k in adapter)
    assert any("modal_projectors.vision" in k for k in adapter)
    assert "prefix_tokens.vision" in adapter


@pytest.mark.slow
def test_stage1_projector_only_export(tmp_path, tiny_dataset, monkeypatch):
    from modelcompose_tpu.train.train_multimodal import train
    import modelcompose_tpu.train.train_multimodal as tm
    orig = tm.build_model_config

    def tiny_cfg(a):
        cfg = orig(a)
        cfg.vocab_size, cfg.hidden_size = 256, 64
        cfg.intermediate_size, cfg.num_hidden_layers = 128, 2
        cfg.num_attention_heads = cfg.num_key_value_heads = 4
        return cfg

    monkeypatch.setattr(tm, "build_model_config", tiny_cfg)
    args = _args(tmp_path, tiny_dataset, tune_mm_mlp_adapter="True",
                 version="plain")
    result = train(args, tokenizer=TinyTokenizer())
    assert result["steps"] == 3
    out = str(tmp_path / "out")
    assert os.path.exists(os.path.join(out, "mm_projector.safetensors"))

    # stage-2 can consume the stage-1 projector (reference:
    # run_finetune_*.sh --pretrain_mm_mlp_adapter)
    args2 = _args(tmp_path, tiny_dataset, lora_strategy="modal",
                  lora_r="4", lora_alpha="8")
    args2.pretrain_mm_mlp_adapter = os.path.join(
        out, "mm_projector.safetensors")
    args2.output_dir = str(tmp_path / "out2")
    result2 = train(args2, tokenizer=TinyTokenizer())
    assert result2["steps"] == 3


@pytest.mark.slow
def test_resume_from_checkpoint(tmp_path, tiny_dataset, monkeypatch):
    from modelcompose_tpu.train.train_multimodal import train
    import modelcompose_tpu.train.train_multimodal as tm
    orig = tm.build_model_config

    def tiny_cfg(a):
        cfg = orig(a)
        cfg.vocab_size, cfg.hidden_size = 256, 64
        cfg.intermediate_size, cfg.num_hidden_layers = 128, 2
        cfg.num_attention_heads = cfg.num_key_value_heads = 4
        return cfg

    monkeypatch.setattr(tm, "build_model_config", tiny_cfg)
    args = _args(tmp_path, tiny_dataset, lora_strategy="modal",
                 lora_r="4", lora_alpha="8")
    train(args, tokenizer=TinyTokenizer())      # writes checkpoint-2
    args.max_steps = 5
    result = train(args, tokenizer=TinyTokenizer())  # resumes from step 2
    assert result["steps"] == 5
    assert len(result["losses"]) == 3  # only 3 new steps executed


@pytest.mark.slow
def test_full_finetune_exports_base_weights(tmp_path, tiny_dataset,
                                            monkeypatch):
    """lora_strategy absent: the final export includes the FULL backbone
    (model.safetensors) so trained base weights survive — an adapter-only
    export would silently drop the whole finetune."""
    from modelcompose_tpu.compose.state_io import load_state
    from modelcompose_tpu.train.train_multimodal import train
    args = _args(tmp_path, tiny_dataset)  # no lora_strategy flag

    import modelcompose_tpu.train.train_multimodal as tm
    orig = tm.build_model_config

    def tiny_cfg(a):
        cfg = orig(a)
        cfg.vocab_size, cfg.hidden_size = 256, 64
        cfg.intermediate_size, cfg.num_hidden_layers = 128, 2
        cfg.num_attention_heads = cfg.num_key_value_heads = 4
        return cfg

    monkeypatch.setattr(tm, "build_model_config", tiny_cfg)
    train(args, tokenizer=TinyTokenizer())
    out = tmp_path / "out"
    full = load_state(str(out / "model.safetensors"))
    assert "model.layers.0.self_attn.q_proj.weight" in full
    assert "model.embed_tokens.weight" in full
    assert (out / "adapter_model.safetensors").exists()


@pytest.mark.slow
def test_stage2_quantized_base_and_chunked_loss(tmp_path, tiny_dataset,
                                                monkeypatch):
    """Single-chip memory levers: --quantize_frozen_base (int8 frozen
    base), --loss_chunk, --adam_mu_dtype run end-to-end through the
    entry — incl. the step-checkpoint save/resume path serializing the
    quantized tree (round-4 BENCH_TRAIN.jsonl configuration)."""
    from modelcompose_tpu.train.train_multimodal import train
    args = _args(tmp_path, tiny_dataset, lora_strategy="modal+language",
                 lora_r="4", lora_alpha="8", local_prefix_tokens="1",
                 local_suffix_tokens="1", quantize_frozen_base="True",
                 loss_chunk="8", adam_mu_dtype="bfloat16")
    import modelcompose_tpu.train.train_multimodal as tm
    orig = tm.build_model_config

    def tiny_cfg(a):
        cfg = orig(a)
        cfg.vocab_size, cfg.hidden_size = 256, 64
        cfg.intermediate_size, cfg.num_hidden_layers = 128, 2
        cfg.num_attention_heads = cfg.num_key_value_heads = 4
        return cfg

    monkeypatch.setattr(tm, "build_model_config", tiny_cfg)
    result = train(args, tokenizer=TinyTokenizer())
    assert result["steps"] == 3
    assert all(np.isfinite(result["losses"]))
    out = str(tmp_path / "out")
    assert os.path.exists(os.path.join(out, "adapter_model.safetensors"))

    # resume from the step checkpoint with the quantized state template
    args2 = _args(tmp_path, tiny_dataset, lora_strategy="modal+language",
                  lora_r="4", lora_alpha="8", local_prefix_tokens="1",
                  local_suffix_tokens="1", quantize_frozen_base="True",
                  loss_chunk="8", adam_mu_dtype="bfloat16",
                  max_steps="4")
    result2 = train(args2, tokenizer=TinyTokenizer())
    assert result2["steps"] == 4


@pytest.mark.slow
def test_gradient_accumulation_through_entry(tmp_path, tiny_dataset,
                                             monkeypatch):
    """--gradient_accumulation_steps through the train entry: the running
    donated accumulation (peak = 2 grad trees at any depth, not accum
    trees) applies one optimizer step per ``accum`` micro-batches and the
    export path still works."""
    from modelcompose_tpu.train.train_multimodal import train
    args = _args(tmp_path, tiny_dataset, lora_strategy="modal+language",
                 lora_r="4", lora_alpha="8", local_prefix_tokens="1",
                 local_suffix_tokens="1",
                 gradient_accumulation_steps="2", max_steps="4",
                 save_steps="0")
    import modelcompose_tpu.train.train_multimodal as tm
    orig = tm.build_model_config

    def tiny_cfg(a):
        cfg = orig(a)
        cfg.vocab_size, cfg.hidden_size = 256, 64
        cfg.intermediate_size, cfg.num_hidden_layers = 128, 2
        cfg.num_attention_heads = cfg.num_key_value_heads = 4
        return cfg

    monkeypatch.setattr(tm, "build_model_config", tiny_cfg)
    result = train(args, tokenizer=TinyTokenizer())
    # HF semantics: max_steps counts OPTIMIZER steps — 4 optimizer steps
    # x accum 2 = 8 micro-batches
    assert result["optimizer_steps"] == 4
    assert result["steps"] == 8
    assert all(np.isfinite(result["losses"]))
    assert os.path.exists(
        os.path.join(str(tmp_path / "out"), "adapter_model.safetensors"))
