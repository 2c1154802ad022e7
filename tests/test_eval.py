"""Eval layer: scorers, EvalAI normalizer, and the full
checkpoint->loader->QA-loader->scorer pipeline on tiny dims."""

import json
import os

import numpy as np
import pytest
import torch

from modelcompose_tpu.eval.eval_avqa import calculate_accuracy as avqa_acc
from modelcompose_tpu.eval.eval_music_avqa import \
    calculate_accuracy as music_acc
from modelcompose_tpu.eval.m4c_evaluator import EvalAIAnswerProcessor


def test_evalai_processor():
    p = EvalAIAnswerProcessor()
    assert p("The Cat.") == "cat"
    assert p("Two") == "2"
    assert p("isnt") == "isn't"
    assert p("A  dog!") == "dog"
    # word_tokenize strips commas before the digit-comma rule can fire,
    # exactly like the reference's mmf processor
    assert p("3,000") == "3000"


def _write_qa_files(tmp_path, gold, outputs):
    answers = [{"id": i, "conversations": [
        {"from": "human", "value": f"q{i}"},
        {"from": "gpt", "value": g}]} for i, g in enumerate(gold)]
    af = tmp_path / "answers.json"
    af.write_text(json.dumps(answers))
    of = tmp_path / "out.jsonl"
    with open(of, "w") as f:
        for i, text in enumerate(outputs):
            f.write(json.dumps({"question_id": i, "text": text}) + "\n")
    return str(af), str(of)


def test_avqa_first_char_scoring(tmp_path):
    af, of = _write_qa_files(tmp_path, ["A", "B", "C"],
                             ["A. yes", "B", "D maybe"])
    assert abs(avqa_acc(af, of, verbose=False) - 66.67) < 0.1


def test_music_avqa_normalized_scoring(tmp_path):
    af, of = _write_qa_files(tmp_path, ["two", "no"], ["2", "No."])
    assert music_acc(af, of, verbose=False) == 100.0


# ---------------------------------------------------------------------------
# Full pipeline on tiny dims
# ---------------------------------------------------------------------------

from tests.fake_tokenizer import FakeLlamaTokenizer as TinyTokenizer



@pytest.fixture()
def fake_checkpoint(tmp_path):
    """Build a composed checkpoint + base dir with tiny dims."""
    import jax
    from transformers import LlamaConfig, LlamaForCausalLM
    from safetensors.torch import save_file

    from modelcompose_tpu.compose.convert import params_to_adapter
    from modelcompose_tpu.compose.state_io import save_state
    from modelcompose_tpu.config import tiny_test_config
    from modelcompose_tpu.models.model import MultimodalLM

    base_dir = tmp_path / "vicuna-tiny"
    ckpt_dir = tmp_path / "merged-multimodal"
    os.makedirs(base_dir)
    os.makedirs(ckpt_dir)

    torch.manual_seed(0)
    hf = LlamaForCausalLM(LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256))
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()
               if "rotary_emb.inv_freq" not in k},
              str(base_dir / "model.safetensors"))

    cfg = tiny_test_config(mm_vision_encoder="test:32x2", mm_hidden_size=32,
                           mm_projector_type="mlp2x_gelu",
                           local_prefix_tokens=1, local_suffix_tokens=1)
    model = MultimodalLM.random_init(cfg, jax.random.PRNGKey(0))
    adapter = params_to_adapter(model.params, cfg,
                                projector_params=model.projectors)
    save_state(adapter, str(ckpt_dir / "adapter_model.safetensors"))
    cfg.save(str(ckpt_dir / "config.json"))
    return str(ckpt_dir), str(base_dir)


def test_loader_and_qa_pipeline(fake_checkpoint, tmp_path, monkeypatch):
    ckpt_dir, base_dir = fake_checkpoint
    from PIL import Image

    import modelcompose_tpu.models.loader as loader_mod
    monkeypatch.setattr(loader_mod, "load_tokenizer",
                        lambda mb: TinyTokenizer())

    tokenizer, model, processors, context_len = \
        loader_mod.load_pretrained_model(ckpt_dir, base_dir)
    assert context_len == 2048
    assert "vision" in processors

    # question file with one image sample
    img_path = tmp_path / "img.png"
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(img_path)
    questions = [{"id": 0, "conversations": [
        {"from": "human", "value": f"<image>\nWhat color?"},
        {"from": "gpt", "value": "A"}],
        "modal_inputs": {"vision": [str(img_path)]}}]
    qfile = tmp_path / "q.json"
    qfile.write_text(json.dumps(questions))

    from modelcompose_tpu.eval.model_multimodal_qa_loader import eval_model

    class Args:
        model_path = ckpt_dir
        model_base = base_dir
        question_file = str(qfile)
        answers_file = str(tmp_path / "ans.jsonl")
        conv_mode = "vicuna_v1"
        num_chunks = 1
        chunk_idx = 0
        temperature = 0.0
        batch_size = 1
        max_new_tokens = 4

    monkeypatch.setattr(
        "modelcompose_tpu.eval.model_multimodal_qa_loader."
        "load_pretrained_model",
        lambda mp, mb, mn: (TinyTokenizer(), model, processors, 2048))
    eval_model(Args)

    lines = [json.loads(l) for l in open(Args.answers_file)]
    assert len(lines) == 1
    assert lines[0]["question_id"] == 0
    assert set(lines[0]) >= {"question_id", "prompt", "text", "answer_id",
                             "model_id"}


def test_loader_requires_multimodal_name(fake_checkpoint):
    ckpt_dir, base_dir = fake_checkpoint
    from modelcompose_tpu.models.loader import load_pretrained_model
    with pytest.raises(ValueError):
        load_pretrained_model(ckpt_dir, base_dir, model_name="plainmodel")


def test_loader_overlays_adapter_weights(fake_checkpoint, monkeypatch):
    ckpt_dir, base_dir = fake_checkpoint
    import modelcompose_tpu.models.loader as loader_mod
    monkeypatch.setattr(loader_mod, "load_tokenizer",
                        lambda mb: TinyTokenizer())
    _, model, _, _ = loader_mod.load_pretrained_model(ckpt_dir, base_dir)
    from modelcompose_tpu.compose.state_io import load_adapter_dir
    adapter = load_adapter_dir(ckpt_dir)
    got = np.asarray(model.params["layers"]["attn"]["q"]["lora_a"][0, 0])
    want = adapter["model.layers.0.self_attn.q_proj.lora_A.default.weight"].T
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_qa_loader_beam_search_cli(fake_checkpoint, tmp_path, monkeypatch):
    """--num-beams plumbing: the loader runs beam decode end-to-end and
    writes the same jsonl schema (beam math parity is pinned in
    tests/test_beam_golden.py)."""
    import json as _json

    from PIL import Image

    import modelcompose_tpu.models.loader as loader_mod
    ckpt_dir, base_dir = fake_checkpoint
    monkeypatch.setattr(loader_mod, "load_tokenizer",
                        lambda mb: TinyTokenizer())
    tokenizer, model, processors, _ = \
        loader_mod.load_pretrained_model(ckpt_dir, base_dir)

    img_path = tmp_path / "img.png"
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(img_path)
    qfile = tmp_path / "q.json"
    # TWO questions: batch_size=4 must be forced to 1 by the beam path or
    # beam_generate's batch-1 assertion fires
    qfile.write_text(_json.dumps([
        {"id": 7, "conversations": [
            {"from": "human", "value": "<image>\nWhat?"},
            {"from": "gpt", "value": "A"}],
         "modal_inputs": {"vision": [str(img_path)]}},
        {"id": 8, "conversations": [
            {"from": "human", "value": "<image>\nWhich?"},
            {"from": "gpt", "value": "B"}],
         "modal_inputs": {"vision": [str(img_path)]}}]))

    from modelcompose_tpu.eval.model_multimodal_qa_loader import eval_model

    class Args:
        model_path = ckpt_dir
        model_base = base_dir
        question_file = str(qfile)
        answers_file = str(tmp_path / "ans_beam.jsonl")
        conv_mode = "vicuna_v1"
        num_chunks = 1
        chunk_idx = 0
        temperature = 0.0
        batch_size = 4  # must be forced to 1 by the beam path
        max_new_tokens = 4
        num_beams = 2

    monkeypatch.setattr(
        "modelcompose_tpu.eval.model_multimodal_qa_loader."
        "load_pretrained_model",
        lambda mp, mb, mn: (TinyTokenizer(), model, processors, 2048))
    eval_model(Args)
    lines = [_json.loads(l) for l in open(Args.answers_file)]
    assert len(lines) == 2
    assert [l["question_id"] for l in lines] == [7, 8]
