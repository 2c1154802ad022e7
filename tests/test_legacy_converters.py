"""Legacy converter tooling: benchmark submission formats (reference:
scripts/convert_*_for_{eval,submission}.py) and the llava->multimodal
upgraders (reference: scripts/convert_llava_to_multimodal/)."""

import pytest
import json
import subprocess
import sys

import numpy as np

from modelcompose_tpu.eval.convert_for_submission import (
    convert_gqa, convert_mmbench, convert_mmvet, convert_vizwiz,
    convert_vqav2, seed_accuracy)


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_gqa_and_mmvet(tmp_path):
    src = tmp_path / "a.jsonl"
    _write_jsonl(src, [{"question_id": 7, "text": "A Dog."},
                       {"question_id": 8, "text": "blue"}])
    out = convert_gqa(str(src), str(tmp_path / "gqa.json"))
    assert out == [{"questionId": 7, "prediction": "a dog"},
                   {"questionId": 8, "prediction": "blue"}]
    out = convert_mmvet(str(src), str(tmp_path / "mmvet.json"))
    assert out == {"v1_7": "A Dog.", "v1_8": "blue"}


def test_vizwiz_and_vqav2(tmp_path):
    ann = tmp_path / "ann.jsonl"
    res = tmp_path / "res.jsonl"
    _write_jsonl(ann, [{"question_id": 1, "image": "i1.jpg"},
                       {"question_id": 2, "image": "i2.jpg"}])
    _write_jsonl(res, [{"question_id": 1, "text": "The Cat."},
                       {"question_id": 2, "text": "Two"}])
    out = convert_vizwiz(str(ann), str(res), str(tmp_path / "up.json"))
    # EvalAI normalization applied (articles dropped, numbers digitized)
    assert out == [{"image": "i1.jpg", "answer": "cat"},
                   {"image": "i2.jpg", "answer": "2"}]

    _write_jsonl(res, [{"question_id": 1, "text": "The Cat."}])  # 2 missing
    out = convert_vqav2(str(ann), str(res), str(tmp_path / "up2.json"))
    assert out == [{"question_id": 1, "answer": "cat"},
                   {"question_id": 2, "answer": ""}]


def test_seed_accuracy(tmp_path):
    ann = tmp_path / "seed.json"
    json.dump({"question_type": {"scene": 1, "instance": 2},
               "questions": [
                   {"question_id": "1", "data_type": "image",
                    "question_type_id": 1, "answer": "A"},
                   {"question_id": "2", "data_type": "image",
                    "question_type_id": 1, "answer": "B"},
                   {"question_id": "3", "data_type": "image",
                    "question_type_id": 2, "answer": "C"},
                   {"question_id": "4", "data_type": "video",
                    "question_type_id": 2, "answer": "D"}]},
              open(ann, "w"))
    res = tmp_path / "res.jsonl"
    _write_jsonl(res, [{"question_id": 1, "text": "A"},
                       {"question_id": 2, "text": "X"},
                       {"question_id": 3, "text": "C"}])
    scores = seed_accuracy(str(ann), str(res), "image")
    assert scores["per_type"] == {"scene": 50.0, "instance": 100.0}
    assert scores["total"] == round(2 / 3 * 100, 2)


def test_mmbench(tmp_path):
    ann = tmp_path / "dev.tsv"
    with open(ann, "w") as f:
        f.write("index\tquestion\tA\tB\thint\tcategory\tsource\timage\t"
                "comment\tl2-category\n")
        f.write("10\tWhat?\topt a\topt b\th\tc\ts\timg\tcm\tl2\n")
    rdir = tmp_path / "results"
    rdir.mkdir()
    _write_jsonl(rdir / "exp1.jsonl", [{"question_id": 10, "text": "A"}])
    out_path = convert_mmbench(str(ann), str(rdir), str(tmp_path / "up"),
                               "exp1")
    rows = open(out_path).read().splitlines()
    assert rows[0].split("\t") == ["index", "question", "A", "B",
                                   "prediction"]
    assert rows[1].split("\t") == ["10", "What?", "opt a", "opt b", "A"]


def test_convert_llava_checkpoint(tmp_path):
    """LoRA 'default' -> 'vision', mm_projector -> modal_projectors.vision,
    adapter/non-lora split (reference: convert_checkpoint.py:48-88)."""
    import torch

    ckpt = tmp_path / "llava-lora"
    ckpt.mkdir()
    rs = np.random.RandomState(0)
    state = {
        "base_model.model.model.layers.0.self_attn.q_proj"
        ".lora_A.default.weight": torch.from_numpy(rs.randn(4, 8)
                                                   .astype(np.float32)),
        "base_model.model.model.layers.0.self_attn.q_proj"
        ".lora_B.default.weight": torch.from_numpy(rs.randn(8, 4)
                                                   .astype(np.float32)),
        "model.mm_projector.0.weight": torch.from_numpy(
            rs.randn(8, 8).astype(np.float32)),
        "prefix_tokens": torch.zeros(1, 2, 8),
        "model.embed_tokens.weight": torch.zeros(4, 8),  # base: dropped
    }
    torch.save(state, ckpt / "pytorch_model.bin")
    (ckpt / "config.json").write_text("{}")

    from modelcompose_tpu.compose.convert_llava_checkpoint import \
        convert_checkpoint
    from modelcompose_tpu.compose.state_io import load_state

    out = tmp_path / "multimodal-out"
    stats = convert_checkpoint(str(ckpt), str(out))
    assert stats == {"adapter_keys": 2, "non_lora_keys": 2}
    adapter = load_state(str(out / "adapter_model.bin"))
    assert "base_model.model.model.layers.0.self_attn.q_proj" \
           ".lora_A.vision.weight" in adapter
    non_lora = load_state(str(out / "non_lora_trainables.bin"))
    assert "model.modal_projectors.vision.0.weight" in non_lora
    assert "prefix_tokens.vision" in non_lora
    assert (out / "config.json").exists()


def test_convert_test_data_cli(tmp_path):
    q = tmp_path / "llava.jsonl"
    _write_jsonl(q, [{"question_id": 5, "image": "x.jpg",
                      "text": "what?", "category": "conv"}])
    out = tmp_path / "mm.json"
    r = subprocess.run(
        [sys.executable, "-m",
         "modelcompose_tpu.compose.convert_llava_checkpoint", "test-data",
         "--input_path", str(q), "--input_image_path", str(tmp_path),
         "--output_path", str(out)],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-400:]
    data = json.load(open(out))
    assert data[0]["id"] == 5
    assert data[0]["conversations"][0]["value"] == "<image>\nwhat?"
    assert data[0]["modal_inputs"]["vision"][0].endswith("x.jpg")
    assert data[0]["category"] == "conv"  # extra keys pass through


@pytest.mark.slow
def test_merge_deltas_to_base(tmp_path):
    """Weight-space NaiveMC merge of peft-era unimodal checkpoints
    (reference: merge_image_audio_to_multimodal.py, intended behavior):
    dense deltas averaged into the base, overlays renamed per-modal,
    sharded HF output round-trips through our loader."""
    import subprocess
    import sys

    rs = np.random.RandomState(0)
    base = tmp_path / "base"
    base.mkdir()
    H = 8
    base_w = {"model.layers.0.self_attn.q_proj.weight":
              rs.randn(H, H).astype(np.float32),
              "model.embed_tokens.weight":
              rs.randn(16, H).astype(np.float32)}
    from modelcompose_tpu.compose.state_io import save_state, load_state
    save_state(base_w, str(base / "pytorch_model.bin"))
    json.dump({"hidden_size": H}, open(base / "config.json", "w"))
    (base / "tokenizer.model").write_text("tok")

    def mk_ckpt(name, seed, modal_cfg):
        d = tmp_path / name
        d.mkdir()
        r = np.random.RandomState(seed)
        a = r.randn(2, H).astype(np.float32)
        b = r.randn(H, 2).astype(np.float32)
        save_state({"base_model.model.model.layers.0.self_attn.q_proj"
                    ".lora_A.weight": a,
                    "base_model.model.model.layers.0.self_attn.q_proj"
                    ".lora_B.weight": b},
                   str(d / "adapter_model.bin"))
        save_state({"base_model.model.model.mm_projector.0.weight":
                    r.randn(H, H).astype(np.float32),
                    # bias + soft-token overlays keep their key shape (the
                    # reference's helper appends '.weight' to these)
                    "base_model.model.model.mm_projector.0.bias":
                    r.randn(H).astype(np.float32),
                    "base_model.model.prefix_tokens":
                    r.randn(1, 2, H).astype(np.float32)},
                   str(d / "non_lora_trainables.bin"))
        json.dump({"lora_alpha": 4, "r": 2},
                  open(d / "adapter_config.json", "w"))
        json.dump(modal_cfg, open(d / "config.json", "w"))
        return str(d), (b @ a) * 2.0

    v_dir, v_delta = mk_ckpt("vis", 1, {"mm_vision_encoder": "clip"})
    a_dir, a_delta = mk_ckpt("aud", 2, {"mm_audio_encoder": "beats"})

    out = tmp_path / "merged"
    r = subprocess.run(
        [sys.executable, "-m",
         "modelcompose_tpu.compose.merge_deltas_to_base", str(base),
         "--checkpoint", f"vision={v_dir}", "--checkpoint", f"audio={a_dir}",
         "--output_path", str(out)],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-500:]

    from modelcompose_tpu.models.loader import load_hf_llama_dir
    merged = load_hf_llama_dir(str(out))  # exercises the shard index too
    want = base_w["model.layers.0.self_attn.q_proj.weight"] + \
        (v_delta + a_delta) / 2
    np.testing.assert_allclose(
        merged["model.layers.0.self_attn.q_proj.weight"], want, rtol=1e-5)
    # overlays renamed per modal; config unioned; provenance written
    assert "model.modal_projectors.vision.0.weight" in merged
    assert "model.modal_projectors.audio.0.weight" in merged
    # bias / soft-token overlay keys survive un-mangled (no '.weight' tail)
    assert "model.modal_projectors.vision.0.bias" in merged
    assert "prefix_tokens" in merged
    assert not any(k.endswith(".bias.weight") for k in merged)
    cfg = json.load(open(out / "config.json"))
    assert cfg["mm_vision_encoder"] == "clip"
    assert cfg["mm_audio_encoder"] == "beats"
    assert json.load(open(out / "merge_info.json"))["vision"] == v_dir
    assert (out / "tokenizer.model").exists()


def test_check_multimodal_exist(tmp_path, capsys):
    from modelcompose_tpu.data.convert_to_multimodal import \
        check_multimodal_exist
    media = tmp_path / "img.jpg"
    media.write_text("x")
    data = [{"id": 1, "modal_inputs": {"vision": [str(media)]}},
            {"id": 2, "modal_inputs": {"audio": [str(tmp_path / "gone")]}}]
    p = tmp_path / "data.json"
    json.dump(data, open(p, "w"))
    assert check_multimodal_exist(str(p)) == 1
    json.dump(data[:1], open(p, "w"))
    assert check_multimodal_exist(str(p)) == 0
    assert "All Clear!" in capsys.readouterr().out
