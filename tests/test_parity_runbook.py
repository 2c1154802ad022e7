"""Dry run of the real-weights parity runbook (round-4 VERDICT next #8).

The runbook (scripts/parity_when_weights.sh) is environmentally blocked
(no released weights / network); this pins every piece of its glue on the
synthetic golden checkpoint so it works the day weights are available:

- the merge -> load -> qa-loader -> answers-jsonl chain produces
  deterministic, diffable output (two independent runs are identical);
- scripts/diff_answers.py agrees (exit 0 on identical, 1 + a mismatch
  report on a divergence or id-set difference);
- the shell script itself parses (bash -n) and its CLI calls match the
  tools' actual interfaces.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.fake_tokenizer import FakeLlamaTokenizer as TinyTokenizer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _eval_answers(model, processors, ckpt_dir, base_dir, qfile, out_path,
                  monkeypatch):
    from modelcompose_tpu.eval.model_multimodal_qa_loader import eval_model

    class Args:
        model_path = ckpt_dir
        model_base = base_dir
        question_file = str(qfile)
        answers_file = str(out_path)
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
    return out_path


@pytest.mark.slow
def test_parity_dry_run_merge_eval_diff(tmp_path, monkeypatch):
    import jax
    from PIL import Image

    from modelcompose_tpu.compose.convert import params_to_adapter
    from modelcompose_tpu.compose.state_io import save_state
    from modelcompose_tpu.config import ModelConfig, tiny_test_config
    from modelcompose_tpu.models.model import MultimodalLM

    # two synthetic unimodal checkpoints (vision + audio), tiny dims
    ckpts = []
    for modal, kw in (("vision", dict(mm_vision_encoder="test:32x2",
                                      mm_hidden_size=32,
                                      mm_projector_type="mlp2x_gelu")),
                      ("audio", dict(mm_audio_encoder="test:16x2",
                                     mm_audio_projector_type="qformer_4N_2L"))):
        cfg = tiny_test_config(local_prefix_tokens=1, local_suffix_tokens=1,
                               **kw)
        model = MultimodalLM.random_init(
            cfg, jax.random.PRNGKey(0 if modal == "vision" else 1))
        d = tmp_path / f"ckpt-{modal}"
        d.mkdir()
        save_state(params_to_adapter(model.params, cfg,
                                     projector_params=model.projectors),
                   str(d / "adapter_model.safetensors"))
        cfg.save(str(d / "config.json"))
        ckpts.append(str(d))

    # (a) merge with the runbook's CLI surface
    merged = str(tmp_path / "merged-multimodal")
    subprocess.run(
        [sys.executable, "-m", "modelcompose_tpu.compose.merge", *ckpts,
         "-o", merged, "--strategy",
         "online-merge-reset-default-vision=0.5,default-audio=0.5"],
        check=True, cwd=REPO, timeout=300)
    assert os.path.exists(os.path.join(merged, "adapter_model.safetensors"))

    # tiny HF base for the loader
    from transformers import LlamaConfig, LlamaForCausalLM
    from safetensors.torch import save_file
    import torch
    base_dir = tmp_path / "vicuna-tiny"
    base_dir.mkdir()
    torch.manual_seed(0)
    hf = LlamaForCausalLM(LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256))
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()
               if "rotary_emb.inv_freq" not in k},
              str(base_dir / "model.safetensors"))

    import modelcompose_tpu.models.loader as loader_mod
    monkeypatch.setattr(loader_mod, "load_tokenizer",
                        lambda mb: TinyTokenizer())
    _, model, processors, _ = loader_mod.load_pretrained_model(
        merged, str(base_dir))

    # (b) MCUB-style mixed-modal question file
    img = tmp_path / "i.png"
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(img)
    wav = tmp_path / "a.npy"
    np.save(wav, np.random.RandomState(1).randn(8000).astype(np.float32))
    questions = [{"id": i, "conversations": [
        {"from": "human",
         "value": "<image>\n<audio>\nWhich modality? A. image B. audio"},
        {"from": "gpt", "value": "A"}],
        "modal_inputs": {"vision": [str(img)], "audio": [str(wav)]}}
        for i in range(3)]
    qfile = tmp_path / "q.json"
    qfile.write_text(json.dumps(questions))

    a1 = _eval_answers(model, processors, merged, str(base_dir), qfile,
                       tmp_path / "run1.jsonl", monkeypatch)
    a2 = _eval_answers(model, processors, merged, str(base_dir), qfile,
                       tmp_path / "run2.jsonl", monkeypatch)

    # (c) the differ: identical runs -> exit 0
    r = subprocess.run([sys.executable, "scripts/diff_answers.py",
                        str(a1), str(a2)], cwd=REPO, capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0, r.stdout + r.stderr
    stats = json.loads(r.stdout.splitlines()[0])
    assert stats["identical"] == 3 and stats["mismatched"] == 0

    # a doctored divergence -> exit 1 with a mismatch report
    rows = [json.loads(l) for l in open(a2)]
    rows[1]["text"] = "DIVERGED"
    bad = tmp_path / "bad.jsonl"
    bad.write_text("\n".join(json.dumps(r_) for r_ in rows))
    r = subprocess.run([sys.executable, "scripts/diff_answers.py",
                        str(a1), str(bad)], cwd=REPO, capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 1
    assert json.loads(r.stdout.splitlines()[0])["mismatched"] == 1
    assert "MISMATCH" in r.stderr


def test_runbook_dry_run_builds_correct_cli(tmp_path):
    """PARITY_DRY_RUN exercises the runbook's command construction end to
    end: every checkpoint path in the merge CLI must be rooted under
    CKPT_ROOT (a printf format-recycling bug once paired checkpoints with
    each other instead of the root)."""
    ckpt_root = tmp_path / "released"
    for m in ("vision", "audio", "video"):
        (ckpt_root / m).mkdir(parents=True)
    (tmp_path / "data").mkdir()
    env = {**os.environ, "PARITY_DRY_RUN": "1",
           "CKPT_ROOT": str(ckpt_root),
           "VICUNA": str(tmp_path / "vicuna"),
           "DATA_ROOT": str(tmp_path / "data"),
           "MODALS": "audio image",
           "MERGED": str(tmp_path / "merged")}
    r = subprocess.run(["bash", "scripts/parity_when_weights.sh"],
                       cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=120)
    assert r.returncode == 0, r.stdout + r.stderr
    lines = [l for l in r.stdout.splitlines() if l.startswith("DRYRUN:")]
    merge = next(l for l in lines if "compose.merge" in l)
    root = os.path.realpath(str(ckpt_root))
    for m in ("vision", "audio", "video"):
        assert f"{root}/{m}" in merge, merge
    # equal coefficients over the 3 available modalities
    assert "default-vision=0.3333333333333333" in merge, merge
    # harness invocations carry the merged ckpt + base
    assert sum("avqa.sh" in l for l in lines) == 2
    assert any("MCUB-4.sh" in l for l in lines)
    # dry run must leave the repo untouched (no data symlink)
    assert not os.path.lexists(os.path.join(REPO, "data"))


def test_runbook_shell_parses():
    r = subprocess.run(["bash", "-n", "scripts/parity_when_weights.sh"],
                       cwd=REPO, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    # harness shells it calls exist
    for s in ("scripts/model_composition/test/avqa.sh",
              "scripts/model_composition/test/MCUB-4.sh",
              "scripts/diff_answers.py"):
        assert os.path.exists(os.path.join(REPO, s)), s
