"""GOLDEN decode parity: token-identical greedy generation vs the
reference's real ``MultimodalLlamaForCausalLM`` end-to-end.

A tiny reference model (random weights) is built from the reference's own
code (via the full-model oracle), exported in the reference checkpoint
layout (HF base ``pytorch_model.bin`` + ``adapter_model.bin`` +
``config.json``), loaded through OUR converter/loader
(``models.loader.load_pretrained_model``), and both sides run greedy
generation over mixed-modal prompts.  Token ids must match exactly —
prefill routing, decode default-route semantics, prefix/suffix soft
tokens, projector conversion, and the online-merge-reset configuration
are all in the loop (reference: eval/model_multimodal_qa_loader.py:93-102,
model/language_model/multimodal_llama.py:436-438, 747-767).
"""

import json
import os

import numpy as np
import pytest

from tests.reference_oracle import reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not mounted")

import jax.numpy as jnp  # noqa: E402

from modelcompose_tpu.constants import MODAL_TOKEN_INDEXES  # noqa: E402

H, NL, NH, V, I = 32, 2, 4, 64, 64
R, ALPHA = 4, 8
PRE, SUF = 2, 2
E_VIS, T_VIS = 8, 3     # stub vision tower: feature dim / tokens per image
E_AUD, T_AUD = 8, 4
E_VID, F_VID, N_VID = 8, 2, 3   # video: frames x tokens-per-frame
E_PT, T_PT = 8, 5
IMG = MODAL_TOKEN_INDEXES["vision"]
AUD = MODAL_TOKEN_INDEXES["audio"]
STEPS = 8


def _build_reference_model(reset_scaling=None):
    import torch
    import torch.nn as nn

    from tests.reference_oracle import load_reference_llama
    mm = load_reference_llama()

    cfg = mm.MultimodalConfig(
        vocab_size=V, hidden_size=H, intermediate_size=I,
        num_hidden_layers=NL, num_attention_heads=NH, num_key_value_heads=NH,
        max_position_embeddings=128, rms_norm_eps=1e-6,
        lora_strategy="modal+language", lora_r=R, lora_alpha=ALPHA,
        lora_dropout=0.0, local_prefix_tokens=PRE, local_suffix_tokens=SUF,
        mm_vision_encoder="test:8x1", mm_audio_encoder="test-audio",
        mm_video_encoder="test-video", mm_point_encoder="test-point",
        reset_scaling_weights=reset_scaling,
        pad_token_id=0, bos_token_id=1, eos_token_id=2)
    torch.manual_seed(0)
    model = mm.MultimodalLlamaForCausalLM(cfg)

    class StubVision(nn.Module):
        hidden_size = E_VIS

        def forward(self, x):
            return x  # raw inputs ARE the encoder features [b, T, E]

        @property
        def dummy_inputs(self):
            return torch.zeros(1, T_VIS, E_VIS)

    class StubAudio(nn.Module):
        hidden_size = E_AUD

        def forward(self, audio_inputs=None, audio_padding_mask=None):
            return audio_inputs, None

        @property
        def dummy_inputs(self):
            return {"audio_inputs": torch.zeros(1, T_AUD, E_AUD),
                    "audio_padding_mask": torch.zeros(1, T_AUD)}

    class StubVideo(nn.Module):
        hidden_size = E_VID

        def forward(self, x):
            return x  # raw inputs ARE [b, t, n, d] frame features

        @property
        def dummy_inputs(self):
            return torch.zeros(1, F_VID, N_VID, E_VID)

    class StubPoint(nn.Module):
        hidden_size = E_PT

        def forward(self, x):
            return x

        @property
        def dummy_inputs(self):
            return torch.zeros(1, T_PT, E_PT)

    def mk_proj(e):
        return nn.Sequential(nn.Linear(e, H), nn.GELU(), nn.Linear(H, H))

    model.model.modal_encoders = nn.ModuleDict(
        {"vision": StubVision(), "audio": StubAudio(),
         "video": StubVideo(), "point": StubPoint()})
    model.model.modal_projectors = nn.ModuleDict(
        {"vision": mk_proj(E_VIS), "audio": mk_proj(E_AUD),
         "video": mk_proj(E_VID), "point": mk_proj(E_PT)})

    # Reference config.json stamps (what initialize_multimodal_modules
    # writes, reference: multimodal_arch.py:90-115)
    cfg.mm_hidden_size = E_VIS
    cfg.mm_projector_type = "mlp2x_gelu"
    cfg.mm_audio_hidden_size = E_AUD
    cfg.mm_audio_projector_type = "mlp2x_gelu"
    cfg.mm_video_hidden_size = E_VID
    cfg.mm_video_projector_type = "mlp2x_gelu"
    cfg.mm_point_hidden_size = E_PT
    cfg.mm_point_projector_type = "mlp2x_gelu"

    # Deterministic random weights everywhere (LoRA B inits to zero —
    # randomize so adapters actually steer the logits).
    gen = torch.Generator().manual_seed(42)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "modal_encoders" in name:
                continue
            if "layernorm" in name or name.endswith("norm.weight"):
                p.copy_(1.0 + 0.05 * torch.randn(p.shape, generator=gen))
            else:
                p.copy_(0.15 * torch.randn(p.shape, generator=gen))
    model.eval()
    return mm, cfg, model


def _export_reference_ckpt(model, cfg, tmp_path):
    """Write the reference's on-disk layout: model_base/pytorch_model.bin
    (HF Llama keys) + multimodal-ckpt/{adapter_model.bin, config.json}
    (reference: train_multimodal.py:516-521, builder.py:140-168)."""
    import torch

    base_dir = tmp_path / "vicuna-tiny"
    ckpt_dir = tmp_path / "multimodal-tiny-ckpt"
    base_dir.mkdir()
    ckpt_dir.mkdir()
    base_state, adapter_state = {}, {}
    for name, t in model.state_dict().items():
        if "modal_encoders" in name or "rotary_emb" in name:
            continue
        if ("lora_" in name or "modal_projectors" in name
                or name.startswith(("prefix_tokens", "suffix_tokens"))):
            adapter_state[name] = t
        else:
            base_state[name] = t
    torch.save(base_state, base_dir / "pytorch_model.bin")
    torch.save(adapter_state, ckpt_dir / "adapter_model.bin")
    d = cfg.to_dict()
    d["dtype"] = "float32"
    with open(ckpt_dir / "config.json", "w") as f:
        json.dump(d, f, default=str)
    return str(base_dir), str(ckpt_dir)


def _reference_greedy(model, ids, modal_inputs, steps):
    """HF greedy-search semantics via the reference's own
    prepare_inputs_for_generation + forward (tuple KV cache)."""
    import torch
    ids = torch.tensor(np.asarray(ids))[None]
    attn = torch.ones_like(ids)
    past, out_tokens = None, []
    with torch.no_grad():
        for _ in range(steps):
            model_inputs = model.prepare_inputs_for_generation(
                ids, past_key_values=past, attention_mask=attn,
                use_cache=True, modal_inputs=modal_inputs)
            out = model(**model_inputs)
            tok = int(out.logits[0, -1].argmax())
            if tok == int(model.config.eos_token_id):
                break
            out_tokens.append(tok)
            ids = torch.cat([ids, torch.tensor([[tok]])], dim=1)
            attn = torch.ones_like(ids)
            past = out.past_key_values
    return out_tokens


class _OurStubTower:
    def __init__(self, e, t, num_frames=None, tokens_per_frame=None):
        self.hidden_size = e
        self.feature_len = t
        self.num_frames = num_frames          # video protocol
        self.tokens_per_frame = tokens_per_frame
        self.modal_processor = None

    def encode(self, x=None, audio_inputs=None, audio_padding_mask=None):
        return jnp.asarray(x if x is not None else audio_inputs)


def _load_ours(base_dir, ckpt_dir, monkeypatch):
    from modelcompose_tpu.models import loader as loader_mod

    def fake_towers(cfg, rng=None):
        return {"vision": _OurStubTower(E_VIS, T_VIS),
                "audio": _OurStubTower(E_AUD, T_AUD),
                "video": _OurStubTower(E_VID, F_VID * N_VID,
                                       num_frames=F_VID,
                                       tokens_per_frame=N_VID),
                "point": _OurStubTower(E_PT, T_PT)}

    monkeypatch.setattr(loader_mod, "build_modal_encoders", fake_towers)
    _, model, _, _ = loader_mod.load_pretrained_model(
        ckpt_dir, base_dir, "multimodal-tiny-ckpt",
        load_tokenizer_fn=lambda p: None)
    return model


VID = MODAL_TOKEN_INDEXES["video"]
PT = MODAL_TOKEN_INDEXES["point"]


def _prompts(rs):
    """Mixed-modal prompts (features shared by both sides), including a
    full 4-modal MCUB-style case."""
    vis = rs.randn(2, T_VIS, E_VIS).astype(np.float32)
    aud = rs.randn(1, T_AUD, E_AUD).astype(np.float32)
    vid = rs.randn(1, F_VID, N_VID, E_VID).astype(np.float32)
    pt = rs.randn(1, T_PT, E_PT).astype(np.float32)
    cases = [
        (np.array([1, 5, IMG, 7, 8, 9]), {"vision": vis[:1]}),
        (np.array([1, AUD, 6, IMG, 10]), {"vision": vis[1:2],
                                          "audio": aud}),
        (np.array([1, 11, 12, 13, 14]), {"vision": vis[:1]}),  # text-only
        # 4-modal MCUB-style prompt
        (np.array([1, IMG, 15, AUD, 16, VID, 17, PT, 18]),
         {"vision": vis[:1], "audio": aud, "video": vid, "point": pt}),
    ]
    return cases


def _run_parity(reset_scaling, monkeypatch, tmp_path):
    import torch
    mm, cfg, ref_model = _build_reference_model(reset_scaling)
    base_dir, ckpt_dir = _export_reference_ckpt(ref_model, cfg, tmp_path)
    ours = _load_ours(base_dir, ckpt_dir, monkeypatch)

    rs = np.random.RandomState(3)
    for ids, feats in _prompts(rs):
        ref_inputs = {}
        for m, f in feats.items():
            if m == "audio":
                ref_inputs[m] = {
                    "audio_inputs": torch.from_numpy(f),
                    "audio_padding_mask": torch.zeros(1, T_AUD)}
            else:
                ref_inputs[m] = torch.from_numpy(f)
        ref_tokens = _reference_greedy(ref_model, ids, ref_inputs, STEPS)

        our_inputs = {m: f for m, f in feats.items()
                      if MODAL_TOKEN_INDEXES[m] in ids}
        if "audio" in our_inputs:
            our_inputs["audio"] = {
                "audio_inputs": our_inputs["audio"]}
        our_tokens = ours.generate([ids], our_inputs,
                                   max_new_tokens=STEPS)[0]
        assert our_tokens == ref_tokens, (
            f"ids={ids.tolist()} ours={our_tokens} ref={ref_tokens}")

    # Active-adapter compaction must stay token-identical to the
    # REFERENCE, not just to our own full contraction (VERDICT r2 #3):
    # re-run the last (4-modal MCUB-style) prompt compacted.
    our_tokens_c = ours.generate([ids], our_inputs, max_new_tokens=STEPS,
                                 compact_adapters=True)[0]
    assert our_tokens_c == ref_tokens, (our_tokens_c, ref_tokens)


def test_greedy_tokens_identical_plain(monkeypatch, tmp_path):
    """DAMC operating point: modal+language routing, prefix/suffix 2+2."""
    _run_parity(None, monkeypatch, tmp_path)


def test_greedy_tokens_identical_online_merge_reset(monkeypatch, tmp_path):
    """Composed checkpoint: online-merge-reset coefficients fan the decode
    'default' route over default-{modal} adapters (reference:
    multimodal_llama.py:92-107, 130-148) — 4-modal equal coefficients,
    the README's operating point."""
    _run_parity("default-audio=0.25,default-vision=0.25,"
                "default-video=0.25,default-point=0.25",
                monkeypatch, tmp_path)
