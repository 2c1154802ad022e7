"""CLIP text tower parity vs HF CLIPTextModelWithProjection (the
reference's experimental text-as-modality encoder, reference:
modelcompose/model/multimodal_encoder/text_encoder.py:1-72)."""

import numpy as np
import pytest
import torch

from modelcompose_tpu.models.text_clip import (ClipTextConfig,
                                               ClipTextEncoder,
                                               clip_text_embeds,
                                               convert_hf_clip_text)


@pytest.fixture(scope="module")
def tiny_hf_text():
    from transformers import CLIPTextConfig as HFCfg
    from transformers import CLIPTextModelWithProjection

    # eos_token_id must name the tiny vocab's EOT (real CLIP: 49407, the
    # vocab max — there argmax-of-ids pooling and first-EOT pooling agree)
    hf_cfg = HFCfg(hidden_size=32, intermediate_size=64,
                   num_hidden_layers=3, num_attention_heads=4,
                   vocab_size=99, max_position_embeddings=16,
                   projection_dim=24, eos_token_id=98)
    torch.manual_seed(0)
    model = CLIPTextModelWithProjection(hf_cfg)
    model.eval()
    return model


def _our_cfg():
    return ClipTextConfig(hidden_size=32, intermediate_size=64,
                          num_hidden_layers=3, num_attention_heads=4,
                          vocab_size=99, max_position_embeddings=16,
                          projection_dim=24)


def test_hf_parity(tiny_hf_text):
    cfg = _our_cfg()
    state = {k: v.numpy() for k, v in tiny_hf_text.state_dict().items()}
    params = convert_hf_clip_text(state, cfg)
    rs = np.random.RandomState(0)
    # EOT = max id (98) placed mid-sequence; trailing ids are "padding"
    ids = rs.randint(1, 90, size=(2, 9)).astype(np.int32)
    ids[0, 5] = 98
    ids[1, 7] = 98
    with torch.no_grad():
        want = tiny_hf_text(torch.tensor(ids.astype(np.int64)))\
            .text_embeds.numpy()
    got = np.asarray(clip_text_embeds(params, cfg, ids))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_tower_protocol(tiny_hf_text):
    cfg = _our_cfg()
    state = {k: v.numpy() for k, v in tiny_hf_text.state_dict().items()}
    enc = ClipTextEncoder(cfg, params=convert_hf_clip_text(state, cfg))
    ids = np.array([[1, 5, 98, 0]], np.int32)
    out = np.asarray(enc.encode(ids))
    assert out.shape == (1, 1, 24)  # one feature token, reference's
    assert enc.hidden_size == 24    # unsqueeze(1) (text_encoder.py:36-37)
    assert enc.feature_len == 1
