"""GOLDEN parity: models/vision_eva.py vs the reference's vendored EVA ViT
(reference: modelcompose/model/multimodal_encoder/eva_clip/
eva_vit_model.py), covering both released tower families:
EVA02-style (subln + SwiGLU + 2D rope) and EVA01-style (fused qkv + GELU
MLP, no rope)."""

import dataclasses

import numpy as np
import pytest

from tests.reference_oracle import reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not mounted")

from modelcompose_tpu.models.vision_eva import (EvaVisionConfig,  # noqa: E402
                                                PRESETS,
                                                convert_eva_vision,
                                                eva_vision_features)

IMG, PATCH, H, DEPTH, HEADS = 28, 14, 16, 3, 2


def _build_reference(variant: str):
    import torch

    from tests.reference_oracle import load_reference_eva
    eva = load_reference_eva()

    import functools

    torch.manual_seed(0)
    # the factory builds EVA towers with eps=1e-6 norms (reference:
    # eva_clip/model.py:123), not nn.LayerNorm's 1e-5 default
    kwargs = dict(img_size=IMG, patch_size=PATCH, embed_dim=H, depth=DEPTH,
                  num_heads=HEADS, mlp_ratio=2.0, qkv_bias=True,
                  num_classes=0, use_mean_pooling=True,
                  norm_layer=functools.partial(torch.nn.LayerNorm,
                                               eps=1e-6),
                  pt_hw_seq_len=16, intp_freq=True)
    if variant == "eva02":
        kwargs.update(subln=True, naiveswiglu=True, rope=True, xattn=False)
    else:  # eva01: fused qkv, plain MLP, no rope
        kwargs.update(subln=False, naiveswiglu=False, rope=False,
                      xattn=False)
    model = eva.EVAVisionTransformer(**kwargs)
    model.eval()
    # randomize biases/ln too so parity is not vacuous
    gen = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith(".bias") or "_bias" in name:
                p.copy_(0.05 * torch.randn(p.shape, generator=gen))
            elif "norm" in name and name.endswith(".weight"):
                p.copy_(1.0 + 0.05 * torch.randn(p.shape, generator=gen))
    return model


def _our_cfg(variant: str) -> EvaVisionConfig:
    return EvaVisionConfig(
        hidden_size=H, depth=DEPTH, num_heads=HEADS, mlp_ratio=2.0,
        image_size=IMG, patch_size=PATCH, qkv_bias=True,
        use_rope=(variant == "eva02"), pt_hw_seq_len=16, intp_freq=True,
        swiglu=(variant == "eva02"), subln=(variant == "eva02"),
        select_layer=-2, select_feature="patch")


@pytest.mark.parametrize("variant", ["eva02", "eva01"])
def test_eva_features_match_reference(variant):
    import torch

    model = _build_reference(variant)
    cfg = _our_cfg(variant)
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_eva_vision(state, cfg)

    rs = np.random.RandomState(0)
    pixels = rs.randn(2, IMG, IMG, 3).astype(np.float32)

    with torch.no_grad():
        out = model.forward(torch.from_numpy(pixels.transpose(0, 3, 1, 2)),
                            output_hidden_states=True)
    ref = out.hidden_states[cfg.select_layer].numpy()[:, 1:]  # drop CLS

    ours = np.asarray(eva_vision_features(params, cfg, pixels))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_eva_tower_dispatch_and_protocol():
    """'eva' in the spec routes to EvaVisionTower (reference:
    clip_encoder.py:22); the tower satisfies the encoder protocol."""
    import jax

    from modelcompose_tpu.config import tiny_test_config
    from modelcompose_tpu.models.towers import build_modal_encoders

    cfg = tiny_test_config(mm_vision_encoder="eva-test:16x2",
                           mm_hidden_size=16)
    towers = build_modal_encoders(cfg, jax.random.PRNGKey(0))
    tower = towers["vision"]
    assert type(tower).__name__ == "EvaVisionTower"
    assert tower.hidden_size == 16
    assert tower.feature_len == 4  # 28/14 grid -> 2x2 patches
    feats = np.asarray(tower.encode(tower.dummy_inputs))
    assert feats.shape == (1, 4, 16)


def test_eva_presets_match_published_dims():
    p = PRESETS["EVA02-CLIP-L-14-336"]
    assert (p.hidden_size, p.depth, p.num_heads) == (1024, 24, 16)
    assert p.swiglu and p.subln and p.use_rope
    assert p.grid == 24 and p.num_patches == 576
    g = PRESETS["EVA01-CLIP-g-14"]
    assert (g.hidden_size, g.depth) == (1408, 40)
    assert not (g.swiglu or g.subln or g.use_rope)


def test_eva_checkpoint_load_roundtrip(tmp_path):
    """load_model consumes a .pt checkpoint with visual.-prefixed keys
    (the released EVA file layout)."""
    import torch

    model = _build_reference("eva02")
    cfg = _our_cfg("eva02")
    state = {f"visual.{k}": v for k, v in model.state_dict().items()}
    p = tmp_path / "EVA02_tiny.bin"
    torch.save(state, p)

    from modelcompose_tpu.compose.state_io import load_state
    params = convert_eva_vision(load_state(str(p)), cfg)
    rs = np.random.RandomState(1)
    pixels = rs.randn(1, IMG, IMG, 3).astype(np.float32)
    feats = np.asarray(eva_vision_features(params, cfg, pixels))
    assert feats.shape == (1, 4, H)
