"""GOLDEN tower parity: our JAX towers vs the reference's own vendored
encoder code (run from /root/reference via the oracle loader) with
identical random weights."""

import numpy as np
import pytest

from tests.reference_oracle import reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not mounted")

import jax.numpy as jnp  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _oracle():
    from tests.reference_oracle import load_reference_arch
    load_reference_arch()


# ------------------------------------------------------------------ BEATs

def test_beats_matches_reference_model():
    import torch
    from modelcompose.model.multimodal_encoder.beats.BEATs import (BEATs,
                                                                   BEATsConfig)

    from modelcompose_tpu.models.audio_beats import (BeatsConfig,
                                                     beats_extract_features,
                                                     convert_beats_checkpoint)

    raw = {"input_patch_size": 4, "embed_dim": 16, "encoder_layers": 2,
           "encoder_embed_dim": 24, "encoder_ffn_embed_dim": 48,
           "encoder_attention_heads": 4, "conv_pos": 8,
           "conv_pos_groups": 4, "relative_position_embedding": True,
           "num_buckets": 32, "max_distance": 64, "gru_rel_pos": True,
           "deep_norm": True, "layer_norm_first": False}
    torch.manual_seed(0)
    ref_model = BEATs(BEATsConfig(raw))
    ref_model.eval()
    # make the zero-init rel bias / grep params non-trivial
    with torch.no_grad():
        for p in ref_model.parameters():
            if p.std() < 1e-6:
                p.add_(torch.randn_like(p) * 0.05)

    fbank = torch.randn(2, 16, 8)
    with torch.no_grad():
        want, want_mask = ref_model.extract_features_new(fbank, None,
                                                         feature_only=True)

    state = {k: v.float().numpy()
             for k, v in ref_model.state_dict().items()}
    cfg = BeatsConfig(input_patch_size=4, embed_dim=16, encoder_layers=2,
                      encoder_embed_dim=24, encoder_ffn_embed_dim=48,
                      encoder_attention_heads=4, conv_pos=8,
                      conv_pos_groups=4, num_buckets=32, max_distance=64,
                      fbank_bins=8)
    params = convert_beats_checkpoint(state, cfg)
    got, _ = beats_extract_features(params, cfg, jnp.asarray(fbank.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=5e-4,
                               rtol=1e-3)


def test_beats_padding_matches_reference():
    import torch
    from modelcompose.model.multimodal_encoder.beats.BEATs import (BEATs,
                                                                   BEATsConfig)

    from modelcompose_tpu.models.audio_beats import (BeatsConfig,
                                                     beats_extract_features,
                                                     convert_beats_checkpoint)

    raw = {"input_patch_size": 4, "embed_dim": 16, "encoder_layers": 1,
           "encoder_embed_dim": 24, "encoder_ffn_embed_dim": 48,
           "encoder_attention_heads": 4, "conv_pos": 8,
           "conv_pos_groups": 4, "relative_position_embedding": True,
           "num_buckets": 32, "max_distance": 64, "gru_rel_pos": True,
           "deep_norm": True, "layer_norm_first": False}
    torch.manual_seed(1)
    ref_model = BEATs(BEATsConfig(raw))
    ref_model.eval()
    fbank = torch.randn(1, 16, 8)
    pad = torch.zeros(1, 16, dtype=torch.bool)
    pad[0, 8:] = True
    with torch.no_grad():
        want, want_mask = ref_model.extract_features_new(
            fbank, pad, feature_only=True)
    state = {k: v.float().numpy()
             for k, v in ref_model.state_dict().items()}
    cfg = BeatsConfig(input_patch_size=4, embed_dim=16, encoder_layers=1,
                      encoder_embed_dim=24, encoder_ffn_embed_dim=48,
                      encoder_attention_heads=4, conv_pos=8,
                      conv_pos_groups=4, num_buckets=32, max_distance=64,
                      fbank_bins=8)
    params = convert_beats_checkpoint(state, cfg)
    got, got_mask = beats_extract_features(
        params, cfg, jnp.asarray(fbank.numpy()),
        jnp.asarray(pad.numpy()))
    np.testing.assert_array_equal(np.asarray(got_mask), want_mask.numpy())
    valid = ~want_mask.numpy()[0]
    np.testing.assert_allclose(np.asarray(got)[0, valid],
                               want.numpy()[0, valid], atol=5e-4, rtol=1e-3)


# -------------------------------------------------------------- PointBERT

def test_point_transformer_matches_reference(monkeypatch):
    import torch
    from modelcompose.model.multimodal_encoder.pointbert.point_encoder \
        import PointTransformer

    from modelcompose_tpu.models.point_bert import (PointBertConfig,
                                                    convert_point_bert,
                                                    point_bert_features)

    class Cfg(dict):
        __getattr__ = dict.__getitem__

    ref_cfg = Cfg(trans_dim=16, depth=2, drop_path_rate=0.0, cls_dim=4,
                  num_heads=2, group_size=4, num_group=8, encoder_dims=16,
                  point_dims=6)
    torch.manual_seed(0)
    ref_model = PointTransformer(ref_cfg, use_max_pool=False)
    ref_model.eval()

    # reference FPS seeds from a random point (misc.py:52); pin it to 0 to
    # match our deterministic grouping
    monkeypatch.setattr(
        torch, "randint",
        lambda low, high, size, **kw: torch.zeros(size, dtype=torch.long))

    pts = torch.randn(2, 64, 6)
    with torch.no_grad():
        want = ref_model(pts)

    state = {k: v.float().numpy()
             for k, v in ref_model.state_dict().items()}
    cfg = PointBertConfig(trans_dim=16, depth=2, num_heads=2, group_size=4,
                          num_group=8, encoder_dims=16, npoints=64)
    params = convert_point_bert(state, cfg)
    got = point_bert_features(params, cfg, jnp.asarray(pts.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=5e-4,
                               rtol=1e-3)


# ------------------------------------------------------- LanguageBind video

def test_languagebind_video_matches_reference():
    import torch
    from modelcompose.model.multimodal_encoder.languagebind.video \
        .configuration_video import CLIPVisionConfig
    from modelcompose.model.multimodal_encoder.languagebind.video \
        .modeling_video import CLIPVisionTransformer

    from modelcompose_tpu.models.video_languagebind import (
        LanguageBindVideoConfig, convert_languagebind_video,
        languagebind_video_features)

    ref_cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        num_frames=2, hidden_act="gelu")
    ref_cfg.add_time_attn = True
    ref_cfg.force_patch_dropout = 0.0
    # the vendored tree borrows transformers' CLIPAttention, which in new
    # versions dispatches on _attn_implementation
    ref_cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    ref_model = CLIPVisionTransformer(ref_cfg)
    ref_model.eval()

    video = torch.randn(1, 3, 2, 28, 28)  # [B, C, T, H, W]
    with torch.no_grad():
        out = ref_model(video, output_hidden_states=True, return_dict=True)
    want = out.hidden_states[-2].numpy()  # [B, T, N, C]

    state = {f"vision_model.{k}": v.float().numpy()
             for k, v in ref_model.state_dict().items()}
    cfg = LanguageBindVideoConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14, num_frames=2,
        hidden_act="gelu", select_layer=-2)
    params = convert_languagebind_video(state, cfg)
    pixels = video.permute(0, 2, 3, 4, 1).numpy()  # [B, T, H, W, 3]
    got = languagebind_video_features(params, cfg, jnp.asarray(pixels))
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)
