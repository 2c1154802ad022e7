"""GOLDEN parity: models/audio_imagebind.py vs the reference's vendored
ImageBind audio path (reference: modelcompose/model/multimodal_encoder/
imagebind/imagebind_model.py:455-531 — the 'VideoLLaMA' audio encoder,
builder.py:92-95)."""

import numpy as np
import pytest

from tests.reference_oracle import reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not mounted")

import dataclasses  # noqa: E402

from modelcompose_tpu.models.audio_imagebind import (  # noqa: E402
    ImageBindAudioConfig, ImageBindAudioProcessor, convert_imagebind_audio,
    imagebind_audio_features)

E, L, HEADS, MELS, FRAMES = 16, 2, 2, 32, 46


def _tiny_cfg() -> ImageBindAudioConfig:
    return ImageBindAudioConfig(
        embed_dim=E, num_blocks=L, num_heads=HEADS, num_mel_bins=MELS,
        target_len=FRAMES, out_embed_dim=E)


def _build_reference():
    import torch

    from tests.reference_oracle import load_reference_arch, _shim_timm
    _shim_timm()
    load_reference_arch()
    from modelcompose.model.multimodal_encoder.imagebind.imagebind_model \
        import ImageBindModel

    torch.manual_seed(0)
    model = ImageBindModel(
        audio_embed_dim=E, audio_num_blocks=L, audio_num_heads=HEADS,
        audio_num_mel_bins=MELS, audio_target_len=FRAMES,
        audio_drop_path=0.0, out_embed_dim=E,
        vision_embed_dim=8, vision_num_blocks=1, vision_num_heads=2,
        text_embed_dim=8, text_num_blocks=1, text_num_heads=2,
        depth_embed_dim=8, depth_num_blocks=1, depth_num_heads=2,
        thermal_embed_dim=8, thermal_num_blocks=1, thermal_num_heads=2,
        imu_embed_dim=8, forward_select=1)
    model.eval()
    gen = torch.Generator().manual_seed(11)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if not name.startswith(("modality_preprocessors.audio",
                                    "modality_trunks.audio",
                                    "modality_heads.audio")):
                continue
            if "norm" in name and name.endswith(".weight"):
                p.copy_(1.0 + 0.05 * torch.randn(p.shape, generator=gen))
            else:
                p.copy_(0.1 * torch.randn(p.shape, generator=gen))
    return model


@pytest.mark.slow
def test_imagebind_audio_features_match_reference():
    import torch

    model = _build_reference()
    cfg = _tiny_cfg()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_imagebind_audio(state, cfg)

    rs = np.random.RandomState(0)
    mel = rs.randn(2, 3, 1, MELS, FRAMES).astype(np.float32)  # B=2, S=3
    with torch.no_grad():
        ref = model.forward(torch.from_numpy(mel)).numpy()

    ours = np.asarray(imagebind_audio_features(params, cfg,
                                               mel.astype(np.float32)))
    assert ours.shape == ref.shape == (2, 3, E)
    np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=1e-4)
    # postprocessor: unit-norm x logit scale 20
    np.testing.assert_allclose(np.linalg.norm(ours, axis=-1),
                               cfg.logit_scale, rtol=1e-4)


def test_imagebind_tower_dispatch_and_protocol():
    """'VideoLLaMA' in the audio spec routes to the ImageBind tower
    (reference: builder.py:92-95)."""
    import jax

    from modelcompose_tpu.config import tiny_test_config
    from modelcompose_tpu.models.towers import build_modal_encoders

    cfg = tiny_test_config(mm_audio_encoder="imagebind-test:16x2",
                           mm_audio_hidden_size=16)
    towers = build_modal_encoders(cfg, jax.random.PRNGKey(0))
    tower = towers["audio"]
    assert type(tower).__name__ == "ImageBindAudioTower"
    assert tower.hidden_size == 16
    assert tower.feature_len == 3  # one token per clip
    feats = np.asarray(tower.encode(tower.dummy_inputs))
    assert feats.shape == (1, 3, 16)


def test_imagebind_processor_shapes_and_normalization():
    """waveform2melspec semantics: 3 uniformly spaced 2s clips, hanning
    fbank, pad/crop to target_len, (x - mean)/std (reference:
    data/data.py:27-150)."""
    cfg = ImageBindAudioConfig()
    proc = ImageBindAudioProcessor(cfg)
    rs = np.random.RandomState(0)
    wav = rs.randn(16000 * 5).astype(np.float32) * 0.1  # 5 s
    out = proc(wav)
    assert out.shape == (1, 3, 1, 128, 204)
    # pytorchvideo ConstantClipsPerVideoSampler semantics:
    # start_i = i * (duration - clip) / clips_per_video — 5 s, 2 s clip,
    # 3 clips -> [0, 1, 2] (the old endpoint-inclusive [0, 1.5, 3] pinned
    # a divergence from the reference sampler)
    assert proc._clip_starts(5.0) == [0.0, 1.0, 2.0]
    # short audio: frames get zero-padded to target_len (normalized pad)
    short = proc(rs.randn(16000).astype(np.float32))
    assert short.shape == (1, 3, 1, 128, 204)
    pad_val = (0.0 - cfg.norm_mean) / cfg.norm_std
    assert np.allclose(short[0, 0, 0, :, -1], pad_val)


def test_imagebind_checkpoint_load(tmp_path):
    """load_model consumes an imagebind_huge.pth-layout torch pickle with
    every modality's keys present (audio keys filtered)."""
    import torch

    model = _build_reference()
    p = tmp_path / "imagebind_huge.pth"
    torch.save(model.state_dict(), p)

    from modelcompose_tpu.models.audio_imagebind import ImageBindAudioTower

    tower = ImageBindAudioTower.__new__(ImageBindAudioTower)
    tower.cfg = _tiny_cfg()
    tower._dtype = np.float32
    tower.load_model(str(p))
    rs = np.random.RandomState(1)
    mel = rs.randn(1, 3, 1, MELS, FRAMES).astype(np.float32)
    out = np.asarray(imagebind_audio_features(tower.params, tower.cfg, mel))
    assert out.shape == (1, 3, E)


def test_imagebind_audio_through_collator_and_model():
    """End-to-end host pipeline for ImageBind audio: the collator must
    pass the stacked-melspec protocol through (the old code hard-assumed
    the BEATs ``(feats, mask)`` tuple and crashed on unpack — reference
    splits the same way, multimodal_arch.py:211-235)."""
    import jax

    from modelcompose_tpu.config import tiny_test_config
    from modelcompose_tpu.data.audio_processing import collate_audio_inputs
    from modelcompose_tpu.models.model import MultimodalLM

    cfg = tiny_test_config(mm_audio_encoder="imagebind-test:16x2",
                           mm_audio_hidden_size=16,
                           mm_projector_type="linear")
    model = MultimodalLM.random_init(cfg, jax.random.PRNGKey(0))
    proc = model.modal_processors()["audio"]
    rs = np.random.RandomState(0)
    waves = [rs.randn(16000).astype(np.float32) * 0.1 for _ in range(2)]
    collated = collate_audio_inputs(proc, waves)
    assert isinstance(collated, np.ndarray)  # stacked clips, no mask
    feats = model.encode_modal_inputs({"audio": collated})["audio"]
    span = model.feature_span_len("audio")
    assert feats.shape[0] == 2 and feats.shape[1] == span
    # and the BEATs protocol still round-trips through the same helper
    from modelcompose_tpu.data.audio_processing import BeatsAudioProcessor
    beats_out = collate_audio_inputs(BeatsAudioProcessor(), waves)
    assert set(beats_out) == {"audio_inputs", "audio_padding_mask"}
