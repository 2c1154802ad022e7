"""CLIP vision tower parity vs HF CLIPVisionModel (the reference's tower,
modelcompose/model/multimodal_encoder/clip_encoder.py:54-81)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from modelcompose_tpu.models.vision_clip import (ClipVisionConfig,
                                                 clip_vision_features,
                                                 convert_hf_clip_vision,
                                                 init_clip_vision)


@pytest.fixture(scope="module")
def tiny_hf_clip():
    from transformers import CLIPVisionConfig as HFCfg
    from transformers import CLIPVisionModel
    torch.manual_seed(0)
    hf_cfg = HFCfg(hidden_size=32, intermediate_size=64, num_hidden_layers=3,
                   num_attention_heads=4, image_size=28, patch_size=14,
                   hidden_act="quick_gelu", attn_implementation="eager")
    model = CLIPVisionModel(hf_cfg)
    model.eval()
    return model


@pytest.mark.parametrize("select_layer,select_feature",
                         [(-2, "patch"), (-1, "cls_patch")])
def test_hf_parity(tiny_hf_clip, select_layer, select_feature):
    cfg = ClipVisionConfig(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=3, num_attention_heads=4,
                           image_size=28, patch_size=14,
                           select_layer=select_layer,
                           select_feature=select_feature)
    state = {k: v.numpy() for k, v in tiny_hf_clip.state_dict().items()}
    params = convert_hf_clip_vision(state, cfg)

    pixels = torch.randn(2, 3, 28, 28)
    with torch.no_grad():
        outs = tiny_hf_clip(pixels, output_hidden_states=True)
    want = outs.hidden_states[select_layer]
    if select_feature == "patch":
        want = want[:, 1:]
    want = want.numpy()

    got = clip_vision_features(params, cfg,
                               jnp.asarray(pixels.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_layers_to_run():
    cfg = ClipVisionConfig(num_hidden_layers=24, select_layer=-2)
    assert cfg.layers_to_run == 23
    cfg = ClipVisionConfig(num_hidden_layers=24, select_layer=-1)
    assert cfg.layers_to_run == 24
    assert ClipVisionConfig(num_hidden_layers=4, select_layer=2).layers_to_run == 2


def test_init_and_shapes():
    cfg = ClipVisionConfig(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=28, patch_size=14)
    params = init_clip_vision(cfg, jax.random.PRNGKey(0))
    feats = clip_vision_features(params, cfg, jnp.ones((1, 28, 28, 3)))
    assert feats.shape == (1, 4, 32)  # 2x2 patches, CLS dropped
