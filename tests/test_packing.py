"""Static-shape packing vs the reference splice semantics
(reference: modelcompose/model/multimodal_arch.py:287-459)."""

import numpy as np
import jax.numpy as jnp
import pytest

from modelcompose_tpu.config import ROUTE_CLASS_INDEX
from modelcompose_tpu.constants import IGNORE_INDEX, MODAL_TOKEN_INDEXES
from modelcompose_tpu.core.packing import (assemble_embeds, pick_bucket,
                                           plan_pack)

IMG = MODAL_TOKEN_INDEXES["vision"]
AUD = MODAL_TOKEN_INDEXES["audio"]


def test_single_image_layout():
    ids = np.array([5, 6, IMG, 7, 8])
    lab = np.array([-100, -100, -100, 7, 8])
    plan = plan_pack([ids], {"vision": (1, 3)}, labels=[lab], bucket_len=16)
    assert plan.lengths.tolist() == [7]  # 4 text + 3 feat
    # layout: 5 6 [f f f] 7 8
    assert plan.token_ids[0, :2].tolist() == [5, 6]
    assert plan.is_feat[0].tolist() == [False] * 2 + [True] * 3 + [False] * 11
    assert plan.token_ids[0, 5:7].tolist() == [7, 8]
    # labels: IGNORE over features (reference: multimodal_arch.py:361-364)
    assert plan.labels[0].tolist() == [-100, -100, -100, -100, -100, 7, 8] + \
        [IGNORE_INDEX] * 9
    v = ROUTE_CLASS_INDEX["vision"]
    assert plan.route_ids[0].tolist() == [0, 0, v, v, v, 0, 0] + [0] * 9
    assert plan.segment_ids[0].tolist() == [1] * 7 + [0] * 9


def test_instance_counter_is_global_across_batch():
    # reference: multimodal_arch.py:302 — cur_modal_idx shared over samples.
    ids0 = np.array([1, AUD, 2, AUD])
    ids1 = np.array([AUD, 3])
    plan = plan_pack([ids0, ids1], {"audio": (3, 2)}, bucket_len=16)
    # sample 0 consumes instances 0 and 1, sample 1 instance 2.
    assert plan.feat_idx[0, 1:3].tolist() == [0, 1]
    assert plan.feat_idx[0, 4:6].tolist() == [2, 3]
    assert plan.feat_idx[1, 0:2].tolist() == [4, 5]


def test_audio_feature_mask_routes_default():
    # Q-former padding inside the span is mask=False -> 'default' class
    # (reference complement construction, multimodal_arch.py:452-453).
    ids = np.array([1, AUD, 2])
    fm = np.array([[True, True, False, False]])
    plan = plan_pack([ids], {"audio": (1, 4)}, feat_masks={"audio": fm},
                     bucket_len=8)
    a = ROUTE_CLASS_INDEX["audio"]
    assert plan.route_ids[0].tolist() == [0, a, a, 0, 0, 0, 0, 0]
    # still attention-valid (reference pads attn mask with True, :446-448)
    assert plan.segment_ids[0].tolist() == [1] * 6 + [0] * 2


def test_text_only_sample_in_multimodal_batch():
    ids0 = np.array([1, IMG, 2])
    ids1 = np.array([4, 5, 6])
    plan = plan_pack([ids0, ids1], {"vision": (1, 2)}, bucket_len=8)
    assert not plan.is_feat[1].any()
    assert plan.route_ids[1].tolist() == [0] * 8
    assert plan.token_ids[1, :3].tolist() == [4, 5, 6]
    assert plan.lengths.tolist() == [4, 3]


def test_assemble_matches_manual_splice():
    H = 4
    V = 10
    embed = jnp.arange(V * H, dtype=jnp.float32).reshape(V, H)
    ids = np.array([1, IMG, 2, AUD, 3])
    vis = jnp.full((1, 2, H), 100.0)
    aud = jnp.stack([jnp.full((3, H), 200.0)])
    plan = plan_pack([ids], {"vision": (1, 2), "audio": (1, 3)}, bucket_len=16)
    out = assemble_embeds(embed, plan, {"vision": vis, "audio": aud})
    expect = jnp.concatenate([
        embed[1:2], jnp.full((2, H), 100.0), embed[2:3],
        jnp.full((3, H), 200.0), embed[3:4], jnp.zeros((8, H))], axis=0)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(expect))


def test_feature_rows_are_ordered_within_instance():
    H = 2
    embed = jnp.zeros((5, H))
    ids = np.array([1, IMG])
    vis = jnp.arange(6, dtype=jnp.float32).reshape(1, 3, H)
    plan = plan_pack([ids], {"vision": (1, 3)}, bucket_len=8)
    out = assemble_embeds(embed, plan, {"vision": vis})
    np.testing.assert_allclose(np.asarray(out[0, 1:4]),
                               np.asarray(vis[0]))


def test_instance_count_mismatch_raises():
    ids = np.array([1, IMG, IMG])
    with pytest.raises(ValueError):
        plan_pack([ids], {"vision": (1, 2)}, bucket_len=8)


def test_missing_modality_raises():
    ids = np.array([1, AUD])
    with pytest.raises(ValueError):
        plan_pack([ids], {"vision": (1, 2)}, bucket_len=8)


def test_bucket_selection():
    assert pick_bucket(3) == 512
    assert pick_bucket(513) == 1024
    # 256-step ladder in [2048, 4096]: the 3,287-position MCUB-4 prompt
    # executes 3,328 positions, not 4,096 (round-4 prefill-MFU fix)
    assert pick_bucket(2049) == 2304
    assert pick_bucket(3287) == 3328
    assert pick_bucket(4096) == 4096
    # >4096 prompts (e.g. two videos ~4.3k) generate instead of raising
    assert pick_bucket(4300) == 5120
    assert pick_bucket(8192) == 8192
    with pytest.raises(ValueError):
        pick_bucket(10_000)
