"""Training policy + sharded train step
(reference: modelcompose/train/train_multimodal.py:424-466,
llava_trainer.py:193-329)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from modelcompose_tpu.config import tiny_test_config
from modelcompose_tpu.constants import IGNORE_INDEX, MODAL_TOKEN_INDEXES
from modelcompose_tpu.core.packing import plan_pack
from modelcompose_tpu.models.model import MultimodalLM
from modelcompose_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                            param_pspecs, shard_params)
from modelcompose_tpu.train.trainer import (TrainConfig, adapter_row_lrs,
                                            init_train_state,
                                            make_optimizer, make_train_step,
                                            normalized_warmup_cosine)

IMG = MODAL_TOKEN_INDEXES["vision"]


def _make_batch(model, B=2):
    rs = np.random.RandomState(0)
    pixels = rs.rand(B, 28, 28, 3).astype(np.float32)
    enc_feats = model.encoders["vision"].encode(pixels)
    ids = [np.array([1, IMG, 7, 8]) for _ in range(B)]
    labels = [np.array([-100, -100, 7, 8]) for _ in range(B)]
    span = model.feature_span_len("vision")
    plan = plan_pack(ids, {"vision": (B, span)}, labels=labels,
                     bucket_len=16)
    batch = {
        "encoder_features": {"vision": jnp.asarray(enc_feats)},
        "token_ids": jnp.asarray(plan.token_ids),
        "feat_idx": jnp.asarray(plan.feat_idx),
        "is_feat": jnp.asarray(plan.is_feat),
        "route_ids": jnp.asarray(plan.route_ids),
        "labels": jnp.asarray(plan.labels),
        "segment_ids": jnp.asarray(plan.segment_ids),
    }
    return batch, tuple(plan.feat_layout)


@pytest.fixture(scope="module")
def vision_model():
    cfg = tiny_test_config(mm_vision_encoder="test:32x2", mm_hidden_size=32,
                           mm_projector_type="mlp2x_gelu",
                           local_prefix_tokens=1, local_suffix_tokens=1)
    return MultimodalLM.random_init(cfg, jax.random.PRNGKey(0))


def test_adapter_row_lrs_strategies():
    tc = TrainConfig(learning_rate=1e-3, mm_language_lr=1e-5)
    cfg = tiny_test_config(mm_vision_encoder="x", mm_hidden_size=8,
                           lora_strategy="modal+language")
    lrs = adapter_row_lrs(cfg, tc)  # [default, vision]
    np.testing.assert_allclose(lrs, [1e-5, 1e-3])

    cfg2 = tiny_test_config(mm_vision_encoder="x", mm_hidden_size=8,
                            lora_strategy="modal")
    np.testing.assert_allclose(adapter_row_lrs(cfg2, tc), [0, 1e-3])

    cfg3 = tiny_test_config(mm_vision_encoder="x", mm_hidden_size=8,
                            lora_strategy="same")
    np.testing.assert_allclose(adapter_row_lrs(cfg3, tc), [1e-3, 0])

    tc_stage1 = TrainConfig(tune_mm_mlp_adapter=True)
    np.testing.assert_allclose(adapter_row_lrs(cfg, tc_stage1), [0, 0])


def test_schedule_shape():
    sched = normalized_warmup_cosine(10, 100)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(10)) - 1.0) < 1e-6
    assert float(sched(100)) < 1e-6
    assert 0.4 < float(sched(55)) < 0.6


def test_train_steps_decrease_loss_and_freeze_base(vision_model):
    model = vision_model
    tc = TrainConfig(learning_rate=5e-3, mm_projector_lr=5e-3,
                     mm_language_lr=5e-3, total_steps=20, warmup_ratio=0.0)
    state = init_train_state(model.cfg, tc, model.params, model.projectors)
    tx, labels = make_optimizer(model.cfg, tc, state.params)
    # re-init opt state with the same tx used by the step
    state = init_train_state(model.cfg, tc, model.params, model.projectors)
    step = make_train_step(model.cfg, tc, tx, attn_impl="xla", donate=False)

    batch, layout = _make_batch(model)
    base_w_before = np.asarray(
        state.params["backbone"]["layers"]["attn"]["q"]["w"])
    lora_before = np.asarray(
        state.params["backbone"]["layers"]["attn"]["q"]["lora_a"])
    proj_before = np.asarray(state.params["projectors"]["vision"]
                             ["layers"][0]["w"])

    losses = []
    for _ in range(5):
        state, loss = step(state, batch, layout)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses

    np.testing.assert_array_equal(
        np.asarray(state.params["backbone"]["layers"]["attn"]["q"]["w"]),
        base_w_before)  # base frozen
    assert not np.allclose(
        np.asarray(state.params["backbone"]["layers"]["attn"]["q"]["lora_a"]),
        lora_before)  # adapters moved
    assert not np.allclose(
        np.asarray(state.params["projectors"]["vision"]["layers"][0]["w"]),
        proj_before)  # projector moved


def test_stage1_projector_only(vision_model):
    model = vision_model
    tc = TrainConfig(learning_rate=5e-3, total_steps=10,
                     tune_mm_mlp_adapter=True, warmup_ratio=0.0)
    state = init_train_state(model.cfg, tc, model.params, model.projectors)
    tx, _ = make_optimizer(model.cfg, tc, state.params)
    step = make_train_step(model.cfg, tc, tx, attn_impl="xla", donate=False)
    batch, layout = _make_batch(model)
    lora_before = np.asarray(
        state.params["backbone"]["layers"]["attn"]["q"]["lora_a"])
    prefix_before = np.asarray(
        state.params["backbone"]["prefix_tokens"]["vision"])
    state, _ = step(state, batch, layout)
    np.testing.assert_array_equal(
        np.asarray(state.params["backbone"]["layers"]["attn"]["q"]["lora_a"]),
        lora_before)
    np.testing.assert_array_equal(
        np.asarray(state.params["backbone"]["prefix_tokens"]["vision"]),
        prefix_before)


@pytest.mark.slow
def test_sharded_train_step_on_mesh(vision_model):
    model = vision_model
    mesh = make_mesh(data=4, model=2)
    params = shard_params(model.params, mesh)
    tc = TrainConfig(learning_rate=1e-3, total_steps=10, warmup_ratio=0.0)
    state = init_train_state(model.cfg, tc, params, model.projectors)
    tx, _ = make_optimizer(model.cfg, tc, state.params)
    step = make_train_step(model.cfg, tc, tx, attn_impl="xla", donate=False)
    batch, layout = _make_batch(model, B=4)
    bs = batch_sharding(mesh)
    batch = {k: (jax.device_put(v, bs) if k != "encoder_features" else
                 {m: jax.device_put(f, bs) for m, f in v.items()})
             for k, v in batch.items()}
    with mesh:
        state, loss = step(state, batch, layout)
    assert np.isfinite(float(loss))


def test_param_pspecs_cover_tree(vision_model):
    specs = param_pspecs(vision_model.params)
    jax.tree.map(lambda a, b: None, vision_model.params, specs,
                 is_leaf=lambda x: hasattr(x, "ndim") or
                 type(x).__name__ == "PartitionSpec")


@pytest.mark.slow
def test_remat_training_matches_no_remat():
    """cfg.remat rematerializes decoder layers; loss/grads identical."""
    import jax
    from modelcompose_tpu.core.llama import forward, init_params
    from modelcompose_tpu.models.model import causal_lm_loss

    def run(remat):
        cfg = tiny_test_config(remat=remat)
        params = init_params(cfg, jax.random.PRNGKey(0))
        embeds = jax.random.normal(jax.random.PRNGKey(1),
                                   (1, 8, cfg.hidden_size), jnp.float32)
        labels = jnp.array([[1, 2, 3, 4, 5, 6, 7, 2]])

        def loss_fn(p):
            logits, _ = forward(p, cfg, embeds,
                                routing_table=jnp.asarray(cfg.routing_table()))
            return causal_lm_loss(logits, labels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return float(loss), grads

    l0, g0 = run(False)
    l1, g1 = run(True)
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g0["layers"]["attn"]["q"]["lora_b"]),
        np.asarray(g1["layers"]["attn"]["q"]["lora_b"]), atol=1e-6)


@pytest.mark.slow
def test_bf16_adam_moments(vision_model):
    model = vision_model
    tc = TrainConfig(learning_rate=5e-3, total_steps=10, warmup_ratio=0.0,
                     adam_mu_dtype="bfloat16")
    state = init_train_state(model.cfg, tc, model.params, model.projectors)
    tx, _ = make_optimizer(model.cfg, tc, state.params)
    step = make_train_step(model.cfg, tc, tx, attn_impl="xla", donate=False)
    batch, layout = _make_batch(model)
    state, loss = step(state, batch, layout)
    assert np.isfinite(float(loss))
    # mu stored in bf16 for trainable leaves
    leaves = jax.tree.leaves(state.opt_state)
    assert any(getattr(l, "dtype", None) == jnp.bfloat16 for l in leaves)


@pytest.mark.slow
def test_grad_accumulation_matches_big_batch(vision_model):
    """accum=2 over two half-batches == one step over the full batch."""
    from modelcompose_tpu.train.trainer import make_grad_and_apply
    model = vision_model
    tc = TrainConfig(learning_rate=1e-2, total_steps=10, warmup_ratio=0.0)
    batch, layout = _make_batch(model, B=4)

    def half(b, sl):
        # slice rows AND rebase feat_idx onto the halved feature table
        # (plan_pack's indices are absolute into the batch's flattened
        # features — the train entry re-plans each micro-batch)
        out = {}
        span = layout[0][2]
        base = sl.start * span
        for k, v in b.items():
            if k == "encoder_features":
                out[k] = {m: f[sl] for m, f in v.items()}
            elif k == "feat_idx":
                out[k] = jnp.where(b["is_feat"][sl], v[sl] - base, 0)
            else:
                out[k] = v[sl]
        return out

    state_b = init_train_state(model.cfg, tc, model.params,
                               model.projectors)
    tx_b, _ = make_optimizer(model.cfg, tc, state_b.params)
    grad_fn, apply_fn, accumulate, grad_accum_fn = make_grad_and_apply(
        model.cfg, tc, tx_b, attn_impl="xla",
        donate=False)  # the fixture keeps model.params
    # big-batch gradients vs two accumulated micro-batches: the
    # accumulation CONTRACT is gradient equality (post-Adam params are
    # sign-unstable where a gradient element is ~0 — the update is
    # +/-lr either way, so comparing params would test noise)
    _, g_big = grad_fn(state_b.params, batch, layout)
    half_layout = (("vision", 2, layout[0][2]),)
    _, g1 = grad_fn(state_b.params, half(batch, slice(0, 2)), half_layout)
    _, g2 = grad_fn(state_b.params, half(batch, slice(2, 4)), half_layout)
    total = accumulate(g1, g2, 1.0)
    total = jax.tree.map(lambda x: x / 2, total)
    for a, b in zip(jax.tree.leaves(g_big), jax.tree.leaves(total)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # the FUSED micro-step (grad + fold into the donated running total
    # in one program — the entry's production path) matches the split
    # grad_fn -> accumulate sequence exactly
    _, g1f = grad_fn(state_b.params, half(batch, slice(0, 2)), half_layout)
    _, total_f = grad_accum_fn(state_b.params, g1f,
                               half(batch, slice(2, 4)), half_layout)
    total_f = jax.tree.map(lambda x: x / 2, total_f)
    for a, b in zip(jax.tree.leaves(g_big), jax.tree.leaves(total_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # and the apply path runs (params move)
    state_b2 = apply_fn(state_b, total)
    w0 = np.asarray(state_b.params["projectors"]["vision"]["layers"][0]["w"])
    w1 = np.asarray(
        state_b2.params["projectors"]["vision"]["layers"][0]["w"])
    assert np.abs(w1 - w0).max() > 0


@pytest.mark.slow
def test_vision_tower_layerwise_lr_decay():
    """Vision-tower training with layerwise lr decay (reference:
    llava_trainer.py:98-132): tower params update, and the per-layer
    update magnitude decays with depth (top stacked layer steps ~1/decay
    larger than the one below; embeddings deepest)."""
    import jax
    import jax.numpy as jnp

    from modelcompose_tpu.config import tiny_test_config
    from modelcompose_tpu.constants import MODAL_TOKEN_INDEXES
    from modelcompose_tpu.core.packing import plan_pack
    from modelcompose_tpu.models.model import MultimodalLM
    from modelcompose_tpu.train.train_multimodal import make_batch
    from modelcompose_tpu.train.trainer import (TrainConfig,
                                                init_train_state,
                                                make_optimizer,
                                                make_train_step)

    # 3 tower layers: features tap hidden -2, so layers 0..1 contribute
    # (the top layer never influences the features and must not move)
    cfg = tiny_test_config(mm_vision_encoder="test:8x3", mm_hidden_size=8,
                           mm_projector_type="mlp2x_gelu",
                           lora_strategy="modal+language",
                           hidden_size=32, intermediate_size=64,
                           num_attention_heads=2, num_key_value_heads=2,
                           dtype="float32")
    model = MultimodalLM.random_init(cfg, jax.random.PRNGKey(0))
    decay = 0.5
    tc = TrainConfig(learning_rate=1e-3, total_steps=4, warmup_ratio=0.0,
                     mm_vision_tower_lr=1e-2,
                     mm_vision_tower_layerwise_lr_decay=decay)
    tower0 = jax.tree.map(np.asarray, model.encoders["vision"].params)
    state = init_train_state(cfg, tc, model.params, model.projectors,
                             tower_params={"vision":
                                           model.encoders["vision"].params})
    tx, _ = make_optimizer(cfg, tc, state.params)
    step = make_train_step(cfg, tc, tx, attn_impl="xla", donate=False,
                           vision_tower_cfg=model.encoders["vision"].cfg)

    IMG = MODAL_TOKEN_INDEXES["vision"]
    collated = {
        "input_ids": [np.array([1, IMG, 7, 8]), np.array([1, IMG, 9, 10])],
        "labels": [np.array([-100, -100, 7, 8]),
                   np.array([-100, -100, 9, 10])],
        "modal_inputs": {"vision": np.random.RandomState(0).randn(
            2, 28, 28, 3).astype(np.float32)},
    }
    batch, layout = make_batch(model, collated, tower_train=True)
    assert "tower_pixels" in batch and "vision" not in \
        batch["encoder_features"]
    # two steps: the warmup schedule multiplier is 0 at step 0
    state, loss = step(state, batch, layout)
    state, loss = step(state, batch, layout)
    assert np.isfinite(float(loss))

    tower1 = state.params["towers"]["vision"]
    qw0, qw1 = tower0["layers"]["q"]["w"], np.asarray(
        tower1["layers"]["q"]["w"])
    per_layer = np.abs(qw1 - qw0).mean(axis=(1, 2))  # [L]
    assert per_layer[1] > 0, "tower did not train"
    assert per_layer[2] == 0, "layer above the -2 tap must have zero grad"
    # layer 1 steps ~1/decay larger than layer 0 (Adam output is a
    # normalized direction, so the leaf lr IS the step magnitude)
    ratio = per_layer[1] / per_layer[0]
    assert 1.5 < ratio < 2.5, (per_layer, ratio)
    emb_delta = np.abs(np.asarray(tower1["patch_embedding"])
                       - tower0["patch_embedding"]).mean()
    assert emb_delta < per_layer[0], (emb_delta, per_layer)


@pytest.mark.slow
def test_tower_frozen_without_vision_tower_lr():
    """Without mm_vision_tower_lr the tower label is set_to_zero."""
    import jax

    from modelcompose_tpu.config import tiny_test_config
    from modelcompose_tpu.models.model import MultimodalLM
    from modelcompose_tpu.train.trainer import (TrainConfig,
                                                make_optimizer)

    cfg = tiny_test_config(mm_vision_encoder="test:8x1", mm_hidden_size=8,
                           lora_strategy="modal+language", dtype="float32")
    model = MultimodalLM.random_init(cfg, jax.random.PRNGKey(0))
    tc = TrainConfig(learning_rate=1e-3, total_steps=4)
    train_params = {"backbone": model.params,
                    "projectors": model.projectors,
                    "towers": {"vision": model.encoders["vision"].params}}
    tx, labels = make_optimizer(cfg, tc, train_params)
    assert set(jax.tree.leaves(labels["towers"])) == {"tower"}
    grads = jax.tree.map(lambda x: np.ones_like(x), train_params)
    updates, _ = tx.update(grads, tx.init(train_params), train_params)
    assert all(np.all(np.asarray(u) == 0)
               for u in jax.tree.leaves(updates["towers"]))


@pytest.mark.slow
def test_zero1_sharded_opt_state_matches_replicated():
    """ZeRO-1 (moments sharded over the data axis,
    parallel/mesh.shard_opt_state) must not change training numerics:
    two steps on a (4,2) mesh produce the same losses as replicated
    moments, and the data-sharded moment layout survives the step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from modelcompose_tpu.config import tiny_test_config
    from modelcompose_tpu.constants import MODAL_TOKEN_INDEXES
    from modelcompose_tpu.core.packing import plan_pack
    from modelcompose_tpu.models.model import MultimodalLM
    from modelcompose_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                                shard_params)
    from modelcompose_tpu.train.trainer import (TrainConfig,
                                                init_train_state,
                                                make_optimizer,
                                                make_train_step)

    cfg = tiny_test_config(
        mm_vision_encoder="test:32x2", mm_hidden_size=32,
        mm_projector_type="mlp2x_gelu", hidden_size=64,
        intermediate_size=128, num_attention_heads=4,
        num_key_value_heads=4, dtype="float32")
    model = MultimodalLM.random_init(cfg, jax.random.PRNGKey(0))
    host_params = jax.tree.map(np.asarray, model.params)
    host_proj = jax.tree.map(np.asarray, model.projectors)

    mesh = make_mesh(data=4, model=2)
    B = 4
    IMG = MODAL_TOKEN_INDEXES["vision"]
    pixels = np.zeros((B, 28, 28, 3), np.float32)
    enc_feats = np.asarray(model.encoders["vision"].encode(pixels))
    ids = [np.array([1, IMG, 7, 8]) for _ in range(B)]
    labels = [np.array([-100, -100, 7, 8]) for _ in range(B)]
    span = model.feature_span_len("vision")
    plan = plan_pack(ids, {"vision": (B, span)}, labels=labels,
                     bucket_len=16)
    bs = batch_sharding(mesh)
    batch = {
        "encoder_features": {"vision": jax.device_put(
            jnp.asarray(enc_feats), bs)},
        "token_ids": jax.device_put(jnp.asarray(plan.token_ids), bs),
        "feat_idx": jax.device_put(jnp.asarray(plan.feat_idx), bs),
        "is_feat": jax.device_put(jnp.asarray(plan.is_feat), bs),
        "route_ids": jax.device_put(jnp.asarray(plan.route_ids), bs),
        "labels": jax.device_put(jnp.asarray(plan.labels), bs),
        "segment_ids": jax.device_put(jnp.asarray(plan.segment_ids), bs),
    }
    tc = TrainConfig(learning_rate=1e-3, total_steps=4, warmup_ratio=0.0)

    def run(zero1):
        params = shard_params(host_params, mesh)
        state = init_train_state(cfg, tc, params, host_proj,
                                 mesh=mesh if zero1 else None)
        tx, _ = make_optimizer(cfg, tc, state.params)
        step = make_train_step(cfg, tc, tx, attn_impl="xla")
        losses = []
        with mesh:
            for _ in range(2):
                state, loss = step(state, batch, tuple(plan.feat_layout))
                losses.append(float(loss))
        return losses, state

    losses_rep, _ = run(zero1=False)
    losses_z1, state_z1 = run(zero1=True)
    np.testing.assert_allclose(losses_z1, losses_rep, rtol=1e-6)

    # a moment leaf with a data-divisible axis stays data-sharded
    from jax.sharding import PartitionSpec as P
    leaves = jax.tree.leaves(
        state_z1.opt_state,
        is_leaf=lambda x: hasattr(x, "sharding"))
    data_sharded = [x for x in leaves
                    if hasattr(x, "sharding") and getattr(
                        x.sharding, "spec", P()) and
                    "data" in str(x.sharding.spec)]
    assert data_sharded, "no opt-state leaf kept a data-axis sharding"


@pytest.mark.slow
def test_grad_accum_with_tower_training():
    """Gradient accumulation composes with vision-tower training: the
    accum grad fn must receive vision_tower_cfg (the in-graph tower
    forward needs it) — regression for the accum-branch crash."""
    import jax
    import numpy as np

    from modelcompose_tpu.config import tiny_test_config
    from modelcompose_tpu.constants import MODAL_TOKEN_INDEXES
    from modelcompose_tpu.models.model import MultimodalLM
    from modelcompose_tpu.train.train_multimodal import make_batch
    from modelcompose_tpu.train.trainer import (TrainConfig,
                                                init_train_state,
                                                make_grad_and_apply,
                                                make_optimizer)

    cfg = tiny_test_config(mm_vision_encoder="test:8x3", mm_hidden_size=8,
                           mm_projector_type="mlp2x_gelu",
                           lora_strategy="modal+language",
                           hidden_size=32, intermediate_size=64,
                           num_attention_heads=2, num_key_value_heads=2,
                           dtype="float32")
    model = MultimodalLM.random_init(cfg, jax.random.PRNGKey(0))
    tc = TrainConfig(learning_rate=1e-3, total_steps=4, warmup_ratio=0.0,
                     mm_vision_tower_lr=1e-2)
    state = init_train_state(cfg, tc, model.params, model.projectors,
                             tower_params={"vision":
                                           model.encoders["vision"].params})
    tx, _ = make_optimizer(cfg, tc, state.params)
    grad_fn, apply_fn, accumulate, _ = make_grad_and_apply(
        cfg, tc, tx, vision_tower_cfg=model.encoders["vision"].cfg,
        donate=False)  # the fixture keeps model.params

    IMG = MODAL_TOKEN_INDEXES["vision"]
    collated = {
        "input_ids": [np.array([1, IMG, 7, 8])],
        "labels": [np.array([-100, -100, 7, 8])],
        "modal_inputs": {"vision": np.random.RandomState(0).randn(
            1, 28, 28, 3).astype(np.float32)},
    }
    batch, layout = make_batch(model, collated, tower_train=True)
    loss1, g1 = grad_fn(state.params, batch, layout)
    loss2, g2 = grad_fn(state.params, batch, layout)
    total = jax.tree.map(lambda a, b: (a + b) / 2, g1, g2)
    state = apply_fn(state, total)
    assert np.isfinite(float(loss1)) and int(state.step) == 1
    # tower grads actually flowed
    g_tower = np.abs(np.asarray(
        g1["towers"]["vision"]["layers"]["q"]["w"])).sum()
    assert g_tower > 0


def test_full_finetune_when_strategy_absent():
    """lora_strategy ABSENT (None) mirrors the reference's no-freeze path
    (train_multimodal.py:436: the freeze only runs when a strategy is
    given): base backbone weights train at learning_rate — the legacy
    full-finetune recipe (scripts/legacy/finetune.sh).  The STRING 'none'
    still freezes the LLM."""
    import jax
    import numpy as np

    from modelcompose_tpu.config import tiny_test_config
    from modelcompose_tpu.train.trainer import (TrainConfig,
                                                make_optimizer,
                                                trainable_labels)

    from modelcompose_tpu.models.model import MultimodalLM

    tc = TrainConfig(learning_rate=1e-3, total_steps=4, warmup_ratio=0.0)

    cfg_none = tiny_test_config(mm_vision_encoder="test:8x1",
                                mm_hidden_size=8, lora_strategy=None)
    model = MultimodalLM.random_init(cfg_none, jax.random.PRNGKey(0))
    params = {"backbone": model.params, "projectors": model.projectors}
    labels = trainable_labels(params, cfg_none, tc)
    assert labels["backbone"]["layers"]["attn"]["q"]["w"] == "base"
    assert labels["backbone"]["embed_tokens"] == "base"
    tx, _ = make_optimizer(cfg_none, tc, params)  # builds without error

    cfg_str = tiny_test_config(mm_vision_encoder="test:8x1",
                               mm_hidden_size=8, lora_strategy="none")
    labels2 = trainable_labels(
        {"backbone": model.params, "projectors": model.projectors},
        cfg_str, tc)
    assert labels2["backbone"]["layers"]["attn"]["q"]["w"] == "frozen"


@pytest.mark.slow
def test_full_finetune_train_step_moves_base_weights():
    """End-to-end: a train step with lora_strategy absent updates BASE
    backbone weights (the legacy full-finetune recipe), while the same
    step with the string 'none' leaves them frozen."""
    import jax
    import numpy as np

    from modelcompose_tpu.config import tiny_test_config
    from modelcompose_tpu.constants import MODAL_TOKEN_INDEXES
    from modelcompose_tpu.core.packing import plan_pack
    from modelcompose_tpu.models.model import MultimodalLM
    from modelcompose_tpu.train.trainer import (TrainConfig,
                                                init_train_state,
                                                make_optimizer,
                                                make_train_step)

    def one_step(strategy):
        cfg = tiny_test_config(mm_vision_encoder="test:8x1",
                               mm_hidden_size=8,
                               mm_projector_type="mlp2x_gelu",
                               lora_strategy=strategy, dtype="float32")
        model = MultimodalLM.random_init(cfg, jax.random.PRNGKey(0))
        w0 = np.asarray(model.params["layers"]["attn"]["q"]["w"]).copy()
        tc = TrainConfig(learning_rate=1e-3, total_steps=4,
                         warmup_ratio=0.0)
        state = init_train_state(cfg, tc, model.params, model.projectors)
        tx, _ = make_optimizer(cfg, tc, state.params)
        step = make_train_step(cfg, tc, tx, attn_impl="xla", donate=False)

        IMG = MODAL_TOKEN_INDEXES["vision"]
        pixels = np.zeros((1, 28, 28, 3), np.float32)
        feats = np.asarray(model.encoders["vision"].encode(pixels))
        ids = [np.array([1, IMG, 7, 8])]
        labels = [np.array([-100, -100, 7, 8])]
        span = model.feature_span_len("vision")
        plan = plan_pack(ids, {"vision": (1, span)}, labels=labels,
                         bucket_len=16)
        import jax.numpy as jnp
        batch = {"encoder_features": {"vision": jnp.asarray(feats)},
                 "token_ids": jnp.asarray(plan.token_ids),
                 "feat_idx": jnp.asarray(plan.feat_idx),
                 "is_feat": jnp.asarray(plan.is_feat),
                 "route_ids": jnp.asarray(plan.route_ids),
                 "labels": jnp.asarray(plan.labels),
                 "segment_ids": jnp.asarray(plan.segment_ids)}
        # two steps: the warmup multiplier is 0 at step 0
        state, loss = step(state, batch, tuple(plan.feat_layout))
        state, loss = step(state, batch, tuple(plan.feat_layout))
        w1 = np.asarray(state.params["backbone"]["layers"]["attn"]["q"]["w"])
        return float(np.abs(w1 - w0).max()), float(loss)

    delta_full, loss_full = one_step(None)
    delta_frozen, _ = one_step("none")
    assert delta_full > 0, "full finetune did not move base weights"
    assert delta_frozen == 0, "strategy 'none' must freeze base weights"
    assert np.isfinite(loss_full)


def test_chunked_loss_matches_plain(vision_model):
    """loss_chunk path (rematerialized per-chunk lm_head; TrainConfig.
    loss_chunk) is numerically identical to the whole-sequence loss —
    value AND gradients — so the memory optimization cannot change
    training."""
    from modelcompose_tpu.train.trainer import multimodal_loss_from_features

    model = vision_model
    batch, layout = _make_batch(model)
    batch = dict(batch)
    batch["feat_layout"] = list(layout)
    table = jnp.asarray(model.cfg.routing_table())
    train_params = {"backbone": model.params,
                    "projectors": model.projectors}

    def loss(p, chunk):
        return multimodal_loss_from_features(p, model.cfg, table, batch,
                                             "xla", loss_chunk=chunk)

    l_plain, g_plain = jax.value_and_grad(lambda p: loss(p, None))(
        train_params)
    l_chunk, g_chunk = jax.value_and_grad(lambda p: loss(p, 4))(
        train_params)
    np.testing.assert_allclose(float(l_plain), float(l_chunk), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_chunk)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_tower_dtype_per_modal_override():
    """Vision-tower training keeps fp32 master weights for the TRAINED
    tower only; frozen towers beside it honor the requested dtype —
    forcing every tower fp32 doubles frozen-tower HBM (round-5 review)."""
    import jax.numpy as jnp

    from modelcompose_tpu.config import tiny_test_config
    from modelcompose_tpu.models.towers import build_modal_encoders

    cfg = tiny_test_config(mm_vision_encoder="test:8x1",
                           mm_audio_encoder="test:16x2",
                           mm_hidden_size=8, mm_audio_hidden_size=16)
    encs = build_modal_encoders(cfg, jax.random.PRNGKey(0),
                                dtype=jnp.bfloat16,
                                dtype_per_modal={"vision": jnp.float32})
    vis = jax.tree.leaves(encs["vision"].params)
    aud = jax.tree.leaves(encs["audio"].params)
    assert all(l.dtype == jnp.float32 for l in vis
               if jnp.issubdtype(l.dtype, jnp.floating))
    assert any(l.dtype == jnp.bfloat16 for l in aud)


@pytest.mark.slow
def test_sharded_grad_accumulation_on_mesh(vision_model):
    """The fused accumulation micro-step (grad_accum_fn) under a DP x TP
    mesh: GSPMD infers shardings from the donated running total, and the
    accumulated gradients match the unsharded accumulation bit-for-near
    (the entry's multi-chip effective-batch path; the dryrun gates only
    cover make_train_step)."""
    from modelcompose_tpu.train.trainer import make_grad_and_apply

    model = vision_model
    tc = TrainConfig(learning_rate=1e-3, total_steps=10, warmup_ratio=0.0)
    batch, layout = _make_batch(model, B=4)

    # unsharded oracle
    state_u = init_train_state(model.cfg, tc, model.params,
                               model.projectors)
    tx_u, _ = make_optimizer(model.cfg, tc, state_u.params)
    g_u, _, _, ga_u = make_grad_and_apply(model.cfg, tc, tx_u,
                                          attn_impl="xla", donate=False)
    _, tot_u = g_u(state_u.params, batch, layout)
    _, tot_u = ga_u(state_u.params, tot_u, batch, layout)

    mesh = make_mesh(data=4, model=2)
    params = shard_params(model.params, mesh)
    state = init_train_state(model.cfg, tc, params, model.projectors)
    tx, _ = make_optimizer(model.cfg, tc, state.params)
    grad_fn, apply_fn, _, grad_accum_fn = make_grad_and_apply(
        model.cfg, tc, tx, attn_impl="xla", donate=False)
    bs = batch_sharding(mesh)
    sb = {k: (jax.device_put(v, bs) if k != "encoder_features" else
              {m: jax.device_put(f, bs) for m, f in v.items()})
          for k, v in batch.items()}
    with mesh:
        loss1, total = grad_fn(state.params, sb, layout)
        loss2, total = grad_accum_fn(state.params, total, sb, layout)
        state2 = apply_fn(state, total)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert int(state2.step) == 1
    for a, b in zip(jax.tree.leaves(tot_u), jax.tree.leaves(total)):
        if a.size == 0:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_reinit_lora_a_enables_gradient_flow():
    """Training from a converted HF checkpoint: the converter zero-fills
    LoRA (A is normally overlaid from a trained adapter), and with A=0
    AND B=0 the LoRA gradients are identically zero forever (dL/dA ∝ B,
    dL/dB ∝ A) — reinit_lora_a is the peft get_peft_model kaiming-A step
    the train entry applies on that path."""
    from modelcompose_tpu.core.llama import init_params, reinit_lora_a

    cfg = tiny_test_config(mm_vision_encoder="x", mm_hidden_size=8,
                           lora_strategy="modal+language")
    params = init_params(cfg, jax.random.PRNGKey(0))
    # simulate the converter's zero-filled LoRA
    zeroed = jax.tree_util.tree_map_with_path(
        lambda p, x: jnp.zeros_like(x)
        if "lora" in jax.tree_util.keystr(p) else x, params)
    la0 = zeroed["layers"]["attn"]["q"]["lora_a"]
    assert float(jnp.abs(la0).max()) == 0.0
    fresh = reinit_lora_a(zeroed, jax.random.PRNGKey(1))
    la = fresh["layers"]["attn"]["q"]["lora_a"]
    lb = fresh["layers"]["attn"]["q"]["lora_b"]
    assert float(jnp.abs(la).max()) > 0.0       # A lives
    assert float(jnp.abs(lb).max()) == 0.0      # B stays zero
    # peft kaiming_uniform(a=sqrt(5)) bound = 1/sqrt(d_in)
    bound = 1.0 / np.sqrt(la.shape[-2])
    assert float(jnp.abs(la).max()) <= bound + 1e-6

    def loss(p):
        x = jnp.ones((1, 4, cfg.hidden_size), jnp.float32)
        from modelcompose_tpu.core.llama import forward
        logits, _ = forward(p, cfg, x,
                            routing_table=jnp.asarray(cfg.routing_table()))
        return (logits.astype(jnp.float32) ** 2).mean()

    g = jax.grad(loss, allow_int=True)(fresh)
    gb = g["layers"]["attn"]["q"]["lora_b"]
    assert float(jnp.abs(gb).max()) > 0.0       # grads FLOW into B now


def test_clip_masks_frozen_grads(vision_model):
    """Global-norm clipping must see TRAINABLE gradients only: huge grads
    on frozen bf16 base leaves (zeroed later inside multi_transform) must
    not rescale the trainable updates (HF clips requires_grad params)."""
    import optax

    model = vision_model
    tc = TrainConfig(learning_rate=1e-3, total_steps=10, warmup_ratio=0.0,
                     max_grad_norm=1.0)
    state = init_train_state(model.cfg, tc, model.params, model.projectors)
    tx, labels = make_optimizer(model.cfg, tc, state.params)
    opt_state = tx.init(state.params)

    small = jax.tree.map(lambda p: jnp.full_like(p, 1e-4), state.params)
    # blow up only the frozen base weight grads
    big = jax.tree_util.tree_map_with_path(
        lambda path, g: g * 1e6
        if any(getattr(p, "key", None) == "w" for p in path)
        and "projectors" != getattr(path[0], "key", None) else g,
        small)
    upd_small, _ = tx.update(small, opt_state, state.params)
    upd_big, _ = tx.update(big, opt_state, state.params)
    la_small = np.asarray(
        upd_small["backbone"]["layers"]["attn"]["q"]["lora_a"], np.float32)
    la_big = np.asarray(
        upd_big["backbone"]["layers"]["attn"]["q"]["lora_a"], np.float32)
    np.testing.assert_allclose(la_big, la_small, rtol=1e-5)


def test_weight_decay_grouping_matches_hf(vision_model):
    """HF AdamW grouping: norm scales/biases never decayed; LoRA and
    other weights decayed.  With zero grads, a decayed leaf still moves
    (-lr*wd*w) and a no-decay leaf stays put."""
    model = vision_model
    tc = TrainConfig(learning_rate=1e-2, total_steps=10, warmup_ratio=0.0,
                     weight_decay=0.1)
    state = init_train_state(model.cfg, tc, model.params, model.projectors)
    tx, labels = make_optimizer(model.cfg, tc, state.params)
    assert labels["backbone"]["layers"]["input_layernorm"] == "frozen"
    assert labels["projectors"]["vision"]["layers"][0]["b"] \
        == "proj:nodecay"
    assert labels["projectors"]["vision"]["layers"][0]["w"] == "proj"
    opt_state = tx.init(state.params)
    zeros = jax.tree.map(jnp.zeros_like, state.params)
    upd, _ = tx.update(zeros, opt_state, state.params)
    # decayed projector weight moves toward zero, bias (nodecay) is static
    w_upd = np.asarray(upd["projectors"]["vision"]["layers"][0]["w"],
                       np.float32)
    b_upd = np.asarray(upd["projectors"]["vision"]["layers"][0]["b"],
                       np.float32)
    la_upd = np.asarray(
        upd["backbone"]["layers"]["attn"]["q"]["lora_a"], np.float32)
    assert np.abs(w_upd).max() > 0
    np.testing.assert_array_equal(b_upd, 0)
    # LoRA A is random-init nonzero -> decays; B is zero-init -> no move
    assert np.abs(la_upd).max() > 0
