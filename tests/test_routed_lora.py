"""Golden tests for the routed-LoRA primitive against the reference math
(LocalLoraLinear.forward semantics, reference: modelcompose/model/
language_model/multimodal_llama.py:120-160), reimplemented independently in
numpy."""

import pytest
import numpy as np
import jax.numpy as jnp

from modelcompose_tpu.config import (ModelConfig, NUM_ROUTE_CLASSES,
                                     ROUTE_CLASS_INDEX, tiny_test_config)
from modelcompose_tpu.ops.routed_lora import (fold_default_adapter,
                                              route_weights,
                                              routed_lora_matmul)


def _numpy_reference(x, w, A, B, route):
    """y[t] = x[t] @ w + sum_a route[t,a] * (x[t] @ A_a) @ B_a."""
    y = x @ w
    n_adapters = A.shape[0]
    for a in range(n_adapters):
        y = y + route[..., a:a + 1] * ((x @ A[a]) @ B[a])
    return y


def _rand_setup(rng, B=2, L=6, d_in=8, d_out=10, n_adapters=3, r=4):
    x = rng.standard_normal((B, L, d_in)).astype(np.float32)
    w = rng.standard_normal((d_in, d_out)).astype(np.float32) * 0.1
    A = rng.standard_normal((n_adapters, d_in, r)).astype(np.float32) * 0.1
    Bm = rng.standard_normal((n_adapters, r, d_out)).astype(np.float32) * 0.1
    return x, w, A, Bm


def test_routed_matmul_matches_per_adapter_loop():
    rng = np.random.default_rng(0)
    x, w, A, Bm = _rand_setup(rng)
    route = rng.standard_normal((2, 6, 3)).astype(np.float32)
    got = routed_lora_matmul(jnp.array(x), jnp.array(w), jnp.array(A),
                             jnp.array(Bm), jnp.array(route))
    want = _numpy_reference(x, w, A, Bm, route)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_one_hot_routing_selects_single_adapter():
    rng = np.random.default_rng(1)
    x, w, A, Bm = _rand_setup(rng, B=1, L=3, n_adapters=2)
    # token 0 -> adapter 0 (scale 2.0), token 1 -> adapter 1, token 2 -> none
    route = np.zeros((1, 3, 2), np.float32)
    route[0, 0, 0] = 2.0
    route[0, 1, 1] = 1.0
    got = np.asarray(routed_lora_matmul(jnp.array(x), jnp.array(w),
                                        jnp.array(A), jnp.array(Bm),
                                        jnp.array(route)))
    base = x @ w
    np.testing.assert_allclose(got[0, 0], base[0, 0] +
                               2.0 * (x[0, 0] @ A[0]) @ Bm[0], rtol=1e-5)
    np.testing.assert_allclose(got[0, 1], base[0, 1] +
                               (x[0, 1] @ A[1]) @ Bm[1], rtol=1e-5)
    np.testing.assert_allclose(got[0, 2], base[0, 2], rtol=1e-5)


def test_route_none_is_base_only():
    rng = np.random.default_rng(2)
    x, w, A, Bm = _rand_setup(rng)
    got = routed_lora_matmul(jnp.array(x), jnp.array(w), jnp.array(A),
                             jnp.array(Bm), None)
    np.testing.assert_allclose(np.asarray(got), x @ w, rtol=1e-5, atol=1e-5)


def test_fold_default_matches_routed_default():
    rng = np.random.default_rng(3)
    x, w, A, Bm = _rand_setup(rng, B=1, L=4)
    default_route = np.array([0.5, 0.0, 1.5], np.float32)
    folded = fold_default_adapter(jnp.array(w), jnp.array(A), jnp.array(Bm),
                                  jnp.array(default_route))
    route = np.broadcast_to(default_route, (1, 4, 3))
    want = _numpy_reference(x, w, A, Bm, route)
    np.testing.assert_allclose(np.asarray(jnp.array(x) @ folded), want,
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Routing-table semantics (config-level)
# ---------------------------------------------------------------------------

def test_routing_table_damc_single_modality():
    cfg = tiny_test_config(mm_vision_encoder="clip", mm_hidden_size=16)
    names = cfg.adapter_names()
    assert names == ["default", "vision"]
    table = cfg.routing_table()
    scale = cfg.lora_alpha / cfg.lora_r
    assert table.shape == (NUM_ROUTE_CLASSES, 2)
    # default class -> default adapter
    assert table[ROUTE_CLASS_INDEX["default"], 0] == scale
    assert table[ROUTE_CLASS_INDEX["default"], 1] == 0
    # vision class -> vision adapter
    assert table[ROUTE_CLASS_INDEX["vision"], 1] == scale
    # absent modality -> no adapter at all (base only)
    assert np.all(table[ROUTE_CLASS_INDEX["audio"]] == 0)


def test_adapter_order_matches_reference_infer_modals():
    # Reference order: default, audio, vision, video, point
    # (modelcompose/model/multimodal_encoder/builder.py:121-133).
    cfg = tiny_test_config(mm_vision_encoder="clip", mm_audio_encoder="beats",
                           mm_video_encoder="lb", mm_point_encoder="pb",
                           mm_hidden_size=16, mm_audio_hidden_size=16,
                           mm_video_hidden_size=16, mm_point_hidden_size=16)
    assert cfg.adapter_names() == ["default", "audio", "vision", "video",
                                   "point"]


def test_routing_table_online_merge_reset():
    # online-merge-reset: default class fans out over default-{modal} rows
    # with coefficients folded into the scales (reference:
    # multimodal_llama.py:92-107, 130-148).
    cfg = tiny_test_config(
        mm_vision_encoder="clip", mm_audio_encoder="beats",
        mm_hidden_size=16, mm_audio_hidden_size=16,
        reset_scaling_weights="default-audio=0.5,default-vision=0.25")
    names = cfg.adapter_names()
    assert names == ["default", "audio", "vision", "default-audio",
                     "default-vision"]
    table = cfg.routing_table()
    scale = cfg.lora_alpha / cfg.lora_r
    drow = table[ROUTE_CLASS_INDEX["default"]]
    np.testing.assert_allclose(
        drow, [0.0, 0.0, 0.0, 0.5 * scale, 0.25 * scale], rtol=1e-6)
    # modality tokens still use their own adapter at base scale
    arow = table[ROUTE_CLASS_INDEX["audio"]]
    np.testing.assert_allclose(arow, [0.0, scale, 0.0, 0.0, 0.0], rtol=1e-6)


def test_routing_table_merge_mean():
    cfg = tiny_test_config(
        mm_vision_encoder="clip", mm_audio_encoder="beats",
        mm_hidden_size=16, mm_audio_hidden_size=16,
        merge_default_weights="mean")
    table = cfg.routing_table()
    scale = cfg.lora_alpha / cfg.lora_r
    drow = table[ROUTE_CLASS_INDEX["default"]]
    np.testing.assert_allclose(drow, [0, 0, 0, scale / 2, scale / 2],
                               rtol=1e-6)


def test_route_weights_gather():
    cfg = tiny_test_config(mm_vision_encoder="clip", mm_hidden_size=16)
    table = jnp.array(cfg.routing_table())
    ids = jnp.array([[0, ROUTE_CLASS_INDEX["vision"], 0]], jnp.int32)
    rw = route_weights(ids, table)
    assert rw.shape == (1, 3, 2)
    np.testing.assert_allclose(np.asarray(rw[0, 1]),
                               cfg.routing_table()[ROUTE_CLASS_INDEX["vision"]])


def test_fold_decode_adapters_equivalence():
    """Folded decode adapters == full routed computation on the default
    route, for plain and merge-reset tables."""
    import jax
    from modelcompose_tpu.config import tiny_test_config
    from modelcompose_tpu.core.llama import init_params
    from modelcompose_tpu.ops.routed_lora import (fold_decode_adapters,
                                                  routed_lora_matmul)

    cfg = tiny_test_config(
        mm_vision_encoder="x", mm_hidden_size=8,
        mm_audio_encoder="y", mm_audio_hidden_size=8,
        reset_scaling_weights="default-vision=0.5,default-audio=0.25")
    params = init_params(cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    for grp in ("attn", "mlp"):
        for name in params["layers"][grp]:
            key, sub = jax.random.split(key)
            p = params["layers"][grp][name]
            p["lora_b"] = jax.random.normal(sub, p["lora_b"].shape) * 0.1

    table = jnp.asarray(cfg.routing_table())
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, cfg.hidden_size))

    folded, ftable = fold_decode_adapters(params, np.asarray(table)[0])
    p_full = params["layers"]["attn"]["q"]
    p_fold = folded["layers"]["attn"]["q"]
    route_full = jnp.broadcast_to(table[0], (2, 3, table.shape[1]))
    route_fold = jnp.broadcast_to(ftable[0], (2, 3, 1))
    y_full = routed_lora_matmul(x, p_full["w"][0], p_full["lora_a"][0],
                                p_full["lora_b"][0], route_full)
    y_fold = routed_lora_matmul(x, p_fold["w"][0], p_fold["lora_a"][0],
                                p_fold["lora_b"][0], route_fold)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_full),
                               atol=1e-5)


def test_fold_dense_prefill_identical_decode_equal():
    """fold_dense: (a) prefill with the rebased table == original routed
    forward on every route class; (b) decode (route=None on folded params)
    == original default-route computation; (c) int8 base weights refold
    within quantization tolerance."""
    import jax
    from modelcompose_tpu.config import tiny_test_config
    from modelcompose_tpu.core.llama import init_params
    from modelcompose_tpu.ops.quant import quantize_backbone
    from modelcompose_tpu.ops.routed_lora import fold_dense

    cfg = tiny_test_config(
        mm_vision_encoder="x", mm_hidden_size=8,
        mm_audio_encoder="y", mm_audio_hidden_size=8,
        reset_scaling_weights="default-vision=0.5,default-audio=0.25")
    params = init_params(cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    for grp in ("attn", "mlp"):
        for name in params["layers"][grp]:
            key, sub = jax.random.split(key)
            p = params["layers"][grp][name]
            p["lora_b"] = jax.random.normal(sub, p["lora_b"].shape) * 0.1

    table = jnp.asarray(cfg.routing_table())
    folded, ftable = fold_dense(params, table)
    assert np.allclose(np.asarray(ftable[0]), 0.0)

    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, cfg.hidden_size))
    p_full = params["layers"]["attn"]["q"]
    p_fold = folded["layers"]["attn"]["q"]

    # (a) every route class reproduces the original routed output
    for cls in range(table.shape[0]):
        route = jnp.broadcast_to(table[cls], (2, 3, table.shape[1]))
        route_f = jnp.broadcast_to(ftable[cls], (2, 3, table.shape[1]))
        y = routed_lora_matmul(x, p_full["w"][0], p_full["lora_a"][0],
                               p_full["lora_b"][0], route)
        y_f = routed_lora_matmul(x, p_fold["w"][0], p_fold["lora_a"][0],
                                 p_fold["lora_b"][0], route_f)
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y),
                                   atol=1e-5)

    # (b) decode: adapter branch skipped entirely (route=None)
    route0 = jnp.broadcast_to(table[0], (2, 3, table.shape[1]))
    y_def = routed_lora_matmul(x, p_full["w"][0], p_full["lora_a"][0],
                               p_full["lora_b"][0], route0)
    y_dec = routed_lora_matmul(x, p_fold["w"][0], p_fold["lora_a"][0],
                               p_fold["lora_b"][0], None)
    np.testing.assert_allclose(np.asarray(y_dec), np.asarray(y_def),
                               atol=1e-5)

    # (c) int8 base: refolded quantized weight stays near the exact fold
    qparams = quantize_backbone(params, quantize_lm_head=False)
    qfolded, _ = fold_dense(qparams, table)
    wq = qfolded["layers"]["attn"]["q"]["w"]
    w_deq = np.asarray(wq["q"], np.float32) * np.asarray(wq["scale"])
    w_exact = np.asarray(p_fold["w"])
    err = np.abs(w_deq - w_exact).max()
    step = np.asarray(wq["scale"]).max()
    assert err <= step, (err, step)  # within one quantization step


def test_generate_fold_dense_matches_unfolded():
    """End-to-end: generate(fold_decode='dense') emits the same greedy
    tokens as the unfolded path."""
    import jax
    from modelcompose_tpu.config import ROUTE_CLASS_INDEX, tiny_test_config
    from modelcompose_tpu.core.generate import generate
    from modelcompose_tpu.core.llama import init_params

    cfg = tiny_test_config(mm_vision_encoder="x", mm_hidden_size=8,
                           mm_audio_encoder="y", mm_audio_hidden_size=8,
                           merge_default_weights="mean")
    params = init_params(cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    for grp in ("attn", "mlp"):
        for name in params["layers"][grp]:
            key, sub = jax.random.split(key)
            p = params["layers"][grp][name]
            p["lora_b"] = jax.random.normal(sub, p["lora_b"].shape) * 0.1

    B, L = 2, 8
    embeds = jax.random.normal(jax.random.PRNGKey(2),
                               (B, L, cfg.hidden_size)) * 0.1
    route_ids = np.zeros((B, L), np.int32)
    route_ids[:, 2:4] = ROUTE_CLASS_INDEX["vision"]
    lengths = np.array([L, L - 2], np.int32)
    kw = dict(lengths=lengths, route_ids=jnp.asarray(route_ids),
              routing_table=cfg.routing_table(), max_new_tokens=6,
              eos_token_id=None)
    t_plain = generate(params, cfg, embeds, **kw)
    t_fold = generate(params, cfg, embeds, fold_decode="dense", **kw)
    assert t_plain == t_fold


@pytest.mark.slow
def test_compact_active_adapters_prefill_identical():
    """Gathering the adapter stacks down to the batch-active columns is
    numerically identical to the full contraction — on forward logits AND
    greedy generation (VERDICT round 2 #3 / SURVEY hard part #2)."""
    import jax
    from modelcompose_tpu.config import ROUTE_CLASS_INDEX, tiny_test_config
    from modelcompose_tpu.core.generate import generate
    from modelcompose_tpu.core.llama import forward, init_params
    from modelcompose_tpu.ops.routed_lora import (active_adapter_set,
                                                  compact_active_adapters)

    # 3-modal online-merge-reset config: 7 adapter rows stacked
    cfg = tiny_test_config(
        mm_vision_encoder="x", mm_hidden_size=8,
        mm_audio_encoder="y", mm_audio_hidden_size=8,
        mm_video_encoder="z", mm_video_hidden_size=8,
        reset_scaling_weights=(
            "default-vision=0.4,default-audio=0.3,default-video=0.3"))
    params = init_params(cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    for grp in ("attn", "mlp"):
        for name in params["layers"][grp]:
            key, sub = jax.random.split(key)
            p = params["layers"][grp][name]
            p["lora_b"] = jax.random.normal(sub, p["lora_b"].shape) * 0.1
    table = cfg.routing_table()
    n_adapters = table.shape[1]

    # batch uses default + vision only -> active set is a strict subset
    B, L = 2, 8
    route_ids = np.zeros((B, L), np.int32)
    route_ids[:, 2:4] = ROUTE_CLASS_INDEX["vision"]
    classes = np.unique(route_ids)
    active = active_adapter_set(table, classes)
    assert 0 < len(active) < n_adapters, (active, n_adapters)

    cparams, ctable = compact_active_adapters(params, table, active)
    assert cparams["layers"]["attn"]["q"]["lora_a"].shape[1] == len(active)

    embeds = jax.random.normal(jax.random.PRNGKey(2),
                               (B, L, cfg.hidden_size)) * 0.1
    seg = np.ones((B, L), np.int32)
    full, _ = forward(params, cfg, embeds, route_ids=jnp.asarray(route_ids),
                      routing_table=jnp.asarray(table),
                      segment_ids=jnp.asarray(seg))
    comp, _ = forward(cparams, cfg, embeds, route_ids=jnp.asarray(route_ids),
                      routing_table=ctable, segment_ids=jnp.asarray(seg))
    np.testing.assert_allclose(np.asarray(comp), np.asarray(full),
                               rtol=1e-5, atol=1e-5)

    kw = dict(lengths=np.array([L, L - 2], np.int32),
              route_ids=jnp.asarray(route_ids), max_new_tokens=6,
              eos_token_id=None)
    t_full = generate(params, cfg, embeds, routing_table=table, **kw)
    t_comp = generate(cparams, cfg, embeds, routing_table=ctable, **kw)
    assert t_full == t_comp


@pytest.mark.slow
def test_model_generate_compact_adapters_matches():
    """MultimodalLM.generate(compact_adapters=True) emits identical tokens
    and caches the gathered stacks per active set."""
    import jax
    from modelcompose_tpu.config import tiny_test_config
    from modelcompose_tpu.constants import MODAL_TOKEN_INDEXES
    from modelcompose_tpu.models.model import MultimodalLM

    cfg = tiny_test_config(
        mm_vision_encoder="test:32x2", mm_hidden_size=32,
        mm_audio_encoder="test:32x2", mm_audio_hidden_size=32,
        mm_projector_type="mlp2x_gelu", local_prefix_tokens=1,
        local_suffix_tokens=1,
        reset_scaling_weights="default-vision=0.5,default-audio=0.5")
    model = MultimodalLM.random_init(cfg, jax.random.PRNGKey(3))
    IMG = MODAL_TOKEN_INDEXES["vision"]
    pixels = np.linspace(-1, 1, 2 * 28 * 28 * 3,
                         dtype=np.float32).reshape(2, 28, 28, 3)
    ids = [np.array([1, IMG, 7, 8]), np.array([1, IMG, 9, 10, 11])]
    t_ref = model.generate(ids, {"vision": jnp.asarray(pixels)},
                           max_new_tokens=6)
    t_cmp = model.generate(ids, {"vision": jnp.asarray(pixels)},
                           max_new_tokens=6, compact_adapters=True)
    assert t_ref == t_cmp
    (active,) = model._compact_cache.keys()
    # audio adapter rows are inactive for a vision-only batch
    assert len(active) < cfg.routing_table().shape[1]
