"""Chunked prefill (core/generate.prefill_chunked): numerically identical
to the one-shot prefill, and the decode that follows produces the same
greedy tokens."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from modelcompose_tpu.config import ROUTE_CLASS_INDEX, tiny_test_config
from modelcompose_tpu.core.generate import (_decode_loop, _prefill,
                                            prefill_chunked)
from modelcompose_tpu.core.llama import init_params


def _setup():
    cfg = tiny_test_config(mm_vision_encoder="x", mm_hidden_size=8,
                           dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    for grp in ("attn", "mlp"):
        for name in params["layers"][grp]:
            key, sub = jax.random.split(key)
            p = params["layers"][grp][name]
            p["lora_b"] = jax.random.normal(sub, p["lora_b"].shape) * 0.1
    B, L = 1, 16
    embeds = jax.random.normal(jax.random.PRNGKey(2),
                               (B, L, cfg.hidden_size)) * 0.1
    route = np.zeros((B, L), np.int32)
    route[:, 2:5] = ROUTE_CLASS_INDEX["vision"]
    lengths = np.array([13], np.int32)  # right padding after position 12
    return cfg, params, embeds, jnp.asarray(route), lengths


@pytest.mark.slow
def test_chunked_prefill_matches_one_shot():
    cfg, params, embeds, route, lengths = _setup()
    table = cfg.routing_table()
    seg = (np.arange(16)[None] < lengths[:, None]).astype(np.int32)
    cache_len = 32

    logits_full, cache_full = _prefill(
        params, cfg, embeds, route, jnp.asarray(table), jnp.asarray(seg),
        jnp.asarray(lengths), cache_len, "auto", False)
    ticks = []
    logits_c, cache_c = prefill_chunked(
        params, cfg, embeds, route, table, lengths, cache_len, chunk=4,
        tick_cb=lambda: ticks.append(1))
    assert len(ticks) == 4  # one per chunk

    np.testing.assert_allclose(np.asarray(logits_c),
                               np.asarray(logits_full), rtol=2e-5,
                               atol=2e-5)
    # the cache's VALID region matches exactly (beyond lengths both paths
    # hold whatever the padding rows produced; decode masks it out)
    Lv = int(lengths[0])
    for part in ("k", "v"):
        np.testing.assert_allclose(
            np.asarray(getattr(cache_c, part))[:, :, :Lv],
            np.asarray(getattr(cache_full, part))[:, :, :Lv],
            rtol=2e-5, atol=2e-5)

    # same greedy continuation from both caches
    rng = jax.random.PRNGKey(0)
    t_full, _ = _decode_loop(params, cfg, cache_full, logits_full,
                             jnp.asarray(lengths), jnp.asarray(table), rng,
                             6, -1, do_sample=False)
    t_c, _ = _decode_loop(params, cfg, cache_c, logits_c,
                          jnp.asarray(lengths), jnp.asarray(table), rng,
                          6, -1, do_sample=False)
    assert np.asarray(t_full).tolist() == np.asarray(t_c).tolist()


@pytest.mark.slow
def test_chunked_prefill_ragged_and_unit_chunks():
    """chunk sizes that don't divide the bucket (ragged tail) and even
    chunk=1 must still match the one-shot prefill."""
    cfg, params, embeds, route, lengths = _setup()
    table = cfg.routing_table()
    seg = (np.arange(16)[None] < lengths[:, None]).astype(np.int32)
    logits_full, _ = _prefill(
        params, cfg, embeds, route, jnp.asarray(table), jnp.asarray(seg),
        jnp.asarray(lengths), 32, "auto", False)
    for chunk in (5, 7, 1):  # 16 % 5 = 1, 16 % 7 = 2, unit chunks
        logits_c, _ = prefill_chunked(params, cfg, embeds, route, table,
                                      lengths, 32, chunk=chunk)
        np.testing.assert_allclose(np.asarray(logits_c),
                                   np.asarray(logits_full), rtol=2e-5,
                                   atol=2e-5, err_msg=f"chunk={chunk}")


@pytest.mark.slow
def test_chunked_prefill_kv_quant_append():
    """kv_quant=True: each chunk quantizes into an int8 transient at
    append time (memory-bounded long admissions, serve/slot_engine).
    The cache is int8-structured, its valid rows equal the one-shot
    int8 prefill's write-time quantization within 1 int8 step (inputs
    to quantize_kv differ only by the prefix's dequant round-trip), and
    the logits stay close to the bf16-read path — the same
    approximation class as int8-KV decode, one phase earlier."""
    cfg, params, embeds, route, lengths = _setup()
    table = cfg.routing_table()
    seg = (np.arange(16)[None] < lengths[:, None]).astype(np.int32)
    cache_len = 32

    logits_bf, _ = prefill_chunked(params, cfg, embeds, route, table,
                                   lengths, cache_len, chunk=4)
    logits_q, cache_q = prefill_chunked(params, cfg, embeds, route, table,
                                        lengths, cache_len, chunk=4,
                                        kv_quant=True)
    assert isinstance(cache_q.k, dict) and cache_q.k["q"].dtype == jnp.int8
    rel = (np.abs(np.asarray(logits_q) - np.asarray(logits_bf)).max()
           / (np.abs(np.asarray(logits_bf)).max() + 1e-9))
    assert rel < 0.05, rel

    # one-shot int8 prefill: same quantized-cache STRUCTURE; the valid
    # int8 rows agree tightly (layer-l k/v see layer-(l-1) attention
    # outputs that already differ by the prefix dequant round-trip, so
    # the drift compounds a few int8 steps — NOT bit-identity)
    logits_os, cache_os = _prefill(
        params, cfg, embeds, route, jnp.asarray(table), jnp.asarray(seg),
        jnp.asarray(lengths), cache_len, "auto", True)
    Lv = int(lengths[0])
    for part in ("k", "v"):
        a = np.asarray(getattr(cache_q, part)["q"])[:, :, :Lv]
        b = np.asarray(getattr(cache_os, part)["q"])[:, :, :Lv]
        diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
        assert diff.max() <= 8 and (diff <= 1).mean() > 0.99, \
            (diff.max(), (diff <= 1).mean())

    # greedy continuation through the int8-KV decode path matches the
    # one-shot int8 engine on this model
    rng = jax.random.PRNGKey(0)
    t_q, _ = _decode_loop(params, cfg, cache_q, logits_q,
                          jnp.asarray(lengths), jnp.asarray(table), rng,
                          6, -1, do_sample=False)
    t_os, _ = _decode_loop(params, cfg, cache_os, logits_os,
                           jnp.asarray(lengths), jnp.asarray(table), rng,
                           6, -1, do_sample=False)
    assert np.asarray(t_q).tolist() == np.asarray(t_os).tolist()


def test_chunked_prefill_no_routing():
    cfg, params, embeds, _, lengths = _setup()
    seg = (np.arange(16)[None] < lengths[:, None]).astype(np.int32)
    logits_full, _ = _prefill(params, cfg, embeds, None, None,
                              jnp.asarray(seg), jnp.asarray(lengths), 32,
                              "auto", False)
    logits_c, _ = prefill_chunked(params, cfg, embeds, None, None, lengths,
                                  32, chunk=8)
    np.testing.assert_allclose(np.asarray(logits_c),
                               np.asarray(logits_full), rtol=2e-5,
                               atol=2e-5)
