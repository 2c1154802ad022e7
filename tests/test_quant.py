"""Weight-only int8 decode quantization (ops/quant.py)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from modelcompose_tpu.config import tiny_test_config
from modelcompose_tpu.core.generate import generate
from modelcompose_tpu.core.llama import init_params
from modelcompose_tpu.ops.quant import (dequant_matmul, is_quantized,
                                        quantize_backbone, quantize_int8)


def test_quantize_roundtrip_accuracy():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32), jnp.float32)
    wq = quantize_int8(w)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64), jnp.float32)
    y_ref = x @ w
    y_q = dequant_matmul(x, wq)
    rel = float(jnp.abs(y_q - y_ref).max() / jnp.abs(y_ref).max())
    assert rel < 0.02, rel


def test_quantize_backbone_structure():
    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    qp = quantize_backbone(params)
    assert is_quantized(qp["layers"]["attn"]["q"]["w"])
    assert qp["layers"]["attn"]["q"]["w"]["q"].dtype == jnp.int8
    assert is_quantized(qp["lm_head"])
    # adapters untouched; original tree unmodified
    assert not is_quantized(qp["layers"]["attn"]["q"]["lora_a"])
    assert not is_quantized(params["layers"]["attn"]["q"]["w"])


@pytest.mark.slow
def test_quantized_generate_close_to_fp():
    cfg = tiny_test_config(mm_vision_encoder="x", mm_hidden_size=8)
    # non-degenerate weights so argmax is stable-ish
    params = init_params(cfg, jax.random.PRNGKey(0))
    qp = quantize_backbone(params)
    embeds = jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.hidden_size),
                               jnp.float32)
    lengths = np.array([8])
    table = cfg.routing_table()
    out_fp = generate(params, cfg, embeds, lengths=lengths,
                      routing_table=table, max_new_tokens=4)
    out_q = generate(qp, cfg, embeds, lengths=lengths,
                     routing_table=table, max_new_tokens=4)
    # int8 is an approximation: outputs must be well-formed; typically equal
    assert len(out_q[0]) > 0 and len(out_fp[0]) > 0


@pytest.mark.slow
def test_int8_kv_cache_generate_close():
    """int8 KV cache decode: same shape/flow, outputs within quantization
    noise of the bf16-cache path (greedy tokens usually identical on a
    non-degenerate model)."""
    import jax
    cfg = tiny_test_config(mm_vision_encoder="x", mm_hidden_size=8)
    params = init_params(cfg, jax.random.PRNGKey(3))
    embeds = jax.random.normal(jax.random.PRNGKey(4),
                               (2, 8, cfg.hidden_size), jnp.float32)
    lengths = np.array([8, 6])
    table = cfg.routing_table()
    out_fp = generate(params, cfg, embeds, lengths=lengths,
                      routing_table=table, max_new_tokens=5)
    out_q = generate(params, cfg, embeds, lengths=lengths,
                     routing_table=table, max_new_tokens=5, kv_quant=True)
    assert len(out_q) == 2 and all(len(o) > 0 for o in out_q)
    # logits-level check: prefill+1-step with both cache formats
    from modelcompose_tpu.core.generate import _prefill
    lg_fp, _ = _prefill(params, cfg, jnp.asarray(embeds), None,
                        jnp.asarray(table), None, jnp.asarray(lengths),
                        16, "xla", False)
    lg_q, _ = _prefill(params, cfg, jnp.asarray(embeds), None,
                       jnp.asarray(table), None, jnp.asarray(lengths),
                       16, "xla", True)
    # prefill logits identical (cache quantization only affects reads)
    np.testing.assert_allclose(np.asarray(lg_q), np.asarray(lg_fp),
                               atol=1e-5)
    _ = out_fp


@pytest.mark.slow
def test_int8_kv_greedy_tokens_match_fp_cache():
    """The production serving config decodes over an int8 KV cache;
    greedy tokens must match the fp-cache path (scales factor out of
    both attention contractions, ops/attention.decode_attention)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from modelcompose_tpu.config import ROUTE_CLASS_INDEX, tiny_test_config
    from modelcompose_tpu.core.generate import generate
    from modelcompose_tpu.core.llama import init_params

    cfg = tiny_test_config(mm_vision_encoder="x", mm_hidden_size=8)
    params = init_params(cfg, jax.random.PRNGKey(0))
    B, L = 2, 8
    embeds = jax.random.normal(jax.random.PRNGKey(2),
                               (B, L, cfg.hidden_size)) * 0.1
    route_ids = np.zeros((B, L), np.int32)
    route_ids[:, 2:4] = ROUTE_CLASS_INDEX["vision"]
    kw = dict(lengths=np.array([L, L - 2], np.int32),
              route_ids=jnp.asarray(route_ids),
              routing_table=cfg.routing_table(), max_new_tokens=8,
              eos_token_id=None)
    t_fp = generate(params, cfg, embeds, **kw)
    t_q8 = generate(params, cfg, embeds, kv_quant=True, **kw)
    assert t_fp == t_q8
