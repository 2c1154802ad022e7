"""Pallas flash-decode kernel vs the XLA chunked loop (interpret mode on
CPU; bench.py's kernel_check covers the compiled path on hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modelcompose_tpu.core.llama import quantize_kv
import importlib
attn_mod = importlib.import_module(
    "modelcompose_tpu.ops.attention")  # the package re-exports the
# function under the same name, shadowing the submodule attribute
from modelcompose_tpu.ops.flash_decode import (_pick_chunk,
                                               flash_decode_attention)


def _xla_reference(q, k_cache, v_cache, kv_len, layer_idx):
    """The in-module XLA loop, forced past the pallas dispatch."""
    from modelcompose_tpu.ops import flash_decode as fd
    orig = fd.flash_decode_attention
    fd.flash_decode_attention = lambda *a, **kw: None
    try:
        return attn_mod.decode_attention(q, k_cache, v_cache, kv_len,
                                         layer_idx=layer_idx)
    finally:
        fd.flash_decode_attention = orig


def _make(B, S, H, Hkv, D, NL, quantized, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, 1, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (NL, B, S, Hkv, D), jnp.float32)
    v = jax.random.normal(ks[2], (NL, B, S, Hkv, D), jnp.float32)
    if quantized:
        return q, jax.jit(quantize_kv)(k), jax.jit(quantize_kv)(v)
    return q, k, v


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("rep", [1, 2])
def test_flash_decode_matches_xla_loop(quantized, rep):
    B, S, H, D, NL = 2, 256, 4, 16, 3
    Hkv = H // rep
    q, kc, vc = _make(B, S, H, Hkv, D, NL, quantized)
    kv_len = jnp.array([S - 5, 40], jnp.int32)
    for li in (0, NL - 1):
        got = flash_decode_attention(q, kc, vc, kv_len, jnp.int32(li),
                                     sm_scale=D ** -0.5, chunk=128)
        assert got is not None
        want = _xla_reference(q, kc, vc, kv_len, jnp.int32(li))
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=2e-5, atol=2e-5)


def test_decode_attention_dispatches_to_kernel():
    """The public decode_attention path takes the kernel when shapes fit
    and stays numerically identical."""
    B, S, H, Hkv, D, NL = 1, 256, 4, 4, 16, 2
    q, kc, vc = _make(B, S, H, Hkv, D, NL, True, seed=1)
    kv_len = jnp.array([100], jnp.int32)
    got = attn_mod.decode_attention(q, kc, vc, kv_len,
                                    layer_idx=jnp.int32(1), chunk=128)
    want = _xla_reference(q, kc, vc, kv_len, jnp.int32(1))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-5, atol=2e-5)


def test_pick_chunk():
    assert _pick_chunk(4224) == 384  # 4224 = 33*128 = 11*384
    assert _pick_chunk(4096) == 512
    assert _pick_chunk(512) == 512
    assert _pick_chunk(100) is None
    assert _pick_chunk(128) == 128


def test_kernel_under_jit_with_traced_layer():
    """layer_idx arrives traced from the decode layer-scan."""
    B, S, H, Hkv, D, NL = 1, 128, 4, 4, 16, 3
    q, kc, vc = _make(B, S, H, Hkv, D, NL, True, seed=2)
    kv_len = jnp.array([77], jnp.int32)

    @jax.jit
    def run(li):
        return flash_decode_attention(q, kc, vc, kv_len, li,
                                      sm_scale=D ** -0.5, chunk=128)

    for li in range(NL):
        got = run(jnp.int32(li))
        want = _xla_reference(q, kc, vc, kv_len, jnp.int32(li))
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=2e-5, atol=2e-5)
