"""Pallas flash attention vs XLA reference (kernel runs in interpreter mode
on the CPU test mesh; same code path compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modelcompose_tpu.ops.attention import attention_reference, decode_attention
from modelcompose_tpu.ops.flash_attention import flash_attention


def _rand_qkv(rng, B, L, S, H, Hkv, D):
    q = jnp.array(rng.standard_normal((B, L, H, D)), jnp.float32)
    k = jnp.array(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    v = jnp.array(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("causal", [True, False])
def test_flash_matches_reference_small(causal):
    rng = np.random.default_rng(0)
    q, k, v = _rand_qkv(rng, B=2, L=256, S=256, H=2, Hkv=2, D=128)
    got = flash_attention(q, k, v, causal=causal)
    want = attention_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_flash_segment_ids_padding():
    rng = np.random.default_rng(1)
    B, L = 2, 256
    q, k, v = _rand_qkv(rng, B=B, L=L, S=L, H=2, Hkv=2, D=128)
    lengths = np.array([200, 77])
    seg = np.zeros((B, L), np.int32)
    for b, n in enumerate(lengths):
        seg[b, :n] = 1
    seg = jnp.array(seg)
    got = flash_attention(q, k, v, causal=True, q_segment_ids=seg,
                          kv_segment_ids=seg)
    want = attention_reference(q, k, v, causal=True, q_segment_ids=seg,
                               kv_segment_ids=seg)
    got, want = np.asarray(got), np.asarray(want)
    for b, n in enumerate(lengths):
        np.testing.assert_allclose(got[b, :n], want[b, :n], rtol=2e-3,
                                   atol=2e-3)


def test_flash_gqa():
    rng = np.random.default_rng(2)
    q, k, v = _rand_qkv(rng, B=1, L=256, S=256, H=4, Hkv=2, D=128)
    got = flash_attention(q, k, v, causal=True)
    want = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3,
                               atol=2e-3)


def test_flash_non_multiple_lengths_and_small_head_dim():
    rng = np.random.default_rng(3)
    q, k, v = _rand_qkv(rng, B=1, L=130, S=130, H=2, Hkv=2, D=64)
    got = flash_attention(q, k, v, causal=True)
    want = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3,
                               atol=2e-3)


def test_flash_gradients_flow():
    rng = np.random.default_rng(4)
    q, k, v = _rand_qkv(rng, B=1, L=128, S=128, H=1, Hkv=1, D=128)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, causal=True) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=2e-3,
                                   atol=2e-3)


def test_decode_attention_matches_full():
    rng = np.random.default_rng(5)
    B, S, H, D = 2, 64, 2, 32
    kv_len = np.array([10, 33])
    k = jnp.array(rng.standard_normal((B, S, H, D)), jnp.float32)
    v = jnp.array(rng.standard_normal((B, S, H, D)), jnp.float32)
    q = jnp.array(rng.standard_normal((B, 1, H, D)), jnp.float32)
    got = decode_attention(q, k, v, jnp.array(kv_len))
    for b in range(B):
        n = kv_len[b]
        want = attention_reference(q[b:b + 1], k[b:b + 1, :n], v[b:b + 1, :n],
                                   causal=False)
        np.testing.assert_allclose(np.asarray(got[b]), np.asarray(want[0]),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_backward_matches_xla_reference():
    """Pallas bwd kernels vs jax.vjp through the XLA reference."""
    import jax
    from modelcompose_tpu.ops.attention import attention_reference

    B, L, H, D = 2, 96, 4, 32
    rng = jax.random.PRNGKey(0)
    kq, kk, kv, kg = jax.random.split(rng, 4)
    q = jax.random.normal(kq, (B, L, H, D), jnp.float32)
    k = jax.random.normal(kk, (B, L, H, D), jnp.float32)
    v = jax.random.normal(kv, (B, L, H, D), jnp.float32)
    seg = (jnp.arange(L)[None, :] < jnp.array([[L], [70]])).astype(jnp.int32)
    seg = seg.reshape(2, L)
    g = jax.random.normal(kg, (B, L, H, D), jnp.float32)

    def pallas_fn(q, k, v):
        return flash_attention(q, k, v, causal=True, q_segment_ids=seg,
                               kv_segment_ids=seg)

    def ref_fn(q, k, v):
        return attention_reference(q, k, v, causal=True, q_segment_ids=seg,
                                   kv_segment_ids=seg)

    _, vjp_p = jax.vjp(pallas_fn, q, k, v)
    _, vjp_r = jax.vjp(ref_fn, q, k, v)
    # zero the cotangent at padding rows — outputs there are garbage by
    # design in both impls, but DIFFERENT garbage
    g_valid = g * seg[:, :, None, None]
    dq_p, dk_p, dv_p = vjp_p(g_valid)
    dq_r, dk_r, dv_r = vjp_r(g_valid)
    np.testing.assert_allclose(np.asarray(dq_p), np.asarray(dq_r),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dk_p), np.asarray(dk_r),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dv_p), np.asarray(dv_r),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_backward_gqa_group_sum():
    import jax
    from modelcompose_tpu.ops.attention import attention_reference

    B, L, H, Hkv, D = 1, 64, 4, 2, 32
    rng = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (B, L, H, D), jnp.float32)
    k = jax.random.normal(kk, (B, L, Hkv, D), jnp.float32)
    v = jax.random.normal(kv, (B, L, Hkv, D), jnp.float32)

    def pallas_fn(q, k, v):
        return flash_attention(q, k, v, causal=True).sum()

    def ref_fn(q, k, v):
        return attention_reference(q, k, v, causal=True).sum()

    gp = jax.grad(pallas_fn, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(ref_fn, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_flash_retuned_blocks_long_context():
    """The measured block table (_pick_fwd_blocks) switches to a
    (512, 1024) tile at Lq >= 3072 — the composed long-context prefill
    geometry.  Parity at a shape that takes that branch (incl. a
    non-multiple length so the padding path composes with it); the
    short-L tests never reach it."""
    from modelcompose_tpu.ops.flash_attention import _pick_fwd_blocks

    assert _pick_fwd_blocks(3328, 3328) == (512, 1024)
    assert _pick_fwd_blocks(2048, 2048) == (256, 512)

    rng = np.random.default_rng(6)
    B, L, H, D = 1, 3136, 2, 128
    q, k, v = _rand_qkv(rng, B=B, L=L, S=L, H=H, Hkv=H, D=D)
    lengths = np.array([3100])
    seg = np.zeros((B, L), np.int32)
    seg[0, :lengths[0]] = 1
    seg = jnp.array(seg)
    got = flash_attention(q, k, v, causal=True, q_segment_ids=seg,
                          kv_segment_ids=seg)
    want = attention_reference(q, k, v, causal=True, q_segment_ids=seg,
                               kv_segment_ids=seg)
    np.testing.assert_allclose(np.asarray(got)[0, :lengths[0]],
                               np.asarray(want)[0, :lengths[0]],
                               rtol=2e-3, atol=2e-3)

    # BACKWARD through the retuned tile: the lse residual must cross the
    # fwd/bwd boundary padding-free — the forward pads Lq=3136 to 3584
    # with its (512, ...) tile while the backward re-pads with its own
    # blk_q=256; returning forward-padded lse crashed jax.grad here.
    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, causal=True, q_segment_ids=seg,
                            kv_segment_ids=seg)
        return jnp.where(seg[..., None, None] != 0, o, 0.0).sum()

    def loss_ref(q, k, v):
        o = attention_reference(q, k, v, causal=True, q_segment_ids=seg,
                                kv_segment_ids=seg)
        return jnp.where(seg[..., None, None] != 0, o, 0.0).sum()

    gp = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)


def test_flash_bf16_operand_path():
    """Production dtype: bf16 MXU operands with f32 accumulation (p/ds
    cast to bf16 for the second GEMM — flash-attn-2 numerics).  Pins the
    round-5 operand-dtype change: fwd + grads stay within bf16-resolution
    tolerance of the f32 XLA reference on the same bf16 inputs."""
    rng = np.random.default_rng(11)
    q, k, v = _rand_qkv(rng, B=1, L=256, S=256, H=2, Hkv=2, D=128)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))

    got = flash_attention(qb, kb, vb, causal=True)
    assert got.dtype == jnp.bfloat16
    want = attention_reference(qb.astype(jnp.float32),
                               kb.astype(jnp.float32),
                               vb.astype(jnp.float32), causal=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=2e-2, atol=2e-2)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True)
                       .astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, causal=True)
                       .astype(jnp.float32) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(qb, kb, vb)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(
        qb.astype(jnp.float32), kb.astype(jnp.float32),
        vb.astype(jnp.float32))
    for a, b in zip(gf, gr):
        # grads scale with L; compare relative to the reference magnitude
        scale = float(jnp.max(jnp.abs(b)))
        np.testing.assert_allclose(np.asarray(a, np.float32) / scale,
                                   np.asarray(b) / scale,
                                   rtol=5e-2, atol=5e-2)


def test_tile_table_env_overrides(monkeypatch):
    """MC_FLASH_FWD_BLOCKS / MC_FLASH_BWD_BLOCKS override the measured
    tile tables at trace time (probe runs bench a candidate tile through
    the full program before the table is edited)."""
    from modelcompose_tpu.ops.flash_attention import (_pick_fwd_blocks,
                                                      _pick_bwd_blocks)

    assert _pick_bwd_blocks(2048, 2048) == (256, 512)
    monkeypatch.setenv("MC_FLASH_FWD_BLOCKS", "1024x512")
    monkeypatch.setenv("MC_FLASH_BWD_BLOCKS", "512x512")
    assert _pick_fwd_blocks(3328, 3328) == (1024, 512)
    assert _pick_fwd_blocks(128, 128) == (1024, 512)
    assert _pick_bwd_blocks(2048, 2048) == (512, 512)
    monkeypatch.delenv("MC_FLASH_FWD_BLOCKS")
    monkeypatch.delenv("MC_FLASH_BWD_BLOCKS")
    assert _pick_fwd_blocks(3328, 3328) == (512, 1024)
    assert _pick_bwd_blocks(2048, 2048) == (256, 512)
