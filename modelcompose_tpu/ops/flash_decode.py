"""Pallas flash-decode kernel: single-token attention over the stacked
KV cache.

The decode step is HBM-bound: it must stream this layer's full cache
once.  This kernel double-buffers chunk DMAs across grid steps, with the
layer index delivered by scalar prefetch so no per-layer cache slice is
ever materialized.  Plays the role the reference delegates to HF eager
decode attention (reference: modelcompose/model/language_model/
multimodal_llama.py:284-312).

**Measured result (v5e, 7B cache at 4.2k positions): the XLA chunked
fori_loop in ops/attention.decode_attention is FASTER** — 5.39 ms vs
6.0-8.8 ms across kernel variants (elementwise VPU contraction, MXU
block-diag dot, C in {128, 384}); per-grid-step overhead and in-kernel
relayouts eat the DMA-pipelining win.  The kernel therefore ships
OPT-IN (set MC_FLASH_DECODE=1) as verified groundwork for future Mosaic
revisions; parity vs the XLA path is tested in
tests/test_flash_decode.py, and BASELINE.md records the measurements.

Layout contract (matches core/llama.KVCache):
  q:        [B, 1, H, D]
  cache:    [NL, B, S, Hkv, D]   (int8 'q' + f32 'scale' [..., Hkv, 1]
                                  when quantized, else bf16/f32 array)
  kv_len:   [B] valid entries (new token's slot included)

The logits contraction runs on the MXU against a block-diagonal q
(cross-lane VPU reductions measured 1.5x slower); the p@v accumulation
reduces over the chunk axis on the VPU.  int8 chunks dequantize in VMEM;
the per-vector scales factor out of both contractions exactly as in
ops/attention.decode_attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fd_kernel(scalars_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref,
               o_ref, m_scr, l_scr, acc_scr, w_scr, *, C, rep, sm_scale,
               quantized):
    b = pl.program_id(0)
    ic = pl.program_id(1)
    nc = pl.num_programs(1)
    H, D = q_ref.shape[1:]
    Hkv = H // rep

    @pl.when(ic == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        # Block-diagonal q for the logits matmul: W[g*D+d, h] = q[h, d]
        # when h's kv group == g (GQA handled by the group test).
        # Contracting D elementwise would be a cross-LANE reduction (the
        # slow VPU path); as a [C, Hkv*D] x [Hkv*D, H] MXU dot the lanes
        # stay busy and the dequantized chunk feeds the MXU directly.
        qT = (q_ref[0].astype(jnp.float32) * sm_scale).T   # [D, H]
        w_full = jnp.broadcast_to(qT[None], (Hkv, D, H)).reshape(Hkv * D, H)
        group = jax.lax.broadcasted_iota(jnp.int32, (Hkv * D, H), 0) // D
        head = jax.lax.broadcasted_iota(jnp.int32, (Hkv * D, H), 1)
        w_scr[:] = jnp.where(group == head // rep, w_full, 0.0)

    k = k_ref[0, 0].astype(jnp.float32).reshape(C, -1)   # [C, Hkv*D]
    s = jax.lax.dot(k, w_scr[:], preferred_element_type=jnp.float32)
    # s: [C, H]
    if quantized:
        ks = ks_ref[0, 0].astype(jnp.float32)            # [C, Hkv]
        if rep > 1:
            ks = jnp.repeat(ks, rep, axis=1)
        s = s * ks

    kv_len = scalars_ref[1 + b]
    pos = ic * C + jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
    s = jnp.where(pos < kv_len, s, NEG_INF)

    m_prev = m_scr[:, 0]                                 # [H]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=0))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new[None, :])                      # [C, H]
    l_new = l_scr[:, 0] * alpha + jnp.sum(p, axis=0)

    v = v_ref[0, 0].astype(jnp.float32)                  # [C, Hkv, D]
    if rep > 1:
        v = jnp.repeat(v, rep, axis=1)
    if quantized:
        vs = vs_ref[0, 0].astype(jnp.float32)            # [C, Hkv]
        if rep > 1:
            vs = jnp.repeat(vs, rep, axis=1)
        p = p * vs
    pv = jnp.sum(p[:, :, None] * v, axis=0)              # [H, D]

    m_scr[:] = jnp.broadcast_to(m_new[:, None], m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new[:, None], l_scr.shape)
    acc_scr[:] = acc_scr[:] * alpha[:, None] + pv

    @pl.when(ic == nc - 1)
    def _finalize():
        l = l_scr[:, 0]
        safe_l = jnp.maximum(l, 1e-30)
        o_ref[0] = (acc_scr[:] / safe_l[:, None]).astype(o_ref.dtype)


def _pick_chunk(S: int, want: int = 768):
    """Largest multiple of 128 that divides S, capped at ``want`` —
    large chunks amortize per-grid-step kernel overhead (measured to
    dominate at C=128); the raised vmem_limit_bytes covers the k+v
    double-buffered blocks plus their in-kernel f32 dequant copies."""
    best = None
    c = 128
    while c <= min(want, S):
        if S % c == 0:
            best = c
        c += 128
    return best


def flash_decode_attention(q, k_cache, v_cache, kv_len, layer_idx, *,
                           sm_scale, chunk: int = 768):
    """Stacked-cache single-token attention, or None when the shapes
    don't fit the kernel's tiling (caller falls back to the XLA loop).

    q: [B, 1, H, D]; caches [NL, B, S, Hkv, D] (+scales); kv_len [B];
    layer_idx: traced int32 scalar.
    """
    B, _, H, D = q.shape
    quantized = isinstance(k_cache, dict)
    k_q = k_cache["q"] if quantized else k_cache
    v_q = v_cache["q"] if quantized else v_cache
    NL, _, S, Hkv, _ = k_q.shape
    rep = H // Hkv

    C = _pick_chunk(S, chunk)
    interpret = _interpret()
    # On hardware, hold the kernel to shapes that tile cleanly:
    # lanes = D, sublanes = Hkv (int8 min tile (32, 128)).
    if C is None or (not interpret and (D % LANES != 0 or Hkv % 8 != 0)):
        return None
    if H > 512:  # scratch sanity bound
        return None

    nc = S // C
    scalars = jnp.concatenate([
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        jnp.asarray(kv_len, jnp.int32).reshape(-1)])

    if quantized:
        ks = k_cache["scale"][..., 0]                    # [NL, B, S, Hkv]
        vs = v_cache["scale"][..., 0]
    else:  # dummy 1-element scale operands keep the arity static
        ks = jnp.ones((1, 1, C, 1), jnp.float32)
        vs = ks

    # index_map signature: (*grid_ids, *scalar_prefetch_refs)
    def k_map(b, ic, s):
        return (s[0], b, ic, 0, 0)

    def scale_map(b, ic, s):
        if quantized:
            return (s[0], b, ic, 0)
        return (0, 0, 0, 0)

    kernel = functools.partial(_fd_kernel, C=C, rep=rep, sm_scale=sm_scale,
                               quantized=quantized)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nc),
        in_specs=[
            pl.BlockSpec((1, H, D), lambda b, ic, s: (b, 0, 0)),
            pl.BlockSpec((1, 1, C, Hkv, D), k_map),
            pl.BlockSpec((1, 1, C, Hkv) if quantized else (1, 1, C, 1),
                         scale_map),
            pl.BlockSpec((1, 1, C, Hkv, D), k_map),
            pl.BlockSpec((1, 1, C, Hkv) if quantized else (1, 1, C, 1),
                         scale_map),
        ],
        out_specs=pl.BlockSpec((1, H, D), lambda b, ic, s: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((H, LANES), jnp.float32),
            pltpu.VMEM((H, LANES), jnp.float32),
            pltpu.VMEM((H, D), jnp.float32),
            pltpu.VMEM((Hkv * D, H), jnp.float32),  # block-diag q
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # the default 16 MB scoped-VMEM cap rejects the kernel by
            # ~28 KB; v5e cores have headroom beyond it
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(scalars, q[:, 0], k_q, ks, v_q, vs)
    return out[:, None]
