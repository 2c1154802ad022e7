"""Attention ops: XLA reference implementation + dispatch wrapper.

Plays the role flash-attn 2 plays in the reference training path
(reference: modelcompose/train/multimodal_flash_attn_monkey_patch.py:18-121)
and eager softmax attention in the eval path (reference: modelcompose/model/
language_model/multimodal_llama.py:295-312).  Instead of varlen unpadding we
use segment ids: padding tokens carry segment 0, real tokens segment >= 1;
attention is allowed only within matching segments, optionally causal.

``attention()`` dispatches to the Pallas TPU kernel (ops/flash_attention.py)
on TPU backends and to the XLA implementation elsewhere.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def attention_reference(q, k, v, *, causal: bool = True,
                        q_segment_ids=None, kv_segment_ids=None,
                        q_offset: int = 0, sm_scale: Optional[float] = None):
    """Plain XLA attention with fp32 softmax (matches HF eager semantics).

    Args:
      q: [B, Lq, H, D]; k, v: [B, S, Hkv, D].
      q_segment_ids: [B, Lq] int32 (0 = padding) or None.
      kv_segment_ids: [B, S] int32 (0 = padding) or None.
      q_offset: absolute position of q[0] within the kv axis (decode steps).

    Returns: [B, Lq, H, D] in q.dtype.
    """
    B, Lq, H, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    if sm_scale is None:
        sm_scale = D ** -0.5
    if Hkv != H:
        rep = H // Hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

    logits = jnp.einsum("blhd,bshd->bhls", q, k,
                        preferred_element_type=jnp.float32) * sm_scale

    mask = jnp.ones((B, 1, Lq, S), dtype=bool)
    if causal:
        q_pos = q_offset + jnp.arange(Lq)[:, None]
        k_pos = jnp.arange(S)[None, :]
        mask = mask & (q_pos >= k_pos)[None, None, :, :]
    if q_segment_ids is not None and kv_segment_ids is not None:
        seg = (q_segment_ids[:, :, None] == kv_segment_ids[:, None, :])
        seg = seg & (kv_segment_ids[:, None, :] != 0)
        mask = mask & seg[:, None, :, :]
    elif kv_segment_ids is not None:
        mask = mask & (kv_segment_ids[:, None, None, :] != 0)

    logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhls,bshd->blhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def attention(q, k, v, *, causal: bool = True, q_segment_ids=None,
              kv_segment_ids=None, q_offset: int = 0,
              sm_scale: Optional[float] = None, impl: str = "auto"):
    """Dispatching attention entry point.

    impl: 'auto' (pallas on TPU, xla elsewhere), 'pallas', or 'xla'.
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from .flash_attention import flash_attention
        return flash_attention(
            q, k, v, causal=causal, q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids, q_offset=q_offset,
            sm_scale=sm_scale)
    return attention_reference(
        q, k, v, causal=causal, q_segment_ids=q_segment_ids,
        kv_segment_ids=kv_segment_ids, q_offset=q_offset, sm_scale=sm_scale)


def decode_attention(q, k_cache, v_cache, kv_len, *, sm_scale=None,
                     chunk: int = 512, layer_idx=None):
    """Single-token attention against a preallocated KV cache,
    flash-decoding style: a ``fori_loop`` over cache chunks with running
    max/sum accumulators, so the int8->f32 dequantization of each chunk
    lives only in VMEM.  (A single whole-cache einsum lets XLA materialize
    the dequantized cache in HBM — measured 288 GB/s effective at 4.2k
    cached positions on v5e; this loop is the fastest structure measured,
    beating both a pallas flash-decode kernel and per-layer unrolled
    variants — see BASELINE.md round-3 notes.)

    q: [B, 1, H, D]; k_cache/v_cache: [B, S_max, Hkv, D] arrays OR
    int8-quantized dicts {'q': int8, 'scale': [B, S_max, Hkv, 1]} (see
    core/llama.quantize_kv).  With ``layer_idx`` given, the caches instead
    carry a leading layer axis ([NL, B, S_max, Hkv, D]) and chunks are
    sliced directly from the stacked buffer — the decode layer-scan keeps
    the whole cache as its carry and this avoids materializing a per-layer
    copy.  kv_len: [B] or scalar number of valid cache entries (the new
    token's slot included).

    With quantized caches the per-vector scales factor OUT of both
    contractions — logits pick up k_scale per key column, and v_scale
    multiplies the probabilities — so the int8 tensors are what stream
    from HBM.
    """
    B, _, H, D = q.shape
    # Normalize kv_len to [B] BEFORE any dispatch — the pallas kernel
    # reads one scalar-prefetch entry per batch row.
    kv_len = jnp.asarray(kv_len)
    if kv_len.ndim == 0:
        kv_len = jnp.broadcast_to(kv_len, (B,))
    if layer_idx is not None and os.environ.get("MC_FLASH_DECODE") == "1":
        # Opt-in pallas flash-decode kernel — measured SLOWER than this
        # XLA loop on v5e (see ops/flash_decode.py header); kept as
        # parity-tested groundwork.
        from .flash_decode import flash_decode_attention
        out = flash_decode_attention(
            q, k_cache, v_cache, kv_len, layer_idx,
            sm_scale=D ** -0.5 if sm_scale is None else sm_scale)
        if out is not None:
            return out
    k_q, k_scale = (k_cache["q"], k_cache["scale"]) \
        if isinstance(k_cache, dict) else (k_cache, None)
    v_q, v_scale = (v_cache["q"], v_cache["scale"]) \
        if isinstance(v_cache, dict) else (v_cache, None)
    seq_axis = 1 if layer_idx is None else 2
    S = k_q.shape[seq_axis]
    Hkv = k_q.shape[seq_axis + 1]
    if sm_scale is None:
        sm_scale = D ** -0.5
    rep = H // Hkv

    C = min(chunk, S)
    n_chunks = (S + C - 1) // C
    qf = q[:, 0].astype(jnp.float32) * sm_scale  # [B, H, D]

    def slice_chunk(x, start):
        """[B, C, Hkv, last] chunk of a (possibly layer-stacked) cache."""
        if layer_idx is None:
            return jax.lax.dynamic_slice(
                x, (0, start, 0, 0), (B, C) + x.shape[2:])
        return jax.lax.dynamic_slice(
            x, (layer_idx, 0, start, 0, 0), (1, B, C) + x.shape[3:])[0]

    def expand(x):  # GQA: repeat kv heads AFTER the chunk slice (in VMEM)
        return x if rep == 1 else jnp.repeat(x, rep, axis=2)

    def body(i, carry):
        m, l, acc = carry
        # Clamp the last chunk's start; the owned-range mask below keeps
        # the overlap from double-counting.
        start = jnp.minimum(i * C, S - C)
        k_c = expand(slice_chunk(k_q, start))
        v_c = expand(slice_chunk(v_q, start))
        logits = jnp.einsum("bhd,bchd->bhc", qf, k_c.astype(jnp.float32),
                            preferred_element_type=jnp.float32)
        if k_scale is not None:
            ks_c = expand(slice_chunk(k_scale, start))
            logits = logits * ks_c[..., 0].transpose(0, 2, 1)
        pos = start + jnp.arange(C)
        valid = (pos[None] >= i * C) & (pos[None] < kv_len[:, None])
        logits = jnp.where(valid[:, None, :], logits, NEG_INF)
        m_new = jnp.maximum(m, logits.max(-1))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new[..., None])  # [B, H, C]
        l_new = l * corr + p.sum(-1)
        if v_scale is not None:
            vs_c = expand(slice_chunk(v_scale, start))
            p = p * vs_c[..., 0].transpose(0, 2, 1)
        acc_new = acc * corr[..., None] + jnp.einsum(
            "bhc,bchd->bhd", p, v_c.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((B, H), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, H), jnp.float32)
    a0 = jnp.zeros((B, H, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, a0))
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.astype(q.dtype)[:, None]
