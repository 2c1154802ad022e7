"""Pallas TPU flash attention (forward), with recompute backward.

This kernel is the TPU-native replacement for the reference's external
flash-attn-2 CUDA kernels (reference: modelcompose/train/
multimodal_flash_attn_monkey_patch.py:86-108) and its vendored Triton kernel
(reference: modelcompose/model/language_model/mpt/flash_attn_triton.py).
Instead of varlen unpadding, ragged batches are expressed with segment ids
(0 = padding), which the kernel masks natively — mixed-modal prompts of
different lengths therefore compile once per bucket.

Structure: grid (batch, q_head, q_block, kv_block) with the kv axis
innermost ("arbitrary"), online-softmax state (m, l, acc) carried in VMEM
scratch across kv steps, GQA handled by indexing the kv head as
``q_head // group`` in the BlockSpec index maps.  Fully-masked causal blocks
skip their FLOPs via ``pl.when``.

The backward pass currently recomputes attention in XLA inside a
``jax.custom_vjp`` (O(L^2) intermediates in the bwd only); a Pallas backward
kernel is the planned upgrade.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import attention_reference

NEG_INF = -1e30
LANES = 128


def _interpret() -> bool:
    # Run the kernel in interpreter mode off-TPU so unit tests exercise the
    # same kernel logic on the CPU mesh.
    return jax.default_backend() != "tpu"


def _fa_kernel(q_ref, k_ref, v_ref, qseg_ref, kvseg_ref, o_ref,
               m_scr, l_scr, acc_scr, *, sm_scale, causal, blk_q, blk_k,
               q_offset):
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_start = q_offset + iq * blk_q
    k_start = ik * blk_k
    # Causal: the whole kv block is in the future for every q row -> skip.
    run_block = True
    if causal:
        run_block = q_start + blk_q - 1 >= k_start

    @pl.when(run_block)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)          # [blk_q, D]
        k = k_ref[0, 0].astype(jnp.float32)          # [blk_k, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale  # [blk_q, blk_k]

        qseg = qseg_ref[0, 0]                        # [blk_q]
        kvseg = kvseg_ref[0, 0]                      # [blk_k]
        mask = (qseg[:, None] == kvseg[None, :]) & (kvseg[None, :] != 0)
        if causal:
            rows = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (blk_q, blk_k), 0)
            cols = k_start + jax.lax.broadcasted_iota(
                jnp.int32, (blk_q, blk_k), 1)
            mask &= rows >= cols
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, 0][:, None]                # [blk_q, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)    # [blk_q, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                       # [blk_q, blk_k]
        alpha = jnp.exp(m_prev - m_new)              # [blk_q, 1]

        l_prev = l_scr[:, 0][:, None]
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

        v = v_ref[0, 0].astype(jnp.float32)          # [blk_k, D]
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [blk_q, D]
        acc_scr[:] = acc_scr[:] * alpha + pv

    @pl.when(ik == nk - 1)
    def _finalize():
        l = l_scr[:, 0][:, None]
        # Fully-masked rows (segment-0 padding) have m == NEG_INF and
        # p == exp(0) == 1 everywhere, so l > 0 and the row yields a
        # uniform mean of v — garbage, like the XLA reference's softmax
        # over all-NEG_INF logits.  Callers must ignore padding rows.
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)


def _flash_attention_forward(q, k, v, q_segment_ids, kv_segment_ids,
                             sm_scale, causal, q_offset,
                             blk_q=256, blk_k=512):
    """q: [B, H, Lq, D]; k, v: [B, Hkv, S, D]; segment ids [B, Lq]/[B, S]."""
    B, H, Lq, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    group = H // Hkv

    blk_q = min(blk_q, max(Lq, 128))
    blk_k = min(blk_k, max(S, 128))

    def pad_to(x, axis, mult):
        rem = (-x.shape[axis]) % mult
        if rem == 0:
            return x
        pads = [(0, 0)] * x.ndim
        pads[axis] = (0, rem)
        return jnp.pad(x, pads)

    # Pad seq lens to block multiples and head dim to the 128-lane tile.
    q = pad_to(pad_to(q, 2, blk_q), 3, LANES)
    k = pad_to(pad_to(k, 2, blk_k), 3, LANES)
    v = pad_to(pad_to(v, 2, blk_k), 3, LANES)
    q_segment_ids = pad_to(q_segment_ids, 1, blk_q)
    kv_segment_ids = pad_to(kv_segment_ids, 1, blk_k)  # pads are segment 0
    # TPU block tiling needs the last two dims of a block to be (8k, 128k);
    # lift segment ids to [B, 8, L] so blocks are (1, 8, blk).
    q_segment_ids = jnp.broadcast_to(
        q_segment_ids[:, None, :], (B, 8, q_segment_ids.shape[1]))
    kv_segment_ids = jnp.broadcast_to(
        kv_segment_ids[:, None, :], (B, 8, kv_segment_ids.shape[1]))
    Lq_p, Dp = q.shape[2], q.shape[3]
    S_p = k.shape[2]

    grid = (B, H, Lq_p // blk_q, S_p // blk_k)

    kernel = functools.partial(
        _fa_kernel, sm_scale=sm_scale, causal=causal, blk_q=blk_q,
        blk_k=blk_k, q_offset=q_offset)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, blk_q, Dp), lambda b, h, iq, ik: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, blk_k, Dp),
                         lambda b, h, iq, ik, g=group: (b, h // g, ik, 0)),
            pl.BlockSpec((1, 1, blk_k, Dp),
                         lambda b, h, iq, ik, g=group: (b, h // g, ik, 0)),
            pl.BlockSpec((1, 8, blk_q), lambda b, h, iq, ik: (b, 0, iq)),
            pl.BlockSpec((1, 8, blk_k), lambda b, h, iq, ik: (b, 0, ik)),
        ],
        out_specs=pl.BlockSpec((1, 1, blk_q, Dp),
                               lambda b, h, iq, ik: (b, h, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Lq_p, Dp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((blk_q, LANES), jnp.float32),
            pltpu.VMEM((blk_q, LANES), jnp.float32),
            pltpu.VMEM((blk_q, Dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=_interpret(),
    )(q, k, v, q_segment_ids, kv_segment_ids)

    return out[:, :, :Lq, :D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash_attention(q, k, v, q_segment_ids, kv_segment_ids,
                     sm_scale, causal, q_offset):
    return _flash_attention_forward(q, k, v, q_segment_ids, kv_segment_ids,
                                    sm_scale, causal, q_offset)


def _fa_fwd(q, k, v, q_segment_ids, kv_segment_ids, sm_scale, causal,
            q_offset):
    out = _flash_attention_forward(q, k, v, q_segment_ids, kv_segment_ids,
                                   sm_scale, causal, q_offset)
    return out, (q, k, v, q_segment_ids, kv_segment_ids)


def _fa_bwd(sm_scale, causal, q_offset, residuals, g):
    q, k, v, q_segment_ids, kv_segment_ids = residuals

    def ref(q_, k_, v_):
        # attention_reference takes [B, L, H, D]; residuals are [B, H, L, D].
        o = attention_reference(
            q_.swapaxes(1, 2), k_.swapaxes(1, 2), v_.swapaxes(1, 2),
            causal=causal, q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids, q_offset=q_offset,
            sm_scale=sm_scale)
        return o.swapaxes(1, 2)

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


_flash_attention.defvjp(_fa_fwd, _fa_bwd)


def flash_attention(q, k, v, *, causal: bool = True, q_segment_ids=None,
                    kv_segment_ids=None, q_offset: int = 0,
                    sm_scale: Optional[float] = None):
    """Public entry. q: [B, Lq, H, D]; k, v: [B, S, Hkv, D]. Returns same
    layout as q."""
    B, Lq, H, D = q.shape
    S = k.shape[1]
    if sm_scale is None:
        sm_scale = D ** -0.5
    if q_segment_ids is None:
        q_segment_ids = jnp.ones((B, Lq), dtype=jnp.int32)
    if kv_segment_ids is None:
        kv_segment_ids = jnp.ones((B, S), dtype=jnp.int32)
    q_segment_ids = q_segment_ids.astype(jnp.int32)
    kv_segment_ids = kv_segment_ids.astype(jnp.int32)

    out = _flash_attention(
        q.swapaxes(1, 2), k.swapaxes(1, 2), v.swapaxes(1, 2),
        q_segment_ids, kv_segment_ids, float(sm_scale), bool(causal),
        int(q_offset))
    return out.swapaxes(1, 2)
