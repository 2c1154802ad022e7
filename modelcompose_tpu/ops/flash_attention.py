"""Pallas TPU flash attention, forward + backward kernels.

TPU-native replacement for the reference's external flash-attn-2 CUDA
kernels (reference: modelcompose/train/multimodal_flash_attn_monkey_patch.py:
86-108) and its vendored Triton kernel (reference: modelcompose/model/
language_model/mpt/flash_attn_triton.py).  Instead of varlen unpadding,
ragged batches are expressed with segment ids (0 = padding), which the
kernels mask natively — mixed-modal prompts of different lengths compile
once per bucket.

Forward: grid (batch, q_head, q_block, kv_block) with the kv axis innermost
("arbitrary"), online-softmax state (m, l, acc) in VMEM scratch, GQA by
indexing the kv head as ``q_head // group`` in BlockSpec index maps,
fully-masked causal blocks skipped via ``pl.when``.  The log-sum-exp is
saved as a residual.

Backward: two kernels in the style of jax's official TPU splash/mha ops —
``dq`` iterates kv blocks per q block, ``dkv`` iterates q blocks per kv
block — both recomputing p = exp(s - lse) from the saved lse and using the
precomputed di = rowsum(o * do).  For GQA, dk/dv are produced per q-head
and group-summed in XLA (free for MHA).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# MXU dot inputs stay in the INCOMING dtype (bf16 in production) with
# float32 accumulation via preferred_element_type — the flash-attn-2
# numerics (bf16 operands, fp32 accumulate; P/dS cast to bf16 for the
# second GEMM).  Casting operands to f32 BEFORE the dot forces the MXU's
# multi-pass f32 path (~1/8 the bf16 rate) and capped the forward kernel
# at ~12.5 TF/s in the round-5 block probe.  MC_FLASH_F32_DOT=1 restores
# the f32-operand path for A/B probes — read at TRACE time (not import)
# so setting it after modelcompose_tpu is imported still takes effect.


def _f32_dot() -> bool:
    return os.environ.get("MC_FLASH_F32_DOT") == "1"


def _mxu_in(x):
    return x.astype(jnp.float32) if _f32_dot() else x


def _gemm2_cast(p, like_dtype):
    """Softmax/ds terms are computed in f32; cast back to the operand
    dtype for the second GEMM (identity for f32 test inputs)."""
    return p if _f32_dot() else p.astype(like_dtype)


def _causal_skip(q_start: int, k_start: int, blk_q: int, causal: bool):
    """Whole kv block in the future for every q row -> skip the block."""
    if not causal:
        return True
    return q_start + blk_q - 1 >= k_start


def _block_mask(qseg, kvseg, q_start, k_start, blk_q, blk_k, causal):
    """[blk_q, blk_k] validity mask — segment match, kv-padding (seg 0),
    and the causal triangle.  ONE implementation shared by the forward
    and both backward kernels: this is the correctness-critical masking
    logic, and a semantics change applied to one copy but not the others
    would silently break fwd/bwd parity."""
    mask = (qseg[:, None] == kvseg[None, :]) & (kvseg[None, :] != 0)
    if causal:
        # (q_start + i) >= (k_start + j)  <=>  i - j >= k_start - q_start:
        # the iota difference is GRID-INVARIANT (hoistable across blocks);
        # only the scalar rhs changes per block.
        diff = (jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 0)
                - jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 1))
        mask &= diff >= (k_start - q_start)
    return mask


LANES = 128


def _interpret() -> bool:
    # Run kernels in interpreter mode off-TPU so unit tests exercise the
    # same kernel logic on the CPU mesh.
    return jax.default_backend() != "tpu"


def _pad_to(x, axis, mult):
    rem = (-x.shape[axis]) % mult
    if rem == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return jnp.pad(x, pads)


def _lift_segments(seg, B):
    # TPU block tiling needs the last two dims of a block to be (8k, 128k);
    # lift segment ids to [B, 8, L] so blocks are (1, 8, blk).
    return jnp.broadcast_to(seg[:, None, :], (B, 8, seg.shape[1]))


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fa_kernel(q_ref, k_ref, v_ref, qseg_ref, kvseg_ref, o_ref, lse_ref,
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
    run_block = _causal_skip(q_start, k_start, blk_q, causal)

    @pl.when(run_block)
    def _compute():
        q = _mxu_in(q_ref[0, 0])
        k = _mxu_in(k_ref[0, 0])
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale

        mask = _block_mask(qseg_ref[0, 0], kvseg_ref[0, 0], q_start,
                           k_start, blk_q, blk_k, causal)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, 0][:, None]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)

        l_prev = l_scr[:, 0][:, None]
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

        v = _mxu_in(v_ref[0, 0])
        pv = jax.lax.dot_general(
            _gemm2_cast(p, v_ref.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
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
        lse = m_scr[:, 0][:, None] + jnp.log(safe_l)
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _env_blocks(var: str):
    """Optional trace-time tile override ("QxK", e.g. "512x1024") so
    probe runs can bench a candidate tile through the full production
    program without editing the table first."""
    ov = os.environ.get(var, "")
    if ov:
        bq, bk = ov.split("x")
        return int(bq), int(bk)
    return None


def _pick_fwd_blocks(Lq: int, S: int):
    """Measured forward block tile table (v5e, D=128, causal — probe:
    scripts/probe_prefill_mfu.py).  At the composed 3328-bucket geometry
    (512, 1024) runs 13% faster than (256, 512) — fewer grid steps, and
    the larger kv tile amortizes the online-softmax VPU work per loaded
    block; at ≤2048 (256, 512) stays best."""
    ov = _env_blocks("MC_FLASH_FWD_BLOCKS")
    if ov:
        return ov
    if Lq >= 3072:
        return 512, 1024
    return 256, 512


def _pick_bwd_blocks(Lq: int, S: int):
    """Backward (dq/dkv) tile table — probe MC_PROBE=flashbwd in
    scripts/probe_prefill_mfu.py before changing."""
    ov = _env_blocks("MC_FLASH_BWD_BLOCKS")
    if ov:
        return ov
    return 256, 512


def _flash_attention_forward(q, k, v, q_segment_ids, kv_segment_ids,
                             sm_scale, causal, q_offset,
                             blk_q=None, blk_k=None):
    """q: [B, H, Lq, D]; k, v: [B, Hkv, S, D]; segment ids [B, Lq]/[B, S].
    Returns (out [B, H, Lq, D], lse [B, H, Lq_pad])."""
    B, H, Lq, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    group = H // Hkv

    auto_q, auto_k = _pick_fwd_blocks(Lq, S)
    blk_q = auto_q if blk_q is None else blk_q
    blk_k = auto_k if blk_k is None else blk_k

    # Clamp block size toward the true length but keep it a multiple of 128
    # — odd lengths (e.g. Lq=150) would otherwise violate the (8k, 128)
    # TPU tiling constraint on the compiled kernel.
    blk_q = min(blk_q, max(-(-Lq // 128) * 128, 128))
    blk_k = min(blk_k, max(-(-S // 128) * 128, 128))

    q = _pad_to(_pad_to(q, 2, blk_q), 3, LANES)
    k = _pad_to(_pad_to(k, 2, blk_k), 3, LANES)
    v = _pad_to(_pad_to(v, 2, blk_k), 3, LANES)
    qseg = _lift_segments(_pad_to(q_segment_ids, 1, blk_q), B)
    kvseg = _lift_segments(_pad_to(kv_segment_ids, 1, blk_k), B)
    Lq_p, Dp = q.shape[2], q.shape[3]
    S_p = k.shape[2]

    grid = (B, H, Lq_p // blk_q, S_p // blk_k)
    kernel = functools.partial(
        _fa_kernel, sm_scale=sm_scale, causal=causal, blk_q=blk_q,
        blk_k=blk_k, q_offset=q_offset)

    out, lse = pl.pallas_call(
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
        out_specs=[
            pl.BlockSpec((1, 1, blk_q, Dp),
                         lambda b, h, iq, ik: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, blk_q, LANES),
                         lambda b, h, iq, ik: (b, h, iq, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Lq_p, Dp), q.dtype),
            jax.ShapeDtypeStruct((B, H, Lq_p, LANES), jnp.float32),
        ],
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
    )(q, k, v, qseg, kvseg)

    # Slice lse to the TRUE Lq: the forward and backward pick their block
    # sizes independently (_pick_fwd_blocks retunes the forward tile by
    # shape), so the residual contract must be padding-free — returning
    # the forward-padded lse breaks jax.grad whenever Lq is not a
    # multiple of the forward's blk_q (e.g. the composed 3328 bucket
    # with the (512, 1024) tile pads to 3584; the backward re-pads with
    # its own blk_q=256 and the shapes collide).
    return out[:, :, :Lq, :D], lse[:, :, :Lq, 0]


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, qseg_ref,
                   kvseg_ref, dq_ref, dq_scr, *, sm_scale, causal, blk_q,
                   blk_k, q_offset):
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q_start = q_offset + iq * blk_q
    k_start = ik * blk_k
    run_block = _causal_skip(q_start, k_start, blk_q, causal)

    @pl.when(run_block)
    def _compute():
        q = _mxu_in(q_ref[0, 0])
        k = _mxu_in(k_ref[0, 0])
        v = _mxu_in(v_ref[0, 0])
        do = _mxu_in(do_ref[0, 0])
        lse = lse_ref[0, 0][:, 0][:, None]          # [blk_q, 1]
        di = di_ref[0, 0][:, 0][:, None]            # [blk_q, 1]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        mask = _block_mask(qseg_ref[0, 0], kvseg_ref[0, 0], q_start,
                           k_start, blk_q, blk_k, causal)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - di) * sm_scale
        dq_scr[:] += jax.lax.dot_general(
            _gemm2_cast(ds, k_ref.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _finalize():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, qseg_ref,
                    kvseg_ref, dk_ref, dv_ref, dk_scr, dv_scr, *, sm_scale,
                    causal, blk_q, blk_k, q_offset):
    ik = pl.program_id(2)
    iq = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(iq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q_start = q_offset + iq * blk_q
    k_start = ik * blk_k
    run_block = _causal_skip(q_start, k_start, blk_q, causal)

    @pl.when(run_block)
    def _compute():
        q = _mxu_in(q_ref[0, 0])
        k = _mxu_in(k_ref[0, 0])
        v = _mxu_in(v_ref[0, 0])
        do = _mxu_in(do_ref[0, 0])
        lse = lse_ref[0, 0][:, 0][:, None]
        di = di_ref[0, 0][:, 0][:, None]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        mask = _block_mask(qseg_ref[0, 0], kvseg_ref[0, 0], q_start,
                           k_start, blk_q, blk_k, causal)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)   # [blk_q, blk_k]
        dv_scr[:] += jax.lax.dot_general(
            _gemm2_cast(p, do_ref.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [blk_k, D]
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - di) * sm_scale                # [blk_q, blk_k]
        dk_scr[:] += jax.lax.dot_general(
            _gemm2_cast(ds, q_ref.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [blk_k, D]

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_attention_backward(q, k, v, o, lse, do, q_segment_ids,
                              kv_segment_ids, sm_scale, causal, q_offset,
                              blk_q=None, blk_k=None):
    B, H, Lq, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    group = H // Hkv

    auto_q, auto_k = _pick_bwd_blocks(Lq, S)
    blk_q = auto_q if blk_q is None else blk_q
    blk_k = auto_k if blk_k is None else blk_k

    # Clamp block size toward the true length but keep it a multiple of 128
    # — odd lengths (e.g. Lq=150) would otherwise violate the (8k, 128)
    # TPU tiling constraint on the compiled kernel.
    blk_q = min(blk_q, max(-(-Lq // 128) * 128, 128))
    blk_k = min(blk_k, max(-(-S // 128) * 128, 128))

    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)

    q = _pad_to(_pad_to(q, 2, blk_q), 3, LANES)
    do = _pad_to(_pad_to(do, 2, blk_q), 3, LANES)
    k = _pad_to(_pad_to(k, 2, blk_k), 3, LANES)
    v = _pad_to(_pad_to(v, 2, blk_k), 3, LANES)
    Lq_p, Dp = q.shape[2], q.shape[3]
    S_p = k.shape[2]
    # lse/di lifted to [B, H, Lq_p, LANES] so blocks tile cleanly
    lse = jnp.broadcast_to(_pad_to(lse, 2, blk_q)[..., None],
                           (B, H, Lq_p, LANES))
    di = jnp.broadcast_to(_pad_to(di, 2, blk_q)[..., None],
                          (B, H, Lq_p, LANES))
    qseg = _lift_segments(_pad_to(q_segment_ids, 1, blk_q), B)
    kvseg = _lift_segments(_pad_to(kv_segment_ids, 1, blk_k), B)

    # ---- dq: grid (B, H, nq, nk), kv innermost ----
    def q_map(b, h, iq, ik):
        return (b, h, iq, 0)

    def kv_map(b, h, iq, ik, g=group):
        return (b, h // g, ik, 0)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, sm_scale=sm_scale, causal=causal,
                          blk_q=blk_q, blk_k=blk_k, q_offset=q_offset),
        grid=(B, H, Lq_p // blk_q, S_p // blk_k),
        in_specs=[
            pl.BlockSpec((1, 1, blk_q, Dp), q_map),
            pl.BlockSpec((1, 1, blk_k, Dp), kv_map),
            pl.BlockSpec((1, 1, blk_k, Dp), kv_map),
            pl.BlockSpec((1, 1, blk_q, Dp), q_map),
            pl.BlockSpec((1, 1, blk_q, LANES), q_map),
            pl.BlockSpec((1, 1, blk_q, LANES), q_map),
            pl.BlockSpec((1, 8, blk_q), lambda b, h, iq, ik: (b, 0, iq)),
            pl.BlockSpec((1, 8, blk_k), lambda b, h, iq, ik: (b, 0, ik)),
        ],
        out_specs=pl.BlockSpec((1, 1, blk_q, Dp), q_map),
        out_shape=jax.ShapeDtypeStruct((B, H, Lq_p, Dp), q.dtype),
        scratch_shapes=[pltpu.VMEM((blk_q, Dp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=_interpret(),
    )(q, k, v, do, lse, di, qseg, kvseg)

    # ---- dkv: grid (B, H, nk, nq), q innermost; per-q-head outputs ----
    def q_map2(b, h, ik, iq):
        return (b, h, iq, 0)

    def kv_map2(b, h, ik, iq, g=group):
        return (b, h // g, ik, 0)

    def kv_out_map(b, h, ik, iq):
        return (b, h, ik, 0)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, sm_scale=sm_scale, causal=causal,
                          blk_q=blk_q, blk_k=blk_k, q_offset=q_offset),
        grid=(B, H, S_p // blk_k, Lq_p // blk_q),
        in_specs=[
            pl.BlockSpec((1, 1, blk_q, Dp), q_map2),
            pl.BlockSpec((1, 1, blk_k, Dp), kv_map2),
            pl.BlockSpec((1, 1, blk_k, Dp), kv_map2),
            pl.BlockSpec((1, 1, blk_q, Dp), q_map2),
            pl.BlockSpec((1, 1, blk_q, LANES), q_map2),
            pl.BlockSpec((1, 1, blk_q, LANES), q_map2),
            pl.BlockSpec((1, 8, blk_q), lambda b, h, ik, iq: (b, 0, iq)),
            pl.BlockSpec((1, 8, blk_k), lambda b, h, ik, iq: (b, 0, ik)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, blk_k, Dp), kv_out_map),
            pl.BlockSpec((1, 1, blk_k, Dp), kv_out_map),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, S_p, Dp), k.dtype),
            jax.ShapeDtypeStruct((B, H, S_p, Dp), v.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((blk_k, Dp), jnp.float32),
                        pltpu.VMEM((blk_k, Dp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=_interpret(),
    )(q, k, v, do, lse, di, qseg, kvseg)

    dq = dq[:, :, :Lq, :D]
    dk = dk[:, :, :S, :D]
    dv = dv[:, :, :S, :D]
    if group > 1:  # GQA: sum grads over the q-head group per kv head
        dk = dk.reshape(B, Hkv, group, S, D).sum(axis=2)
        dv = dv.reshape(B, Hkv, group, S, D).sum(axis=2)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp plumbing
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash_attention(q, k, v, q_segment_ids, kv_segment_ids,
                     sm_scale, causal, q_offset):
    out, _ = _flash_attention_forward(q, k, v, q_segment_ids,
                                      kv_segment_ids, sm_scale, causal,
                                      q_offset)
    return out


def _fa_fwd(q, k, v, q_segment_ids, kv_segment_ids, sm_scale, causal,
            q_offset):
    out, lse = _flash_attention_forward(q, k, v, q_segment_ids,
                                        kv_segment_ids, sm_scale, causal,
                                        q_offset)
    return out, (q, k, v, out, lse, q_segment_ids, kv_segment_ids)


def _fa_bwd(sm_scale, causal, q_offset, residuals, g):
    q, k, v, out, lse, q_segment_ids, kv_segment_ids = residuals
    dq, dk, dv = _flash_attention_backward(
        q, k, v, out, lse, g, q_segment_ids, kv_segment_ids, sm_scale,
        causal, q_offset)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            None, None)


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
