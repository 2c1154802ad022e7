"""Weight-only int8 quantization for decode.

Batch-1 decode is HBM-bandwidth-bound: every step streams the full 13.5 GB
of bf16 weights.  Per-output-channel symmetric int8 halves the bytes (the
scale multiply folds into the matmul epilogue, and XLA fuses the
int8->bf16 convert into the dot's operand load so weights stream from HBM
as int8).  This replaces the role bitsandbytes plays in the reference
(reference: modelcompose/model/builder.py:30-39 4/8-bit load), redesigned
for the TPU memory system.

LoRA adapters, norms, embeddings stay bf16 (tiny); the lm_head is
quantized too (it is a full weight-matrix stream per step).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def quantize_int8(w: jnp.ndarray, axis: int = -2) -> Dict[str, jnp.ndarray]:
    """Symmetric per-output-channel int8: quantize over ``axis`` (the
    contraction/input axis), keeping one scale per output column."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(jnp.float32)}


def dequant_matmul(x: jnp.ndarray, wq: Dict[str, jnp.ndarray],
                   out_dtype=None) -> jnp.ndarray:
    """y = x @ dequant(wq).  The convert lives inside the contraction so
    the int8 tensor is what streams from HBM; the per-column scale is an
    epilogue multiply.  ``out_dtype`` keeps the fp32 accumulation when
    the consumer wants fp32 (the lm_head logits contract) — defaulting
    through x.dtype would round every logit through bf16 first."""
    y = jnp.einsum("...i,...io->...o", x,
                   wq["q"].astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return (y * wq["scale"][..., 0, :]).astype(out_dtype or x.dtype)


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "q" in w


def quantize_backbone(params: Dict[str, Any],
                      quantize_lm_head: bool = True) -> Dict[str, Any]:
    """Quantize the dense base weights of a core/llama.py param tree in
    place-compatible copy; LoRA stacks, norms, embed stay as-is."""
    out = dict(params)
    layers = {k: (dict(v) if isinstance(v, dict) else v)
              for k, v in params["layers"].items()}
    for grp in ("attn", "mlp"):
        group = dict(layers[grp])
        for name, p in group.items():
            p2 = dict(p)
            p2["w"] = quantize_int8(p["w"], axis=-2)
            group[name] = p2
        layers[grp] = group
    out["layers"] = layers
    if quantize_lm_head:
        out["lm_head"] = quantize_int8(params["lm_head"], axis=-2)
    return out


import functools


@functools.partial(jax.jit, static_argnames=("ax",))
def _amax_lowmem(x, ax):
    return jnp.max(jnp.abs(x).astype(jnp.float32), axis=ax, keepdims=True)


@functools.partial(jax.jit, donate_argnums=(0,))
def _q_lowmem(x, s):
    return jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                    -127, 127).astype(jnp.int8)


def quantize_leaf_lowmem(w, axis: int = -2):
    """Two-phase donated int8 quantize of ONE weight leaf, numerically
    identical to ``quantize_int8``.  The scale reduce and the int8 write
    run as SEPARATE jits so the fp32 cast has a single consumer in each
    and fuses — the one-jit form lets XLA materialize a full fp32 copy of
    the leaf (5.8 GB for a stacked 7B MLP weight), which OOMs a 16 GB
    chip next to a resident model tree.  The input leaf is DONATED: drop
    every other reference before calling.  (Helpers are module-level so
    same-shape leaves share the compile cache.)"""
    scale = jnp.maximum(_amax_lowmem(w, axis) / 127.0, 1e-8)
    return {"q": _q_lowmem(w, scale), "scale": scale.astype(jnp.float32)}
