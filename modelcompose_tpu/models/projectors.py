"""Modality projectors: linear / mlpNx_gelu / qformer_{N}N_{L}L / identity.

Functional JAX rebuild of the reference projector zoo (reference:
modelcompose/model/multimodal_projector/builder.py:202-261).  The Q-Former is
the BLIP-2-style query transformer used for audio (``qformer_32N_2L`` in DAMC
runs): BERT-base width (768, 12 heads, post-LN, exact-erf GELU,
eps 1e-12), learned query tokens, cross-attention to the encoder features
every layer, query-only FFN, and a final Linear to the LLM width (reference:
builder.py:111-173 ``VideoLlamaAudioQformer`` + the vendored Qformer.py BERT).

Every projector is a pair of pure functions: ``init_projector(spec, ...)``
returning a param pytree and ``apply_projector(spec, params, x)``.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

QFORMER_HIDDEN = 768
QFORMER_HEADS = 12
QFORMER_INTERMEDIATE = 3072
QFORMER_LN_EPS = 1e-12
QFORMER_NUM_POSITIONS = 1024  # reference: builder.py:112 num_positions


def _gelu(x):
    # BERT / nn.GELU() exact erf form — NOT jax.nn.gelu's default tanh approx.
    return jax.nn.gelu(x, approximate=False)


def _init_dense(rng, d_in, d_out, std=0.02, dtype=jnp.float32):
    w = jax.random.normal(rng, (d_in, d_out), jnp.float32) * std
    return {"w": w.astype(dtype), "b": jnp.zeros((d_out,), dtype)}


def _dense(p, x):
    return jnp.einsum("...i,io->...o", x, p["w"],
                      preferred_element_type=jnp.float32).astype(x.dtype) + p["b"]


def _init_ln(d, dtype=jnp.float32):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def _ln(p, x, eps=QFORMER_LN_EPS):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


# ---------------------------------------------------------------------------
# Spec parsing (reference: builder.py:202-226)
# ---------------------------------------------------------------------------

def parse_spec(spec: str) -> Dict[str, Any]:
    if spec == "linear":
        return {"kind": "linear"}
    if spec == "identity":
        return {"kind": "identity"}
    m = re.match(r"^mlp(\d+)x_gelu$", spec)
    if m:
        return {"kind": "mlp", "depth": int(m.group(1))}
    m = re.match(r"^qformer_(\d+)N_(\d+)L$", spec)
    if m:
        return {"kind": "qformer", "n_query": int(m.group(1)),
                "n_layers": int(m.group(2))}
    raise ValueError(f"Unknown projector type: {spec}")


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_projector(spec: str, rng, d_in: int, d_out: int,
                   dtype=jnp.float32) -> Dict[str, Any]:
    kind = parse_spec(spec)
    if kind["kind"] == "identity":
        return {}
    if kind["kind"] == "linear":
        return {"layers": [_init_dense(rng, d_in, d_out, dtype=dtype)]}
    if kind["kind"] == "mlp":
        layers = []
        keys = jax.random.split(rng, kind["depth"])
        layers.append(_init_dense(keys[0], d_in, d_out, dtype=dtype))
        for i in range(1, kind["depth"]):
            layers.append(_init_dense(keys[i], d_out, d_out, dtype=dtype))
        return {"layers": layers}
    # qformer
    H, L = QFORMER_HIDDEN, kind["n_layers"]
    keys = iter(jax.random.split(rng, 12 * L + 4))
    params: Dict[str, Any] = {
        "query_tokens": (jax.random.normal(next(keys), (kind["n_query"], H),
                                           jnp.float32) * 0.02).astype(dtype),
        "position_embedding": (jax.random.normal(
            next(keys), (QFORMER_NUM_POSITIONS, d_in), jnp.float32)
            * 0.02).astype(dtype),
        "embeddings_ln": _init_ln(H, dtype),
        "llama_proj": _init_dense(next(keys), H, d_out, dtype=dtype),
        "layers": [],
    }
    for _ in range(L):
        layer = {
            "self": {
                "q": _init_dense(next(keys), H, H, dtype=dtype),
                "k": _init_dense(next(keys), H, H, dtype=dtype),
                "v": _init_dense(next(keys), H, H, dtype=dtype),
                "o": _init_dense(next(keys), H, H, dtype=dtype),
                "ln": _init_ln(H, dtype),
            },
            "cross": {
                "q": _init_dense(next(keys), H, H, dtype=dtype),
                "k": _init_dense(next(keys), d_in, H, dtype=dtype),
                "v": _init_dense(next(keys), d_in, H, dtype=dtype),
                "o": _init_dense(next(keys), H, H, dtype=dtype),
                "ln": _init_ln(H, dtype),
            },
            "ffn": {
                "w1": _init_dense(next(keys), H, QFORMER_INTERMEDIATE,
                                  dtype=dtype),
                "w2": _init_dense(next(keys), QFORMER_INTERMEDIATE, H,
                                  dtype=dtype),
                "ln": _init_ln(H, dtype),
            },
        }
        params["layers"].append(layer)
    return params


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _mha(att, q_in, kv_in, n_heads=QFORMER_HEADS):
    """Post-LN BERT attention block: out = LN(dense(attn) + q_in)."""
    B, Q, H = q_in.shape
    hd = H // n_heads
    q = _dense(att["q"], q_in).reshape(B, Q, n_heads, hd)
    k = _dense(att["k"], kv_in).reshape(B, kv_in.shape[1], n_heads, hd)
    v = _dense(att["v"], kv_in).reshape(B, kv_in.shape[1], n_heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(hd)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                     preferred_element_type=jnp.float32)
    ctx = ctx.reshape(B, Q, H).astype(q_in.dtype)
    return _ln(att["ln"], _dense(att["o"], ctx) + q_in)


def apply_projector(spec: str, params: Dict[str, Any], x) -> jnp.ndarray:
    """x: [B, T, d_in] -> [B, T_out, d_out]."""
    kind = parse_spec(spec)
    if kind["kind"] == "identity":
        return x
    if kind["kind"] in ("linear", "mlp"):
        y = _dense(params["layers"][0], x)
        for layer in params["layers"][1:]:
            y = _dense(layer, _gelu(y))
        return y
    # qformer (reference: builder.py:130-155)
    B, T, _ = x.shape
    n_pos = params["position_embedding"].shape[0]
    if T > n_pos:
        # the reference's nn.Embedding(num_positions) raises an index
        # error at the same point (builder.py:128-139) — same hard limit,
        # clearer message (e.g. >20.5 s BEATs audio = >1024 tokens)
        raise ValueError(
            f"qformer input has {T} tokens but the position table holds "
            f"{n_pos} (reference VideoLlamaAudioQformer limit); clip the "
            "input")
    x = x + params["position_embedding"][:T][None, :, :]
    q = jnp.broadcast_to(params["query_tokens"][None],
                         (B,) + params["query_tokens"].shape)
    q = _ln(params["embeddings_ln"], q)
    for layer in params["layers"]:
        q = _mha(layer["self"], q, q)
        q = _mha(layer["cross"], q, x)
        ff = _dense(layer["ffn"]["w2"], _gelu(_dense(layer["ffn"]["w1"], q)))
        q = _ln(layer["ffn"]["ln"], ff + q)
    return _dense(params["llama_proj"], q)


def output_len(spec: str, input_len: int) -> int:
    """Number of feature tokens the projector emits for an input of length T."""
    kind = parse_spec(spec)
    if kind["kind"] == "qformer":
        return kind["n_query"]
    return input_len
