"""CLIP text encoder with projection (the text-as-modality tower).

JAX rebuild of the reference's experimental ``CLIPTextProjEncoder``
(reference: modelcompose/model/multimodal_encoder/text_encoder.py:1-72),
which wraps HF ``CLIPTextModelWithProjection``: causal-masked text
transformer, EOT-token pooling (argmax of token ids — the EOT id is the
vocabulary maximum), linear projection to the shared CLIP space, one
feature token per text (the reference unsqueezes to [B, 1, proj_dim]).

Note: the ``<text>`` modality never graduated in the reference — its merge
CLI does not recognize ``mm_text_encoder``
(merge_unimodal_modelcompose.py:15-26) — so this tower is provided as a
standalone encoder with HF weight conversion and golden parity, without
adding a 'text' route class to the composition tables.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .vision_clip import _ln, quick_gelu


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    vocab_size: int = 49408
    max_position_embeddings: int = 77
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5


def init_clip_text(cfg: ClipTextConfig, rng, dtype=jnp.float32
                   ) -> Dict[str, Any]:
    H, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    keys = jax.random.split(rng, 12)
    std = 0.02

    def stacked(key, d_in, d_out):
        return {"w": (jax.random.normal(key, (L, d_in, d_out), jnp.float32)
                      * std).astype(dtype),
                "b": jnp.zeros((L, d_out), dtype)}

    def lnp():
        return {"scale": jnp.ones((L, H), dtype),
                "bias": jnp.zeros((L, H), dtype)}

    return {
        "token_embedding": (jax.random.normal(
            keys[0], (cfg.vocab_size, H), jnp.float32) * std).astype(dtype),
        "position_embedding": (jax.random.normal(
            keys[1], (cfg.max_position_embeddings, H), jnp.float32)
            * std).astype(dtype),
        "layers": {
            "ln1": lnp(),
            "ln2": lnp(),
            "q": stacked(keys[2], H, H),
            "k": stacked(keys[3], H, H),
            "v": stacked(keys[4], H, H),
            "o": stacked(keys[5], H, H),
            "fc1": stacked(keys[6], H, I),
            "fc2": stacked(keys[7], I, H),
        },
        "final_layernorm": {"scale": jnp.ones((H,), dtype),
                            "bias": jnp.zeros((H,), dtype)},
        "text_projection": (jax.random.normal(
            keys[8], (H, cfg.projection_dim), jnp.float32)
            * std).astype(dtype),
    }


def clip_text_embeds(params: Dict[str, Any], cfg: ClipTextConfig,
                     input_ids: jnp.ndarray,
                     attention_mask=None) -> jnp.ndarray:
    """input_ids: [B, T] int32 (EOT = max token id, per CLIP convention).
    Returns projected text embeddings [B, projection_dim] (the reference's
    forward returns this unsqueezed to one feature token)."""
    B, T = input_ids.shape
    eps = cfg.layer_norm_eps
    x = jnp.take(params["token_embedding"], input_ids, axis=0)
    x = x + params["position_embedding"][None, :T]

    # causal mask (+ key-padding if given) — HF CLIPTextModel semantics
    causal = jnp.tril(jnp.ones((T, T), bool))
    mask = causal[None]
    if attention_mask is not None:
        mask = mask & attention_mask[:, None, :].astype(bool)

    n_heads = cfg.num_attention_heads
    hd = cfg.hidden_size // n_heads

    def body(h, lp):
        y = _ln(lp["ln1"], h, eps)

        def proj(p, v):
            return (jnp.einsum("bti,io->bto", v, p["w"],
                               preferred_element_type=jnp.float32)
                    + p["b"]).astype(h.dtype)

        q = proj(lp["q"], y).reshape(B, T, n_heads, hd)
        k = proj(lp["k"], y).reshape(B, T, n_heads, hd)
        v = proj(lp["v"], y).reshape(B, T, n_heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(hd)
        logits = jnp.where(mask[:, None], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32)
        h = h + proj(lp["o"], ctx.reshape(B, T, -1).astype(h.dtype))
        m = _ln(lp["ln2"], h, eps)
        m = (jnp.einsum("bti,io->bto", m, lp["fc1"]["w"],
                        preferred_element_type=jnp.float32)
             + lp["fc1"]["b"]).astype(h.dtype)
        m = quick_gelu(m)
        m = (jnp.einsum("bti,io->bto", m, lp["fc2"]["w"],
                        preferred_element_type=jnp.float32)
             + lp["fc2"]["b"]).astype(h.dtype)
        return h + m, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = _ln(params["final_layernorm"], x, eps)
    # EOT pooling: the EOT token has the largest id (HF CLIPTextModel)
    eot = jnp.argmax(input_ids, axis=-1)
    pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    return jnp.einsum("bi,io->bo", pooled, params["text_projection"],
                      preferred_element_type=jnp.float32).astype(x.dtype)


# ---------------------------------------------------------------------------
# HF weight conversion
# ---------------------------------------------------------------------------

def convert_hf_clip_text(state: Dict[str, np.ndarray], cfg: ClipTextConfig,
                         dtype=jnp.float32) -> Dict[str, Any]:
    """Convert an HF CLIPTextModelWithProjection state dict (keys rooted at
    ``text_model.`` plus ``text_projection.weight``)."""
    def g(key):
        return np.asarray(state[f"text_model.{key}"], np.float32)

    L = cfg.num_hidden_layers

    def stack_dense(fmt):
        return {"w": np.stack([g(fmt.format(i=i) + ".weight").T
                               for i in range(L)]),
                "b": np.stack([g(fmt.format(i=i) + ".bias")
                               for i in range(L)])}

    def stack_ln(fmt):
        return {"scale": np.stack([g(fmt.format(i=i) + ".weight")
                                   for i in range(L)]),
                "bias": np.stack([g(fmt.format(i=i) + ".bias")
                                  for i in range(L)])}

    params = {
        "token_embedding": g("embeddings.token_embedding.weight"),
        "position_embedding": g("embeddings.position_embedding.weight"),
        "layers": {
            "ln1": stack_ln("encoder.layers.{i}.layer_norm1"),
            "ln2": stack_ln("encoder.layers.{i}.layer_norm2"),
            "q": stack_dense("encoder.layers.{i}.self_attn.q_proj"),
            "k": stack_dense("encoder.layers.{i}.self_attn.k_proj"),
            "v": stack_dense("encoder.layers.{i}.self_attn.v_proj"),
            "o": stack_dense("encoder.layers.{i}.self_attn.out_proj"),
            "fc1": stack_dense("encoder.layers.{i}.mlp.fc1"),
            "fc2": stack_dense("encoder.layers.{i}.mlp.fc2"),
        },
        "final_layernorm": {"scale": g("final_layer_norm.weight"),
                            "bias": g("final_layer_norm.bias")},
        "text_projection": np.asarray(
            state["text_projection.weight"], np.float32).T,
    }
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)


class ClipTextEncoder:
    """Tower-protocol wrapper (one feature token per text, matching the
    reference's unsqueeze(1), text_encoder.py:27-37)."""

    def __init__(self, cfg: ClipTextConfig = None, params=None, rng=None):
        self.cfg = cfg or ClipTextConfig()
        self.params = params if params is not None else init_clip_text(
            self.cfg, rng if rng is not None else jax.random.PRNGKey(0))
        self.hidden_size = self.cfg.projection_dim
        self.feature_len = 1
        self._jfn = jax.jit(lambda p, ids, m: clip_text_embeds(
            p, self.cfg, ids, m))

    def encode(self, input_ids, attention_mask=None):
        out = self._jfn(self.params, jnp.asarray(input_ids, jnp.int32),
                        None if attention_mask is None
                        else jnp.asarray(attention_mask))
        return out[:, None, :]  # [B, 1, proj_dim]

    def dummy_inputs(self):
        return jnp.zeros((1, 4), jnp.int32)

    @property
    def modal_processor(self):
        return None  # tokenizer supplied by the caller (HF CLIPTokenizer)
