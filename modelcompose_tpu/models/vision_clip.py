"""CLIP ViT vision tower (openai/clip-vit-large-patch14-336 class).

JAX rebuild of the reference's ``CLIPVisionTower`` around HF
``CLIPVisionModel`` (reference: modelcompose/model/multimodal_encoder/
clip_encoder.py:54-81): pre-LN ViT with class token, learned absolute
position embeddings, quick-GELU MLPs.  ``select_layer`` taps an intermediate
hidden state (DAMC uses -2) and ``select_feature='patch'`` drops the CLS
token (reference: clip_encoder.py:60-67), so the tower only *runs* the
layers it needs — the tap is a static scan length, not a dead last layer.

Layers are stacked on a leading axis and run under ``lax.scan`` (one
compiled block).  Weight conversion from the HF checkpoint layout lives in
``convert_hf_clip_vision``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    num_channels: int = 3
    layer_norm_eps: float = 1e-5
    select_layer: int = -2
    select_feature: str = "patch"
    # openai CLIP checkpoints use quick_gelu; LanguageBind image weights
    # are OpenCLIP-derived exact-GELU (their released config.json says
    # "gelu", like the video tower) — reference runs whatever the
    # checkpoint config says (languagebind/image/configuration_image.py)
    hidden_act: str = "quick_gelu"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def num_positions(self) -> int:
        return self.num_patches + 1

    @property
    def layers_to_run(self) -> int:
        """hidden_states[k] is the output after k layers; select_layer -2
        means index L-1, i.e. run L-1 layers."""
        if self.select_layer < 0:
            n = self.num_hidden_layers + 1 + self.select_layer
        else:
            n = self.select_layer
        if not 0 <= n <= self.num_hidden_layers:
            raise ValueError(f"select_layer {self.select_layer} out of range")
        return n


CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _ln(p, x, eps):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * p["scale"]
            + p["bias"]).astype(x.dtype)


def init_clip_vision(cfg: ClipVisionConfig, rng, dtype=jnp.float32
                     ) -> Dict[str, Any]:
    H, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    keys = jax.random.split(rng, 10)
    std = 0.02

    def dense(key, shape):
        return {"w": (jax.random.normal(key, shape, jnp.float32)
                      * std).astype(dtype),
                "b": jnp.zeros((shape[-1],), dtype)}

    def lnp():
        return {"scale": jnp.ones((L, H), dtype), "bias": jnp.zeros((L, H), dtype)}

    def stacked(key, d_in, d_out):
        return {"w": (jax.random.normal(key, (L, d_in, d_out), jnp.float32)
                      * std).astype(dtype),
                "b": jnp.zeros((L, d_out), dtype)}

    return {
        "class_embedding": jnp.zeros((H,), dtype),
        "patch_embedding": (jax.random.normal(
            keys[0], (cfg.patch_size, cfg.patch_size, cfg.num_channels, H),
            jnp.float32) * std).astype(dtype),
        "position_embedding": (jax.random.normal(
            keys[1], (cfg.num_positions, H), jnp.float32) * std).astype(dtype),
        "pre_layernorm": {"scale": jnp.ones((H,), dtype),
                          "bias": jnp.zeros((H,), dtype)},
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
    }


def _attn(lp, x, n_heads):
    B, T, H = x.shape
    hd = H // n_heads

    def proj(p, v):
        return (jnp.einsum("bti,io->bto", v, p["w"],
                           preferred_element_type=jnp.float32)
                + p["b"]).astype(x.dtype)

    q = proj(lp["q"], x).reshape(B, T, n_heads, hd)
    k = proj(lp["k"], x).reshape(B, T, n_heads, hd)
    v = proj(lp["v"], x).reshape(B, T, n_heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(hd)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                     preferred_element_type=jnp.float32)
    return proj(lp["o"], ctx.reshape(B, T, H).astype(x.dtype))


def clip_vision_features(params: Dict[str, Any], cfg: ClipVisionConfig,
                         pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels: [B, H_img, W_img, 3] normalized. Returns the selected hidden
    state, [B, num_patches(+1), hidden] per select_feature."""
    B = pixels.shape[0]
    H = cfg.hidden_size
    eps = cfg.layer_norm_eps
    dtype = params["class_embedding"].dtype

    patches = jax.lax.conv_general_dilated(
        pixels.astype(dtype), params["patch_embedding"],
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(dtype)
    patches = patches.reshape(B, -1, H)
    cls = jnp.broadcast_to(params["class_embedding"][None, None], (B, 1, H))
    x = jnp.concatenate([cls, patches], axis=1)
    x = x + params["position_embedding"][None]
    x = _ln(params["pre_layernorm"], x, eps)

    n_run = cfg.layers_to_run
    lp_all = params["layers"]
    lp_run = jax.tree.map(lambda a: a[:n_run], lp_all)

    def body(h, lp):
        a = _attn(lp, _ln(lp["ln1"], h, eps), cfg.num_attention_heads)
        h = h + a
        m = _ln(lp["ln2"], h, eps)
        m = (jnp.einsum("bti,io->bto", m, lp["fc1"]["w"],
                        preferred_element_type=jnp.float32)
             + lp["fc1"]["b"]).astype(h.dtype)
        m = quick_gelu(m) if cfg.hidden_act == "quick_gelu" \
            else jax.nn.gelu(m, approximate=False)
        m = (jnp.einsum("bti,io->bto", m, lp["fc2"]["w"],
                        preferred_element_type=jnp.float32)
             + lp["fc2"]["b"]).astype(h.dtype)
        return h + m, None

    x, _ = jax.lax.scan(body, x, lp_run)

    if cfg.select_feature == "patch":
        return x[:, 1:]
    if cfg.select_feature == "cls_patch":
        return x
    raise ValueError(f"Unexpected select feature: {cfg.select_feature}")


# ---------------------------------------------------------------------------
# HF weight conversion
# ---------------------------------------------------------------------------

def convert_hf_clip_vision(state: Dict[str, np.ndarray],
                           cfg: ClipVisionConfig,
                           dtype=jnp.float32) -> Dict[str, Any]:
    """Convert an HF CLIPVisionModel state dict (keys rooted at
    ``vision_model.``) into the stacked pytree above."""
    def g(key):
        return np.asarray(state[f"vision_model.{key}"], np.float32)

    L = cfg.num_hidden_layers

    def stack_dense(fmt):
        w = np.stack([g(fmt.format(i=i) + ".weight").T for i in range(L)])
        b = np.stack([g(fmt.format(i=i) + ".bias") for i in range(L)])
        return {"w": w, "b": b}

    def stack_ln(fmt):
        return {"scale": np.stack([g(fmt.format(i=i) + ".weight")
                                   for i in range(L)]),
                "bias": np.stack([g(fmt.format(i=i) + ".bias")
                                  for i in range(L)])}

    params = {
        "class_embedding": g("embeddings.class_embedding"),
        # torch conv weight [out, in, kh, kw] -> HWIO
        "patch_embedding": g("embeddings.patch_embedding.weight")
            .transpose(2, 3, 1, 0),
        "position_embedding": g("embeddings.position_embedding.weight"),
        "pre_layernorm": {"scale": g("pre_layrnorm.weight"),
                          "bias": g("pre_layrnorm.bias")},
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
    }
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
