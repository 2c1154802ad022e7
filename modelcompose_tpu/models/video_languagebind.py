"""LanguageBind video tower: CLIP ViT with interleaved temporal attention.

Rebuild of the reference's vendored LanguageBind video encoder (reference:
modelcompose/model/multimodal_encoder/languagebind/video/modeling_video.py:
65-135, 599-680): 8 uniformly-sampled 224x224 frames are embedded per-frame
by a CLIP ViT (256 patches + CLS = 257 tokens), and every encoder layer
runs, before its spatial attention,

  1. a per-layer learned **temporal embedding** added over the frame axis,
  2. a **temporal attention** block (own LN + attention, residual) where
     tokens attend across the 8 frames at the same spatial position,

then the standard pre-LN CLIP spatial attention + MLP.  ``select_layer`` -2
taps hidden_states[-2] reshaped to [B, T, 257, C] (reference:
languagebind/__init__.py:211-218); the LLM side flattens to
[B, T*257, C] (reference: multimodal_arch.py:236-240).

Activation is configurable: the published LanguageBind weights are
OpenCLIP-derived (exact gelu); HF-CLIP-derived checkpoints use quick_gelu.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .vision_clip import _ln, quick_gelu


@dataclasses.dataclass(frozen=True)
class LanguageBindVideoConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    num_frames: int = 8
    num_channels: int = 3
    layer_norm_eps: float = 1e-5
    hidden_act: str = "gelu"
    select_layer: int = -2

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def num_positions(self) -> int:
        return self.num_patches + 1

    @property
    def layers_to_run(self) -> int:
        if self.select_layer < 0:
            n = self.num_hidden_layers + 1 + self.select_layer
        else:
            n = self.select_layer
        if not 0 <= n <= self.num_hidden_layers:
            raise ValueError(f"select_layer {self.select_layer}")
        return n


def _act(cfg, x):
    if cfg.hidden_act == "quick_gelu":
        return quick_gelu(x)
    return jax.nn.gelu(x, approximate=False)


def init_languagebind_video(cfg: LanguageBindVideoConfig, rng,
                            dtype=jnp.float32) -> Dict[str, Any]:
    H, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    keys = iter(jax.random.split(rng, 24))
    std = 0.02

    def stacked(d_in, d_out):
        return {"w": (jax.random.normal(next(keys), (L, d_in, d_out),
                                        jnp.float32) * std).astype(dtype),
                "b": jnp.zeros((L, d_out), dtype)}

    def stacked_ln():
        return {"scale": jnp.ones((L, H), dtype),
                "bias": jnp.zeros((L, H), dtype)}

    return {
        "class_embedding": jnp.zeros((H,), dtype),
        "patch_embedding": (jax.random.normal(
            next(keys), (cfg.patch_size, cfg.patch_size, cfg.num_channels, H),
            jnp.float32) * std).astype(dtype),
        "position_embedding": (jax.random.normal(
            next(keys), (cfg.num_positions, H), jnp.float32) * std
            ).astype(dtype),
        "pre_layernorm": {"scale": jnp.ones((H,), dtype),
                          "bias": jnp.zeros((H,), dtype)},
        "layers": {
            "temporal_embedding": (jax.random.normal(
                next(keys), (L, cfg.num_frames, H), jnp.float32)
                * H ** -0.5).astype(dtype),
            "t_ln": stacked_ln(),
            "t_q": stacked(H, H), "t_k": stacked(H, H),
            "t_v": stacked(H, H), "t_o": stacked(H, H),
            "ln1": stacked_ln(),
            "q": stacked(H, H), "k": stacked(H, H),
            "v": stacked(H, H), "o": stacked(H, H),
            "ln2": stacked_ln(),
            "fc1": stacked(H, I), "fc2": stacked(I, H),
        },
    }


def _mha(lp, pre, x, n_heads):
    """x: [B*, S, H] -> attention over S."""
    Bx, S, H = x.shape
    hd = H // n_heads

    def proj(p, v):
        return (jnp.einsum("bsi,io->bso", v, p["w"],
                           preferred_element_type=jnp.float32)
                + p["b"]).astype(x.dtype)

    q = proj(lp[pre + "q"], x).reshape(Bx, S, n_heads, hd)
    k = proj(lp[pre + "k"], x).reshape(Bx, S, n_heads, hd)
    v = proj(lp[pre + "v"], x).reshape(Bx, S, n_heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(hd)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                     preferred_element_type=jnp.float32)
    return proj(lp[pre + "o"], ctx.reshape(Bx, S, H).astype(x.dtype))


def languagebind_video_features(params: Dict[str, Any],
                                cfg: LanguageBindVideoConfig,
                                pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels: [B, T, H_img, W_img, 3] normalized frames.
    Returns [B, T, 257, hidden] at the selected layer."""
    B, T = pixels.shape[:2]
    H = cfg.hidden_size
    eps = cfg.layer_norm_eps
    dtype = params["class_embedding"].dtype
    frames = pixels.reshape((B * T,) + pixels.shape[2:])

    patches = jax.lax.conv_general_dilated(
        frames.astype(dtype), params["patch_embedding"],
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(dtype)
    patches = patches.reshape(B * T, -1, H)
    cls = jnp.broadcast_to(params["class_embedding"][None, None],
                           (B * T, 1, H))
    x = jnp.concatenate([cls, patches], axis=1)       # [B*T, N, H]
    x = x + params["position_embedding"][None]
    x = _ln(params["pre_layernorm"], x, eps)

    N = x.shape[1]
    n_run = cfg.layers_to_run
    lp_run = jax.tree.map(lambda a: a[:n_run], params["layers"])

    def body(h, lp):
        # temporal block (reference: modeling_video.py:104-133)
        ht = h.reshape(B, T, N, H)
        ht = ht + lp["temporal_embedding"][None, :T, None, :]
        ht = ht.transpose(0, 2, 1, 3).reshape(B * N, T, H)
        t_in = _ln({"scale": lp["t_ln"]["scale"],
                    "bias": lp["t_ln"]["bias"]}, ht, eps)
        t_out = _mha(lp, "t_", t_in, cfg.num_attention_heads)
        ht = ht + t_out
        h = ht.reshape(B, N, T, H).transpose(0, 2, 1, 3).reshape(B * T, N, H)

        # spatial attention + MLP (pre-LN CLIP)
        a = _mha(lp, "", _ln(lp["ln1"], h, eps), cfg.num_attention_heads)
        h = h + a
        m = _ln(lp["ln2"], h, eps)
        m = (jnp.einsum("bsi,io->bso", m, lp["fc1"]["w"],
                        preferred_element_type=jnp.float32)
             + lp["fc1"]["b"]).astype(h.dtype)
        m = _act(cfg, m)
        m = (jnp.einsum("bsi,io->bso", m, lp["fc2"]["w"],
                        preferred_element_type=jnp.float32)
             + lp["fc2"]["b"]).astype(h.dtype)
        return h + m, None

    x, _ = jax.lax.scan(body, x, lp_run)
    return x.reshape(B, T, N, H)


# ---------------------------------------------------------------------------
# HF-layout weight conversion (LanguageBindVideo checkpoint)
# ---------------------------------------------------------------------------

def convert_languagebind_video(state: Dict[str, np.ndarray],
                               cfg: LanguageBindVideoConfig,
                               dtype=jnp.float32) -> Dict[str, Any]:
    """Keys rooted at ``vision_model.`` with per-layer ``temporal_attn`` /
    ``temporal_layer_norm1`` / ``temporal_embedding`` extras."""
    def g(key):
        return np.asarray(state[f"vision_model.{key}"], np.float32)

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
        "class_embedding": g("embeddings.class_embedding"),
        "patch_embedding": g("embeddings.patch_embedding.weight")
            .transpose(2, 3, 1, 0),
        "position_embedding": g("embeddings.position_embedding.weight"),
        "pre_layernorm": {"scale": g("pre_layrnorm.weight"),
                          "bias": g("pre_layrnorm.bias")},
        "layers": {
            "temporal_embedding": np.stack(
                [g(f"encoder.layers.{i}.temporal_embedding")[0]
                 for i in range(L)]),
            "t_ln": stack_ln("encoder.layers.{i}.temporal_layer_norm1"),
            "t_q": stack_dense("encoder.layers.{i}.temporal_attn.q_proj"),
            "t_k": stack_dense("encoder.layers.{i}.temporal_attn.k_proj"),
            "t_v": stack_dense("encoder.layers.{i}.temporal_attn.v_proj"),
            "t_o": stack_dense("encoder.layers.{i}.temporal_attn.out_proj"),
            "ln1": stack_ln("encoder.layers.{i}.layer_norm1"),
            "q": stack_dense("encoder.layers.{i}.self_attn.q_proj"),
            "k": stack_dense("encoder.layers.{i}.self_attn.k_proj"),
            "v": stack_dense("encoder.layers.{i}.self_attn.v_proj"),
            "o": stack_dense("encoder.layers.{i}.self_attn.out_proj"),
            "ln2": stack_ln("encoder.layers.{i}.layer_norm2"),
            "fc1": stack_dense("encoder.layers.{i}.mlp.fc1"),
            "fc2": stack_dense("encoder.layers.{i}.mlp.fc2"),
        },
    }
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)


# ---------------------------------------------------------------------------
# Tower wrapper
# ---------------------------------------------------------------------------

class LanguageBindVideoTower:
    """Video tower; ``encode`` returns [B, T, 257, hidden] (the model
    flattens T*N)."""

    modality = "video"

    def __init__(self, spec: str, model_cfg=None, rng=None, params=None,
                 dtype=None):
        import functools
        import os
        select_layer = getattr(model_cfg, "mm_video_select_layer", -2) \
            if model_cfg is not None else -2
        if isinstance(spec, str) and spec.startswith("test:"):
            h, l = spec.split(":")[1].split("x")
            self.cfg = LanguageBindVideoConfig(
                hidden_size=int(h), intermediate_size=2 * int(h),
                num_hidden_layers=int(l), num_attention_heads=4,
                image_size=28, patch_size=14, num_frames=2,
                select_layer=select_layer)
        else:
            self.cfg = LanguageBindVideoConfig(select_layer=select_layer)
        self.spec = spec
        self.params = params
        if self.params is None:
            if isinstance(spec, str) and os.path.isdir(spec):
                self.load_model()
            else:
                self.params = init_languagebind_video(
                    self.cfg,
                    rng if rng is not None else jax.random.PRNGKey(0),
                    dtype or jnp.float32)
        self._encode = jax.jit(functools.partial(
            languagebind_video_features, cfg=self.cfg))

    def load_model(self):
        from ..compose.state_io import load_state
        import os
        for name in ("model.safetensors", "pytorch_model.bin"):
            p = os.path.join(self.spec, name)
            if os.path.exists(p):
                self.params = convert_languagebind_video(load_state(p),
                                                         self.cfg)
                return
        raise FileNotFoundError(f"no LanguageBind weights under {self.spec}")

    @property
    def hidden_size(self) -> int:
        return self.cfg.hidden_size

    @property
    def num_frames(self) -> int:
        return self.cfg.num_frames

    @property
    def tokens_per_frame(self) -> int:
        return self.cfg.num_positions  # CLS kept (reference returns all)

    @property
    def feature_len(self) -> int:
        return self.num_frames * self.tokens_per_frame

    @property
    def dummy_inputs(self) -> np.ndarray:
        return np.zeros((1, self.cfg.num_frames, self.cfg.image_size,
                         self.cfg.image_size, 3), np.float32)

    @property
    def modal_processor(self):
        from ..data.video_processing import LanguageBindVideoProcessor
        return LanguageBindVideoProcessor(
            num_frames=self.cfg.num_frames, size=self.cfg.image_size)

    def encode(self, videos) -> jnp.ndarray:
        return self._encode(self.params, pixels=jnp.asarray(videos))

    def __call__(self, videos):
        return self.encode(videos)
