"""EVA-CLIP vision tower (EVA01-g / EVA02-L family).

TPU-native rebuild of the reference's vendored EVA ViT (reference:
modelcompose/model/multimodal_encoder/eva_clip/eva_vit_model.py:370-579 and
rope.py:79-136; dispatched when the tower name contains 'eva',
clip_encoder.py:22-51).  Architecture knobs the two released towers use:

- **EVA02-CLIP-L-14-336**: subln (separate q/k/v projections + inner
  attention LN + ffn LN), naive SwiGLU ffn (mlp_ratio 2.6667), 2D rotary
  position embedding over the patch grid (interleaved-pair rotation,
  half-head dim split between row and column frequencies, fine-tuned grid
  interpolated onto pt_hw_seq_len=16), q/v biases only.
- **EVA01-CLIP-g-14**: fused qkv (converted to split form), plain GELU MLP
  (mlp_ratio 4.3637), no rope, no subln.

The decoder runs as one ``lax.scan`` over layer-stacked params; hidden
states tap layer ``select_layer`` exactly like the reference tower
(clip_encoder.py:59-67, select_feature='patch' drops CLS).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EvaVisionConfig:
    hidden_size: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 2.6667
    image_size: int = 336
    patch_size: int = 14
    num_channels: int = 3
    layer_norm_eps: float = 1e-6
    qkv_bias: bool = True          # q/v biases (k bias is always absent)
    use_rope: bool = True
    pt_hw_seq_len: int = 16
    intp_freq: bool = True
    swiglu: bool = True            # naiveswiglu ffn vs plain GELU MLP
    subln: bool = False            # inner_attn_ln + ffn_ln
    postnorm: bool = False
    select_layer: int = -2
    select_feature: str = "patch"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def ffn_hidden(self) -> int:
        return int(self.hidden_size * self.mlp_ratio)


# The two tower variants the reference dispatches on
# (clip_encoder.py:22-51); EVA02-L uses subln+swiglu+rope, EVA01-g the
# classic BEiT-style block.
PRESETS = {
    "EVA02-CLIP-L-14-336": EvaVisionConfig(
        hidden_size=1024, depth=24, num_heads=16, mlp_ratio=2.6667,
        image_size=336, patch_size=14, qkv_bias=True, use_rope=True,
        pt_hw_seq_len=16, intp_freq=True, swiglu=True, subln=True),
    "EVA01-CLIP-g-14": EvaVisionConfig(
        hidden_size=1408, depth=40, num_heads=16, mlp_ratio=4.3637,
        image_size=224, patch_size=14, qkv_bias=True, use_rope=False,
        swiglu=False, subln=False),
    "EVA01-CLIP-g-14-336": EvaVisionConfig(
        hidden_size=1408, depth=40, num_heads=16, mlp_ratio=4.3637,
        image_size=336, patch_size=14, qkv_bias=True, use_rope=False,
        swiglu=False, subln=False),
}


# ---------------------------------------------------------------------------
# 2D vision rope (reference: rope.py VisionRotaryEmbeddingFast)
# ---------------------------------------------------------------------------

def vision_rope_tables(cfg: EvaVisionConfig) -> tuple:
    """cos/sin [num_patches, head_dim].  Row and column positions each get
    head_dim/2 via interleaved duplication of head_dim/4 frequencies."""
    half = cfg.head_dim // 2  # the rope 'dim' argument
    n_freq = half // 2
    freqs = 1.0 / (10000.0 ** (np.arange(0, half, 2)[:n_freq] / half))
    g = cfg.grid
    if cfg.intp_freq:
        t = np.arange(g, dtype=np.float64) / g * cfg.pt_hw_seq_len
    else:
        t = np.arange(g, dtype=np.float64)
    fg = np.einsum("i,j->ij", t, freqs)          # [g, n_freq]
    fg = np.repeat(fg, 2, axis=-1)               # interleave: f0,f0,f1,f1
    # position (i, j) -> concat(row_i freqs, col_j freqs)
    full = np.concatenate(
        [np.broadcast_to(fg[:, None, :], (g, g, half)),
         np.broadcast_to(fg[None, :, :], (g, g, half))], axis=-1)
    full = full.reshape(g * g, cfg.head_dim)
    return (jnp.asarray(np.cos(full), jnp.float32),
            jnp.asarray(np.sin(full), jnp.float32))


def _rotate_half_interleaved(x):
    """(-x2, x1) over INTERLEAVED pairs (reference: rope.py:23-27) — not
    the Llama half-split."""
    x = x.reshape(x.shape[:-1] + (-1, 2))
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape[:-2] + (-1,))


def _apply_vision_rope(t, cos, sin):
    """t: [B, H, N_patches, D]; cos/sin: [N_patches, D]."""
    return t * cos + _rotate_half_interleaved(t) * sin


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------

def init_eva_vision(cfg: EvaVisionConfig, rng, dtype=jnp.float32
                    ) -> Dict[str, Any]:
    H, L, F = cfg.hidden_size, cfg.depth, cfg.ffn_hidden
    keys = jax.random.split(rng, 12)
    std = 0.02

    def dense(key, shape, bias=True):
        p = {"w": (jax.random.normal(key, shape, jnp.float32)
                   * std).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((shape[-1],), dtype)
        return p

    def stacked(key, d_in, d_out, bias=True):
        p = {"w": (jax.random.normal(key, (L, d_in, d_out), jnp.float32)
                   * std).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((L, d_out), dtype)
        return p

    def lnp():
        return {"scale": jnp.ones((L, H), dtype),
                "bias": jnp.zeros((L, H), dtype)}

    params: Dict[str, Any] = {
        "cls_token": jnp.zeros((H,), dtype),
        "patch_embedding": (jax.random.normal(
            keys[0], (cfg.patch_size, cfg.patch_size, cfg.num_channels, H),
            jnp.float32) * std).astype(dtype),
        "patch_bias": jnp.zeros((H,), dtype),
        "position_embedding": (jax.random.normal(
            keys[1], (cfg.num_patches + 1, H), jnp.float32)
            * std).astype(dtype),
        "layers": {
            "norm1": lnp(),
            "norm2": lnp(),
            "q": stacked(keys[2], H, H, bias=cfg.qkv_bias),
            "k": stacked(keys[3], H, H, bias=False),
            "v": stacked(keys[4], H, H, bias=cfg.qkv_bias),
            "proj": stacked(keys[5], H, H),
        },
    }
    layers = params["layers"]
    if cfg.swiglu:
        layers["w1"] = stacked(keys[6], H, F)
        layers["w2"] = stacked(keys[7], H, F)
        layers["w3"] = stacked(keys[8], F, H)
    else:
        layers["fc1"] = stacked(keys[6], H, F)
        layers["fc2"] = stacked(keys[7], F, H)
    if cfg.subln:
        layers["inner_attn_ln"] = lnp()
        layers["ffn_ln"] = {"scale": jnp.ones((L, F), dtype),
                            "bias": jnp.zeros((L, F), dtype)}
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _ln(x, p, eps):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps) * p["scale"] + p["bias"]


def _dense(x, p):
    y = jnp.einsum("...i,io->...o", x, p["w"],
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return y + p["b"] if "b" in p else y


def eva_vision_features(params: Dict[str, Any], cfg: EvaVisionConfig,
                        pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels: [B, H_img, W_img, 3] normalized.  Returns the selected
    hidden state [B, num_patches(+1), hidden]."""
    B = pixels.shape[0]
    eps = cfg.layer_norm_eps
    dtype = params["cls_token"].dtype

    patches = jax.lax.conv_general_dilated(
        pixels.astype(dtype), params["patch_embedding"],
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = patches.reshape(B, -1, cfg.hidden_size) + params["patch_bias"]
    cls = jnp.broadcast_to(params["cls_token"], (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"]

    rope = vision_rope_tables(cfg) if cfg.use_rope else None
    nh, hd = cfg.num_heads, cfg.head_dim
    N = x.shape[1]

    def attention(lp, h):
        q = _dense(h, lp["q"]).reshape(B, N, nh, hd).transpose(0, 2, 1, 3)
        k = _dense(h, lp["k"]).reshape(B, N, nh, hd).transpose(0, 2, 1, 3)
        v = _dense(h, lp["v"]).reshape(B, N, nh, hd).transpose(0, 2, 1, 3)
        if rope is not None:  # cls token (index 0) is not rotated
            cos, sin = rope
            q = jnp.concatenate(
                [q[:, :, :1], _apply_vision_rope(q[:, :, 1:], cos, sin)],
                axis=2).astype(v.dtype)
            k = jnp.concatenate(
                [k[:, :, :1], _apply_vision_rope(k[:, :, 1:], cos, sin)],
                axis=2).astype(v.dtype)
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                            preferred_element_type=jnp.float32) * hd ** -0.5
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", probs, v,
                         preferred_element_type=jnp.float32)
        out = out.astype(h.dtype).transpose(0, 2, 1, 3).reshape(B, N, -1)
        if cfg.subln:
            out = _ln(out, lp["inner_attn_ln"], eps)
        return _dense(out, lp["proj"])

    def ffn(lp, h):
        if cfg.swiglu:
            hidden = jax.nn.silu(_dense(h, lp["w1"])) * _dense(h, lp["w2"])
            if cfg.subln:
                hidden = _ln(hidden, lp["ffn_ln"], eps)
            return _dense(hidden, lp["w3"])
        hidden = jax.nn.gelu(_dense(h, lp["fc1"]), approximate=False)
        if cfg.subln:
            hidden = _ln(hidden, lp["ffn_ln"], eps)
        return _dense(hidden, lp["fc2"])

    def block(x, lp):
        if cfg.postnorm:
            x = x + _ln(attention(lp, x), lp["norm1"], eps)
            x = x + _ln(ffn(lp, x), lp["norm2"], eps)
        else:
            x = x + attention(lp, _ln(x, lp["norm1"], eps))
            x = x + ffn(lp, _ln(x, lp["norm2"], eps))
        return x, x

    # hidden_states index = (embeddings, block_1, ..., block_depth) like
    # the reference's output_hidden_states tuple (eva_vit_model.py:
    # 550-560) — but run ONLY the layers up to the tap and return the
    # scan carry: stacking every hidden state materializes a
    # [depth, B, N, H] buffer (~130 MB/image at EVA01-g fp32) and runs
    # dead layers past select_layer (same trick as the CLIP tower).
    idx = cfg.select_layer % (cfg.depth + 1)
    if idx == 0:
        return x[:, 1:] if cfg.select_feature == "patch" else x
    lp_run = jax.tree.map(lambda a: a[:idx], params["layers"])
    hidden, _ = jax.lax.scan(lambda c, lp: (block(c, lp)[0], None), x,
                             lp_run)
    if cfg.select_feature == "patch":
        return hidden[:, 1:]
    return hidden


# ---------------------------------------------------------------------------
# Checkpoint conversion (EVA visual.* torch key layout)
# ---------------------------------------------------------------------------

def convert_eva_vision(state: Dict[str, np.ndarray], cfg: EvaVisionConfig,
                       dtype=jnp.float32) -> Dict[str, Any]:
    """Convert an EVA ViT state dict (keys as in eva_vit_model.py, with or
    without a ``visual.`` prefix; fused ``qkv`` split into q/k/v)."""
    def g(key):
        for k in (key, f"visual.{key}"):
            if k in state:
                return np.asarray(state[k], np.float32)
        raise KeyError(key)

    def has(key):
        return key in state or f"visual.{key}" in state

    L, H = cfg.depth, cfg.hidden_size

    def stack(fmt, transpose=True):
        ws = [g(fmt.format(i=i)) for i in range(L)]
        ws = [w.T if transpose else w for w in ws]
        return np.stack(ws)

    def stacked_dense(name, bias=True):
        p = {"w": stack(f"blocks.{{i}}.{name}.weight")}
        if bias:
            p["b"] = stack(f"blocks.{{i}}.{name}.bias", transpose=False)
        return p

    def stacked_ln(name):
        return {"scale": stack(f"blocks.{{i}}.{name}.weight",
                               transpose=False),
                "bias": stack(f"blocks.{{i}}.{name}.bias", transpose=False)}

    params: Dict[str, Any] = {
        "cls_token": g("cls_token").reshape(-1),
        # torch conv [out, in, kh, kw] -> HWIO
        "patch_embedding": g("patch_embed.proj.weight")
        .transpose(2, 3, 1, 0),
        "patch_bias": g("patch_embed.proj.bias"),
        "position_embedding": g("pos_embed")[0],
        "layers": {"norm1": stacked_ln("norm1"),
                   "norm2": stacked_ln("norm2"),
                   "proj": stacked_dense("attn.proj")},
    }
    layers = params["layers"]
    if has("blocks.0.attn.qkv.weight"):  # fused (EVA01 family)
        qs, ks, vs = [], [], []
        for i in range(L):
            w = g(f"blocks.{i}.attn.qkv.weight")  # [3H, H]
            q, k, v = np.split(w, 3, axis=0)
            qs.append(q.T)
            ks.append(k.T)
            vs.append(v.T)
        layers["q"] = {"w": np.stack(qs)}
        layers["k"] = {"w": np.stack(ks)}
        layers["v"] = {"w": np.stack(vs)}
    else:  # separate projections (subln / EVA02 family)
        layers["q"] = {"w": stack("blocks.{i}.attn.q_proj.weight")}
        layers["k"] = {"w": stack("blocks.{i}.attn.k_proj.weight")}
        layers["v"] = {"w": stack("blocks.{i}.attn.v_proj.weight")}
    if cfg.qkv_bias:
        layers["q"]["b"] = stack("blocks.{i}.attn.q_bias", transpose=False)
        layers["v"]["b"] = stack("blocks.{i}.attn.v_bias", transpose=False)
    if cfg.swiglu:
        layers["w1"] = stacked_dense("mlp.w1")
        layers["w2"] = stacked_dense("mlp.w2")
        layers["w3"] = stacked_dense("mlp.w3")
    else:
        layers["fc1"] = stacked_dense("mlp.fc1")
        layers["fc2"] = stacked_dense("mlp.fc2")
    if cfg.subln:
        layers["inner_attn_ln"] = stacked_ln("attn.inner_attn_ln")
        layers["ffn_ln"] = stacked_ln("mlp.ffn_ln")
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)


# ---------------------------------------------------------------------------
# Tower (encoder protocol)
# ---------------------------------------------------------------------------

class EvaVisionTower:
    """Image tower for 'eva' specs (reference dispatch rule:
    clip_encoder.py:22 — ``'eva' in name.lower()``)."""

    modality = "vision"

    def __init__(self, spec: str, model_cfg, rng=None,
                 params: Optional[Dict[str, Any]] = None,
                 dtype=jnp.float32):
        import functools
        import os

        base = self._preset_for(spec)
        self.cfg = dataclasses.replace(
            base, select_layer=model_cfg.mm_vision_select_layer,
            select_feature=model_cfg.mm_vision_select_feature)
        if spec.startswith("eva-test:"):
            h, l = spec.split(":")[1].split("x")
            self.cfg = dataclasses.replace(
                self.cfg, hidden_size=int(h), depth=int(l), num_heads=2,
                image_size=28, patch_size=14, mlp_ratio=2.0,
                pt_hw_seq_len=2)
        self.spec = spec
        self.params = params
        self._dtype = dtype
        if self.params is None:
            if os.path.exists(spec):
                self.load_model()
            else:
                self.params = init_eva_vision(
                    self.cfg, rng if rng is not None
                    else jax.random.PRNGKey(0), dtype)
        self._encode = jax.jit(functools.partial(eva_vision_features,
                                                 cfg=self.cfg))

    @staticmethod
    def _preset_for(spec: str) -> EvaVisionConfig:
        if "EVA02_CLIP_L_336_psz14_s6B" in spec or "EVA02" in spec:
            return PRESETS["EVA02-CLIP-L-14-336"]
        if "336" in spec and "EVA01" in spec:
            return PRESETS["EVA01-CLIP-g-14-336"]
        if "EVA01" in spec or "eva_clip_g" in spec.lower():
            return PRESETS["EVA01-CLIP-g-14"]
        return PRESETS["EVA02-CLIP-L-14-336"]

    def load_model(self):
        """Load an EVA checkpoint (.pt torch pickle / safetensors) from
        ``self.spec`` (reference: clip_encoder.py:31-51 via the eva_clip
        factory's force_custom_clip path)."""
        from ..compose.state_io import load_state
        state = load_state(self.spec)
        self.params = convert_eva_vision(state, self.cfg, self._dtype)

    @property
    def hidden_size(self) -> int:
        return self.cfg.hidden_size

    @property
    def feature_len(self) -> int:
        n = self.cfg.num_patches
        return n if self.cfg.select_feature == "patch" else n + 1

    @property
    def dummy_inputs(self) -> np.ndarray:
        return np.zeros((1, self.cfg.image_size, self.cfg.image_size, 3),
                        np.float32)

    @property
    def modal_processor(self):
        from ..data.image_processing import ClipImageProcessor
        return ClipImageProcessor(size=self.cfg.image_size)

    def encode(self, pixels) -> jnp.ndarray:
        return self._encode(self.params, pixels=jnp.asarray(pixels))

    def __call__(self, pixels):
        return self.encode(pixels)
