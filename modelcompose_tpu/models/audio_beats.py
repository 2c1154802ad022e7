"""BEATs audio encoder (microsoft BEATs iter3+ AS2M class) in JAX.

Rebuild of the reference's vendored BEATs (reference: modelcompose/model/
multimodal_encoder/beats/BEATs.py:149-189 ``extract_features_new`` and
beats/backbone.py): fbank [B, N, 128] -> 16x16 conv patch embed (512) ->
LayerNorm -> proj to 768 -> 12-layer post-LN transformer with

- convolutional positional embedding (grouped conv k=128, groups=16,
  weight-normed, SamePad trims the trailing step, GELU) added residually,
- a T5-style bucketed **relative position bias** shared across layers
  (320 buckets, max distance 800), per-layer **gated** (gru_rel_pos: gates
  from an 8-way projection of q, reference: backbone.py:690-698),
- deep-norm residual scaling (alpha = (2L)^(1/4)).

The reference's fp16 ``alpha=32`` max-subtraction trick (backbone.py:
697-700) is a softmax-invariant stabilization; here logits are fp32 so the
plain form is used.  Layers run under ``lax.scan`` with stacked params.

Checkpoint conversion accepts the public BEATs .pt layout (fairseq keys,
weight-norm ``weight_g``/``weight_v`` pairs).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BeatsConfig:
    input_patch_size: int = 16
    embed_dim: int = 512
    encoder_layers: int = 12
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_attention_heads: int = 12
    conv_pos: int = 128
    conv_pos_groups: int = 16
    relative_position_embedding: bool = True
    num_buckets: int = 320
    max_distance: int = 800
    gru_rel_pos: bool = True
    deep_norm: bool = True
    layer_norm_first: bool = False
    fbank_bins: int = 128

    @property
    def deep_norm_alpha(self) -> float:
        return float((2 * self.encoder_layers) ** 0.25) if self.deep_norm \
            else 1.0

    @property
    def head_dim(self) -> int:
        return self.encoder_embed_dim // self.encoder_attention_heads


def _ln(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * p["scale"]
            + p["bias"]).astype(x.dtype)


def _dense(p, x):
    return (jnp.einsum("...i,io->...o", x, p["w"],
                       preferred_element_type=jnp.float32)
            + p["b"]).astype(x.dtype)


# ---------------------------------------------------------------------------
# Relative position buckets (T5-style, reference: backbone.py:431-469)
# ---------------------------------------------------------------------------

def relative_position_bucket(relative_positions: jnp.ndarray,
                             num_buckets: int, max_distance: int
                             ) -> jnp.ndarray:
    num_buckets = num_buckets // 2
    buckets = (relative_positions > 0).astype(jnp.int32) * num_buckets
    rel = jnp.abs(relative_positions)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    rel_if_large = max_exact + (
        jnp.log(rel.astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    rel_if_large = jnp.minimum(rel_if_large, num_buckets - 1)
    return buckets + jnp.where(is_small, rel, rel_if_large)


def compute_position_bias(rel_bias_table: jnp.ndarray, q_len: int,
                          k_len: int, num_buckets: int, max_distance: int
                          ) -> jnp.ndarray:
    """rel_bias_table: [num_buckets, H] -> bias [H, q_len, k_len]."""
    ctx = jnp.arange(q_len)[:, None]
    mem = jnp.arange(k_len)[None, :]
    buckets = relative_position_bucket(mem - ctx, num_buckets, max_distance)
    values = jnp.take(rel_bias_table, buckets, axis=0)  # [q, k, H]
    return values.transpose(2, 0, 1)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_beats(cfg: BeatsConfig, rng, dtype=jnp.float32) -> Dict[str, Any]:
    E, H, F = cfg.embed_dim, cfg.encoder_embed_dim, cfg.encoder_ffn_embed_dim
    L = cfg.encoder_layers
    P = cfg.input_patch_size
    keys = iter(jax.random.split(rng, 16))

    def dense(key, d_in, d_out, std=0.02):
        return {"w": (jax.random.normal(key, (d_in, d_out), jnp.float32)
                      * std).astype(dtype),
                "b": jnp.zeros((d_out,), dtype)}

    def stacked_dense(key, d_in, d_out, std=0.02):
        return {"w": (jax.random.normal(key, (L, d_in, d_out), jnp.float32)
                      * std).astype(dtype),
                "b": jnp.zeros((L, d_out), dtype)}

    def lnp(d):
        return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    def stacked_ln(d):
        return {"scale": jnp.ones((L, d), dtype),
                "bias": jnp.zeros((L, d), dtype)}

    params: Dict[str, Any] = {
        # conv [kh, kw, in, out] HWIO
        "patch_embedding": (jax.random.normal(next(keys), (P, P, 1, E),
                                              jnp.float32) * 0.02
                            ).astype(dtype),
        "layer_norm": lnp(E),
        "post_extract_proj": dense(next(keys), E, H),
        "pos_conv": {
            # effective (weight-normed) grouped conv weight, torch layout
            # [out, in/groups, k] converted to [k, in/groups, out]
            "w": (jax.random.normal(
                next(keys), (cfg.conv_pos, H // cfg.conv_pos_groups, H),
                jnp.float32) * 0.02).astype(dtype),
            "b": jnp.zeros((H,), dtype),
        },
        "encoder_layer_norm": lnp(H),
        "rel_bias": (jax.random.normal(next(keys), (cfg.num_buckets,
                                                    cfg.encoder_attention_heads),
                                       jnp.float32) * 0.02).astype(dtype),
        "layers": {
            "q": stacked_dense(next(keys), H, H),
            "k": stacked_dense(next(keys), H, H),
            "v": stacked_dense(next(keys), H, H),
            "o": stacked_dense(next(keys), H, H),
            "grep_linear": stacked_dense(next(keys), cfg.head_dim, 8),
            "grep_a": jnp.ones((L, 1, cfg.encoder_attention_heads, 1, 1),
                               dtype),
            "self_attn_ln": stacked_ln(H),
            "fc1": stacked_dense(next(keys), H, F),
            "fc2": stacked_dense(next(keys), F, H),
            "final_ln": stacked_ln(H),
        },
    }
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _pos_conv(params, x, cfg: BeatsConfig):
    """Grouped conv positional embedding with SamePad trim + GELU
    (reference: backbone.py:71-87, 152-155)."""
    B, T, H = x.shape
    g = cfg.conv_pos_groups
    w = params["pos_conv"]["w"]  # [k, H/g, H]
    conv = jax.lax.conv_general_dilated(
        x.astype(w.dtype), w,
        window_strides=(1,), padding=[(cfg.conv_pos // 2,
                                       cfg.conv_pos // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=g,
        preferred_element_type=jnp.float32).astype(x.dtype)
    conv = conv + params["pos_conv"]["b"]
    if cfg.conv_pos % 2 == 0:  # SamePad removes the trailing step
        conv = conv[:, :-1]
    return jax.nn.gelu(conv, approximate=False)


def beats_extract_features(params: Dict[str, Any], cfg: BeatsConfig,
                           fbank: jnp.ndarray,
                           padding_mask: Optional[jnp.ndarray] = None
                           ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """fbank: [B, N, 128] normalized; padding_mask: [B, N] bool (True=pad).
    Returns (features [B, T, 768], padding_mask [B, T] True=pad)."""
    B, N, bins = fbank.shape
    P = cfg.input_patch_size

    x = fbank[..., None]  # [B, N, 128, 1] NHWC
    feats = jax.lax.conv_general_dilated(
        x.astype(params["patch_embedding"].dtype), params["patch_embedding"],
        window_strides=(P, P), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)  # [B, N/P, 128/P, E]
    Bn, n1, n2, E = feats.shape
    # reference flattens channel-major: [B, E, n1, n2] -> [B, E, n1*n2]
    # -> transpose => token order is (n1, n2) row-major; NHWC reshape
    # matches that directly.
    feats = feats.reshape(B, n1 * n2, E).astype(fbank.dtype)
    feats = _ln(params["layer_norm"], feats)

    new_padding = None
    if padding_mask is not None:
        T = feats.shape[1]
        extra = padding_mask.shape[1] % T
        if extra > 0:
            padding_mask = padding_mask[:, :-extra]
        new_padding = padding_mask.reshape(B, T, -1).all(-1)

    x = _dense(params["post_extract_proj"], feats)  # [B, T, 768]

    if new_padding is not None:
        x = jnp.where(new_padding[..., None], 0.0, x)
    x = x + _pos_conv(params, x, cfg)
    if not cfg.layer_norm_first:
        x = _ln(params["encoder_layer_norm"], x)

    T = x.shape[1]
    nh, hd = cfg.encoder_attention_heads, cfg.head_dim
    bias = compute_position_bias(
        params["rel_bias"].astype(jnp.float32), T, T, cfg.num_buckets,
        cfg.max_distance) if cfg.relative_position_embedding else None
    alpha = cfg.deep_norm_alpha
    key_mask = new_padding  # [B, T] True=pad or None

    def layer(x, lp):
        q = _dense(lp["q"], x).reshape(B, T, nh, hd)
        k = _dense(lp["k"], x).reshape(B, T, nh, hd)
        v = _dense(lp["v"], x).reshape(B, T, nh, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) \
            * (hd ** -0.5)
        if key_mask is not None:
            logits = jnp.where(key_mask[:, None, None, :], -jnp.inf, logits)
        if bias is not None:
            if cfg.gru_rel_pos:
                # gates from raw q (reference: backbone.py:690-697)
                gate_in = _dense(lp["grep_linear"],
                                 q.transpose(0, 2, 1, 3))  # [B,H,T,8]
                gates = jax.nn.sigmoid(
                    gate_in.reshape(B, nh, T, 2, 4).sum(-1))
                gate_a, gate_b = gates[..., 0], gates[..., 1]
                grep_a = lp["grep_a"].reshape(1, nh, 1)     # [1, H, 1]
                gate_a_1 = gate_a * (gate_b * grep_a - 1.0) + 2.0  # [B,H,T]
                gated_bias = gate_a_1[..., None] * bias[None]
            else:
                gated_bias = bias[None]
            logits = logits + gated_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32)
        attn = _dense(lp["o"], ctx.reshape(B, T, nh * hd).astype(x.dtype))
        x = _ln(lp["self_attn_ln"], x * alpha + attn)
        h = jax.nn.gelu(_dense(lp["fc1"], x), approximate=False)
        h = _dense(lp["fc2"], h)
        x = _ln(lp["final_ln"], x * alpha + h)
        return x, None

    x, _ = jax.lax.scan(layer, x, params["layers"])
    return x, new_padding


# ---------------------------------------------------------------------------
# Checkpoint conversion (public BEATs .pt -> pytree)
# ---------------------------------------------------------------------------

def convert_beats_checkpoint(state: Dict[str, np.ndarray],
                             cfg: BeatsConfig,
                             dtype=jnp.float32) -> Dict[str, Any]:
    def g(k):
        return np.asarray(state[k], np.float32)

    L = cfg.encoder_layers

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

    # weight-normed pos_conv: effective w = v * g / ||v||_{dims != 2}
    if "encoder.pos_conv.0.weight_g" in state:
        wg, wv = g("encoder.pos_conv.0.weight_g"), \
            g("encoder.pos_conv.0.weight_v")
    else:
        wg = g("encoder.pos_conv.0.parametrizations.weight.original0")
        wv = g("encoder.pos_conv.0.parametrizations.weight.original1")
    norm = np.sqrt((wv ** 2).sum(axis=(0, 1), keepdims=True))
    w_eff = wv * wg / np.maximum(norm, 1e-12)   # [out, in/g, k]
    pos_w = w_eff.transpose(2, 1, 0)            # -> [k, in/g, out] WIO

    rel = g("encoder.layers.0.self_attn.relative_attention_bias.weight")

    params = {
        "patch_embedding": g("patch_embedding.weight").transpose(2, 3, 1, 0),
        "layer_norm": {"scale": g("layer_norm.weight"),
                       "bias": g("layer_norm.bias")},
        "post_extract_proj": {"w": g("post_extract_proj.weight").T,
                              "b": g("post_extract_proj.bias")},
        "pos_conv": {"w": pos_w, "b": g("encoder.pos_conv.0.bias")},
        "encoder_layer_norm": {"scale": g("encoder.layer_norm.weight"),
                               "bias": g("encoder.layer_norm.bias")},
        "rel_bias": rel,
        "layers": {
            "q": stack_dense("encoder.layers.{i}.self_attn.q_proj"),
            "k": stack_dense("encoder.layers.{i}.self_attn.k_proj"),
            "v": stack_dense("encoder.layers.{i}.self_attn.v_proj"),
            "o": stack_dense("encoder.layers.{i}.self_attn.out_proj"),
            "grep_linear": stack_dense(
                "encoder.layers.{i}.self_attn.grep_linear"),
            "grep_a": np.stack([
                g(f"encoder.layers.{i}.self_attn.grep_a")
                for i in range(L)]),
            "self_attn_ln": stack_ln(
                "encoder.layers.{i}.self_attn_layer_norm"),
            "fc1": stack_dense("encoder.layers.{i}.fc1"),
            "fc2": stack_dense("encoder.layers.{i}.fc2"),
            "final_ln": stack_ln("encoder.layers.{i}.final_layer_norm"),
        },
    }
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)


# ---------------------------------------------------------------------------
# Tower wrapper (encoder protocol, reference: audio_encoder.py BeatsAudioEncoder)
# ---------------------------------------------------------------------------

class BeatsAudioTower:
    """Audio tower.  ``encode`` returns (features [B, T, 768],
    valid_mask [B, T] True=valid) — the wrapper inverts BEATs' padding
    convention exactly like the reference (reference: modelcompose/model/
    multimodal_encoder/audio_encoder.py:37-40)."""

    modality = "audio"

    def __init__(self, spec: str, model_cfg=None, rng=None,
                 params=None, dtype=None):
        import jax
        import os
        if isinstance(spec, str) and spec.startswith("test:"):
            h, l = spec.split(":")[1].split("x")
            self.cfg = BeatsConfig(
                input_patch_size=4, embed_dim=int(h),
                encoder_layers=int(l), encoder_embed_dim=int(h),
                encoder_ffn_embed_dim=2 * int(h),
                encoder_attention_heads=4, conv_pos=8, conv_pos_groups=4,
                num_buckets=32, max_distance=64, fbank_bins=8)
        else:
            self.cfg = BeatsConfig()
        self.spec = spec
        self.params = params
        if self.params is None:
            if isinstance(spec, str) and os.path.isfile(spec):
                self.load_model()
            else:
                self.params = init_beats(
                    self.cfg,
                    rng if rng is not None else jax.random.PRNGKey(0),
                    dtype or jnp.float32)
        self._encode = jax.jit(functools.partial(beats_extract_features,
                                                 cfg=self.cfg))

    def load_model(self):
        """Load a public BEATs .pt checkpoint (torch pickle with 'cfg' and
        'model' entries, reference: audio_encoder.py:22-35)."""
        import torch
        ckpt = torch.load(self.spec, map_location="cpu", weights_only=False)
        raw_cfg = ckpt.get("cfg", {})
        self.cfg = BeatsConfig(
            input_patch_size=raw_cfg.get("input_patch_size", 16),
            embed_dim=raw_cfg.get("embed_dim", 512),
            encoder_layers=raw_cfg.get("encoder_layers", 12),
            encoder_embed_dim=raw_cfg.get("encoder_embed_dim", 768),
            encoder_ffn_embed_dim=raw_cfg.get("encoder_ffn_embed_dim", 3072),
            encoder_attention_heads=raw_cfg.get("encoder_attention_heads",
                                                12),
            conv_pos=raw_cfg.get("conv_pos", 128),
            conv_pos_groups=raw_cfg.get("conv_pos_groups", 16),
            relative_position_embedding=raw_cfg.get(
                "relative_position_embedding", True),
            num_buckets=raw_cfg.get("num_buckets", 320),
            max_distance=raw_cfg.get("max_distance", 800),
            gru_rel_pos=raw_cfg.get("gru_rel_pos", True),
            deep_norm=raw_cfg.get("deep_norm", True),
            layer_norm_first=raw_cfg.get("layer_norm_first", False))
        state = {k: v.float().numpy() for k, v in ckpt["model"].items()}
        self.params = convert_beats_checkpoint(state, self.cfg)

    @property
    def hidden_size(self) -> int:
        return self.cfg.encoder_embed_dim

    @property
    def feature_len(self) -> int:
        # eval-mode single 512-frame window -> (512/P) * (128/P) tokens
        P = self.cfg.input_patch_size
        return (512 // P) * (self.cfg.fbank_bins // P)

    @property
    def dummy_inputs(self):
        return {"audio_inputs": np.zeros((1, 1024, self.cfg.fbank_bins),
                                         np.float32),
                "audio_padding_mask": np.zeros((1, 1024), bool)}

    @property
    def modal_processor(self):
        from ..data.audio_processing import BeatsAudioProcessor
        return BeatsAudioProcessor(num_mel_bins=self.cfg.fbank_bins)

    def encode(self, audio_inputs, audio_padding_mask=None):
        feats, pad = self._encode(
            self.params, fbank=jnp.asarray(audio_inputs),
            padding_mask=None if audio_padding_mask is None
            else jnp.asarray(audio_padding_mask))
        valid = None if pad is None else ~pad
        return feats, valid

    def __call__(self, audio_inputs, audio_padding_mask=None):
        return self.encode(audio_inputs, audio_padding_mask)
