"""ImageBind audio tower — the reference's alternative audio path.

Rebuild of the audio branch of the vendored ImageBind model, used when
``mm_audio_encoder`` contains 'VideoLLaMA' (reference:
modelcompose/model/multimodal_encoder/builder.py:92-95,
imagebind/imagebind_model.py:455-531):

  mel-spectrogram clips [B, S, 1, 128 mels, 204 frames]
    -> Conv2d patch stem (k=16, s=10, no bias) + LayerNorm
    -> cls token + learnable pos embed
    -> 12-block pre-norm ViT (768d, 12 heads, add_bias_kv: one extra
       learned key/value position per attention)
    -> head LayerNorm -> cls select -> Linear 768->1024 (no bias)
    -> L2 normalize x logit scale 20
  returns [B, S, 1024] clip-level embeddings.

The trunk runs as one ``lax.scan`` over layer-stacked params; the host
processor reproduces the reference's waveform2melspec (kaldi fbank,
hanning window, 2 s clips x3 uniformly spaced, pad/crop to 204 frames,
(x - mean)/std with the ImageBind constants; reference:
data/data.py:27-150).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ImageBindAudioConfig:
    embed_dim: int = 768
    num_blocks: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    num_mel_bins: int = 128
    target_len: int = 204
    kernel_size: int = 16
    stride: int = 10
    out_embed_dim: int = 1024
    logit_scale: float = 20.0
    stem_ln_eps: float = 1e-5   # PatchEmbedGeneric's default LayerNorm
    block_ln_eps: float = 1e-6  # SimpleTransformer _LAYER_NORM
    clip_duration: float = 2.0
    clips_per_audio: int = 3
    sample_rate: int = 16000
    norm_mean: float = -4.268
    norm_std: float = 9.138

    @property
    def grid(self):
        gh = (self.num_mel_bins - self.kernel_size) // self.stride + 1
        gw = (self.target_len - self.kernel_size) // self.stride + 1
        return gh, gw

    @property
    def num_patches(self) -> int:
        gh, gw = self.grid
        return gh * gw


def init_imagebind_audio(cfg: ImageBindAudioConfig, rng,
                         dtype=jnp.float32) -> Dict[str, Any]:
    E, L, F = cfg.embed_dim, cfg.num_blocks, cfg.mlp_ratio * cfg.embed_dim
    keys = jax.random.split(rng, 10)
    std = 0.02

    def stacked(key, d_in, d_out):
        return {"w": (jax.random.normal(key, (L, d_in, d_out), jnp.float32)
                      * std).astype(dtype),
                "b": jnp.zeros((L, d_out), dtype)}

    def lnp(dim=E):
        return {"scale": jnp.ones((L, dim), dtype),
                "bias": jnp.zeros((L, dim), dtype)}

    return {
        "patch_embedding": (jax.random.normal(
            keys[0], (cfg.kernel_size, cfg.kernel_size, 1, E), jnp.float32)
            * std).astype(dtype),
        "stem_ln": {"scale": jnp.ones((E,), dtype),
                    "bias": jnp.zeros((E,), dtype)},
        "cls_token": (jax.random.normal(keys[1], (E,), jnp.float32)
                      * E ** -0.5).astype(dtype),
        "position_embedding": (jax.random.normal(
            keys[2], (cfg.num_patches + 1, E), jnp.float32)
            * E ** -0.5).astype(dtype),
        "layers": {
            "norm1": lnp(), "norm2": lnp(),
            # packed torch MultiheadAttention layout: in_proj [E, 3E]
            "in_proj": stacked(keys[3], E, 3 * E),
            "bias_k": jnp.zeros((L, E), dtype),
            "bias_v": jnp.zeros((L, E), dtype),
            "out_proj": stacked(keys[4], E, E),
            "fc1": stacked(keys[5], E, F),
            "fc2": stacked(keys[6], F, E),
        },
        "head_ln": {"scale": jnp.ones((E,), dtype),
                    "bias": jnp.zeros((E,), dtype)},
        "head_proj": (jax.random.normal(keys[7], (E, cfg.out_embed_dim),
                                        jnp.float32) * std).astype(dtype),
    }


def _ln(x, p, eps):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps) * p["scale"] + p["bias"]


def imagebind_audio_features(params: Dict[str, Any],
                             cfg: ImageBindAudioConfig,
                             melspec: jnp.ndarray) -> jnp.ndarray:
    """melspec: [B, S, 1, mels, frames] (clips) or [B, 1, mels, frames].
    Returns [B, S, out_embed_dim] (or [B, out_embed_dim])."""
    clips = melspec.ndim == 5
    x = melspec
    if clips:
        B, S = x.shape[:2]
        x = x.reshape((B * S,) + x.shape[2:])
    n, _, mels, frames = x.shape
    E = cfg.embed_dim
    dtype = params["cls_token"].dtype

    # Conv2d stem over the 1-channel spectrogram image (NCHW -> NHWC)
    patches = jax.lax.conv_general_dilated(
        x.transpose(0, 2, 3, 1).astype(dtype), params["patch_embedding"],
        window_strides=(cfg.stride, cfg.stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    tokens = patches.reshape(n, -1, E)
    tokens = _ln(tokens, params["stem_ln"], cfg.stem_ln_eps)
    cls = jnp.broadcast_to(params["cls_token"], (n, 1, E))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    tokens = tokens + params["position_embedding"]

    nh = cfg.num_heads
    hd = E // nh
    N = tokens.shape[1]

    def block(h, lp):
        y = _ln(h, lp["norm1"], cfg.block_ln_eps)
        qkv = jnp.einsum("bnd,de->bne", y, lp["in_proj"]["w"],
                         preferred_element_type=jnp.float32
                         ).astype(y.dtype) + lp["in_proj"]["b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # add_bias_kv: one extra learned key/value position
        k = jnp.concatenate(
            [k, jnp.broadcast_to(lp["bias_k"], (n, 1, E))], axis=1)
        v = jnp.concatenate(
            [v, jnp.broadcast_to(lp["bias_v"], (n, 1, E))], axis=1)
        q = q.reshape(n, N, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(n, N + 1, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(n, N + 1, nh, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                            preferred_element_type=jnp.float32) * hd ** -0.5
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhnm,bhmd->bhnd", probs, v,
                          preferred_element_type=jnp.float32)
        attn = attn.astype(h.dtype).transpose(0, 2, 1, 3).reshape(n, N, E)
        attn = jnp.einsum("bnd,de->bne", attn, lp["out_proj"]["w"],
                          preferred_element_type=jnp.float32
                          ).astype(h.dtype) + lp["out_proj"]["b"]
        h = h + attn
        y = _ln(h, lp["norm2"], cfg.block_ln_eps)
        ff = jax.nn.gelu(
            jnp.einsum("bnd,df->bnf", y, lp["fc1"]["w"],
                       preferred_element_type=jnp.float32
                       ).astype(y.dtype) + lp["fc1"]["b"],
            approximate=False)
        ff = jnp.einsum("bnf,fd->bnd", ff, lp["fc2"]["w"],
                        preferred_element_type=jnp.float32
                        ).astype(y.dtype) + lp["fc2"]["b"]
        return h + ff, None

    tokens, _ = jax.lax.scan(block, tokens, params["layers"])

    # head: LN -> cls -> proj; postprocess: l2-normalize * logit scale
    cls_out = _ln(tokens, params["head_ln"], cfg.block_ln_eps)[:, 0]
    out = jnp.einsum("bd,do->bo", cls_out, params["head_proj"],
                     preferred_element_type=jnp.float32)
    out = out / jnp.maximum(
        jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
    out = (cfg.logit_scale * out).astype(dtype)
    if clips:
        out = out.reshape(B, S, -1)
    return out


# ---------------------------------------------------------------------------
# Checkpoint conversion (imagebind_huge.pth audio keys)
# ---------------------------------------------------------------------------

def convert_imagebind_audio(state: Dict[str, np.ndarray],
                            cfg: ImageBindAudioConfig,
                            dtype=jnp.float32) -> Dict[str, Any]:
    def g(key):
        return np.asarray(state[key], np.float32)

    pre = "modality_preprocessors.audio"
    trunk = "modality_trunks.audio.blocks"
    L = cfg.num_blocks

    def stack(fmt, transpose=True):
        ws = [g(fmt.format(i=i)) for i in range(L)]
        return np.stack([w.T if transpose else w for w in ws])

    def stacked_dense(name):
        return {"w": stack(f"{trunk}.{{i}}.{name}.weight"),
                "b": stack(f"{trunk}.{{i}}.{name}.bias", transpose=False)}

    def stacked_ln(name):
        return {"scale": stack(f"{trunk}.{{i}}.{name}.weight",
                               transpose=False),
                "bias": stack(f"{trunk}.{{i}}.{name}.bias",
                              transpose=False)}

    params = {
        "patch_embedding": g(f"{pre}.rgbt_stem.proj.weight")
        .transpose(2, 3, 1, 0),  # [E,1,k,k] -> HWIO
        "stem_ln": {"scale": g(f"{pre}.rgbt_stem.norm_layer.weight"),
                    "bias": g(f"{pre}.rgbt_stem.norm_layer.bias")},
        "cls_token": g(f"{pre}.cls_token").reshape(-1),
        "position_embedding":
            g(f"{pre}.pos_embedding_helper.pos_embed")[0],
        "layers": {
            "norm1": stacked_ln("norm_1"),
            "norm2": stacked_ln("norm_2"),
            "in_proj": {
                "w": np.stack([g(f"{trunk}.{i}.attn.in_proj_weight").T
                               for i in range(L)]),
                "b": np.stack([g(f"{trunk}.{i}.attn.in_proj_bias")
                               for i in range(L)])},
            "bias_k": np.stack([g(f"{trunk}.{i}.attn.bias_k").reshape(-1)
                                for i in range(L)]),
            "bias_v": np.stack([g(f"{trunk}.{i}.attn.bias_v").reshape(-1)
                                for i in range(L)]),
            "out_proj": stacked_dense("attn.out_proj"),
            "fc1": stacked_dense("mlp.fc1"),
            "fc2": stacked_dense("mlp.fc2"),
        },
        "head_ln": {"scale": g("modality_heads.audio.0.weight"),
                    "bias": g("modality_heads.audio.0.bias")},
        "head_proj": g("modality_heads.audio.2.weight").T,
    }
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)


# ---------------------------------------------------------------------------
# Host processor (reference: data/data.py waveform2melspec + clip sampler)
# ---------------------------------------------------------------------------

class ImageBindAudioProcessor:
    """waveform -> [clips, 1, mels, target_len] normalized melspec."""

    def __init__(self, cfg: Optional[ImageBindAudioConfig] = None):
        self.cfg = cfg or ImageBindAudioConfig()

    def _clip_starts(self, duration: float):
        """pytorchvideo ConstantClipsPerVideoSampler semantics (the
        reference's sampler, ImageBind data.py:129): start_i =
        i * (duration - clip_duration) / clips_per_video — the divisor is
        clips_per_video, NOT clips-1 (endpoint-inclusive spacing sampled
        different waveform segments: 0/4/8 s instead of 0/2.67/5.33 s on
        a 10 s clip)."""
        c = self.cfg
        span = max(duration - c.clip_duration, 0.0)
        return [span * i / c.clips_per_audio
                for i in range(c.clips_per_audio)]

    def process_one(self, waveform: np.ndarray) -> np.ndarray:
        from ..data.audio_processing import kaldi_fbank
        c = self.cfg
        waveform = np.asarray(waveform, np.float32).reshape(-1)
        duration = len(waveform) / c.sample_rate
        clips = []
        for start in self._clip_starts(duration):
            s = int(start * c.sample_rate)
            e = int((start + c.clip_duration) * c.sample_rate)
            wclip = waveform[s:e]
            wclip = wclip - wclip.mean()  # reference: data.py:29
            fb = kaldi_fbank(wclip * (1 << 15), c.num_mel_bins,
                             c.sample_rate, window_type="hanning",
                             use_native=False)  # [T, mels]
            fb = fb.T  # [mels, T]
            p = c.target_len - fb.shape[1]
            if p > 0:
                fb = np.pad(fb, ((0, 0), (0, p)))
            elif p < 0:
                fb = fb[:, :c.target_len]
            clips.append(fb[None])  # [1, mels, target]
        out = np.stack(clips).astype(np.float32)
        return (out - c.norm_mean) / c.norm_std

    def __call__(self, waveforms) -> np.ndarray:
        if isinstance(waveforms, np.ndarray) and waveforms.ndim == 1:
            waveforms = [waveforms]
        return np.stack([self.process_one(w) for w in waveforms])


# ---------------------------------------------------------------------------
# Tower (encoder protocol; dispatched on 'VideoLLaMA' in the spec,
# reference: builder.py:92-95)
# ---------------------------------------------------------------------------

class ImageBindAudioTower:
    modality = "audio"

    def __init__(self, spec: str, model_cfg=None, rng=None,
                 params: Optional[Dict[str, Any]] = None,
                 dtype=jnp.float32):
        import functools
        import os

        cfg = ImageBindAudioConfig()
        if spec.startswith("imagebind-test:"):
            e, l = spec.split(":")[1].split("x")
            cfg = dataclasses.replace(cfg, embed_dim=int(e),
                                      num_blocks=int(l), num_heads=2,
                                      num_mel_bins=32, target_len=46,
                                      out_embed_dim=int(e))
        self.cfg = cfg
        self.spec = spec
        self.params = params
        self._dtype = dtype
        if self.params is None:
            ckpt = os.path.join(spec, "imagebind_huge.pth") \
                if os.path.isdir(spec) else spec
            if os.path.exists(ckpt):
                self.load_model(ckpt)
            else:
                self.params = init_imagebind_audio(
                    cfg, rng if rng is not None else jax.random.PRNGKey(0),
                    dtype)
        self._encode = jax.jit(functools.partial(imagebind_audio_features,
                                                 cfg=self.cfg))

    def load_model(self, ckpt_path: Optional[str] = None):
        from ..compose.state_io import load_state
        state = load_state(ckpt_path or self.spec)
        self.params = convert_imagebind_audio(state, self.cfg, self._dtype)

    @property
    def hidden_size(self) -> int:
        return self.cfg.out_embed_dim

    @property
    def feature_len(self) -> int:
        return self.cfg.clips_per_audio  # one embedding per clip

    @property
    def dummy_inputs(self) -> np.ndarray:
        c = self.cfg
        return np.zeros((1, c.clips_per_audio, 1, c.num_mel_bins,
                         c.target_len), np.float32)

    @property
    def modal_processor(self):
        return ImageBindAudioProcessor(self.cfg)

    def encode(self, melspec) -> jnp.ndarray:
        return self._encode(self.params, melspec=jnp.asarray(melspec))

    def __call__(self, melspec):
        return self.encode(melspec)
