"""Modality encoder towers — the duck-typed encoder protocol.

Mirrors the reference's encoder protocol (``forward``, ``hidden_size``,
``modal_processor``, ``dummy_inputs``, ``load_model`` — reference:
modelcompose/model/multimodal_encoder/builder.py:86-116 and SURVEY.md §2.2)
as thin JAX wrapper objects: each tower owns a frozen param pytree and a
jitted ``encode``.  Towers are *frozen at train time* exactly like the
reference (``jax.lax.stop_gradient`` on their outputs happens in the model).

``build_modal_encoders(cfg, rng)`` instantiates one tower per configured
modality.  Random-init mode (no checkpoint path on disk) is used by tests
and benchmarks; real checkpoints load through each tower's converter.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from .vision_clip import (ClipVisionConfig, clip_vision_features,
                          convert_hf_clip_vision, init_clip_vision)


class ClipVisionTower:
    """Image tower (reference: clip_encoder.py CLIPVisionTower).

    Output: [B, 576, 1024] patch features for ViT-L/14-336 layer -2.
    """

    modality = "vision"

    def __init__(self, spec: str, model_cfg: ModelConfig,
                 rng=None, params: Optional[Dict[str, Any]] = None,
                 dtype=jnp.float32):
        # Tiny towers for tests are requested with spec "test:<h>x<l>".
        if spec.startswith("test:"):
            h, l = spec.split(":")[1].split("x")
            self.cfg = ClipVisionConfig(
                hidden_size=int(h), intermediate_size=2 * int(h),
                num_hidden_layers=int(l), num_attention_heads=4,
                image_size=28, patch_size=14,
                select_layer=model_cfg.mm_vision_select_layer,
                select_feature=model_cfg.mm_vision_select_feature)
        elif "LanguageBind_Image" in spec:
            # alternate image tower: LanguageBind image CLIP, ViT-L/14-224,
            # 256 patch tokens (reference: multimodal_encoder/
            # builder.py:81-82, languagebind/__init__.py:94-176).
            # LanguageBind weights are OpenCLIP-derived exact-GELU (their
            # released config.json, same as the video tower) — NOT the
            # openai quick_gelu this class defaults to.
            self.cfg = ClipVisionConfig(
                image_size=224, hidden_act="gelu",
                select_layer=model_cfg.mm_vision_select_layer,
                select_feature=model_cfg.mm_vision_select_feature)
        else:
            self.cfg = ClipVisionConfig(
                select_layer=model_cfg.mm_vision_select_layer,
                select_feature=model_cfg.mm_vision_select_feature)
        self.spec = spec
        self.params = params
        self._dtype = dtype
        if self.params is None:
            if os.path.isdir(spec):
                self.load_model()
            else:
                self.params = init_clip_vision(
                    self.cfg, rng if rng is not None else jax.random.PRNGKey(0),
                    dtype)
        self._encode = jax.jit(functools.partial(
            clip_vision_features, cfg=self.cfg))

    def load_model(self):
        """Load HF CLIPVisionModel weights from ``self.spec`` directory
        (safetensors or torch bin), mirroring the reference's delay-load
        (reference: clip_encoder.py:19-28, 54-58)."""
        from ..compose.state_io import load_state
        for name in ("model.safetensors", "pytorch_model.bin"):
            p = os.path.join(self.spec, name)
            if os.path.exists(p):
                state = load_state(p)
                self.params = convert_hf_clip_vision(state, self.cfg,
                                                     self._dtype)
                return
        raise FileNotFoundError(f"no CLIP weights under {self.spec}")

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
        """pixels: [B, H, W, 3] normalized -> [B, T, hidden]."""
        return self._encode(self.params, pixels=jnp.asarray(pixels))

    def __call__(self, pixels):
        return self.encode(pixels)


def build_modal_encoders(cfg: ModelConfig, rng=None, dtype=None,
                         dtype_per_modal=None) -> Dict[str, Any]:
    """reference: multimodal_encoder/builder.py:86-116.

    ``dtype`` (optional) sets every tower's parameter dtype.  Frozen
    towers in the training pipeline run bfloat16: features are
    stop-gradient'd into a bfloat16 projector anyway, params take half
    the HBM, and the compiled train step then matches the bf16-feature
    device-floor program exactly (fp32 features compile a *different,
    slower* step — measured +10% step time at stage-1 b16).

    ``dtype_per_modal`` overrides ``dtype`` for named modalities — a
    TRAINED tower keeps float32 master weights while the frozen towers
    beside it still honor ``dtype`` (forcing every tower fp32 doubles
    frozen-tower HBM on a chip already at the memory edge).
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    encoders: Dict[str, Any] = {}
    for modal in cfg.modalities():
        mdt = (dtype_per_modal or {}).get(modal, dtype)
        kw = {} if mdt is None else {"dtype": mdt}
        spec = cfg.encoder_spec(modal)
        if isinstance(spec, str) and "test" not in spec \
                and not os.path.isdir(spec):
            # Composed checkpoints store HF hub ids (e.g. 'openai/
            # clip-vit-large-patch14-336'); this zero-egress build can't
            # download, so the tower falls back to RANDOM init — loud
            # warning, or serving silently returns garbage answers.
            import warnings
            warnings.warn(
                f"{modal} encoder spec {spec!r} is not a local directory "
                "— tower weights will be RANDOM-initialized.  Download "
                "the encoder and point the spec at its local path.",
                stacklevel=2)
        rng, sub = jax.random.split(rng)
        if modal == "vision":
            if "eva" in spec.lower():
                # reference dispatch rule: clip_encoder.py:22
                from .vision_eva import EvaVisionTower
                encoders[modal] = EvaVisionTower(spec, cfg, rng=sub, **kw)
            else:
                encoders[modal] = ClipVisionTower(spec, cfg, rng=sub, **kw)
        elif modal == "audio":
            if "VideoLLaMA" in spec or "imagebind" in spec.lower():
                # reference dispatch rule: builder.py:92-95
                from .audio_imagebind import ImageBindAudioTower
                encoders[modal] = ImageBindAudioTower(spec, cfg, rng=sub,
                                                      **kw)
            else:
                from .audio_beats import BeatsAudioTower
                encoders[modal] = BeatsAudioTower(spec, cfg, rng=sub, **kw)
        elif modal == "video":
            from .video_languagebind import LanguageBindVideoTower
            encoders[modal] = LanguageBindVideoTower(spec, cfg, rng=sub,
                                                     **kw)
        elif modal == "point":
            from .point_bert import PointBertTower
            encoders[modal] = PointBertTower(spec, cfg, rng=sub, **kw)
        else:
            raise ValueError(f"unknown modality {modal!r}")
    return encoders
