"""Import the reference's splice code as a golden oracle (test-only).

The reference tree (/root/reference, read-only, public) has heavy native
deps (torchvision, decord, timm, ...) that aren't in this image.  A
meta-path auto-stubber fabricates MagicMock modules for those namespaces so
that `modelcompose.model.multimodal_arch` — pure torch — imports and its
`prepare_inputs_labels_for_multimodal` can be run as a golden oracle
against core/packing.py.

Only usable where /root/reference is mounted; tests skip otherwise.
"""

import importlib.abc
import importlib.machinery
import os
import sys
import types
from unittest.mock import MagicMock

REFERENCE_ROOT = "/root/reference"

_STUB_PREFIXES = (
    "torchvision", "decord", "easydict", "timm", "moviepy", "omegaconf",
    "librosa", "torchaudio", "pytorchvideo", "ftfy", "deepspeed",
    "flash_attn", "bitsandbytes", "xformers", "apex", "iopath",
    "pycocoevalcap", "pycocotools", "sentencepiece_stub",
)


class _AutoStubFinder(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    def find_spec(self, fullname, path=None, target=None):
        if any(fullname == p or fullname.startswith(p + ".")
               for p in _STUB_PREFIXES):
            return importlib.machinery.ModuleSpec(fullname, self,
                                                  is_package=True)
        return None

    def create_module(self, spec):
        m = MagicMock()
        m.__name__ = spec.name
        m.__path__ = []
        m.__spec__ = spec
        return m

    def exec_module(self, module):
        pass


_installed = False


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def load_reference_arch():
    """Return the reference's multimodal_arch module (or raise)."""
    global _installed
    if not _installed:
        sys.meta_path.insert(0, _AutoStubFinder())
        sys.path.insert(0, REFERENCE_ROOT)
        _shim_transformers()
        _shim_old_peft()
        _installed = True
    import modelcompose.model.multimodal_arch as arch
    return arch


def _shim_old_peft():
    """The reference subclasses peft<=0.4's ``lora.Linear`` (positional
    adapter_name/in/out signature, lora_A/B ModuleDicts); peft 0.19 changed
    the API.  Install a minimal old-API base class so LocalLoraLinear
    constructs and its forward math can be golden-tested."""
    import math

    import torch
    import torch.nn as nn
    import peft.tuners.lora as lora_mod

    class OldPeftLoraLinear(nn.Linear):
        def __init__(self, adapter_name, in_features, out_features, r=0,
                     lora_alpha=1, lora_dropout=0.0, fan_in_fan_out=False,
                     is_target_conv_1d_layer=False, **kwargs):
            # old peft forwarded nn.Linear kwargs (the reference model
            # passes bias=False)
            nn.Linear.__init__(self, in_features, out_features,
                               bias=kwargs.pop("bias", True))
            self.fan_in_fan_out = fan_in_fan_out
            self.lora_A = nn.ModuleDict()
            self.lora_B = nn.ModuleDict()
            self.lora_dropout = nn.ModuleDict()
            self.scaling = {}
            self.r = {}
            self.update_layer(adapter_name, r, lora_alpha, lora_dropout,
                              kwargs.get("init_lora_weights", True))

        def update_layer(self, adapter_name, r, lora_alpha, lora_dropout,
                         init_lora_weights=True):
            self.r[adapter_name] = r
            self.lora_A[adapter_name] = nn.Linear(self.in_features, r,
                                                  bias=False)
            self.lora_B[adapter_name] = nn.Linear(r, self.out_features,
                                                  bias=False)
            self.lora_dropout[adapter_name] = (
                nn.Dropout(lora_dropout) if lora_dropout > 0
                else nn.Identity())
            self.scaling[adapter_name] = lora_alpha / r
            if init_lora_weights:
                self.reset_lora_parameters(adapter_name)

        def reset_lora_parameters(self, adapter_name):
            nn.init.kaiming_uniform_(self.lora_A[adapter_name].weight,
                                     a=math.sqrt(5))
            nn.init.zeros_(self.lora_B[adapter_name].weight)

    lora_mod.Linear = OldPeftLoraLinear


def _shim_transformers():
    """The vendored languagebind imports private helpers that newer
    transformers removed; inject no-op compat shims (never executed by the
    splice oracle)."""
    # the reference registers 'llava'/'multimodal' AutoConfig keys; modern
    # transformers ships its own 'llava' — force exist_ok on registration
    import functools

    from transformers.models.auto import configuration_auto, modeling_auto

    def force_exist_ok(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            kwargs["exist_ok"] = True
            return fn(*args, **kwargs)
        return wrapper

    configuration_auto.AutoConfig.register = staticmethod(
        force_exist_ok(configuration_auto.AutoConfig.register))
    modeling_auto.AutoModelForCausalLM.register = staticmethod(
        force_exist_ok(modeling_auto.AutoModelForCausalLM.register))

    import transformers.models.bloom.modeling_bloom as mb
    import transformers.models.clip.modeling_clip as mc
    import transformers.models.gpt_neox.modeling_gpt_neox as mn
    import transformers.models.llama.modeling_llama as ml
    import transformers.models.opt.modeling_opt as mo
    for mod in (mc, mb, mn, ml, mo):
        for name in ("_expand_mask", "_make_causal_mask"):
            if not hasattr(mod, name):
                setattr(mod, name, lambda *a, **k: None)
    # the reference does `from ...modeling_llama import *` and uses names
    # that new transformers no longer star-exports
    import transformers.modeling_outputs as outputs_mod
    for name in ("BaseModelOutputWithPast", "CausalLMOutputWithPast",
                 "SequenceClassifierOutputWithPast"):
        if not hasattr(ml, name):
            setattr(ml, name, getattr(outputs_mod, name))
        if hasattr(ml, "__all__") and name not in ml.__all__:
            ml.__all__ = list(ml.__all__) + [name]
    for name in ("LLAMA_INPUTS_DOCSTRING", "_CONFIG_FOR_DOC"):
        if not hasattr(ml, name):
            setattr(ml, name, "")
            if hasattr(ml, "__all__"):
                ml.__all__ = list(ml.__all__) + [name]
    for helper in ("add_start_docstrings_to_model_forward",
                   "replace_return_docstrings"):
        if not hasattr(ml, helper):
            setattr(ml, helper, lambda *a, **k: (lambda f: f))
            if hasattr(ml, "__all__"):
                ml.__all__ = list(ml.__all__) + [helper]
    import transformers.modeling_utils as mu
    if not hasattr(mu, "get_parameter_device"):
        mu.get_parameter_device = lambda m: "cpu"
    if not hasattr(mu, "get_parameter_dtype"):
        import torch
        mu.get_parameter_dtype = lambda m: torch.float32
    # helpers relocated to transformers.pytorch_utils in newer versions
    try:
        import transformers.pytorch_utils as pu
        for name in ("apply_chunking_to_forward",
                     "find_pruneable_heads_and_indices",
                     "prune_linear_layer"):
            if not hasattr(mu, name) and hasattr(pu, name):
                setattr(mu, name, getattr(pu, name))
            elif not hasattr(mu, name):
                setattr(mu, name, lambda *a, **k: None)
    except ImportError:
        pass


def load_reference_llama():
    """Return the reference's full-model module
    (``modelcompose.model.language_model.multimodal_llama``) runnable under
    the installed (much newer) transformers.

    The reference was written against transformers 4.31 semantics via
    ``from ...modeling_llama import *``; names whose semantics changed
    (rotary embedding signature, apply_rotary_pos_emb position gather, the
    removed ``_prepare_decoder_attention_mask``) are injected into the
    *reference module's namespace only* — the real modeling_llama is left
    untouched so HF-parity tests in the same process stay valid."""
    load_reference_arch()  # install finders + shared shims

    import math as _math
    import types

    import torch
    import torch.nn as nn

    if "transformers.deepspeed" not in sys.modules:
        ds = types.ModuleType("transformers.deepspeed")
        ds.is_deepspeed_zero3_enabled = lambda: False
        sys.modules["transformers.deepspeed"] = ds
        import transformers
        transformers.deepspeed = ds

    import modelcompose.model.language_model.multimodal_llama as mm

    class OldRotary(nn.Module):
        """transformers-4.31 LlamaRotaryEmbedding semantics: built from
        (dim, max_position_embeddings, base); forward(x, seq_len) returns
        cos/sin [1, 1, seq, dim]."""

        def __init__(self, dim=None, max_position_embeddings=2048,
                     base=10000, device=None, config=None):
            super().__init__()
            if config is not None and dim is None:
                dim = config.hidden_size // config.num_attention_heads
            self.inv_freq = 1.0 / (base ** (
                torch.arange(0, dim, 2, dtype=torch.float32) / dim))

        def forward(self, x, seq_len=None):
            t = torch.arange(seq_len, dtype=torch.float32)
            freqs = torch.einsum("i,j->ij", t, self.inv_freq)
            emb = torch.cat((freqs, freqs), dim=-1)
            return (emb.cos()[None, None].to(x.dtype),
                    emb.sin()[None, None].to(x.dtype))

    def _rotate_half(x):
        x1 = x[..., : x.shape[-1] // 2]
        x2 = x[..., x.shape[-1] // 2:]
        return torch.cat((-x2, x1), dim=-1)

    def old_apply_rotary_pos_emb(q, k, cos, sin, position_ids):
        cos = cos.squeeze(1).squeeze(0)[position_ids].unsqueeze(1)
        sin = sin.squeeze(1).squeeze(0)[position_ids].unsqueeze(1)
        return (q * cos) + (_rotate_half(q) * sin), \
               (k * cos) + (_rotate_half(k) * sin)

    def _old_repeat_kv(hidden_states, n_rep):
        if n_rep == 1:
            return hidden_states
        b, h, s, d = hidden_states.shape
        return hidden_states[:, :, None].expand(
            b, h, n_rep, s, d).reshape(b, h * n_rep, s, d)

    def _prepare_decoder_attention_mask(self, attention_mask, input_shape,
                                        inputs_embeds, past_kv_length):
        """4.31 LlamaModel mask builder: additive causal mask + key-padding
        expansion, large-negative fill."""
        dtype = inputs_embeds.dtype
        bsz, tgt_len = input_shape
        min_val = torch.finfo(dtype).min
        combined = None
        if tgt_len > 1:
            mask = torch.full((tgt_len, tgt_len), min_val, dtype=dtype)
            mask_cond = torch.arange(tgt_len)
            mask.masked_fill_(
                mask_cond < (mask_cond + 1).view(tgt_len, 1), 0.0)
            if past_kv_length > 0:
                mask = torch.cat(
                    [torch.zeros(tgt_len, past_kv_length, dtype=dtype),
                     mask], dim=-1)
            combined = mask[None, None].expand(
                bsz, 1, tgt_len, tgt_len + past_kv_length)
        if attention_mask is not None:
            src_len = attention_mask.shape[-1]
            expanded = attention_mask[:, None, None, :].expand(
                bsz, 1, tgt_len, src_len).to(dtype)
            inverted = (1.0 - expanded).masked_fill(
                (1.0 - expanded).bool(), min_val)
            combined = inverted if combined is None else inverted + combined
        return combined

    mm.math = _math
    mm.LlamaRotaryEmbedding = OldRotary
    mm.apply_rotary_pos_emb = old_apply_rotary_pos_emb
    if not hasattr(mm, "repeat_kv"):
        try:
            from transformers.models.llama.modeling_llama import repeat_kv
            mm.repeat_kv = repeat_kv
        except ImportError:
            mm.repeat_kv = _old_repeat_kv
    if not hasattr(mm, "LlamaRMSNorm"):
        from transformers.models.llama.modeling_llama import LlamaRMSNorm
        mm.LlamaRMSNorm = LlamaRMSNorm
    if not hasattr(mm, "ACT2FN"):
        from transformers.activations import ACT2FN
        mm.ACT2FN = ACT2FN
    if not hasattr(mm, "logger"):
        import logging
        mm.logger = logging.getLogger("reference_oracle")
        if not hasattr(mm.logger, "warning_once"):
            mm.logger.warning_once = mm.logger.warning
    mm.MultimodalLlamaModel._prepare_decoder_attention_mask = \
        _prepare_decoder_attention_mask
    return mm


def _shim_timm():
    """eva_vit_model needs three real timm helpers (to_2tuple, drop_path,
    trunc_normal_) that the MagicMock auto-stub cannot play; pre-seed
    sys.modules with a minimal real implementation (sys.modules wins over
    the meta-path finder)."""
    import torch

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def drop_path(x, drop_prob=0.0, training=False, scale_by_keep=True):
        return x  # oracle runs eval-mode only

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(mean + a * std, mean + b * std)
        return tensor

    layers = types.ModuleType("timm.models.layers")
    layers.to_2tuple = to_2tuple
    layers.drop_path = drop_path
    layers.trunc_normal_ = trunc_normal_
    models = types.ModuleType("timm.models")
    models.layers = layers
    timm = types.ModuleType("timm")
    timm.models = models
    timm.layers = layers
    for name, mod in (("timm", timm), ("timm.models", models),
                      ("timm.models.layers", layers),
                      ("timm.layers", layers)):
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None,
                                                      is_package=True)
        mod.__path__ = []
        sys.modules[name] = mod


def load_reference_eva():
    """Return the reference's EVA ViT module (eva_clip/eva_vit_model.py)
    with real timm helpers shimmed in."""
    _shim_timm()
    load_reference_arch()
    import modelcompose.model.multimodal_encoder.eva_clip.eva_vit_model \
        as eva
    return eva
