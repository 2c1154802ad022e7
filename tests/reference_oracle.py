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
            nn.Linear.__init__(self, in_features, out_features, bias=True)
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
