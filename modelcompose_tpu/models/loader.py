"""Model lifecycle: load composed checkpoints into a runnable MultimodalLM.

Rebuild of the reference's ``load_pretrained_model`` dispatch (reference:
modelcompose/model/builder.py:27-231, 'multimodal' + model_base path):
merged ``config.json`` from the composition checkpoint, Vicuna base weights
from ``model_base``, adapter overlay (``adapter_model.*``, fallback
``mm_projector.*``, optional ``non_lora_trainables.*``), then towers built
per config.  Returns ``(tokenizer, model, modal_processors, context_len)``.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, Optional

import numpy as np

from ..compose.convert import hf_llama_to_params, load_adapter_into_params
from ..compose.state_io import load_adapter_dir, load_state
from ..config import ModelConfig
from .model import MultimodalLM
from .projectors import init_projector
from .towers import build_modal_encoders


def load_hf_llama_dir(model_dir: str) -> Dict[str, np.ndarray]:
    """Load a flat HF Llama state dict from sharded safetensors / torch
    bins, honoring the HF shard index when present (the layout released
    Vicuna checkpoints use: ``pytorch_model-0000x-of-0000y.bin`` +
    ``pytorch_model.bin.index.json`` with a ``weight_map``; reference load
    path: model/builder.py:140-148 via HF from_pretrained)."""
    state: Dict[str, np.ndarray] = {}
    for index_name in ("model.safetensors.index.json",
                       "pytorch_model.bin.index.json"):
        index_path = os.path.join(model_dir, index_name)
        if os.path.exists(index_path):
            with open(index_path) as f:
                weight_map = json.load(f)["weight_map"]
            for shard in sorted(set(weight_map.values())):
                state.update(load_state(os.path.join(model_dir, shard)))
            missing = set(weight_map) - set(state)
            if missing:
                raise KeyError(
                    f"shard index {index_name} lists keys absent from its "
                    f"shards: {sorted(missing)[:3]}...")
            return state
    st_files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if st_files:
        for p in st_files:
            state.update(load_state(p))
        return state
    bin_files = sorted(glob.glob(os.path.join(model_dir,
                                              "pytorch_model*.bin")))
    if bin_files:
        for p in bin_files:
            state.update(load_state(p))
        return state
    npz = os.path.join(model_dir, "model.npz")
    if os.path.exists(npz):
        return load_state(npz)
    raise FileNotFoundError(f"no base model weights under {model_dir}")


def load_tokenizer(model_base: str):
    from transformers import AutoTokenizer
    tok = AutoTokenizer.from_pretrained(model_base, use_fast=False)
    return tok


def load_pretrained_model(model_path: str, model_base: Optional[str],
                          model_name: Optional[str] = None,
                          load_tokenizer_fn=None,
                          load_8bit: bool = False,
                          fold_decode_dense: bool = False,
                          tp: int = 1):
    """'multimodal' checkpoints need model_base (reference rule:
    README.md:96 — basename must contain 'multimodal').

    load_8bit quantizes the backbone weight-only int8 AFTER the adapter
    overlay (the role bitsandbytes' load_in_8bit plays in the reference,
    reference: model/builder.py:27-39 — here per-output-channel symmetric
    so weights stream from HBM as int8).  fold_decode_dense additionally
    folds the default-route adapter mix into W and rebases the routing
    table (ops/routed_lora.fold_dense) — the production serving setup.
    tp > 1 shards the backbone Megatron-style over ``tp`` devices on a
    (1, tp) mesh (parallel/mesh.param_pspecs) so serving runs
    tensor-parallel over ICI; generation is mesh-invariant
    (tests/test_multichip_decode.py, driver decode_mesh_check)."""
    model_name = model_name or os.path.basename(model_path.rstrip("/"))
    if "multimodal" not in model_name.lower():
        raise ValueError(
            f"model name {model_name!r} must contain 'multimodal' "
            "(reference: model/builder.py:138)")
    if model_base is None:
        raise ValueError("composed checkpoints require --model-base "
                         "(the Vicuna base)")

    with open(os.path.join(model_path, "config.json")) as f:
        cfg = ModelConfig.from_dict(json.load(f))

    base_state = load_hf_llama_dir(model_base)
    params = hf_llama_to_params(base_state, cfg)
    del base_state

    # LoRA freshly zero/kaiming-init then overlaid (reference:
    # builder.py:150-163, strict=False).
    projector_params: Dict[str, dict] = {}
    adapter = load_adapter_dir(model_path)
    leftovers = load_adapter_into_params(params, adapter, cfg,
                                         projector_params)
    non_lora = os.path.join(model_path, "non_lora_trainables.bin")
    if os.path.exists(non_lora):
        extra = load_state(non_lora)
        extra = {k.replace("base_model.model.", "", 1): v
                 for k, v in extra.items()}
        leftovers += load_adapter_into_params(params, extra, cfg,
                                              projector_params)
    if leftovers:
        print(f"[loader] {len(leftovers)} unconsumed adapter keys "
              f"(first: {leftovers[:3]})")

    encoders = build_modal_encoders(cfg)
    import jax
    for modal in cfg.modalities():
        if modal not in projector_params:
            projector_params[modal] = init_projector(
                cfg.projector_type(modal), jax.random.PRNGKey(0),
                encoders[modal].hidden_size, cfg.hidden_size)

    model = MultimodalLM(cfg, params, encoders, projector_params)
    if load_8bit:
        from ..ops.quant import quantize_backbone
        model.params = quantize_backbone(model.params)
    if fold_decode_dense:
        import jax

        from ..ops.routed_lora import fold_dense
        # jit + donation so old/new weight buffers alias — the eager fold
        # would hold both trees plus fp32 transients and exceed HBM at 7B
        # (the loader owns model.params here, so donating is safe)
        folded, table = jax.jit(fold_dense, donate_argnums=(0,))(
            model.params, jax.numpy.asarray(model.routing_table))
        model.params = folded
        model.routing_table = np.asarray(table)
    if tp > 1:
        from ..parallel.mesh import make_mesh, shard_params
        if len(jax.devices()) < tp:
            raise ValueError(
                f"--tp {tp} needs {tp} devices, have {len(jax.devices())}")
        mesh = make_mesh(data=1, model=tp)
        model.params = shard_params(model.params, mesh)
    if load_tokenizer_fn is None:
        load_tokenizer_fn = load_tokenizer  # late-bound for test injection
    tokenizer = load_tokenizer_fn(model_base) if model_base else None
    context_len = 2048  # reference: builder.py:226-229
    return tokenizer, model, model.modal_processors(), context_len
