"""Training checkpoints: step state save/resume + reference-format exports.

Rebuilds the reference's checkpoint surface (reference: modelcompose/train/
train_multimodal.py:142-234, 497-524 and SURVEY.md §5):

- step checkpoints under ``{output_dir}/checkpoint-{step}/`` with
  auto-resume from the newest one,
- final **adapter_model.safetensors** (+ .bin when torch importable) in the
  reference key layout (LoRA A/B per adapter + projectors + prefix/suffix),
- stage-1 **mm_projector.safetensors** (``tune_mm_mlp_adapter`` path:
  projector weights keyed ``model.modal_projectors.{modal}.*``),
- the model config.json alongside.

Step state (params + optimizer moments + step) is stored as a flattened
safetensors tree — no orbax dependency, restore-friendly across processes.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..compose.convert import params_to_adapter, projector_to_reference
from ..compose.state_io import save_state, load_state
from ..config import ModelConfig


# ---------------------------------------------------------------------------
# Pytree <-> flat dict
# ---------------------------------------------------------------------------

def flatten_tree(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        key = prefix + jax.tree_util.keystr(path)
        out[key] = np.asarray(leaf)
    return out


def unflatten_like(template, flat: Dict[str, np.ndarray], prefix: str = ""):
    """Restored leaves stay HOST numpy arrays: jnp.asarray here would
    allocate a full second state copy on the default device while the
    template state is still live — 2x ~10 GB at the 7B stage-2 geometry,
    RESOURCE_EXHAUSTED at restore on a 16 GB chip.  Device placement
    happens at the caller's _replace_like (sharded leaves) or lazily on
    first jit consume."""
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        key = prefix + jax.tree_util.keystr(path)
        arr = flat[key]
        leaves.append(np.asarray(arr, leaf.dtype)
                      if hasattr(leaf, "dtype") else np.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ---------------------------------------------------------------------------
# Step checkpoints
# ---------------------------------------------------------------------------

def save_step_checkpoint(output_dir: str, step: int, state) -> str:
    ckpt_dir = os.path.join(output_dir, f"checkpoint-{step}")
    os.makedirs(ckpt_dir, exist_ok=True)
    save_state(flatten_tree(state.params, "params"),
               os.path.join(ckpt_dir, "train_params.safetensors"))
    save_state(flatten_tree(state.opt_state, "opt"),
               os.path.join(ckpt_dir, "opt_state.safetensors"))
    with open(os.path.join(ckpt_dir, "trainer_state.json"), "w") as f:
        json.dump({"step": int(state.step)}, f)
    return ckpt_dir


def latest_checkpoint(output_dir: str) -> Optional[str]:
    """reference: train_multimodal.py:497-500 — auto-resume if any
    checkpoint-* exists."""
    cands = glob.glob(os.path.join(output_dir, "checkpoint-*"))
    steps = []
    for c in cands:
        m = re.match(r".*checkpoint-(\d+)$", c)
        if m:
            steps.append((int(m.group(1)), c))
    return max(steps)[1] if steps else None


def restore_step_checkpoint(ckpt_dir: str, state):
    params = unflatten_like(
        state.params,
        load_state(os.path.join(ckpt_dir, "train_params.safetensors")),
        "params")
    opt = unflatten_like(
        state.opt_state,
        load_state(os.path.join(ckpt_dir, "opt_state.safetensors")), "opt")
    with open(os.path.join(ckpt_dir, "trainer_state.json")) as f:
        step = json.load(f)["step"]
    return type(state)(params=params, opt_state=opt,
                       step=jnp.asarray(step, jnp.int32))


# ---------------------------------------------------------------------------
# Final exports (reference formats)
# ---------------------------------------------------------------------------

def save_adapter_checkpoint(output_dir: str, cfg: ModelConfig,
                            backbone_params, projector_params) -> None:
    """Stage-2 DAMC export (reference: train_multimodal.py:516-521)."""
    os.makedirs(output_dir, exist_ok=True)
    adapter = params_to_adapter(backbone_params, cfg,
                                projector_params=projector_params)
    save_state(adapter, os.path.join(output_dir,
                                     "adapter_model.safetensors"))
    try:
        save_state(adapter, os.path.join(output_dir, "adapter_model.bin"))
    except ImportError:
        pass
    cfg.save(os.path.join(output_dir, "config.json"))


def save_full_checkpoint(output_dir: str, cfg: ModelConfig,
                         backbone_params, projector_params) -> None:
    """Full-finetune export (lora_strategy absent — the legacy recipe
    where every backbone weight trains, reference scripts/finetune.sh
    saving the whole model): the BASE weights go out as an HF-Llama
    ``model.safetensors`` (reloadable as a --model_name_or_path /
    model_base), alongside the usual adapter/projector file."""
    from ..compose.convert import params_to_hf_llama
    os.makedirs(output_dir, exist_ok=True)
    state = params_to_hf_llama(backbone_params, cfg)
    save_state(state, os.path.join(output_dir, "model.safetensors"))
    save_adapter_checkpoint(output_dir, cfg, backbone_params,
                            projector_params)


def save_projector_checkpoint(output_dir: str, cfg: ModelConfig,
                              projector_params) -> None:
    """Stage-1 projector-only export (reference:
    train_multimodal.py:212-234 / llava_trainer.py:331-350)."""
    os.makedirs(output_dir, exist_ok=True)
    flat: Dict[str, np.ndarray] = {}
    for modal, tree in projector_params.items():
        flat.update(projector_to_reference(
            cfg.projector_type(modal), tree,
            f"model.modal_projectors.{modal}"))
    save_state(flat, os.path.join(output_dir, "mm_projector.safetensors"))
    try:
        save_state(flat, os.path.join(output_dir, "mm_projector.bin"))
    except ImportError:
        pass
    cfg.save(os.path.join(output_dir, "config.json"))
