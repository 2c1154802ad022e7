"""Checkpoint conversion: reference torch key layout <-> stacked JAX pytree.

The reference stores (a) the Vicuna base as HF Llama shards, (b) trainables
as a flat ``adapter_model.bin`` whose keys come from
``named_parameters()`` of ``MultimodalLlamaForCausalLM`` (reference:
modelcompose/train/train_multimodal.py:516-521):

    model.layers.{i}.self_attn.{q,k,v,o}_proj.lora_{A,B}.{adapter}.weight
    model.layers.{i}.mlp.{gate,up,down}_proj.lora_{A,B}.{adapter}.weight
    model.modal_projectors.{modal}.<projector-local keys>
    prefix_tokens.{modal} / suffix_tokens.{modal}        [1, P, H]

torch ``nn.Linear`` stores weight as [out, in]; the JAX pytree uses
[in, out], LoRA A as [in, r] and B as [r, out], with the per-layer axis
stacked in front and the adapter axis stacked per ``cfg.adapter_names()``.
All conversion is numpy on host; nothing here is traced.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional

import numpy as np

from ..config import ModelConfig
from ..models.projectors import parse_spec

ATTN_MAP = {"q_proj": "q", "k_proj": "k", "v_proj": "v", "o_proj": "o"}
MLP_MAP = {"gate_proj": "gate", "up_proj": "up", "down_proj": "down"}


def _np(x, dtype=np.float32):
    return np.asarray(x, dtype)


# ---------------------------------------------------------------------------
# HF Llama base -> stacked pytree
# ---------------------------------------------------------------------------

def hf_llama_to_params(state: Dict[str, np.ndarray], cfg: ModelConfig,
                       dtype=None) -> Dict[str, Any]:
    """Convert a flat HF Llama state dict (torch [out, in] layout) into the
    stacked-decoder pytree of core/llama.py.  LoRA tensors are zero-initialized
    (B must be zero anyway; A is overlaid by load_adapter_into_params)."""
    import jax.numpy as jnp
    N, A, r = cfg.num_hidden_layers, len(cfg.adapter_names()), cfg.lora_r
    H, I = cfg.hidden_size, cfg.intermediate_size
    kv_out = cfg.num_key_value_heads * cfg.head_dim

    def stack(fmt, transpose=True):
        ws = []
        for i in range(N):
            w = _np(state[fmt.format(i=i)])
            ws.append(w.T if transpose else w)
        return np.stack(ws)

    def linear(name, d_in, d_out):
        return {
            "w": stack(f"model.layers.{{i}}.{name}.weight"),
            "lora_a": np.zeros((N, A, d_in, r), np.float32),
            "lora_b": np.zeros((N, A, r, d_out), np.float32),
        }

    params = {
        "embed_tokens": _np(state["model.embed_tokens.weight"]),
        "layers": {
            "input_layernorm": stack(
                "model.layers.{i}.input_layernorm.weight", transpose=False),
            "post_attention_layernorm": stack(
                "model.layers.{i}.post_attention_layernorm.weight",
                transpose=False),
            "attn": {
                "q": linear("self_attn.q_proj", H, H),
                "k": linear("self_attn.k_proj", H, kv_out),
                "v": linear("self_attn.v_proj", H, kv_out),
                "o": linear("self_attn.o_proj", H, H),
            },
            "mlp": {
                "gate": linear("mlp.gate_proj", H, I),
                "up": linear("mlp.up_proj", H, I),
                "down": linear("mlp.down_proj", I, H),
            },
        },
        "norm": _np(state["model.norm.weight"]),
        "lm_head": _np(state["lm_head.weight"]).T,
    }
    import jax
    target = jnp.dtype(dtype or cfg.dtype)
    return jax.tree.map(lambda x: jnp.asarray(x, target), params)


def params_to_hf_llama(params, cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """Inverse of hf_llama_to_params for the BASE weights: a flat HF Llama
    state dict (torch [out, in] layout) from the stacked pytree.  Used by
    the full-finetune export — adapters/projectors go through
    params_to_adapter separately.  Roundtrip-exact with
    hf_llama_to_params (tests/test_convert.py)."""
    N = cfg.num_hidden_layers
    lp = params["layers"]
    out: Dict[str, np.ndarray] = {
        "model.embed_tokens.weight": np.asarray(params["embed_tokens"]),
        "model.norm.weight": np.asarray(params["norm"]),
        "lm_head.weight": np.asarray(params["lm_head"]).T,
    }
    names = {("attn", "q"): "self_attn.q_proj",
             ("attn", "k"): "self_attn.k_proj",
             ("attn", "v"): "self_attn.v_proj",
             ("attn", "o"): "self_attn.o_proj",
             ("mlp", "gate"): "mlp.gate_proj",
             ("mlp", "up"): "mlp.up_proj",
             ("mlp", "down"): "mlp.down_proj"}
    for i in range(N):
        out[f"model.layers.{i}.input_layernorm.weight"] = \
            np.asarray(lp["input_layernorm"][i])
        out[f"model.layers.{i}.post_attention_layernorm.weight"] = \
            np.asarray(lp["post_attention_layernorm"][i])
        for (grp, name), hf in names.items():
            out[f"model.layers.{i}.{hf}.weight"] = \
                np.asarray(lp[grp][name]["w"][i]).T
    return out


# ---------------------------------------------------------------------------
# Projector key mapping (reference: multimodal_projector/builder.py)
# ---------------------------------------------------------------------------

def _dense_from(state, prefix):
    return {"w": _np(state[f"{prefix}.weight"]).T,
            "b": _np(state[f"{prefix}.bias"])}


def _ln_from(state, prefix):
    return {"scale": _np(state[f"{prefix}.weight"]),
            "bias": _np(state[f"{prefix}.bias"])}


def projector_from_reference(spec: str, state: Dict[str, np.ndarray],
                             prefix: str) -> Dict[str, Any]:
    """Extract one projector's params from reference-layout keys rooted at
    ``prefix`` (e.g. ``model.modal_projectors.vision``)."""
    kind = parse_spec(spec)
    if kind["kind"] == "identity":
        return {}
    if kind["kind"] == "linear":
        return {"layers": [_dense_from(state, prefix)]}
    if kind["kind"] == "mlp":
        # nn.Sequential: Linear at index 0, GELUs odd, Linears even
        layers = [_dense_from(state, f"{prefix}.0")]
        for d in range(1, kind["depth"]):
            layers.append(_dense_from(state, f"{prefix}.{2 * d}"))
        return {"layers": layers}
    # qformer — VideoLlamaAudioQformer key layout (reference:
    # builder.py:111-128 + the vendored Qformer.py BERT module tree)
    qf = f"{prefix}.audio_Qformer.bert"
    params: Dict[str, Any] = {
        "query_tokens": _np(state[f"{prefix}.audio_query_tokens"])[0],
        "position_embedding": _np(
            state[f"{prefix}.audio_position_embedding.weight"]),
        "embeddings_ln": _ln_from(state, f"{qf}.embeddings.LayerNorm"),
        "llama_proj": _dense_from(state, f"{prefix}.audio_llama_proj"),
        "layers": [],
    }
    for l in range(kind["n_layers"]):
        lp = f"{qf}.encoder.layer.{l}"
        params["layers"].append({
            "self": {
                "q": _dense_from(state, f"{lp}.attention.self.query"),
                "k": _dense_from(state, f"{lp}.attention.self.key"),
                "v": _dense_from(state, f"{lp}.attention.self.value"),
                "o": _dense_from(state, f"{lp}.attention.output.dense"),
                "ln": _ln_from(state, f"{lp}.attention.output.LayerNorm"),
            },
            "cross": {
                "q": _dense_from(state, f"{lp}.crossattention.self.query"),
                "k": _dense_from(state, f"{lp}.crossattention.self.key"),
                "v": _dense_from(state, f"{lp}.crossattention.self.value"),
                "o": _dense_from(state, f"{lp}.crossattention.output.dense"),
                "ln": _ln_from(state,
                               f"{lp}.crossattention.output.LayerNorm"),
            },
            "ffn": {
                "w1": _dense_from(state, f"{lp}.intermediate_query.dense"),
                "w2": _dense_from(state, f"{lp}.output_query.dense"),
                "ln": _ln_from(state, f"{lp}.output_query.LayerNorm"),
            },
        })
    return params


def projector_to_reference(spec: str, params: Dict[str, Any],
                           prefix: str) -> Dict[str, np.ndarray]:
    """Inverse of projector_from_reference."""
    kind = parse_spec(spec)
    out: Dict[str, np.ndarray] = {}

    def put_dense(p, pre):
        out[f"{pre}.weight"] = _np(p["w"]).T
        out[f"{pre}.bias"] = _np(p["b"])

    def put_ln(p, pre):
        out[f"{pre}.weight"] = _np(p["scale"])
        out[f"{pre}.bias"] = _np(p["bias"])

    if kind["kind"] == "identity":
        return out
    if kind["kind"] == "linear":
        put_dense(params["layers"][0], prefix)
        return out
    if kind["kind"] == "mlp":
        put_dense(params["layers"][0], f"{prefix}.0")
        for d in range(1, kind["depth"]):
            put_dense(params["layers"][d], f"{prefix}.{2 * d}")
        return out
    qf = f"{prefix}.audio_Qformer.bert"
    out[f"{prefix}.audio_query_tokens"] = _np(params["query_tokens"])[None]
    out[f"{prefix}.audio_position_embedding.weight"] = _np(
        params["position_embedding"])
    put_ln(params["embeddings_ln"], f"{qf}.embeddings.LayerNorm")
    put_dense(params["llama_proj"], f"{prefix}.audio_llama_proj")
    for l, layer in enumerate(params["layers"]):
        lp = f"{qf}.encoder.layer.{l}"
        put_dense(layer["self"]["q"], f"{lp}.attention.self.query")
        put_dense(layer["self"]["k"], f"{lp}.attention.self.key")
        put_dense(layer["self"]["v"], f"{lp}.attention.self.value")
        put_dense(layer["self"]["o"], f"{lp}.attention.output.dense")
        put_ln(layer["self"]["ln"], f"{lp}.attention.output.LayerNorm")
        put_dense(layer["cross"]["q"], f"{lp}.crossattention.self.query")
        put_dense(layer["cross"]["k"], f"{lp}.crossattention.self.key")
        put_dense(layer["cross"]["v"], f"{lp}.crossattention.self.value")
        put_dense(layer["cross"]["o"], f"{lp}.crossattention.output.dense")
        put_ln(layer["cross"]["ln"], f"{lp}.crossattention.output.LayerNorm")
        put_dense(layer["ffn"]["w1"], f"{lp}.intermediate_query.dense")
        put_dense(layer["ffn"]["w2"], f"{lp}.output_query.dense")
        put_ln(layer["ffn"]["ln"], f"{lp}.output_query.LayerNorm")
    return out


# ---------------------------------------------------------------------------
# Adapter checkpoint overlay / export
# ---------------------------------------------------------------------------

_LORA_RE = re.compile(
    r"^model\.layers\.(\d+)\.(self_attn|mlp)\.(\w+_proj)"
    r"\.lora_(A|B)\.([\w.\-]+)\.weight$")


def load_adapter_into_params(params: Dict[str, Any],
                             adapter: Dict[str, np.ndarray],
                             cfg: ModelConfig,
                             projector_params: Optional[Dict[str, Any]] = None,
                             strict: bool = False) -> List[str]:
    """Overlay a reference-layout adapter state dict onto the stacked pytree
    in place (strict=False mirrors the reference's overlay, reference:
    model/builder.py:157-163).  Returns the list of unconsumed keys.

    projector_params: optional dict to receive per-modality projector
    pytrees, e.g. ``{"vision": {...}}`` (filled from
    ``model.modal_projectors.*`` keys).
    """
    import jax.numpy as jnp
    adapter_index = {n: i for i, n in enumerate(cfg.adapter_names())}
    dt = jnp.dtype(cfg.dtype)

    # Mutable numpy staging of the stacked LoRA tensors.
    staged: Dict[tuple, np.ndarray] = {}

    def get_staged(group, name, which):
        key = (group, name, which)
        if key not in staged:
            staged[key] = np.array(
                params["layers"][group][name][which], np.float32, copy=True)
        return staged[key]

    leftovers: List[str] = []
    consumed_projector_prefixes = set()
    for key, val in adapter.items():
        if key.startswith("base_model.model."):
            # peft wrapper prefix on converted LLaVA-LoRA checkpoints
            key = key[len("base_model.model."):]
        m = _LORA_RE.match(key)
        if m:
            layer, grp, proj, ab, adapter_name = m.groups()
            group = "attn" if grp == "self_attn" else "mlp"
            name = (ATTN_MAP if group == "attn" else MLP_MAP).get(proj)
            if name is None or adapter_name not in adapter_index:
                if strict:
                    raise KeyError(key)
                leftovers.append(key)
                continue
            a_idx = adapter_index[adapter_name]
            which = "lora_a" if ab == "A" else "lora_b"
            arr = get_staged(group, name, which)
            # torch: lora_A.weight [r, in]; lora_B.weight [out, r]
            arr[int(layer), a_idx] = _np(val).T
            continue
        pm = re.match(r"^model\.modal_projectors\.(\w+)\.", key)
        if pm and projector_params is not None:
            consumed_projector_prefixes.add(pm.group(1))
            continue
        tm = re.match(r"^(prefix|suffix)_tokens\.([\w\-]+)$", key)
        if tm:
            kind, modal = tm.groups()
            slot = params.setdefault(f"{kind}_tokens", {})
            slot[modal] = jnp.asarray(_np(val)[0], dt)
            continue
        leftovers.append(key)

    for modal in consumed_projector_prefixes:
        spec = cfg.projector_type(modal)
        tree = projector_from_reference(
            spec, adapter, f"model.modal_projectors.{modal}")
        import jax
        projector_params[modal] = jax.tree.map(
            lambda x: jnp.asarray(x, dt), tree)

    for (group, name, which), arr in staged.items():
        params["layers"][group][name][which] = jnp.asarray(arr, dt)
    return leftovers


def params_to_adapter(params: Dict[str, Any], cfg: ModelConfig,
                      projector_params: Optional[Dict[str, Any]] = None
                      ) -> Dict[str, np.ndarray]:
    """Export trainables in the reference adapter_model layout (inverse of
    load_adapter_into_params): all LoRA A/B per adapter + projectors +
    prefix/suffix tokens."""
    out: Dict[str, np.ndarray] = {}
    names = cfg.adapter_names()
    for group, mapping in (("attn", ATTN_MAP), ("mlp", MLP_MAP)):
        grp_name = "self_attn" if group == "attn" else "mlp"
        for torch_name, ours in mapping.items():
            la = np.asarray(params["layers"][group][ours]["lora_a"],
                            np.float32)
            lb = np.asarray(params["layers"][group][ours]["lora_b"],
                            np.float32)
            for i in range(la.shape[0]):
                for a_idx, adapter_name in enumerate(names):
                    base = f"model.layers.{i}.{grp_name}.{torch_name}"
                    out[f"{base}.lora_A.{adapter_name}.weight"] = \
                        la[i, a_idx].T
                    out[f"{base}.lora_B.{adapter_name}.weight"] = \
                        lb[i, a_idx].T
    for kind in ("prefix_tokens", "suffix_tokens"):
        for modal, tok in (params.get(kind) or {}).items():
            out[f"{kind}.{modal}"] = np.asarray(tok, np.float32)[None]
    if projector_params:
        for modal, tree in projector_params.items():
            spec = cfg.projector_type(modal)
            out.update(projector_to_reference(
                spec, tree, f"model.modal_projectors.{modal}"))
    return out
