"""Device mesh + GSPMD sharding specs.

The reference scales with DeepSpeed ZeRO data parallelism and has only a
vestigial ``pretraining_tp`` (SURVEY.md §2.10).  The TPU rebuild does it the
GSPMD way: one ``jax.sharding.Mesh`` with a ``data`` axis (batch / optimizer
sharding — the ZeRO role) and a ``model`` axis (Megatron-style tensor
parallelism over ICI — q/k/v/gate/up shard their output dim, o/down shard
their input dim, LoRA B shards congruently with its base weight so the
routed-adapter einsum needs no extra collectives; the LoRA A bottleneck
[*, r] is replicated).  XLA inserts all collectives.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = data * model
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:need]).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def default_mesh() -> Mesh:
    """All devices on the data axis (pure DP) — the safe default."""
    return make_mesh(data=len(jax.devices()), model=1)


def mesh_for_batch(batch_size: int, model: int = 1,
                   allow_partial: bool = False) -> Mesh:
    """Pure-DP mesh whose data axis divides the global batch.

    By default the batch must use EVERY available device — a prime batch
    size silently degrading to data=1 wastes 7/8 of a v5e-8 (the failure
    mode the reference's deepspeed launcher would error on).  Pass
    ``allow_partial=True`` to accept the largest divisor instead.
    """
    n = len(jax.devices()) // model
    if batch_size % n != 0 and not allow_partial:
        raise ValueError(
            f"global batch {batch_size} does not divide the data axis "
            f"({n} devices / model={model}); pick a divisible batch size "
            "or pass allow_partial=True")
    data = 1
    for d in range(1, n + 1):
        if batch_size % d == 0:
            data = d
    return make_mesh(data=data, model=model)


# ---------------------------------------------------------------------------
# Sharding specs
# ---------------------------------------------------------------------------

def param_pspecs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec tree matching core/llama.py's stacked param pytree.

    Layer-stacked tensors have a leading layer axis (unsharded).  TP axis
    assignments (columns of the table in SURVEY.md §2.10):

      q/k/v/gate/up  w: [N, in, out]        -> (None, None, 'model')
      o/down         w: [N, in, out]        -> (None, 'model', None)
      lora_b (col-parallel base)            -> (None, None, None, 'model')
      lora_b (row-parallel base)            -> replicated (output summed
                                               after contraction; r is tiny)
      lora_a                                -> replicated
      embed_tokens [V, H]                   -> ('model', None)
      lm_head [H, V]                        -> (None, 'model')
    """
    col = {"w": P(None, None, "model"),
           "lora_a": P(),
           "lora_b": P(None, None, None, "model")}
    row = {"w": P(None, "model", None),
           "lora_a": P(),
           "lora_b": P()}
    specs: Dict[str, Any] = {
        "embed_tokens": P("model", None),
        "layers": {
            "input_layernorm": P(),
            "post_attention_layernorm": P(),
            "attn": {"q": dict(col), "k": dict(col), "v": dict(col),
                     "o": dict(row)},
            "mlp": {"gate": dict(col), "up": dict(col), "down": dict(row)},
        },
        "norm": P(),
        "lm_head": P(None, "model"),
    }
    for extra in ("prefix_tokens", "suffix_tokens"):
        if extra in params:
            specs[extra] = {m: P() for m in params[extra]}
    return specs


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    specs = param_pspecs(params)

    def put(x, s):
        if isinstance(x, dict) and set(x) == {"q", "scale"}:
            # int8-quantized leaf (ops/quant): shard the int8 tensor like
            # its dense counterpart; the per-output-channel scales are
            # tiny — replicate and let GSPMD slice them in the matmul.
            return {"q": jax.device_put(x["q"], NamedSharding(mesh, s)),
                    "scale": jax.device_put(x["scale"],
                                            NamedSharding(mesh, P()))}
        return jax.device_put(x, NamedSharding(mesh, s))

    return jax.tree.map(
        put, params, specs,
        is_leaf=lambda x: isinstance(x, dict)
        and set(x) == {"q", "scale"})


def shard_opt_state(opt_state, mesh: Mesh):
    """ZeRO-1: shard optimizer moments over the DATA axis.

    The reference reaches 8 GPUs only because DeepSpeed ZeRO partitions
    optimizer state across data-parallel ranks (SURVEY §2.10); the GSPMD
    equivalent is a sharding annotation on the optimizer pytree — each
    moment leaf adds 'data' on its first FREE axis divisible by the
    data-axis size, MERGED into any sharding the leaf already inherited
    from its parameter (overwriting a 'model' axis would grow, not
    shrink, per-chip moments on DPxTP meshes).  XLA runs the update
    sharded and inserts the gather for the parameter update.  Leaves
    with no free divisible axis (scalars, counts) keep their sharding."""
    data = mesh.shape["data"]

    def put(x):
        ndim = getattr(x, "ndim", 0)
        cur_spec = getattr(getattr(x, "sharding", None), "spec", None)
        cur = list(cur_spec) if cur_spec is not None else []
        cur += [None] * (ndim - len(cur))
        if hasattr(x, "shape") and ndim >= 1 and data > 1:
            for axis, dim in enumerate(x.shape):
                if cur[axis] is None and dim >= data and dim % data == 0:
                    spec = list(cur)
                    spec[axis] = "data"
                    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, NamedSharding(mesh, P(*cur)))

    return jax.tree.map(put, opt_state)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis over the data mesh axis."""
    return NamedSharding(mesh, P("data"))


def shard_batch(tree, mesh: Mesh):
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def shard_encoder_features(feats, mesh: Mesh):
    """Shard per-modality feature tables over the data axis when their
    instance count divides it; replicate otherwise.  At 8 chips a video
    batch (8 x 257 x 4096 per sample) replicated costs ~HBM * data_axis —
    sharding it is the difference between fitting and OOM."""
    data = mesh.shape["data"]
    out = {}
    for modal, f in feats.items():
        spec = P("data") if f.shape[0] % data == 0 else P()
        out[modal] = jax.device_put(f, NamedSharding(mesh, spec))
    return out


def replicated(tree, mesh: Mesh):
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
