"""Routed multi-adapter LoRA linear — the composition primitive.

The reference implements per-modality adapters as a python dict of LoRA
(A, B) pairs and dispatches per adapter name, then sums the per-adapter
outputs under one-hot per-token masks (reference: modelcompose/model/
language_model/multimodal_llama.py:120-160, 262-268).  Because the masks
partition tokens, that is algebraically

    y[t] = x[t] @ W + sum_a route[t, a] * (x[t] @ A_a) @ B_a

with ``route[t]`` the token's row of the routing table (one-hot with the
adapter scale folded in for modality tokens; multi-hot over the
``default-{modal}`` rows for merged-default tokens).

On TPU we keep the adapters stacked — ``A: [n_adapters, in, r]``,
``B: [n_adapters, r, out]`` — and compute the whole branch as two einsums
driving the MXU, with no data-dependent control flow.  XLA fuses the
route-mask multiply into the contraction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def routed_lora_matmul(x, w, lora_a, lora_b, route):
    """y = x @ w + sum_a route[..., a] * (x @ A_a) @ B_a.

    Args:
      x:      [..., L, d_in] activations.
      w:      [d_in, d_out] base weight (JAX layout: y = x @ w).
      lora_a: [A, d_in, r] stacked adapter down-projections.
      lora_b: [A, r, d_out] stacked adapter up-projections.
      route:  [..., L, A] per-token adapter weights (scales folded in), or
              None to skip the adapter branch entirely.

    Returns:
      [..., L, d_out] in x.dtype.
    """
    from .quant import dequant_matmul, is_quantized
    if is_quantized(w):
        # out_dtype keeps the fp32 accumulation for the adapter add —
        # rounding through x.dtype (bf16) first would make the quantized
        # base branch lose mantissa the dense branch keeps (same
        # double-rounding as the lm_head fix in core/llama.py)
        y = dequant_matmul(x, w, out_dtype=jnp.float32)
    else:
        y = jnp.einsum("...i,io->...o", x, w,
                       preferred_element_type=jnp.float32)
    if route is not None:
        u = jnp.einsum("...i,air->...ar", x, lora_a,
                       preferred_element_type=jnp.float32)
        u = u * route[..., None].astype(u.dtype)
        y = y + jnp.einsum("...ar,aro->...o", u.astype(lora_b.dtype), lora_b,
                           preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def route_weights(route_ids, routing_table):
    """Expand per-token route-class ids into adapter-weight rows.

    Args:
      route_ids:     [..., L] int32 route classes (0=default, 1=audio, ...).
      routing_table: [n_classes, n_adapters] float32.

    Returns:
      [..., L, n_adapters] float32 adapter weights.
    """
    return jnp.take(routing_table, route_ids, axis=0)


def fold_decode_adapters(params, default_route):
    """Compact the stacked adapters to the decode-time 'default' mix.

    During decode every token takes the default route (reference:
    multimodal_llama.py:436-438), whose row is STATIC for a generation —
    only the rows with nonzero weight (the 'default' adapter, or the
    ``default-{modal}`` merge rows) are ever read.  Folding them into one
    concatenated low-rank pair [1, d_in, R] x [1, R, d_out] (coefficients
    scaled into B) cuts the per-step adapter HBM traffic from all A rows to
    just the active ones, and the routing gather disappears.

    Args:
      params: core/llama.py param tree (leaves may be int8-quantized dicts
        for ``w``; adapters are always dense).
      default_route: numpy [n_adapters] routing-table row 0.

    Returns: (decode_params, decode_routing_table [1, 1]).
    """
    import numpy as np

    support = [int(i) for i in np.nonzero(np.asarray(default_route))[0]]

    def fold_linear(p):
        if not support:  # routing inactive: keep a zeroed rank-r branch
            a = p["lora_a"][:, :1] * 0
            b = p["lora_b"][:, :1] * 0
        else:
            # [N, in, r*k] and [N, r*k, out], coefficient folded into B
            a = jnp.concatenate([p["lora_a"][:, i] for i in support],
                                axis=2)[:, None]
            b = jnp.concatenate(
                [p["lora_b"][:, i] * float(default_route[i])
                 for i in support], axis=1)[:, None]
        return {"w": p["w"], "lora_a": a, "lora_b": b}

    out = dict(params)
    layers = dict(params["layers"])
    for grp in ("attn", "mlp"):
        layers[grp] = {name: fold_linear(p)
                       for name, p in params["layers"][grp].items()}
    out["layers"] = layers
    table = jnp.ones((1, 1), jnp.float32)
    return out, table


def fold_dense(params, routing_table):
    """Fold the default-route adapter mix densely into every base weight
    and REBASE the routing table so prefill stays numerically identical.

    With c = routing_table[0] (the decode-time 'default' class row,
    reference: multimodal_llama.py:436-438):

        W'      = W + sum_a c_a * A_a @ B_a
        table'  = table - c        (so row 0 becomes all-zero)

    A token with route row r then computes
        x @ W' + sum_a (r_a - c_a) x A_a B_a
      = x @ W  + sum_a r_a x A_a B_a            (unchanged),
    while decode (route row 0 == 0) can skip the adapter branch entirely
    by passing ``routing_table=None`` — removing ALL per-step adapter HBM
    traffic with zero extra residency (the fold replaces W in place,
    unlike fold_decode_adapters' concatenated copy).

    int8-quantized base weights are dequantized, folded, and requantized
    (per-output-channel scales recomputed).

    Returns: (params', routing_table' [n_classes, n_adapters]).
    """
    from .quant import is_quantized, quantize_int8

    table = jnp.asarray(routing_table, jnp.float32)
    c = table[0]

    def fold_linear(p):
        delta = jnp.einsum("a,nair,naro->nio", c,
                           p["lora_a"].astype(jnp.float32),
                           p["lora_b"].astype(jnp.float32))
        w = p["w"]
        if is_quantized(w):
            wf = w["q"].astype(jnp.float32) * w["scale"]
            new_w = quantize_int8(wf + delta, axis=-2)
        else:
            new_w = (w.astype(jnp.float32) + delta).astype(w.dtype)
        return {"w": new_w, "lora_a": p["lora_a"], "lora_b": p["lora_b"]}

    out = dict(params)
    layers = dict(params["layers"])
    for grp in ("attn", "mlp"):
        layers[grp] = {name: fold_linear(p)
                       for name, p in params["layers"][grp].items()}
    out["layers"] = layers
    return out, table - c[None, :]


def active_adapter_set(routing_table, route_classes=None):
    """Adapter columns reachable from the given route classes.

    Args:
      routing_table: [n_classes, n_adapters].
      route_classes: iterable of class ids actually present in the batch
        (None = all classes).

    Returns: sorted tuple of active adapter column indices.
    """
    import numpy as np

    table = np.asarray(routing_table)
    if route_classes is not None:
        rows = table[sorted({int(c) for c in route_classes})]
    else:
        rows = table
    return tuple(int(a) for a in np.nonzero(np.any(rows != 0, axis=0))[0])


def compact_active_adapters(params, routing_table, active):
    """Gather the stacked adapters down to the active columns.

    An online-merge-reset 4-modal composition stacks ~9 adapter rows
    (4 modal + 4 ``default-{modal}`` + the dead 'default'), and
    ``routed_lora_matmul`` contracts over ALL of them for every prefill
    token — ~+50% linear FLOPs at r=128/d=4096 paid even for tokens routed
    to a single adapter (SURVEY.md hard part #2).  The set of columns any
    token can touch is the union of nonzero table entries over the route
    classes present in the batch, which the host-side pack plan knows — so
    slice A/B (and the table columns) ONCE per composed config.  The
    active count is static per config: no dynamic shapes, one compile.

    Args:
      params: core/llama.py param tree.
      routing_table: [n_classes, n_adapters].
      active: tuple of adapter column indices (from active_adapter_set);
        classes whose rows put weight on dropped columns must not be
        routed to afterwards.

    Returns: (params', routing_table' [n_classes, len(active)]).
    """
    import numpy as np

    if not active:  # routing degenerate: keep one (zero-weighted) column
        active = (0,)
    idx = list(active)

    def slice_linear(p):
        return {"w": p["w"],
                "lora_a": jnp.asarray(p["lora_a"])[:, idx],
                "lora_b": jnp.asarray(p["lora_b"])[:, idx]}

    out = dict(params)
    layers = dict(params["layers"])
    for grp in ("attn", "mlp"):
        layers[grp] = {name: slice_linear(p)
                       for name, p in params["layers"][grp].items()}
    out["layers"] = layers
    table = np.asarray(routing_table)[:, idx]
    return out, jnp.asarray(table, jnp.float32)


def fold_default_adapter(w, lora_a, lora_b, default_route):
    """Fold the decode-time ('default' class) adapter mix densely into w.

    During decode the reference routes every generated token through the
    'default' class only (reference: multimodal_llama.py:436-438), so the
    adapter branch is the same rank-r update for every token and can be
    merged into the base weight once:  W' = W + sum_a c_a * A_a @ B_a.

    Args:
      w: [d_in, d_out]; lora_a: [A, d_in, r]; lora_b: [A, r, d_out];
      default_route: [A] the routing-table row for the default class.

    Returns: [d_in, d_out] merged weight, in w.dtype.
    """
    delta = jnp.einsum("a,air,aro->io", default_route.astype(jnp.float32),
                       lora_a.astype(jnp.float32), lora_b.astype(jnp.float32))
    return (w.astype(jnp.float32) + delta).astype(w.dtype)
