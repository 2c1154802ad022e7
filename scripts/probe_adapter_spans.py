"""Microbenchmark: routed-adapter contraction — masked stacked einsum vs
contiguous per-span GEMMs (SURVEY hard part #2 / VERDICT r3 stretch #9).

The production prefill contracts EVERY stacked adapter row for EVERY
token (ops/routed_lora.routed_lora_matmul): at the MCUB-4 operating
point that is 8 compacted rows, so a vision token pays 8 rank-128
adapter GEMMs where 1 carries signal.  But the packed layout
(core/packing) makes each modality's features a CONTIGUOUS span, so the
adapter branch could instead run one [span, d]x[d, r]x[r, d2] chain per
span — ~8x fewer adapter FLOPs.

This probe times both shapes in isolation at the real MCUB-4 prefill
geometry (gate+up+down+qkvo per layer folded into a single
representative [L, 4096]x... set, 8 adapters, r=128).  Decision rule
(round-3 discipline): integrate only if the span form wins by >15% on
the ADAPTER share — the masked einsum is one fused op and the span form
adds per-span dispatch + dynamic-update overhead.

Run: nohup python scripts/probe_adapter_spans.py > /tmp/probe_spans.log &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

L = 3328
H = 4096
I = 11008
R = 128
A = 8
STEPS = 256  # amortize the ~27 MB D2H relay fetch far below compute

# MCUB-4 span layout (packed positions): text spans route nothing after
# fold_dense; each modal span hits exactly one adapter row.
SPANS = [  # (start, length, adapter_row)
    (35, 586, 0),      # vision
    (621, 2066, 1),    # video
    (2687, 42, 2),     # audio
    (2729, 523, 3),    # point
]


def masked_all_rows(x, a_stack, b_stack, route):
    u = jnp.einsum("li,air->lar", x, a_stack,
                   preferred_element_type=jnp.float32)
    u = u * route[..., None].astype(u.dtype)
    return jnp.einsum("lar,aro->lo", u.astype(b_stack.dtype), b_stack,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def per_span(x, a_stack, b_stack):
    y = jnp.zeros((L, b_stack.shape[-1]), x.dtype)
    for start, length, row in SPANS:
        xs = jax.lax.dynamic_slice_in_dim(x, start, length, axis=0)
        u = jnp.einsum("li,ir->lr", xs, a_stack[row],
                       preferred_element_type=jnp.float32)
        o = jnp.einsum("lr,ro->lo", u.astype(b_stack.dtype), b_stack[row],
                       preferred_element_type=jnp.float32).astype(x.dtype)
        y = jax.lax.dynamic_update_slice_in_dim(y, o, start, axis=0)
    return y


def bench(fn, args, steps=STEPS):
    # thread a data dependency through iterations so XLA cannot CSE the
    # repeated calls (round-3 microbench trap)
    @jax.jit
    def loop(x, *rest):
        def body(c, _):
            y = fn(c, *rest)
            return c + y[:, : c.shape[1]] * 1e-6, None
        out, _ = jax.lax.scan(body, x, None, length=steps)
        return out

    x = args[0]
    np.asarray(loop(x, *args[1:]))  # compile
    t0 = time.perf_counter()
    np.asarray(loop(x, *args[1:]))
    return (time.perf_counter() - t0) / steps


def main():
    if jax.default_backend() != "tpu":
        print(json.dumps({"error": "not on tpu"}))
        return
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    results = {}
    for name, d_out in (("attn", H), ("mlp_up", I)):
        x = jax.random.normal(k[0], (L, H), jnp.bfloat16)
        a_stack = jax.random.normal(k[1], (A, H, R), jnp.bfloat16)
        b_stack = jax.random.normal(k[2], (A, R, d_out), jnp.bfloat16)
        rows = np.zeros((L, A), np.float32)
        for s, n, r in SPANS:
            rows[s:s + n, r] = 1.0
        route = jnp.asarray(rows)
        t_masked = bench(masked_all_rows, (x, a_stack, b_stack, route))
        t_span = bench(per_span, (x, a_stack, b_stack))
        flops_masked = 2 * L * A * R * (H + d_out)
        flops_span = sum(2 * n * R * (H + d_out) for _, n, _ in SPANS)
        results[name] = {
            "masked_ms": round(t_masked * 1e3, 3),
            "span_ms": round(t_span * 1e3, 3),
            "speedup": round(t_masked / t_span, 2),
            "masked_tflops": round(flops_masked / t_masked / 1e12, 1),
            "span_tflops": round(flops_span / t_span / 1e12, 1),
        }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
