"""Serving-configuration decode scaling: tokens/sec/chip vs batch size.

The production serving point from BASELINE.md: int8 weights + int8 KV +
dense-folded decode adapters, batch-N greedy decode after a 256-token
prefill per row.  Prints one JSON line with tok/s per batch size.

Usage: python scripts/bench_serving.py [--batches 1 4 8 16] [--steps 128]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", type=int, nargs="*",
                        default=[1, 4, 8, 16])
    parser.add_argument("--steps", type=int, default=128)
    parser.add_argument("--ctx", type=int, default=256)
    parser.add_argument("--cache-len", type=int, default=512)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from modelcompose_tpu.core.generate import _decode_loop, _prefill
    from modelcompose_tpu.core.llama import init_params
    from modelcompose_tpu.ops.quant import quantize_backbone
    from modelcompose_tpu.ops.routed_lora import fold_dense

    cfg = _flagship_cfg()
    shapes = jax.eval_shape(lambda: quantize_backbone(
        init_params(cfg, jax.random.PRNGKey(0))))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    table = jnp.asarray(cfg.routing_table())
    params, table = jax.jit(fold_dense, donate_argnums=(0,))(params, table)
    rng = jax.random.PRNGKey(0)

    results = {}
    for B in args.batches:
        L, steps = args.ctx, args.steps
        embeds = jnp.zeros((B, L, cfg.hidden_size), jnp.bfloat16)
        route_ids = jnp.zeros((B, L), jnp.int32)
        seg = jnp.ones((B, L), jnp.int32)
        lengths = jnp.full((B,), L, jnp.int32)

        def prefill():
            logits, cache = _prefill(params, cfg, embeds, route_ids, table,
                                     seg, lengths, args.cache_len, "auto",
                                     True)
            jax.block_until_ready(logits)  # hard sync: keep prefill out
            return logits, cache           # of the decode-timing window

        def decode(logits, cache):
            tokens, _ = _decode_loop(params, cfg, cache, logits, lengths,
                                     None, rng, steps, -1, do_sample=False)
            return np.asarray(tokens)  # D2H = hard sync

        decode(*prefill())  # compile warmup
        # time prefill and decode separately — prefill cost grows ~linearly
        # with B while weights-bound decode is nearly flat, so folding it in
        # would flatten the decode-vs-batch scaling curve this bench exists
        # to measure.  Best of 2 to absorb shared-chip jitter.
        dt_pre, dt_dec = float("inf"), float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            logits, cache = prefill()
            t1 = time.perf_counter()
            decode(logits, cache)
            t2 = time.perf_counter()
            dt_pre, dt_dec = min(dt_pre, t1 - t0), min(dt_dec, t2 - t1)
        results[f"batch_{B}_tok_per_sec"] = round(B * steps / dt_dec, 1)
        results[f"batch_{B}_prefill_tok_per_sec"] = round(B * L / dt_pre, 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
