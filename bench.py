"""Benchmark: Vicuna-7B decode throughput (tokens/sec/chip) after a routed
multimodal prefill — the protocol the reference's eval loop fixes
(greedy, use_cache, batch decode; reference: modelcompose/eval/
model_multimodal_qa_loader.py:93-102).  Prints ONE JSON line.

vs_baseline compares against a reference-GPU estimate of HF eager decode
for llama-7B fp16 on A100 (~30 tok/s single-stream); the repo itself
publishes no numbers (BASELINE.md).
"""

import json
import os
import time

import numpy as np

REFERENCE_GPU_TOKS_PER_SEC = 30.0  # single-stream HF A100 estimate


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg, _zeros_params
    from modelcompose_tpu.core.generate import _decode_loop, _prefill

    on_tpu = jax.default_backend() == "tpu"
    # Default: the production int8 decode path (int8 weights + folded
    # default-route adapters + int8 KV cache) — 79.7 tok/s vs 42.4 bf16 on
    # one chip.  BENCH_BF16=1 measures the plain bf16 path.
    use_int8 = os.environ.get("BENCH_BF16") != "1"
    if on_tpu:
        # Batch 1 matches the reference eval protocol (greedy, batch 1,
        # use_cache — BASELINE.md); it also bounds the KV cache so the 7B
        # params (13.5 GB bf16) + cache fit the 16 GB v5e HBM.
        cfg = _flagship_cfg()
        B, L, cache_len, steps = 1, 256, 512, 128
    else:  # CPU smoke: tiny config so the bench always runs
        from modelcompose_tpu.config import tiny_test_config
        cfg = tiny_test_config(mm_vision_encoder="x", mm_hidden_size=16)
        B, L, cache_len, steps = 2, 32, 64, 8

    if on_tpu and use_int8:
        from modelcompose_tpu.core.llama import init_params
        from modelcompose_tpu.ops.quant import quantize_backbone
        shapes = jax.eval_shape(lambda: quantize_backbone(
            init_params(cfg, jax.random.PRNGKey(0))))
        params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    elif on_tpu:
        params = _zeros_params(cfg)
    else:
        from modelcompose_tpu.core.llama import init_params
        params = init_params(cfg, jax.random.PRNGKey(0))

    dt = jnp.dtype(cfg.dtype)
    embeds = jnp.zeros((B, L, cfg.hidden_size), dt)
    route_ids = jnp.zeros((B, L), jnp.int32)
    table = jnp.asarray(cfg.routing_table())
    seg = jnp.ones((B, L), jnp.int32)
    lengths = jnp.full((B,), L, jnp.int32)

    # The whole decode runs device-side in one compiled lax.scan
    # (core/generate._decode_loop); timing syncs via an actual
    # device-to-host fetch because block_until_ready does not reliably
    # synchronize through the axon relay.
    rng = jax.random.PRNGKey(0)

    decode_params, decode_table = params, table
    if use_int8:
        # int8 weights leave HBM headroom for the folded default-route
        # adapter pair (79.5 tok/s measured vs 66.6 unfolded)
        from modelcompose_tpu.ops.routed_lora import fold_decode_adapters
        decode_params, decode_table = fold_decode_adapters(
            params, cfg.routing_table()[0])

    def run():
        logits, cache = _prefill(params, cfg, embeds, route_ids, table, seg,
                                 lengths, cache_len, "auto", use_int8)
        tokens = _decode_loop(decode_params, cfg, cache, logits, lengths,
                              decode_table, rng, steps, -1, 0.0)
        return np.asarray(tokens)  # D2H fetch = hard sync

    run()  # compile warmup
    t_total0 = time.perf_counter()
    run()
    t_total = time.perf_counter() - t_total0  # prefill + decode, one sync

    # prefill (one forward over L tokens) costs about one decode step at
    # batch 1; fold it in rather than compiling a second timing program
    dt_s = max(t_total, 1e-9)
    toks_per_sec = B * steps / dt_s
    result = {
        "metric": "decode_tokens_per_sec_per_chip",
        "value": round(toks_per_sec, 2),
        "unit": "tokens/s",
        "vs_baseline": round(toks_per_sec / REFERENCE_GPU_TOKS_PER_SEC, 2)
        if on_tpu else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
