"""Benchmark: Vicuna-7B decode throughput (tokens/sec/chip) after a routed
multimodal prefill — the protocol the reference's eval loop fixes
(greedy, use_cache, batch decode; reference: modelcompose/eval/
model_multimodal_qa_loader.py:93-102).  Prints ONE JSON line.

vs_baseline compares against a reference-GPU estimate of HF eager decode
for llama-7B fp16 on A100 (~30 tok/s single-stream); the repo itself
publishes no numbers (BASELINE.md documents the protocol and the estimate).

The measured window covers one prefill (256 ctx) + 128 decode steps in a
single compiled scan, synced by a device-to-host fetch (block_until_ready
does not synchronize through the axon relay).  Decode runs with the
default-route adapter mix folded densely into W (ops/routed_lora.fold_dense)
— the production decode configuration.
"""

import json
import os
import sys
import time

import numpy as np

_SCRIPTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "scripts")
if _SCRIPTS not in sys.path:
    sys.path.insert(0, _SCRIPTS)

REFERENCE_GPU_TOKS_PER_SEC = 30.0  # single-stream HF A100 estimate


def _enable_compile_cache():
    # canonical definition lives in the package (round-5 consolidation)
    from modelcompose_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()



def _flash_preflight():
    """Compile ONE tiny flash fwd+bwd on the real chip before any big
    program.  The bf16-operand MXU path (round 5) is validated off-chip
    only in interpret mode; if Mosaic rejects it on hardware, re-exec
    this bench with MC_FLASH_F32_DOT=1 (the slower but proven f32-operand
    path) instead of dying with no JSON row.  Re-exec (not a flag flip)
    because the flag is read at trace time and jaxprs already traced
    with bf16 operands would be reused."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu" \
            or os.environ.get("MC_FLASH_F32_DOT") == "1":
        return
    from modelcompose_tpu.ops.attention import attention
    B, L, H, D = 1, 256, 4, 128
    q = jnp.ones((B, L, H, D), jnp.bfloat16)
    seg = jnp.ones((B, L), jnp.int32)

    def loss(q, k, v):
        o = attention(q, k, v, causal=True, q_segment_ids=seg,
                      kv_segment_ids=seg, impl="pallas")
        return (o.astype(jnp.float32) ** 2).mean()

    try:
        np.asarray(jax.jit(jax.grad(loss))(q, q, q)[..., :4])
    except Exception as e:  # noqa: BLE001 — Mosaic lowering failure
        if "UNAVAILABLE" in str(e) or "Broken pipe" in str(e):
            raise  # relay transport problem, not a kernel problem
        print(f"flash bf16-operand preflight failed ({type(e).__name__}: "
              f"{str(e)[:200]}); re-exec with MC_FLASH_F32_DOT=1",
              file=sys.stderr, flush=True)
        os.environ["MC_FLASH_F32_DOT"] = "1"
        os.execv(sys.executable, [sys.executable] + sys.argv)


def kernel_smoke():
    """On-TPU compiled Pallas flash-attention check (fwd + bwd vs XLA at
    bf16) so compiled-kernel regressions surface in BENCH_r*.json runs;
    the pytest suite only exercises interpret mode."""
    import jax
    import jax.numpy as jnp

    from modelcompose_tpu.ops.attention import attention

    if jax.default_backend() != "tpu":
        return "skipped (not on tpu)"
    # Two shapes: the short default tile AND the retuned long-context
    # tile (_pick_fwd_blocks switches at Lq >= 3072 — the composed 3328
    # bucket); each block-table branch gets a compiled fwd+bwd check.
    for L in (512, 3328):
        B, H, D = 1, (8 if L == 512 else 4), 128
        ks = jax.random.split(jax.random.PRNGKey(7), 3)
        q = jax.random.normal(ks[0], (B, L, H, D), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, L, H, D), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, L, H, D), jnp.bfloat16)
        seg = jnp.ones((B, L), jnp.int32)

        def loss(impl):
            def f(q, k, v):
                o = attention(q, k, v, causal=True, q_segment_ids=seg,
                              kv_segment_ids=seg, impl=impl)
                return (o.astype(jnp.float32) ** 2).mean()
            return f

        out_p = jax.jit(jax.value_and_grad(loss("pallas"),
                                           argnums=(0, 1, 2)))(q, k, v)
        out_x = jax.jit(jax.value_and_grad(loss("xla"),
                                           argnums=(0, 1, 2)))(q, k, v)
        flat_p = [np.asarray(x, np.float32)
                  for x in jax.tree.leaves(out_p)]
        flat_x = [np.asarray(x, np.float32)
                  for x in jax.tree.leaves(out_x)]
        for a, b in zip(flat_p, flat_x):
            denom = max(float(np.abs(b).max()), 1e-6)
            rel = float(np.abs(a - b).max()) / denom
            if rel > 2e-2:  # bf16 inputs; kernel accumulates fp32
                return f"FAIL L={L} rel={rel:.3g}"
    return "ok"


def _composed_cfg():
    """4-modal online-merge-reset composition (the MCUB-4 operating point:
    image+audio+video+point towers, equal 0.25 coefficients, LoRA r=128
    — 9 stacked adapter rows; reference:
    scripts/model_composition/test/MCUB-4.sh:30-72, README.md:83-91)."""
    from modelcompose_tpu.config import ModelConfig
    return ModelConfig(
        lora_strategy="modal+language", lora_r=128, lora_alpha=256,
        local_prefix_tokens=5, local_suffix_tokens=5,
        mm_vision_encoder="clip-vit-large-patch14-336", mm_hidden_size=1024,
        mm_audio_encoder="beats", mm_audio_hidden_size=768,
        mm_video_encoder="languagebind", mm_video_hidden_size=1024,
        mm_point_encoder="pointbert", mm_point_hidden_size=384,
        reset_scaling_weights=("default-vision=0.25,default-audio=0.25,"
                               "default-video=0.25,default-point=0.25"),
        dtype="bfloat16")


def _matmul_flops_per_token(cfg, n_active_adapters, lm_head=False):
    """MXU flops per prefill token: base GEMMs + routed adapter GEMMs.

    Delegates to the single flops model in scripts/bench_train.py so the
    train and prefill MFU can never disagree.  ``lm_head`` defaults OFF:
    _prefill gathers the last hidden state BEFORE the lm_head GEMM
    (core/generate.py), so that 2*H*V runs for one position per sequence,
    not per token — the caller adds it once."""
    from bench_train import train_matmul_flops_per_token
    return train_matmul_flops_per_token(cfg, n_active_adapters,
                                        lm_head=lm_head)


def composed_longctx(steps=128):
    """The reference's signature composed workload: a 4-modal MCUB prompt
    (~3.25k embedded positions: 576+10 image, 8x257+10 video, 32+10 audio,
    513+10 point, text) packed into the 4096 bucket — measures prefill MFU
    at that bucket and long-context decode tok/s (int8 weights + int8 KV +
    dense-folded default adapters, adapter stacks compacted to the
    batch-active columns).  Returns a dict of sub-metrics."""
    import jax
    import jax.numpy as jnp

    from modelcompose_tpu.config import ROUTE_CLASS_INDEX
    from modelcompose_tpu.core.generate import _decode_loop, _prefill
    from modelcompose_tpu.core.llama import init_params
    from modelcompose_tpu.ops.quant import quantize_backbone
    from modelcompose_tpu.ops.routed_lora import (active_adapter_set,
                                                  compact_active_adapters,
                                                  fold_dense)

    cfg = _composed_cfg()

    # 4-modal MCUB prompt layout (feature spans + 5+5 soft tokens each)
    from modelcompose_tpu.core.packing import pick_bucket

    spans = [("vision", 576 + 10), ("video", 8 * 257 + 10),
             ("audio", 32 + 10), ("point", 513 + 10)]
    n_text = 70  # system prompt + question + choices
    L_valid = sum(n for _, n in spans) + n_text
    # round-4: the 256-step bucket ladder packs 3,287 valid positions into
    # the 3,328 bucket (1.2% padding) instead of 4,096 (24.6%)
    B, L = 1, pick_bucket(L_valid)
    route_row = np.zeros(L, np.int32)
    pos = n_text // 2
    for modal, n in spans:
        route_row[pos:pos + n] = ROUTE_CLASS_INDEX[modal]
        pos += n
    route_ids = jnp.asarray(route_row[None])
    seg = jnp.asarray((np.arange(L) < L_valid).astype(np.int32)[None])
    lengths = jnp.full((B,), L_valid, jnp.int32)
    embeds = jnp.zeros((B, L, cfg.hidden_size), jnp.bfloat16)

    # Build zeros DIRECTLY in the production decode shapes — compacted to
    # the batch-active adapter columns + dense-folded (compact/fold on a
    # materialized 9-row 7B tree would transiently hold two adapter trees
    # and OOM the 16 GB HBM; the loader does the real transform on host).
    full_table = cfg.routing_table()
    active = active_adapter_set(full_table, np.unique(route_row))
    shapes = jax.eval_shape(
        lambda: fold_dense(*compact_active_adapters(
            quantize_backbone(init_params(cfg, jax.random.PRNGKey(0))),
            full_table, active)))
    params, table = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    cache_len = L + steps
    rng = jax.random.PRNGKey(0)

    def prefill():
        logits, cache = _prefill(params, cfg, embeds, route_ids, table, seg,
                                 lengths, cache_len, "auto", True)
        np.asarray(logits)  # D2H = hard sync through the axon relay
        return logits, cache

    def decode(logits, cache):
        tokens, _ = _decode_loop(params, cfg, cache, logits, lengths,
                                 None, rng, steps, -1, do_sample=False)
        return np.asarray(tokens)

    logits, cache = prefill()          # compile warmup
    decode(logits, cache)              # compile warmup (donates cache)
    t0 = time.perf_counter()
    logits, cache = prefill()
    t_prefill = time.perf_counter() - t0
    t0 = time.perf_counter()
    decode(logits, cache)
    t_decode = time.perf_counter() - t0

    # attention: QK^T and PV are each 2*(L^2/2)*H flops under the causal
    # mask -> 2*L^2*H per layer total; lm_head counted ONCE (the prefill
    # gathers the last hidden state before the lm_head GEMM)
    flops = _matmul_flops_per_token(cfg, len(active)) * L_valid \
        + 2 * cfg.hidden_size * cfg.vocab_size \
        + cfg.num_hidden_layers * 2 * L_valid * L_valid * cfg.hidden_size
    mfu = flops / t_prefill / 197e12   # v5e bf16 peak 197 TFLOP/s
    return {
        "longctx_decode_tok_per_sec": round(steps / t_decode, 2),
        "longctx_prefill_tok_per_sec": round(L_valid / t_prefill, 1),
        "prefill_mfu_4096": round(mfu, 3),
        "longctx_positions": L_valid,
        # key name kept for cross-round comparison; since round 4 the
        # workload packs at the bucket the packer PICKS (prefill_bucket,
        # 3328) — the MCUB-4 prompt no longer pads to 4096
        "prefill_mfu": round(mfu, 3),
        "prefill_bucket": L,
        "active_adapters": len(active),
    }


def train_step_bench():
    """Stage-2 DAMC train-step throughput on one chip (the reference's
    primary workload: run_finetune_vision_damc.sh — per-device micro-batch
    at 2048 ctx, gradient checkpointing).  Production single-chip recipe:
    int8 frozen base + bf16 adapters/grads + bf16 Adam mu + chunked CE
    (bf16 base OOMs at any batch — the arithmetic that forces the
    reference onto ZeRO-3 over 8 GPUs; full ladder: scripts/bench_train.py,
    BENCH_TRAIN.jsonl).  Returns sub-metric dict."""
    import bench_train

    res = bench_train.run_variant("stage2-int8-b2", bench_train.stage2_cfg(),
                                  2, 2048, int8_base=True,
                                  mu_dtype="bfloat16", stage1=False, steps=4)
    return {
        "train_tokens_per_sec": res["tokens_per_sec"],
        "train_step_ms": res["step_ms"],
        "train_mfu_model": res["train_mfu_model"],
        "train_batch_seq": [res["batch"], res["seq"]],
    }


def main():
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg, _zeros_params
    from modelcompose_tpu.core.generate import _decode_loop, _prefill
    from modelcompose_tpu.ops.routed_lora import fold_dense

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        _flash_preflight()  # may re-exec with MC_FLASH_F32_DOT=1
    # Default: the production int8 decode path (int8 weights + dense-folded
    # default-route adapters + int8 KV cache).  BENCH_BF16=1 measures the
    # bf16-weight path (same dense fold).
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

    # Dense-fold the decode-time default adapter mix into W (zero extra
    # residency; the rebased table keeps prefill routing identical) and decode with
    # NO adapter branch: decode traffic = base weights + KV only.
    table = jnp.asarray(cfg.routing_table())
    # Donate so old/new weight buffers alias — without it the fold holds
    # both param trees plus f32 transients and exceeds HBM at 7B.
    params, table = jax.jit(fold_dense, donate_argnums=(0,))(params, table)

    dt = jnp.dtype(cfg.dtype)
    embeds = jnp.zeros((B, L, cfg.hidden_size), dt)
    route_ids = jnp.zeros((B, L), jnp.int32)
    seg = jnp.ones((B, L), jnp.int32)
    lengths = jnp.full((B,), L, jnp.int32)

    # The whole decode runs device-side in one compiled lax.scan
    # (core/generate._decode_loop); timing syncs via an actual
    # device-to-host fetch because block_until_ready does not reliably
    # synchronize through the axon relay.
    rng = jax.random.PRNGKey(0)

    def run():
        logits, cache = _prefill(params, cfg, embeds, route_ids, table, seg,
                                 lengths, cache_len, "auto", use_int8)
        tokens, _ = _decode_loop(params, cfg, cache, logits, lengths,
                                 None, rng, steps, -1, do_sample=False)
        return np.asarray(tokens)  # D2H fetch = hard sync

    # compile warmup — the axon remote-compile relay can drop connections
    # ("Broken pipe") after long queues while the chip stays healthy, so
    # retry the first (compiling) invocation
    for attempt in range(3):
        try:
            run()
            break
        except Exception as e:  # noqa: BLE001 — relay transport errors
            if attempt == 2 or "UNAVAILABLE" not in str(e) \
                    and "Broken pipe" not in str(e):
                raise
            import sys
            print(f"compile relay dropped ({e}); retrying",
                  file=sys.stderr, flush=True)
            time.sleep(30)
    t_total0 = time.perf_counter()
    run()
    t_total = time.perf_counter() - t_total0  # prefill + decode, one sync

    if os.environ.get("BENCH_SKIP_KERNEL") != "1":
        try:
            kernel = kernel_smoke()
        except Exception as e:  # noqa: BLE001 — keep the JSON row alive
            kernel = f"ERROR: {type(e).__name__}: {str(e)[:200]}"
    else:
        kernel = "skipped"

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
        "kernel_check": kernel,
    }

    # Serving configuration at batch 16 (the production throughput point;
    # full scaling curve: scripts/bench_serving.py).  BENCH_SERVING=0 skips.
    if on_tpu and os.environ.get("BENCH_SERVING") != "0":
        B16, L16 = 16, 256
        embeds16 = jnp.zeros((B16, L16, cfg.hidden_size), dt)
        route16 = jnp.zeros((B16, L16), jnp.int32)
        seg16 = jnp.ones((B16, L16), jnp.int32)
        len16 = jnp.full((B16,), L16, jnp.int32)

        def run16():
            logits16, cache16 = _prefill(params, cfg, embeds16, route16,
                                         table, seg16, len16, cache_len,
                                         "auto", use_int8)
            tokens16, _ = _decode_loop(params, cfg, cache16, logits16,
                                       len16, None, rng, steps, -1,
                                       do_sample=False)
            return np.asarray(tokens16)

        try:
            run16()  # compile warmup
            t0 = time.perf_counter()
            run16()
            result["serving_b16_tok_per_sec"] = round(
                B16 * steps / (time.perf_counter() - t0), 1)
        except Exception as e:  # noqa: BLE001 — keep the headline metric
            result["serving_b16_error"] = f"{type(e).__name__}: {e}"[:200]

    # Free the short-bench 7B tree BEFORE either follow-on bench
    # allocates (16 GB HBM budget): the composed workload builds its own
    # tree and the train bench needs ~13.7 GB of state — with the
    # longctx branch skipped (BENCH_LONGCTX=0) the old placement left
    # ~9 GB resident under train_step_bench.  del on the closed-over
    # names empties the shared cells, so run()/run16() no longer pin them.
    del params, table
    import gc
    gc.collect()

    # The composed 4-modal long-context workload (MCUB-4 shape) — the
    # reference's signature eval; BENCH_LONGCTX=0 skips (two extra 7B
    # compiles through the relay).
    if on_tpu and os.environ.get("BENCH_LONGCTX") != "0":
        try:
            result.update(composed_longctx())
        except Exception as e:  # noqa: BLE001 — keep the headline metric
            result["longctx_error"] = f"{type(e).__name__}: {e}"[:200]

    # Stage-2 train-step throughput/MFU (one more 7B compile through the
    # relay; BENCH_TRAIN=0 skips).
    if on_tpu and os.environ.get("BENCH_TRAIN") != "0":
        gc.collect()
        try:
            result.update(train_step_bench())
        except Exception as e:  # noqa: BLE001 — keep the headline metric
            result["train_error"] = f"{type(e).__name__}: {e}"[:200]

    print(json.dumps(result))


def _start_watchdog():
    """A wedged axon relay hangs even jax.devices() indefinitely (observed
    round 5: >3 h).  Rather than hang the driver forever, emit a
    parseable error JSON line and exit after MC_BENCH_WATCHDOG_S seconds
    (default 150 min — generous against a cold-cache compile ladder,
    finite against a dead relay).  MC_BENCH_WATCHDOG_S=0 disables."""
    import threading

    limit = float(os.environ.get("MC_BENCH_WATCHDOG_S", "9000"))
    if limit <= 0:
        return

    def fire():
        row = {
            "metric": "decode_tokens_per_sec_per_chip", "value": 0,
            "unit": "tokens/s", "vs_baseline": None,
            "error": f"watchdog: bench exceeded {limit:.0f}s — "
                     "TPU relay unreachable or wedged"}
        # Embed the newest prior driver capture so a wedged-relay round
        # still reports the last measured state instead of a bare zero.
        try:
            import glob
            prior = sorted(glob.glob(os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_r[0-9][0-9].json")))
            if prior:
                with open(prior[-1]) as f:
                    doc = json.load(f)
                row["last_good_round"] = {
                    "file": os.path.basename(prior[-1]),
                    # driver captures wrap the bench row under "parsed"
                    "result": doc.get("parsed", doc)}
        except Exception:
            pass
        print(json.dumps(row), flush=True)
        os._exit(3)

    t = threading.Timer(limit, fire)
    t.daemon = True
    t.start()


if __name__ == "__main__":
    _start_watchdog()
    main()
