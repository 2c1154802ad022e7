"""Effective-batch training bench (round-4 VERDICT weak #3).

The reference trains at global batch 128 (bs 16 x 8 GPUs,
run_finetune_vision_damc.sh); on one chip the route there is gradient
accumulation.  This measures the accumulation recipe's real throughput:

- accum in {1, 4, 16} at the production point (stage-2 int8 base,
  b2 x 2048), ALL through the make_grad_and_apply path the train entry
  uses (running donated accumulation, peak = 2 grad trees at any depth);
  accum=1 vs the fused make_train_step number (bench.py train_*) prices
  the split grad/apply overhead itself;
- a b8 x 2048 retry (round-4 compile failed on a transient relay 500;
  the persistent compile cache changes the odds);
- b4-anomaly probe: grad-only timing at b2/b4 to locate whether the
  5% per-token regression (0.670 -> 0.633 MFU) lives in fwd+bwd or in
  the optimizer/update half of the step.

Appends rows to BENCH_TRAIN.jsonl.
Run: nohup python scripts/bench_train_accum.py > /tmp/bench_accum.log &
"""

import gc
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import bench_train  # noqa: E402


def run_accum_variant(name, cfg, B, L, accum, steps=3):
    """tokens/s over `steps` FULL optimizer steps (= steps*accum
    micro-batches) through the train entry's accumulation path."""
    import jax
    import jax.numpy as jnp
    from modelcompose_tpu.train.trainer import (TrainConfig,
                                                init_train_state,
                                                make_grad_and_apply,
                                                make_optimizer,
                                                scale_grads)

    from modelcompose_tpu.core.llama import init_params
    from modelcompose_tpu.ops.quant import quantize_backbone
    backbone = bench_train.zeros_like_shapes(
        lambda: quantize_backbone(init_params(cfg, jax.random.PRNGKey(0)),
                                  quantize_lm_head=True))
    from modelcompose_tpu.models.projectors import init_projector
    projectors = {"vision": bench_train.zeros_like_shapes(
        lambda: init_projector("mlp2x_gelu", jax.random.PRNGKey(1),
                               cfg.mm_hidden_size, cfg.hidden_size,
                               dtype=jnp.bfloat16))}
    tc = TrainConfig(learning_rate=2e-4, mm_projector_lr=2e-5,
                     mm_language_lr=1e-5, warmup_ratio=0.03,
                     total_steps=1000, adam_mu_dtype="bfloat16",
                     loss_chunk=256)
    state = init_train_state(cfg, tc, backbone, projectors)
    tx, _ = make_optimizer(cfg, tc, state.params)
    grad_fn, apply_fn, _, grad_accum_fn = make_grad_and_apply(cfg, tc, tx)
    batch, layout = bench_train.make_batch(
        cfg, B, L, 576 + cfg.local_prefix_tokens + cfg.local_suffix_tokens)

    def opt_step(state):
        # the entry's path: first micro-step's grads ARE the total,
        # later micro-steps fold in via the FUSED donated grad_accum_fn
        # (the split grad-then-accumulate holds a third grad tree during
        # the backward and exceeds 16 GB HBM at this geometry)
        loss, total = grad_fn(state.params, batch, layout)
        for _ in range(accum - 1):
            loss, total = grad_accum_fn(state.params, total, batch, layout)
        total = scale_grads(total, 1.0 / accum)
        return apply_fn(state, total), loss

    # warmup (compile grad_fn/accumulate/apply_fn)
    state, loss = opt_step(state)
    np.asarray(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = opt_step(state)
    float(np.asarray(loss))  # D2H hard sync through the relay
    dt = (time.perf_counter() - t0) / steps
    toks = accum * B * L
    res = {"variant": name, "batch": B, "seq": L, "accum": accum,
           "effective_batch": accum * B,
           "opt_step_ms": round(dt * 1e3, 1),
           "tokens_per_sec": round(toks / dt, 1)}
    del state, batch, backbone, projectors
    gc.collect()
    return res


def run_gradonly_probe(name, cfg, B, L, steps=4):
    """fwd+bwd only (no optimizer): locates the b4 anomaly."""
    import jax
    import jax.numpy as jnp
    from modelcompose_tpu.train.trainer import (TrainConfig,
                                                make_grad_and_apply,
                                                make_optimizer,
                                                init_train_state)

    from modelcompose_tpu.core.llama import init_params
    from modelcompose_tpu.ops.quant import quantize_backbone
    backbone = bench_train.zeros_like_shapes(
        lambda: quantize_backbone(init_params(cfg, jax.random.PRNGKey(0)),
                                  quantize_lm_head=True))
    from modelcompose_tpu.models.projectors import init_projector
    projectors = {"vision": bench_train.zeros_like_shapes(
        lambda: init_projector("mlp2x_gelu", jax.random.PRNGKey(1),
                               cfg.mm_hidden_size, cfg.hidden_size,
                               dtype=jnp.bfloat16))}
    tc = TrainConfig(learning_rate=2e-4, warmup_ratio=0.03,
                     total_steps=1000, adam_mu_dtype="bfloat16",
                     loss_chunk=256)
    state = init_train_state(cfg, tc, backbone, projectors)
    tx, _ = make_optimizer(cfg, tc, state.params)
    grad_fn, _, _, grad_accum_fn = make_grad_and_apply(cfg, tc, tx)
    batch, layout = bench_train.make_batch(
        cfg, B, L, 576 + cfg.local_prefix_tokens + cfg.local_suffix_tokens)

    loss, total = grad_fn(state.params, batch, layout)
    np.asarray(loss)
    # thread a data dependency through iterations (CSE trap): each
    # grad_fn call is state-independent and jit caches on shapes — time
    # the fused chain where the accumulator consumes every result so
    # none can be elided.
    t0 = time.perf_counter()
    for _ in range(steps):
        loss, total = grad_accum_fn(state.params, total, batch, layout)
    float(np.asarray(loss))
    np.asarray(jax.tree.leaves(total)[0])
    dt = (time.perf_counter() - t0) / steps
    res = {"variant": name, "batch": B, "seq": L,
           "grad_ms": round(dt * 1e3, 1),
           "grad_tokens_per_sec": round(B * L / dt, 1)}
    del state, batch, backbone, projectors, total
    gc.collect()
    return res


def run_aot_peak(name, cfg, B, L):
    """AOT memory analysis only (no execution, no HBM): round-4's b8
    failed on a transient compile 500, but the b4 analysis already shows
    17.6 GB implied peak on a 15.75 GB chip — b8 is structurally out.
    Record XLA's own number instead of burning chip time on a known OOM
    (one OOM also wedges the relay for ~10 min, poisoning the queue)."""
    import jax
    import jax.numpy as jnp
    from modelcompose_tpu.core.llama import init_params
    from modelcompose_tpu.models.projectors import init_projector
    from modelcompose_tpu.ops.quant import quantize_backbone
    from modelcompose_tpu.train.trainer import (TrainConfig,
                                                init_train_state,
                                                make_optimizer,
                                                make_train_step)
    backbone_s = jax.eval_shape(lambda: quantize_backbone(
        init_params(cfg, jax.random.PRNGKey(0)), quantize_lm_head=True))
    proj_s = {"vision": jax.eval_shape(lambda: init_projector(
        "mlp2x_gelu", jax.random.PRNGKey(1), cfg.mm_hidden_size,
        cfg.hidden_size, dtype=jnp.bfloat16))}
    tc = TrainConfig(learning_rate=2e-4, mm_projector_lr=2e-5,
                     mm_language_lr=1e-5, warmup_ratio=0.03,
                     total_steps=1000, adam_mu_dtype="bfloat16",
                     loss_chunk=256)
    state_s = jax.eval_shape(lambda b, p: init_train_state(cfg, tc, b, p),
                             backbone_s, proj_s)
    tx, _ = make_optimizer(cfg, tc, state_s.params)
    step = make_train_step(cfg, tc, tx)
    batch, layout = bench_train.make_batch(
        cfg, B, L, 576 + cfg.local_prefix_tokens + cfg.local_suffix_tokens)
    batch_s = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), batch)
    c = step.lower(state_s, batch_s, layout).compile()
    m = c.memory_analysis()
    gb = {k: round(getattr(m, k + "_size_in_bytes") / 2**30, 2)
          for k in ("argument", "output", "temp", "alias")}
    peak = round(gb["argument"] + gb["temp"] + gb["output"] - gb["alias"], 2)
    return {"variant": name, "batch": B, "seq": L, "aot_only": True,
            "gb": gb, "implied_peak_gb": peak,
            "fits_15.75": peak <= 15.75}


def main():
    bench_train._enable_compile_cache()
    import jax
    if jax.default_backend() != "tpu":
        print(json.dumps({"error": "not on tpu"}))
        return
    cfg = bench_train.stage2_cfg()
    out = open(os.path.join(REPO, "BENCH_TRAIN.jsonl"), "a")

    def emit(res):
        print(json.dumps(res), flush=True)
        out.write(json.dumps(res) + "\n")
        out.flush()

    catalog = {
        "accum1": ("accum", "stage2-int8-b2-accum1",
                   dict(B=2, L=2048, accum=1)),
        "accum4": ("accum", "stage2-int8-b2-accum4",
                   dict(B=2, L=2048, accum=4)),
        "accum16": ("accum", "stage2-int8-b2-accum16",
                    dict(B=2, L=2048, accum=16)),
        "b8": ("aot", "stage2-int8-b8-retry", dict(B=8, L=2048)),
        "gradonly-b2": ("gradonly", "gradonly-b2", dict(B=2, L=2048)),
        "gradonly-b4": ("gradonly", "gradonly-b4", dict(B=4, L=2048)),
    }
    which = os.environ.get("MC_ACCUM_ONLY", "")
    if not which:
        # parent mode: one SUBPROCESS per variant — a variant's OOM (or
        # the relay's post-OOM wedge) must not cascade into the next
        # (measured round 5: in-process `del` + gc does not reliably
        # return HBM before the next variant's compile)
        import subprocess
        for key in catalog:
            subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env={**os.environ, "MC_ACCUM_ONLY": key})
        return
    todo = [catalog[which]] if which in catalog else []

    for kind, name, kw in todo:
        try:
            if kind == "accum":
                res = run_accum_variant(name, cfg, **kw)
            elif kind == "gradonly":
                res = run_gradonly_probe(name, cfg, **kw)
            elif kind == "aot":
                res = run_aot_peak(name, cfg, **kw)
            else:
                res = bench_train.run_variant(name, cfg, kw.pop("B"),
                                              kw.pop("L"), **kw)
        except Exception as e:  # noqa: BLE001
            import traceback
            traceback.print_exc()
            res = {"variant": name, "error": f"{type(e).__name__}: {e}"[:300]}
            gc.collect()
        emit(res)
    out.close()


if __name__ == "__main__":
    main()
