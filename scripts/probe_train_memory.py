"""Compile-time HBM analysis of the stage-2 train programs (no device
allocation: everything is AOT-lowered from jax.ShapeDtypeStruct trees).

Diagnoses the accum-bench RESOURCE_EXHAUSTED (round 5): compares XLA's
own memory analysis for
  - the FUSED make_train_step (the program behind the round-4
    2,924 tok/s row),
  - the split grad_fn / apply_fn pair behind --gradient_accumulation
    (scripts/bench_train_accum.py), at b2 and b4.

Per program prints argument/output/temp/alias bytes and the implied
peak; the split path's peak must also coexist with the buffers the
program does NOT touch (e.g. Adam moments during grad_fn), which this
script adds up host-side from the state template.

Run: timeout 3000 python scripts/probe_train_memory.py
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import bench_train  # noqa: E402


def tree_abstract(tree):
    import jax
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)


def tree_bytes(tree):
    import jax
    return sum(np.prod(l.shape) * np.dtype(l.dtype).itemsize
               for l in jax.tree.leaves(tree)
               if hasattr(l, "shape"))


def mem_report(compiled):
    m = compiled.memory_analysis()
    return {k: round(getattr(m, k + "_size_in_bytes") / 2**30, 3)
            for k in ("argument", "output", "temp", "alias",
                      "generated_code")}


def main():
    bench_train._enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from modelcompose_tpu.core.llama import init_params
    from modelcompose_tpu.models.projectors import init_projector
    from modelcompose_tpu.ops.quant import quantize_backbone
    from modelcompose_tpu.train.trainer import (TrainConfig,
                                                init_train_state,
                                                make_grad_and_apply,
                                                make_optimizer,
                                                make_train_step)

    cfg = bench_train.stage2_cfg()
    tc = TrainConfig(learning_rate=2e-4, mm_projector_lr=2e-5,
                     mm_language_lr=1e-5, warmup_ratio=0.03,
                     total_steps=1000, adam_mu_dtype="bfloat16",
                     loss_chunk=256)

    # abstract state: shapes only, no buffers
    backbone_s = jax.eval_shape(lambda: quantize_backbone(
        init_params(cfg, jax.random.PRNGKey(0)), quantize_lm_head=True))
    proj_s = {"vision": jax.eval_shape(lambda: init_projector(
        "mlp2x_gelu", jax.random.PRNGKey(1), cfg.mm_hidden_size,
        cfg.hidden_size, dtype=jnp.bfloat16))}
    state_s = jax.eval_shape(
        lambda b, p: init_train_state(cfg, tc, b, p), backbone_s, proj_s)
    tx, _ = make_optimizer(cfg, tc, state_s.params)

    print(json.dumps({
        "resident_gb": {
            "params": round(tree_bytes(state_s.params) / 2**30, 2),
            "opt_state": round(tree_bytes(state_s.opt_state) / 2**30, 2),
            "state_total": round(tree_bytes(state_s) / 2**30, 2)}}),
        flush=True)

    for B in (2, 4):
        batch, layout = bench_train.make_batch(
            cfg, B, 2048,
            576 + cfg.local_prefix_tokens + cfg.local_suffix_tokens)
        batch_s = tree_abstract(batch)

        fused = make_train_step(cfg, tc, tx)
        c = fused.lower(state_s, batch_s, layout).compile()
        print(json.dumps({"program": f"fused-b{B}",
                          "gb": mem_report(c)}), flush=True)

        grad_fn, apply_fn, accumulate, grad_accum_fn = \
            make_grad_and_apply(cfg, tc, tx)
        cg = grad_fn.lower(state_s.params, batch_s, layout).compile()
        print(json.dumps({"program": f"grad_fn-b{B}",
                          "gb": mem_report(cg)}), flush=True)

        grads_s = jax.eval_shape(
            lambda p, b: grad_fn(p, b, layout), state_s.params, batch_s)[1]
        ca = apply_fn.lower(state_s, grads_s).compile()
        print(json.dumps({"program": f"apply_fn-b{B}",
                          "gb": mem_report(ca)}), flush=True)
        cac = accumulate.lower(grads_s, grads_s, 1.0).compile()
        print(json.dumps({"program": f"accumulate-b{B}",
                          "gb": mem_report(cac)}), flush=True)
        cfa = grad_accum_fn.lower(state_s.params, grads_s, batch_s,
                                  layout).compile()
        print(json.dumps({"program": f"grad_accum_fused-b{B}",
                          "gb": mem_report(cfa)}), flush=True)


if __name__ == "__main__":
    main()
