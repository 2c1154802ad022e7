"""Probe: does alternating between two compiled programs per iteration
cost program-reload time through the axon relay?

The pipeline bench measured the stage-2 train loop at ~20 s/step while
the SAME step executable in a tight single-program loop runs 651 ms
(BENCH_TRAIN.jsonl), with every host-side phase ~30 ms (loop-trace).
Hypothesis: each iteration of the real loop alternates CLIP-encode and
train-step executables and the relay/runtime reloads the program binary
per switch.  This probe times (a) N back-to-back steps, then (b) N steps
with a CLIP tower encode interleaved, same process, same executables.

Run: JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache nohup python \
  scripts/probe_program_switch.py > /tmp/probe_switch.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _enable_compile_cache():
    from modelcompose_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()


def main():
    _enable_compile_cache()
    import jax

    if jax.default_backend() != "tpu":
        print(json.dumps({"error": "not on tpu"}))
        return
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__))))
    import bench_train
    from modelcompose_tpu.models.towers import build_modal_encoders
    from modelcompose_tpu.train.trainer import (TrainConfig,
                                                init_train_state,
                                                make_optimizer,
                                                make_train_step)

    cfg = bench_train.stage2_cfg()
    B, L = 2, 1024
    backbone = bench_train.zeros_like_shapes(
        lambda: __import__("modelcompose_tpu.ops.quant",
                           fromlist=["quantize_backbone"]).quantize_backbone(
            __import__("modelcompose_tpu.core.llama",
                       fromlist=["init_params"]).init_params(
                cfg, jax.random.PRNGKey(0)), quantize_lm_head=True))
    from modelcompose_tpu.models.projectors import init_projector
    import jax.numpy as jnp
    projectors = {"vision": bench_train.zeros_like_shapes(
        lambda: init_projector("mlp2x_gelu", jax.random.PRNGKey(1),
                               cfg.mm_hidden_size, cfg.hidden_size,
                               dtype=jnp.bfloat16))}
    tc = TrainConfig(learning_rate=2e-4, adam_mu_dtype="bfloat16",
                     loss_chunk=256)
    state = init_train_state(cfg, tc, backbone, projectors)
    tx, _ = make_optimizer(cfg, tc, state.params)
    step = make_train_step(cfg, tc, tx)
    span = 576 + cfg.local_prefix_tokens + cfg.local_suffix_tokens
    batch, layout = bench_train.make_batch(cfg, B, L, span)

    encoders = build_modal_encoders(cfg, jax.random.PRNGKey(2))
    pixels = jnp.zeros((B, 336, 336, 3), jnp.float32)

    # MC_PROBE_BALLAST_GB: occupy extra HBM to test whether near-full
    # memory (the train entry sits at ~15.3/15.75 GB with the CLIP tower
    # + grads resident) degrades step execution
    ballast_gb = float(os.environ.get("MC_PROBE_BALLAST_GB", "0") or 0)
    ballast = None
    if ballast_gb:
        n = int(ballast_gb * (1 << 30) // 2)
        ballast = jnp.zeros((n,), jnp.bfloat16)
        np.asarray(ballast[:1])

    # warm both executables
    state, loss = step(state, batch, layout)
    np.asarray(loss)
    np.asarray(encoders["vision"].encode(pixels))[:1, :1, :1]

    N = 6
    t0 = time.perf_counter()
    for _ in range(N):
        state, loss = step(state, batch, layout)
    np.asarray(loss)
    t_solo = (time.perf_counter() - t0) / N

    t0 = time.perf_counter()
    for _ in range(N):
        feats = encoders["vision"].encode(pixels)
        state, loss = step(state, batch, layout)
    np.asarray(loss)
    np.asarray(feats)[:1, :1, :1]
    t_mixed = (time.perf_counter() - t0) / N

    print(json.dumps({
        "solo_step_ms": round(t_solo * 1e3, 1),
        "mixed_step_ms": round(t_mixed * 1e3, 1),
        # NB: the delta includes the CLIP encode's own device time, not
        # just program-switch cost — it UPPER-BOUNDS switch overhead.
        # Subtract probe_tower_encode's encode_ms to isolate the switch.
        "mixed_minus_solo_ms": round((t_mixed - t_solo) * 1e3, 1),
    }))


def mesh_variant():
    """Same step but through the entry's mesh path: 1-device mesh,
    shard_params, ZeRO init, batch_sharding device_put, `with mesh:` —
    isolates whether the GSPMD/NamedSharding execute path is slow
    through the relay."""
    _enable_compile_cache()
    import jax
    if jax.default_backend() != "tpu":
        print(json.dumps({"error": "not on tpu"}))
        return
    import jax.numpy as jnp

    import bench_train
    from modelcompose_tpu.core.llama import init_params
    from modelcompose_tpu.models.projectors import init_projector
    from modelcompose_tpu.ops.quant import quantize_backbone
    from modelcompose_tpu.parallel.mesh import (batch_sharding,
                                                mesh_for_batch,
                                                shard_params)
    from modelcompose_tpu.train.trainer import (TrainConfig,
                                                init_train_state,
                                                make_optimizer,
                                                make_train_step)

    cfg = bench_train.stage2_cfg()
    B, L = 2, 1024
    backbone = bench_train.zeros_like_shapes(
        lambda: quantize_backbone(init_params(cfg, jax.random.PRNGKey(0)),
                                  quantize_lm_head=True))
    projectors = {"vision": bench_train.zeros_like_shapes(
        lambda: init_projector("mlp2x_gelu", jax.random.PRNGKey(1),
                               cfg.mm_hidden_size, cfg.hidden_size,
                               dtype=jnp.bfloat16))}
    mesh = mesh_for_batch(B, allow_partial=True)
    backbone = shard_params(backbone, mesh)
    tc = TrainConfig(learning_rate=2e-4, adam_mu_dtype="bfloat16",
                     loss_chunk=256)
    state = init_train_state(cfg, tc, backbone, projectors, mesh=mesh)
    tx, _ = make_optimizer(cfg, tc, state.params)
    step = make_train_step(cfg, tc, tx)
    span = 576 + cfg.local_prefix_tokens + cfg.local_suffix_tokens
    batch, layout = bench_train.make_batch(cfg, B, L, span)
    bs = batch_sharding(mesh)
    with mesh:
        batch = {k: jax.device_put(v, bs) if k != "encoder_features"
                 else {m: jax.device_put(f, bs) for m, f in v.items()}
                 for k, v in batch.items()}
        state, loss = step(state, batch, layout)
        np.asarray(loss)
        N = 6
        t0 = time.perf_counter()
        for _ in range(N):
            state, loss = step(state, batch, layout)
        np.asarray(loss)
        t = (time.perf_counter() - t0) / N
    print(json.dumps({"mesh_step_ms": round(t * 1e3, 1)}))


if __name__ == "__main__":
    if os.environ.get("MC_PROBE_MESH") == "1":
        mesh_variant()
    else:
        main()
