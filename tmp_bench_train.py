"""7B DAMC train-step throughput on one chip (batch 2 x 1024 tokens)."""
import time, jax, jax.numpy as jnp, numpy as np
from __graft_entry__ import _flagship_cfg
from modelcompose_tpu.config import ModelConfig
import dataclasses
from modelcompose_tpu.core.llama import init_params
from modelcompose_tpu.train.trainer import (TrainConfig, init_train_state,
                                            make_optimizer, make_train_step)

cfg = _flagship_cfg()
cfg.remat = True
B, L = 2, 1024
shapes = jax.eval_shape(lambda: init_params(cfg, jax.random.PRNGKey(0)))
params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
# tiny projector (frozen towers excluded; projector included)
from modelcompose_tpu.models.projectors import init_projector
proj = {"vision": init_projector("mlp2x_gelu", jax.random.PRNGKey(1), 1024,
                                 cfg.hidden_size, dtype=jnp.bfloat16)}

tc = TrainConfig(learning_rate=2e-4, total_steps=100)
state = init_train_state(cfg, tc, params, proj)
tx, _ = make_optimizer(cfg, tc, state.params)
step = make_train_step(cfg, tc, tx)

n_img = 1
span = 576 + 10
batch = {
    "encoder_features": {"vision": jnp.zeros((n_img, 576, 1024),
                                             jnp.bfloat16)},
    "token_ids": jnp.zeros((B, L), jnp.int32),
    "feat_idx": jnp.zeros((B, L), jnp.int32),
    "is_feat": jnp.zeros((B, L), bool),
    "route_ids": jnp.zeros((B, L), jnp.int32),
    "labels": jnp.ones((B, L), jnp.int32),
    "segment_ids": jnp.ones((B, L), jnp.int32),
}
layout = (("vision", n_img, 586),)
# NOTE feat layout mismatch vs encoder feats+prefix/suffix; the loss path
# concatenates prefix/suffix (5+5) onto 576 -> 586. OK.
state, loss = step(state, batch, layout)
_ = float(loss)
t0 = time.perf_counter()
for _ in range(4):
    state, loss = step(state, batch, layout)
_ = float(loss)
dt = (time.perf_counter() - t0) / 4
toks = B * L / dt
from modelcompose_tpu.utils.profiling import train_step_flops
tflops = train_step_flops(cfg, B * L) / dt / 1e12
print(f"train step: {dt*1000:.1f} ms, {toks:.0f} tokens/s/chip, "
      f"{tflops:.1f} TFLOP/s")
