"""Measure int8 weight-only decode vs bf16 on the real chip (zero-init int8
params built directly to avoid holding both copies)."""
import time, jax, jax.numpy as jnp, numpy as np
from __graft_entry__ import _flagship_cfg
from modelcompose_tpu.core.llama import init_params
from modelcompose_tpu.core.generate import _decode_loop, _prefill
from modelcompose_tpu.ops.quant import quantize_backbone

cfg = _flagship_cfg()
shapes = jax.eval_shape(lambda: quantize_backbone(
    init_params(cfg, jax.random.PRNGKey(0))))
params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
B, L, cache_len, steps = 1, 256, 512, 128
dt = jnp.dtype(cfg.dtype)
embeds = jnp.zeros((B, L, cfg.hidden_size), dt)
table = jnp.asarray(cfg.routing_table())
seg = jnp.ones((B, L), jnp.int32)
lengths = jnp.full((B,), L, jnp.int32)
rng = jax.random.PRNGKey(0)

def run():
    logits, cache = _prefill(params, cfg, embeds, None, table, seg, lengths, cache_len, "auto")
    tokens = _decode_loop(params, cfg, cache, logits, lengths, table, rng, steps, -1, 0.0)
    return np.asarray(tokens)

run()
t0 = time.perf_counter(); run(); t = time.perf_counter() - t0
print(f"int8 decode: {B*steps/t:.2f} tok/s ({t*1000/steps:.2f} ms/step incl prefill)")
