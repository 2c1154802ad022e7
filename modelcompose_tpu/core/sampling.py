"""Device-side token sampling: temperature + top-p (nucleus), jitted.

The reference worker samples through HF ``generate(temperature, top_p,
do_sample)`` (reference: modelcompose/serve/model_worker.py:156-178, UI
default top_p 0.7 at gradio_web_server.py:339-340).  The TPU-native design
samples ON DEVICE so streaming paths fetch only token ids per step — no
[B, V] logits round-trip — and ``top_p`` is honored end-to-end.

Semantics match HF's processor stack exactly:
- temperature scaling first, then the TopP warper
  (transformers TopPLogitsWarper: ascending sort, softmax-cumsum, drop
  tokens with cumulative mass <= 1 - top_p, always keeping at least one),
  then categorical sampling;
- rows with temperature <= 1e-4 decode greedily (argmax of the raw
  logits), matching the reference's ``do_sample = temperature > 0.001``
  gate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# the reference worker's gate is do_sample = temperature > 0.001
# (model_worker.py) — rows at or below this sample greedily
GREEDY_TEMP = 1e-3


def entropy_seed() -> int:
    """OS-entropy seed for PRNGKey when the caller supplies none — a
    fixed default key would make every worker replay identical "random"
    streams across restarts/replicas."""
    import os

    return int.from_bytes(os.urandom(4), "little")


def top_p_filter(scaled_logits: jax.Array, top_p: jax.Array) -> jax.Array:
    """Mask logits outside the top-p nucleus to -inf.

    scaled_logits: [..., V] (already temperature-scaled); top_p: [...] or
    scalar in (0, 1].  HF-exact: ascending sort, cumulative softmax mass,
    remove tokens with ``cumsum <= 1 - top_p`` (the lowest-probability
    tail), keep at least the top-1 token.  top_p >= 1 removes nothing.
    """
    top_p = jnp.asarray(top_p, scaled_logits.dtype)[..., None]
    sorted_idx = jnp.argsort(scaled_logits, axis=-1)  # ascending
    sorted_logits = jnp.take_along_axis(scaled_logits, sorted_idx, axis=-1)
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    remove_sorted = cum <= (1.0 - top_p)
    # min_tokens_to_keep=1: the last ascending slot (the argmax) survives
    remove_sorted = remove_sorted.at[..., -1].set(False)
    # scatter the mask back to vocabulary order
    remove = jnp.zeros_like(remove_sorted)
    remove = jnp.put_along_axis(remove, sorted_idx, remove_sorted, axis=-1,
                                inplace=False)
    return jnp.where(remove, jnp.finfo(scaled_logits.dtype).min,
                     scaled_logits)


def sample_logits(key, logits: jax.Array, temperature, top_p) -> jax.Array:
    """[B, V] fp32 logits -> [B] int32 tokens, fully on device.

    temperature/top_p: [B] arrays (or scalars); rows with
    temperature <= GREEDY_TEMP take argmax of the raw logits (bit-identical
    to greedy decode), other rows sample
    softmax(top_p_filter(logits / temperature)).
    """
    logits = logits.astype(jnp.float32)
    temperature = jnp.broadcast_to(
        jnp.asarray(temperature, jnp.float32), logits.shape[:-1])
    top_p = jnp.broadcast_to(
        jnp.asarray(top_p, jnp.float32), logits.shape[:-1])
    greedy = temperature <= GREEDY_TEMP
    safe_temp = jnp.where(greedy, 1.0, temperature)[..., None]
    filtered = top_p_filter(logits / safe_temp, top_p)
    sampled = jax.random.categorical(key, filtered, axis=-1)
    return jnp.where(greedy, jnp.argmax(logits, axis=-1),
                     sampled).astype(jnp.int32)


@functools.partial(jax.jit)
def sample_step(key, logits, temperature, top_p):
    """Jitted entry for the streaming engines: one [B] token draw."""
    return sample_logits(key, logits, temperature, top_p)
