"""Rotary position embeddings, HF-Llama convention.

The reference relies on transformers' ``LlamaRotaryEmbedding`` +
``apply_rotary_pos_emb`` (reference: modelcompose/model/language_model/
multimodal_llama.py:190-205, 283): cos/sin tables over ``t * inv_freq`` with
the frequency vector duplicated (``emb = cat(freqs, freqs)``), and the
rotate-half pairing ``(x1, x2) = split(x, 2, axis=-1)``.
"""

import jax.numpy as jnp


def rope_tables(positions, head_dim: int, theta: float = 10000.0,
                dtype=jnp.float32):
    """cos/sin lookup for given positions.

    Args:
      positions: [...] int32 absolute positions.
      head_dim:  per-head dimension (even).

    Returns:
      (cos, sin) each [..., head_dim] float32.
    """
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                                / head_dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q, k, cos, sin):
    """Apply rotary embedding to q and k.

    q: [B, L, H, hd]; k: [B, L, Hkv, hd]; cos/sin: [B, L, hd] (or broadcastable).
    """
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    q_rot = q * cos + _rotate_half(q) * sin
    k_rot = k * cos + _rotate_half(k) * sin
    return q_rot.astype(q.dtype), k_rot.astype(k.dtype)
