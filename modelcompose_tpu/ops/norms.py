"""RMSNorm with Llama semantics: fp32 statistics, cast back to input dtype
(reference uses transformers' LlamaRMSNorm; see modelcompose/model/
language_model/multimodal_llama.py:403-406 usage)."""

import jax
import jax.numpy as jnp


def rms_norm(x, weight, eps: float = 1e-5):
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(dtype)
