"""RMSNorm with Llama semantics: fp32 statistics, cast back to input dtype
(reference uses transformers' LlamaRMSNorm; see modelcompose/model/
language_model/multimodal_llama.py:403-406 usage)."""

import jax
import jax.numpy as jnp


def rms_norm(x, weight, eps: float = 1e-5):
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    # HF 4.31 LlamaRMSNorm casts the normed states back to the input dtype
    # BEFORE the weight multiply (weight * hidden.to(input_dtype)); keep
    # that order so bf16 activations round identically to the reference.
    normed = (xf * jax.lax.rsqrt(var + eps)).astype(dtype)
    return weight.astype(dtype) * normed
