"""Greedy/temperature generation with a preallocated KV cache.

Replaces the reference's HF ``model.generate`` + tuple-concat cache path
(reference: modelcompose/eval/model_multimodal_qa_loader.py:93-102 and
modelcompose/model/language_model/multimodal_llama.py:284-289).  Prefill runs
the full routed multimodal forward once; decode steps run with the 'default'
route class only, matching reference decode semantics (reference:
multimodal_llama.py:436-438, multimodal_arch.py:290-293).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from .llama import KVCache, forward, forward_hidden_routed

@functools.partial(jax.jit, static_argnames=("cfg", "max_len", "attn_impl",
                                              "kv_quant"))
def _prefill(params, cfg: ModelConfig, inputs_embeds, route_ids,
             routing_table, segment_ids, lengths, max_len: int,
             attn_impl: str, kv_quant: bool = False):
    B, L, _ = inputs_embeds.shape
    cache = KVCache.zeros(cfg, B, max_len, quantized=kv_quant)
    hidden, cache = forward_hidden_routed(
        params, cfg, inputs_embeds, route_ids=route_ids,
        routing_table=routing_table, segment_ids=segment_ids,
        cache=cache, attn_impl=attn_impl)
    # Only the last valid position feeds decoding: gather it BEFORE the
    # lm_head so prefill skips the [B, L, V] logits GEMM + fp32 buffer
    # (0.5 GB at the 4096 bucket; the reference computes logits over the
    # whole prompt, eval loop: model_multimodal_qa_loader.py:93-102).
    last_h = jnp.take_along_axis(
        hidden, (lengths - 1)[:, None, None].astype(jnp.int32), axis=1)
    from .llama import logits_from_hidden
    return logits_from_hidden(params, last_h)[:, 0], cache


@functools.partial(jax.jit, static_argnames=("cfg", "offset", "chunk",
                                             "attn_impl"),
                   donate_argnums=(2,))
def _prefill_chunk_step(params, cfg: ModelConfig, cache, embeds_chunk,
                        route_chunk, routing_table, offset: int, chunk: int,
                        attn_impl: str):
    """One chunk of a chunked prefill: write k/v at [offset, offset+chunk)
    and attend causally with the query offset.  Static per (offset, chunk)
    — a bounded set per bucket."""
    B = embeds_chunk.shape[0]
    positions = jnp.broadcast_to(
        offset + jnp.arange(chunk, dtype=jnp.int32), (B, chunk))
    hidden, cache = forward_hidden_routed(
        params, cfg, embeds_chunk, route_ids=route_chunk,
        routing_table=routing_table, positions=positions, cache=cache,
        cache_write_pos=jnp.full((B,), offset, jnp.int32),
        attn_impl=attn_impl, q_offset=offset)
    return hidden, cache


def prefill_chunked(params, cfg: ModelConfig, inputs_embeds, route_ids,
                    routing_table, lengths, cache_len: int,
                    chunk: int = 256, attn_impl: str = "auto",
                    tick_cb=None, kv_quant: bool = False):
    """Chunked prefill for batch-1, right-padded prompts (the
    serve/slot_engine admission shape): the prompt is processed in
    ``chunk``-token pieces so the caller can interleave work between
    pieces (``tick_cb()`` runs after each chunk — the slot scheduler's
    decode tick).  With ``kv_quant=False`` it produces the same
    (last-position logits, cache) as ``_prefill``; parity is pinned in
    tests/test_chunked_prefill.py.

    Causal masking with the query offset exposes exactly the initialized
    cache prefix, so no segment ids are needed for a single right-padded
    sample.

    ``kv_quant=True`` quantizes each chunk's k/v into an int8 cache at
    append time and later chunks attend over the DEQUANTIZED prefix —
    the same approximation class as the int8-KV decode path
    (ops/attention.decode_attention), applied one phase earlier.  This
    bounds the admission transient to the int8 cache (0.95 GB at
    7B/3456 vs 3.6 GB bf16), which is what lets a long-context
    admission fit next to the 7B weights and the slot pool on a 16 GB
    chip; the small logits difference vs one-shot bf16-read prefill is
    pinned in tests/test_chunked_prefill.py."""
    from .llama import logits_from_hidden

    B, L, _ = inputs_embeds.shape
    assert B == 1, "chunked prefill supports batch-1 admission"
    chunk = max(1, min(chunk, L))
    # chunk sizes: full chunks plus a ragged tail (one extra compile per
    # distinct tail size — bounded by the bucket set)
    sizes = [chunk] * (L // chunk)
    if L % chunk:
        sizes.append(L % chunk)
    cache = KVCache.zeros(cfg, B, cache_len, quantized=kv_quant)
    if routing_table is not None:
        routing_table = jnp.asarray(routing_table)
    last_idx = int(np.asarray(lengths)[0]) - 1
    logits = None
    off = 0
    for size in sizes:
        rc = None if route_ids is None else \
            jnp.asarray(route_ids)[:, off:off + size]
        hidden, cache = _prefill_chunk_step(
            params, cfg, cache, inputs_embeds[:, off:off + size], rc,
            routing_table, off, size, attn_impl)
        if off <= last_idx < off + size:
            logits = logits_from_hidden(
                params, hidden[:, last_idx - off][:, None])[:, 0]
        off += size
        if tick_cb is not None:
            tick_cb()
    return logits, cache


@functools.partial(jax.jit,
                   static_argnames=("cfg", "max_steps", "do_sample",
                                    "use_top_p"),
                   donate_argnums=(2,))
def _decode_loop(params, cfg: ModelConfig, cache, first_logits, kv_lens,
                 routing_table, rng, max_steps: int, eos_id,
                 do_sample: bool = False, temperature=1.0, top_p=1.0,
                 use_top_p: bool = False):
    """Device-side greedy/sampled decode: the whole token loop runs inside
    one compiled program (lax.scan over steps), so no host round-trip per
    token — the TPU-native replacement for HF generate's python loop.

    ``temperature``/``top_p`` are TRACED scalar operands (per-value
    recompiles would be a foot-gun for per-request sampling params); only
    the structural switches — sample-vs-greedy and whether the top-p sort
    exists in the program at all — are static.

    Returns ([B, max_steps] token ids, final cache).  The cache is both
    donated AND returned so XLA can alias the input buffer to the output
    (donation with no matching output is unusable and leaves a second
    multi-GB cache copy resident in HBM); callers discard the returned
    cache."""
    B = first_logits.shape[0]
    eos = jnp.asarray(eos_id, jnp.int32)

    def pick(logits, key):
        # Deliberately NOT sampling.sample_logits: that entry pays the
        # [B, V] top-p sort unconditionally, while the static use_top_p /
        # do_sample switches keep the greedy eval program (the headline
        # decode bench) free of it.  The top-p math itself is shared
        # (top_p_filter); keep any semantics change in sync with
        # core/sampling.py.
        if do_sample:
            scaled = logits / temperature
            if use_top_p:
                from .sampling import top_p_filter
                scaled = top_p_filter(scaled.astype(jnp.float32),
                                      top_p.astype(jnp.float32))
            return jax.random.categorical(
                key, scaled, axis=-1).astype(jnp.int32)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def step(carry, _):
        cache, logits, kv_lens, done, key = carry
        key, sub = jax.random.split(key)
        tokens = pick(logits, sub)
        tokens = jnp.where(done, eos, tokens)
        new_done = done | (tokens == eos)
        embeds = jnp.take(params["embed_tokens"], tokens, axis=0)[:, None]
        positions = kv_lens[:, None].astype(jnp.int32)
        logits, cache = forward(
            params, cfg, embeds, route_ids=None,
            routing_table=routing_table, positions=positions, cache=cache,
            cache_write_pos=kv_lens, kv_lens=kv_lens + 1)
        return (cache, logits[:, 0], kv_lens + 1, new_done, key), tokens

    done0 = jnp.zeros((B,), bool)
    (cache, _, _, _, _), tokens = jax.lax.scan(
        step, (cache, first_logits, kv_lens, done0, rng), None,
        length=max_steps)
    return tokens.T, cache  # [B, max_steps]


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2,))
def _decode_step(params, cfg: ModelConfig, cache, tokens, kv_lens,
                 routing_table):
    """One decode step. tokens: [B] int32; kv_lens: [B] valid cache length
    before this token. Returns (logits [B, V], cache, kv_lens+1)."""
    embeds = jnp.take(params["embed_tokens"], tokens, axis=0)[:, None, :]
    positions = kv_lens[:, None].astype(jnp.int32)
    logits, cache = forward(
        params, cfg, embeds, route_ids=None, routing_table=routing_table,
        positions=positions, cache=cache, cache_write_pos=kv_lens,
        kv_lens=kv_lens + 1)
    return logits[:, 0], cache, kv_lens + 1


def generate(params, cfg: ModelConfig, inputs_embeds, *, lengths,
             route_ids=None, routing_table=None, segment_ids=None,
             max_new_tokens: int = 128, eos_token_id: Optional[int] = None,
             temperature: float = 0.0, top_p: float = 1.0, rng=None,
             cache_len: Optional[int] = None,
             attn_impl: str = "auto", device_loop: bool = True,
             fold_decode=False, kv_quant: bool = False):
    """Generate token ids.

    Args:
      inputs_embeds: [B, L, H] packed prompt embeddings (right-padded).
      lengths: [B] true prompt lengths.
      route_ids: [B, L] route classes for the prompt (None = all default).
      segment_ids: [B, L]; defaults to positions < lengths.
      fold_decode: False; True/'concat' (compact default-route adapters
        into one low-rank pair, extra HBM residency); or 'dense' (fold the
        default mix into W and rebase the routing table — prefill stays
        identical, decode skips the adapter branch entirely, zero extra
        residency; see ops/routed_lora.fold_dense).

    Returns:
      list of per-sample python lists of generated token ids (EOS excluded).
    """
    B, L, _ = inputs_embeds.shape
    if cache_len is None:
        cache_len = L + max_new_tokens
    lengths = jnp.asarray(lengths, jnp.int32)
    if segment_ids is None:
        segment_ids = (jnp.arange(L)[None, :] < lengths[:, None]).astype(
            jnp.int32)
    if routing_table is not None:
        routing_table = jnp.asarray(routing_table)
    eos = cfg.eos_token_id if eos_token_id is None else eos_token_id

    decode_params, decode_table = params, routing_table
    if fold_decode == "dense" and routing_table is not None:
        # Fold the static default mix into W once; the rebased table keeps
        # prefill identical and decode drops the adapter branch entirely.
        from ..ops.routed_lora import fold_dense
        params, routing_table = fold_dense(params, routing_table)
        decode_params, decode_table = params, None
    elif routing_table is not None and \
            not np.any(np.asarray(routing_table)[0]):
        # Already-folded params (loader --fold-decode): the default row is
        # all-zero, so decode skips the adapter branch instead of streaming
        # every LoRA stack multiplied by zero.
        decode_table = None

    logits, cache = _prefill(params, cfg, inputs_embeds, route_ids,
                             routing_table, segment_ids, lengths, cache_len,
                             attn_impl, kv_quant)

    if fold_decode in (True, "concat") and routing_table is not None:
        # Compact the default-route adapters into one low-rank pair so
        # the step stops streaming inactive adapter rows from HBM —
        # but the folded copies stay resident NEXT TO the full params,
        # which can exceed HBM at 7B; 'dense' is the zero-residency fold.
        # (Applies to BOTH decode loops: the host loop used to ignore it
        # and stream every stacked adapter times an all-zero route row.)
        from ..ops.routed_lora import fold_decode_adapters
        decode_params, decode_table = fold_decode_adapters(
            params, np.asarray(routing_table)[0])

    if device_loop:
        # One compiled program for the whole decode; a single host sync.
        if rng is None:
            rng = jax.random.PRNGKey(0)
        do_sample = bool(temperature and temperature > 0.0)
        use_top_p = bool(do_sample and top_p is not None and top_p < 1.0)
        tokens, _ = _decode_loop(
            decode_params, cfg, cache, logits, lengths, decode_table, rng,
            max_new_tokens, -1 if eos is None else int(eos), do_sample,
            jnp.float32(temperature or 1.0),
            jnp.float32(1.0 if top_p is None else top_p), use_top_p)
        host = np.asarray(tokens)
        outputs = []
        for b in range(B):
            row = host[b].tolist()
            if eos is not None and eos in row:
                row = row[:row.index(eos)]
            outputs.append(row)
        return outputs

    if rng is None and temperature and temperature > 0.0:
        rng = jax.random.PRNGKey(0)
    kv_lens = lengths
    outputs = [[] for _ in range(B)]
    done = np.zeros(B, dtype=bool)
    for step in range(max_new_tokens):
        if temperature and temperature > 0.0:
            # delegate to the ONE sampling implementation (core/sampling —
            # HF-exact top-p, reference greedy gate) rather than keeping
            # a third copy of the temperature/top-p pipeline here
            from .sampling import sample_step
            rng, sub = jax.random.split(rng)
            tokens = sample_step(
                sub, logits, jnp.float32(temperature),
                jnp.float32(1.0 if top_p is None else top_p))
        else:
            tokens = jnp.argmax(logits, axis=-1)
        tokens = tokens.astype(jnp.int32)
        host_tokens = np.asarray(tokens)
        for b in range(B):
            if not done[b]:
                if eos is not None and host_tokens[b] == eos:
                    done[b] = True
                else:
                    outputs[b].append(int(host_tokens[b]))
        if done.all():
            break
        if step == max_new_tokens - 1:
            break
        logits, cache, kv_lens = _decode_step(decode_params, cfg, cache,
                                              tokens, kv_lens, decode_table)
    return outputs
