"""Functional Llama backbone with stacked per-modality LoRA adapters.

TPU-native redesign of the reference's ``MultimodalLlamaModel`` /
``MultimodalLlamaForCausalLM`` (reference: modelcompose/model/language_model/
multimodal_llama.py:471-770):

- Parameters are a pytree with the *layer axis stacked* so the decoder runs
  as one ``lax.scan`` — a single compiled layer body regardless of depth.
- Per-modality adapters are stacked on a leading adapter axis and routed by
  per-token weight rows (see ops/routed_lora.py); there is no python dict
  dispatch anywhere in the traced graph.
- The KV cache is preallocated ``[n_layers, B, S_max, Hkv, D]`` and updated
  with dynamic slices; decode routes every token through the 'default'
  route class, matching the reference's decode semantics (reference:
  multimodal_llama.py:436-438).
- The MLP applies the routed adapter consistently through gate/up/down for
  a token's modality (reference: multimodal_llama.py:380-390).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops.attention import attention, decode_attention
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, rope_tables
from ..ops.routed_lora import routed_lora_matmul

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def _init_lora(rng, n_layers, n_adapters, d_in, d_out, r, dtype):
    """LoRA init: A ~ kaiming-uniform(a=sqrt(5)) as in peft, B = 0."""
    # kaiming_uniform(a=sqrt(5)) as peft initializes lora_A:
    # gain = sqrt(2/(1+5)) = sqrt(1/3); bound = gain*sqrt(3/fan_in)
    # = 1/sqrt(d_in).  (sqrt(6/d_in) is the a=0 formula — 2.45x too
    # wide; B=0 hides it in the forward but dL/dB scales with A, so
    # early adapter updates diverge from a peft run.)
    bound = float(np.sqrt(1.0 / d_in))
    # sampled directly in ``dtype`` — an fp32 stacked-leaf transient is
    # 5.8 GB at 7B and random init must fit next to the resident tree
    a = jax.random.uniform(rng, (n_layers, n_adapters, d_in, r),
                           minval=-bound, maxval=bound, dtype=dtype)
    b = jnp.zeros((n_layers, n_adapters, r, d_out), dtype=dtype)
    return a, b


def _init_linear(rng, n_layers, n_adapters, d_in, d_out, r, dtype,
                 base_std=0.02):
    k_w, k_a = jax.random.split(rng)
    w = jax.random.normal(k_w, (n_layers, d_in, d_out),
                          dtype=dtype) * jnp.asarray(base_std, dtype)
    la, lb = _init_lora(k_a, n_layers, n_adapters, d_in, d_out, r, dtype)
    return {"w": w, "lora_a": la, "lora_b": lb}


def reinit_lora_a(params: Params, rng, dtype=None) -> Params:
    """Fresh kaiming-uniform A for every ``lora_a`` leaf (B stays zero).

    The HF-checkpoint converter zero-fills LoRA tensors (its A rows are
    normally overlaid from a trained adapter checkpoint) — but TRAINING
    from a converted base with A=0 AND B=0 gives identically-zero LoRA
    gradients forever (dL/dA ∝ B, dL/dB ∝ A), silently training only
    projectors/soft tokens.  The reference path peft get_peft_model
    kaiming-initializes A at adapter creation; this is that step."""
    out = dict(params)
    layers = {k: (dict(v) if isinstance(v, dict) else v)
              for k, v in params["layers"].items()}
    for grp in ("attn", "mlp"):
        group = dict(layers[grp])
        for name, p in group.items():
            p2 = dict(p)
            la = p2["lora_a"]
            rng, sub = jax.random.split(rng)
            bound = float(np.sqrt(1.0 / la.shape[-2]))
            p2["lora_a"] = jax.random.uniform(
                sub, la.shape, minval=-bound, maxval=bound,
                dtype=dtype or la.dtype)
            group[name] = p2
        layers[grp] = group
    out["layers"] = layers
    return out


def init_params(cfg: ModelConfig, rng, quantize_base: bool = False
                ) -> Params:
    """quantize_base=True int8-quantizes each base weight IMMEDIATELY
    after sampling it (ops/quant.quantize_leaf_lowmem), so the full bf16
    tree never exists — at 7B the bf16 tree (13.4 GB) plus towers leaves
    no headroom on a 16 GB chip for anything else; interleaved
    init+quantize peaks at the final int8 tree + one bf16 leaf."""
    dtype = jnp.dtype(cfg.dtype)
    H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    N = cfg.num_hidden_layers
    A = len(cfg.adapter_names())
    r = cfg.lora_r
    hd = cfg.head_dim
    kv_out = cfg.num_key_value_heads * hd

    def quantized(p):
        if not quantize_base:
            return p
        from ..ops.quant import quantize_leaf_lowmem
        if isinstance(p, dict):
            w = p.pop("w")
            p["w"] = quantize_leaf_lowmem(w)
            return p
        return quantize_leaf_lowmem(p)

    keys = jax.random.split(rng, 12)
    params: Params = {
        "embed_tokens": jax.random.normal(keys[0], (V, H), dtype)
        * jnp.asarray(0.02, dtype),
        "layers": {
            "input_layernorm": jnp.ones((N, H), dtype),
            "post_attention_layernorm": jnp.ones((N, H), dtype),
            "attn": {
                "q": quantized(_init_linear(keys[1], N, A, H, H, r, dtype)),
                "k": quantized(
                    _init_linear(keys[2], N, A, H, kv_out, r, dtype)),
                "v": quantized(
                    _init_linear(keys[3], N, A, H, kv_out, r, dtype)),
                "o": quantized(_init_linear(keys[4], N, A, H, H, r, dtype)),
            },
            "mlp": {
                "gate": quantized(
                    _init_linear(keys[5], N, A, H, I, r, dtype)),
                "up": quantized(_init_linear(keys[6], N, A, H, I, r, dtype)),
                "down": quantized(
                    _init_linear(keys[7], N, A, I, H, r, dtype)),
            },
        },
        "norm": jnp.ones((H,), dtype),
        "lm_head": quantized(jax.random.normal(keys[8], (H, V), dtype)
                             * jnp.asarray(0.02, dtype)),
    }
    # Learned per-modality prefix/suffix soft tokens (reference:
    # multimodal_llama.py:633-649), initialized to zeros as in the reference.
    prefix, suffix = {}, {}
    for m in cfg.modalities():
        if cfg.prefix_len(m):
            prefix[m] = jnp.zeros((cfg.prefix_len(m), H), dtype)
        if cfg.suffix_len(m):
            suffix[m] = jnp.zeros((cfg.suffix_len(m), H), dtype)
    if prefix:
        params["prefix_tokens"] = prefix
    if suffix:
        params["suffix_tokens"] = suffix
    return params


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """k/v are either plain arrays [N_layers, B, S_max, Hkv, D] or, when
    int8-quantized, dicts {"q": int8 same-shape, "scale": [..., Hkv, 1]}
    with one scale per cached token-head vector.  The scales factor out of
    both attention matmuls (see ops/attention.decode_attention), so reads
    stream int8 from HBM with no dequantized materialization — half the
    cache bytes and memory."""
    k: Any
    v: Any

    @staticmethod
    def zeros(cfg: ModelConfig, batch: int, max_len: int,
              dtype=None, quantized: bool = False) -> "KVCache":
        dtype = dtype or jnp.dtype(cfg.dtype)
        shape = (cfg.num_hidden_layers, batch, max_len,
                 cfg.num_key_value_heads, cfg.head_dim)
        if quantized:
            def buf():
                return {"q": jnp.zeros(shape, jnp.int8),
                        "scale": jnp.zeros(shape[:-1] + (1,), jnp.float32)}
            return KVCache(k=buf(), v=buf())
        return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def quantize_kv(val: jax.Array):
    """[..., D] -> {'q': int8, 'scale': [..., 1]} per-vector symmetric —
    the same scheme as weight quantization, over the vector axis (ONE
    implementation: a drifting scale floor or clip range between the
    weight and KV paths would silently mismatch)."""
    from ..ops.quant import quantize_int8

    return quantize_int8(val, axis=-1)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def _layer(cfg: ModelConfig, lp, x, route, cos, sin, *, segment_ids,
           cache_k, cache_v, cache_write_pos, kv_lens, attn_impl,
           layer_idx=None, q_offset: int = 0):
    """One decoder block.

    x: [B, L, H]; route: [B, L, A] or None; cos/sin: [B, L, hd].
    cache_k/v: [B, S_max, Hkv, D] or None (no-cache / training mode) —
      or, when ``layer_idx`` is given (decode), the FULL layer-stacked
      cache [NL, B, S_max, Hkv, D] carried through the layer scan: only
      the new token's slot is scattered in place and attention chunk-reads
      the stacked buffer directly (rewriting per-layer slices through scan
      outputs costs the whole multi-GB cache in HBM every decode step).
    cache_write_pos: [B] slot where this chunk's kv starts, or None to
      write at position 0 (prefill).
    kv_lens: [B] total valid kv after this chunk (decode attention only).
    """
    B, L, H = x.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    h = rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)

    ap = lp["attn"]
    q = routed_lora_matmul(h, ap["q"]["w"], ap["q"]["lora_a"],
                           ap["q"]["lora_b"], route)
    k = routed_lora_matmul(h, ap["k"]["w"], ap["k"]["lora_a"],
                           ap["k"]["lora_b"], route)
    v = routed_lora_matmul(h, ap["v"]["w"], ap["v"]["lora_a"],
                           ap["v"]["lora_b"], route)

    q = q.reshape(B, L, nh, hd)
    k = k.reshape(B, L, nkv, hd)
    v = v.reshape(B, L, nkv, hd)
    q, k = apply_rope(q, k, cos, sin)

    def cache_update(cache, val):
        if isinstance(cache, dict):  # int8 cache: quantize at write
            val = quantize_kv(val)
        else:
            val = {None: val}
        out = dict(cache) if isinstance(cache, dict) else {None: cache}
        for part in out:
            src = val[part] if part is not None else val[None]
            dst = out[part]
            if cache_write_pos is None:
                out[part] = jax.lax.dynamic_update_slice(
                    dst, src.astype(dst.dtype), (0, 0, 0, 0))
            else:
                def write_one(c, v_, pos):
                    return jax.lax.dynamic_update_slice(
                        c, v_.astype(c.dtype), (pos, 0, 0))
                out[part] = jax.vmap(write_one)(dst, src, cache_write_pos)
        return out if isinstance(cache, dict) else out[None]

    def scatter_token(c, val):
        # c: [NL, B, S, Hkv, last]; val: [B, 1, Hkv, last]
        return c.at[layer_idx, jnp.arange(B), cache_write_pos].set(
            val[:, 0].astype(c.dtype))

    def cache_update_full(cache, val):
        if isinstance(cache, dict):
            qval = quantize_kv(val)
            return {part: scatter_token(cache[part], qval[part])
                    for part in cache}
        return scatter_token(cache, val)


    new_cache_k, new_cache_v = cache_k, cache_v
    if cache_k is not None and layer_idx is not None:
        new_cache_k = cache_update_full(cache_k, k)
        new_cache_v = cache_update_full(cache_v, v)
    elif cache_k is not None:
        new_cache_k = cache_update(cache_k, k)
        new_cache_v = cache_update(cache_v, v)

    if cache_k is not None and layer_idx is not None:
        # Decode against the stacked carried cache (token slot just set).
        attn_out = decode_attention(q, new_cache_k, new_cache_v, kv_lens,
                                    layer_idx=layer_idx)
    elif cache_k is not None and cache_write_pos is not None:
        # CHUNKED PREFILL (L > 1, per-layer cache via the xs/ys scan):
        # the chunk's k/v were just written at q_offset; attend causally
        # over the whole cache with the query offset — causal masking
        # alone exposes exactly the initialized prefix [0, q_offset + L)
        # for a right-padded batch-1 prompt (serve/slot_engine admission).
        # static prefix slice: causal masking would discard keys past
        # q_offset+L anyway — don't stream the zero-filled cache tail
        S_used = q_offset + L

        def used(c):
            if isinstance(c, dict):
                # int8 transient cache (quantize-at-append, the
                # memory-bounded long-admission path): dequantize only
                # the used prefix — [B, S_used, Hkv, D] bf16, a few MB
                # per layer inside the scan, vs keeping the WHOLE
                # transient cache bf16 (3.6 GB at 7B/3456)
                return (c["q"][:, :S_used].astype(jnp.float32)
                        * c["scale"][:, :S_used]).astype(x.dtype)
            return c[:, :S_used]

        attn_out = attention(q, used(new_cache_k), used(new_cache_v),
                             causal=True, q_offset=q_offset,
                             impl=attn_impl)
    else:
        attn_out = attention(q, k, v, causal=True, q_segment_ids=segment_ids,
                             kv_segment_ids=segment_ids, impl=attn_impl)

    attn_out = attn_out.reshape(B, L, nh * hd)
    attn_out = routed_lora_matmul(attn_out, ap["o"]["w"], ap["o"]["lora_a"],
                                  ap["o"]["lora_b"], route)
    x = x + attn_out

    h = rms_norm(x, lp["post_attention_layernorm"], cfg.rms_norm_eps)
    mp = lp["mlp"]
    gate = routed_lora_matmul(h, mp["gate"]["w"], mp["gate"]["lora_a"],
                              mp["gate"]["lora_b"], route)
    up = routed_lora_matmul(h, mp["up"]["w"], mp["up"]["lora_a"],
                            mp["up"]["lora_b"], route)
    inter = jax.nn.silu(gate) * up
    down = routed_lora_matmul(inter, mp["down"]["w"], mp["down"]["lora_a"],
                              mp["down"]["lora_b"], route)
    x = x + down
    return x, new_cache_k, new_cache_v


def forward_hidden(params: Params, cfg: ModelConfig, inputs_embeds, *,
                   route=None, segment_ids=None, positions=None,
                   cache: Optional[KVCache] = None, cache_write_pos=None,
                   kv_lens=None, attn_impl: str = "auto",
                   q_offset: int = 0
                   ) -> Tuple[jax.Array, Optional[KVCache]]:
    """Run the decoder stack.

    inputs_embeds: [B, L, H]; route: [B, L, A] adapter weights or None;
    positions: [B, L] absolute positions (defaults to arange).
    Returns (final hidden [B, L, H], updated cache or None).
    """
    B, L, H = inputs_embeds.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), (B, L))
    if segment_ids is None:
        segment_ids = jnp.ones((B, L), jnp.int32)
    cos, sin = rope_tables(positions, cfg.head_dim, cfg.rope_theta)

    x = inputs_embeds
    layer_params = params["layers"]

    if cache is not None and cache_write_pos is not None \
            and kv_lens is not None:
        # Decode step (every decode caller passes kv_lens; chunked
        # prefill does not, so a 1-token chunk cannot fall in here): the
        # cache rides the scan CARRY and only the new token's slot is
        # written per layer.  Routing it through scan
        # xs/ys instead costs a full-cache rewrite every step — measured
        # 11.75 ms vs 1.9 ms for the 7B cache structure at 4.2k positions.
        n = cfg.num_hidden_layers

        def body_decode(carry, lp_li):
            x, ck, cv = carry
            lp, li = lp_li
            x, ck, cv = _layer(cfg, lp, x, route, cos, sin,
                               segment_ids=segment_ids, cache_k=ck,
                               cache_v=cv, cache_write_pos=cache_write_pos,
                               kv_lens=kv_lens, attn_impl=attn_impl,
                               layer_idx=li)
            return (x, ck, cv), None

        (x, ck, cv), _ = jax.lax.scan(
            body_decode, (x, cache.k, cache.v),
            (layer_params, jnp.arange(n, dtype=jnp.int32)))
        x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
        return x, KVCache(k=ck, v=cv)

    def body(carry, xs):
        x = carry
        lp, ck, cv = xs
        x, ck, cv = _layer(cfg, lp, x, route, cos, sin,
                           segment_ids=segment_ids, cache_k=ck, cache_v=cv,
                           cache_write_pos=cache_write_pos, kv_lens=kv_lens,
                           attn_impl=attn_impl, q_offset=q_offset)
        return x, (ck, cv)

    if cache is not None:
        xs = (layer_params, cache.k, cache.v)
    else:
        n = cfg.num_hidden_layers
        xs = (layer_params, jnp.zeros((n, 0)), jnp.zeros((n, 0)))

        def body(carry, xs):  # noqa: F811 — cache-free variant
            x = carry
            lp, _, _ = xs
            x, _, _ = _layer(cfg, lp, x, route, cos, sin,
                             segment_ids=segment_ids, cache_k=None,
                             cache_v=None, cache_write_pos=None, kv_lens=None,
                             attn_impl=attn_impl)
            return x, (jnp.zeros(0), jnp.zeros(0))

    scan_body = jax.checkpoint(body) if (cfg.remat and cache is None) else body
    x, caches = jax.lax.scan(scan_body, x, xs)

    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    new_cache = None
    if cache is not None:
        new_cache = KVCache(k=caches[0], v=caches[1])
    return x, new_cache


def logits_from_hidden(params: Params, hidden) -> jax.Array:
    from ..ops.quant import dequant_matmul, is_quantized
    if is_quantized(params["lm_head"]):
        # out_dtype=fp32 keeps the fp32 accumulation end-to-end: the old
        # .astype(jnp.float32) AFTER dequant_matmul rounded every logit
        # through bf16 first (~0.4% mantissa), which can flip near-tied
        # argmax/beam decisions for reasons unrelated to int8 error
        return dequant_matmul(hidden, params["lm_head"],
                              out_dtype=jnp.float32)
    return jnp.einsum("blh,hv->blv", hidden, params["lm_head"],
                      preferred_element_type=jnp.float32)


def forward_hidden_routed(params: Params, cfg: ModelConfig, inputs_embeds, *,
                          route_ids=None, routing_table=None,
                          segment_ids=None, positions=None,
                          cache: Optional[KVCache] = None,
                          cache_write_pos=None, kv_lens=None,
                          attn_impl: str = "auto", q_offset: int = 0):
    """embeds -> last hidden state (no lm_head), with route-class expansion.

    route_ids: [B, L] int32 route classes; routing_table:
    [n_classes, n_adapters].  When routing is inactive for the config the
    default row is applied to every token (matching the reference's
    active_adapters=('default',) path, reference: multimodal_llama.py:240-243).
    """
    route = None
    if routing_table is not None:
        table = jnp.asarray(routing_table)
        if route_ids is None or not cfg.routing_active():
            B, L, _ = inputs_embeds.shape
            route = jnp.broadcast_to(table[0], (B, L, table.shape[1]))
        else:
            route = jnp.take(table, route_ids, axis=0)
    return forward_hidden(
        params, cfg, inputs_embeds, route=route, segment_ids=segment_ids,
        positions=positions, cache=cache, cache_write_pos=cache_write_pos,
        kv_lens=kv_lens, attn_impl=attn_impl, q_offset=q_offset)


def forward(params: Params, cfg: ModelConfig, inputs_embeds, *,
            route_ids=None, routing_table=None, segment_ids=None,
            positions=None, cache: Optional[KVCache] = None,
            cache_write_pos=None, kv_lens=None, attn_impl: str = "auto"):
    """Full causal-LM forward: embeds -> hidden -> fp32 logits."""
    hidden, new_cache = forward_hidden_routed(
        params, cfg, inputs_embeds, route_ids=route_ids,
        routing_table=routing_table, segment_ids=segment_ids,
        positions=positions, cache=cache, cache_write_pos=cache_write_pos,
        kv_lens=kv_lens, attn_impl=attn_impl)
    return logits_from_hidden(params, hidden), new_cache
