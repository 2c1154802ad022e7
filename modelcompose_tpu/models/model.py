"""Top-level multimodal LM: towers + projectors + routed backbone + packing.

TPU-native counterpart of the reference's ``MultimodalLlamaForCausalLM`` +
``MultimodalMetaForCausalLM`` glue (reference: modelcompose/model/
multimodal_arch.py:169-459, language_model/multimodal_llama.py:622-770).
The class is a thin host-side container (params + configs + jitted fns);
everything traced is functional.

Pipeline per batch:
1. ``encode_modal_inputs`` — each modality's frozen tower + trainable
   projector, video flattened b×t×n×d -> b×(t·n)×d (reference:
   multimodal_arch.py:236-240), prefix/suffix soft tokens attached
   (reference: :245-253).
2. ``core.packing.plan_pack`` — host-side static-shape splice plan.
3. ``assemble_embeds`` + routed forward / generate.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..core import generate as generation
from ..core.llama import forward, init_params
from ..core.packing import PackPlan, assemble_embeds, plan_pack
from ..constants import IGNORE_INDEX
from .projectors import apply_projector, init_projector, output_len
from .towers import build_modal_encoders


class MultimodalLM:
    def __init__(self, cfg: ModelConfig, params: Dict[str, Any],
                 encoders: Dict[str, Any],
                 projectors: Dict[str, Dict[str, Any]]):
        self.cfg = cfg
        self.params = params
        self.encoders = encoders
        self.projectors = projectors
        self.routing_table = cfg.routing_table()

    # ------------------------------------------------------------------
    @classmethod
    def random_init(cls, cfg: ModelConfig, rng=None) -> "MultimodalLM":
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k_lm, k_enc, k_proj = jax.random.split(rng, 3)
        params = init_params(cfg, k_lm)
        encoders = build_modal_encoders(cfg, k_enc)
        projectors = {}
        for modal in cfg.modalities():
            k_proj, sub = jax.random.split(k_proj)
            projectors[modal] = init_projector(
                cfg.projector_type(modal), sub,
                encoders[modal].hidden_size, cfg.hidden_size,
                dtype=jnp.dtype(cfg.dtype))
        return cls(cfg, params, encoders, projectors)

    # ------------------------------------------------------------------
    def modal_processors(self) -> Dict[str, Any]:
        return {m: enc.modal_processor for m, enc in self.encoders.items()}

    def decode_routing_table(self):
        """Routing table for DECODE steps, or None when the default row
        is all-zero (dense-folded loader --fold-decode): decode must then
        skip the adapter branch instead of streaming every LoRA stack
        multiplied by zero."""
        table = np.asarray(self.routing_table)
        return jnp.asarray(table) if table[0].any() else None

    def feature_span_len(self, modal: str) -> int:
        """Packed span length for one instance of a modality: projector
        output length (+ temporal flattening for video) + prefix/suffix."""
        enc = self.encoders[modal]
        t = enc.feature_len
        if modal == "video":
            t = enc.num_frames * enc.tokens_per_frame
        t_out = output_len(self.cfg.projector_type(modal), t)
        return t_out + self.cfg.prefix_len(modal) + self.cfg.suffix_len(modal)

    def encode_modal_inputs(self, modal_inputs: Dict[str, Any]
                            ) -> Dict[str, jnp.ndarray]:
        """{modal: batched raw inputs} -> {modal: [n, span, H]} projected
        features with prefix/suffix attached (reference:
        multimodal_arch.py:197-268).  Towers run under stop_gradient —
        they are frozen, only projectors train."""
        feats: Dict[str, jnp.ndarray] = {}
        for modal, raw in modal_inputs.items():
            enc = self.encoders[modal]
            if modal == "audio":
                out = enc.encode(**raw) if isinstance(raw, dict) \
                    else enc.encode(raw)
                # BEATs returns (features, frame-validity); the reference
                # DISCARDS the mask too — `features, _ = encoder(...)`,
                # multimodal_arch.py:234 (the masked call is commented
                # out there) — so batch-pad frames flowing into the
                # projector is parity, not a bug
                x = out[0] if isinstance(out, tuple) else out
            elif modal == "video":
                x = enc.encode(raw)  # [b, t, n, d]
                b, t, n, d = x.shape
                x = x.reshape(b, t * n, d)
            else:
                x = enc.encode(raw)
            x = jax.lax.stop_gradient(x)
            x = apply_projector(self.cfg.projector_type(modal),
                                self.projectors[modal], x)
            parts = []
            b = x.shape[0]
            prefix = (self.params.get("prefix_tokens") or {}).get(modal)
            suffix = (self.params.get("suffix_tokens") or {}).get(modal)
            if prefix is not None:
                parts.append(jnp.broadcast_to(prefix[None],
                                              (b,) + prefix.shape))
            parts.append(x.astype(self.params["embed_tokens"].dtype))
            if suffix is not None:
                parts.append(jnp.broadcast_to(suffix[None],
                                              (b,) + suffix.shape))
            feats[modal] = jnp.concatenate(parts, axis=1) if len(parts) > 1 \
                else parts[0]
        return feats

    # ------------------------------------------------------------------
    def prepare_batch(self, input_ids: Sequence[np.ndarray],
                      modal_inputs: Dict[str, Any],
                      labels: Optional[Sequence[np.ndarray]] = None,
                      bucket_len: Optional[int] = None
                      ) -> Tuple[jnp.ndarray, PackPlan]:
        feats = self.encode_modal_inputs(modal_inputs)
        feat_spans = {m: (int(f.shape[0]), int(f.shape[1]))
                      for m, f in feats.items()}
        plan = plan_pack(list(input_ids), feat_spans, labels=labels,
                         bucket_len=bucket_len)
        embeds = assemble_embeds(self.params["embed_tokens"], plan, feats)
        return embeds, plan

    # ------------------------------------------------------------------
    def generate(self, input_ids: Sequence[np.ndarray],
                 modal_inputs: Dict[str, Any],
                 max_new_tokens: int = 128, temperature: float = 0.0,
                 top_p: float = 1.0, num_beams: int = 1,
                 rng=None, bucket_len: Optional[int] = None,
                 attn_impl: str = "auto",
                 compact_adapters: bool = False) -> List[List[int]]:
        embeds, plan = self.prepare_batch(input_ids, modal_inputs,
                                          bucket_len=bucket_len)
        route_ids = plan.route_ids if self.cfg.routing_active() else None
        params, table = self.params, self.routing_table
        if compact_adapters and route_ids is not None:
            params, table = self._compacted(np.unique(np.asarray(route_ids)))
        if num_beams and num_beams > 1:
            # HF dispatches num_beams>1 to beam search — or beam SAMPLE
            # when do_sample (temperature>0), reference:
            # eval/model_multimodal_qa_loader.py:96-100; scoring length
            # = RAW text ids (modal placeholders unexpanded), matching
            # HF's input_ids-based length normalization.
            from ..core.beam import beam_generate
            assert len(input_ids) == 1, \
                "beam search packs one prompt (the reference eval protocol)"
            return beam_generate(
                params, self.cfg, embeds, lengths=plan.lengths,
                route_ids=route_ids, routing_table=table,
                segment_ids=plan.segment_ids, num_beams=num_beams,
                max_new_tokens=max_new_tokens,
                scoring_prompt_len=len(np.asarray(input_ids[0])),
                temperature=temperature, top_p=top_p, rng=rng,
                attn_impl=attn_impl)
        return generation.generate(
            params, self.cfg, embeds, lengths=plan.lengths,
            route_ids=route_ids, routing_table=table,
            segment_ids=plan.segment_ids, max_new_tokens=max_new_tokens,
            temperature=temperature, top_p=top_p, rng=rng,
            attn_impl=attn_impl)

    def _compacted(self, route_classes):
        """Adapter stacks gathered to the columns the batch's route classes
        can reach (ops/routed_lora.compact_active_adapters), cached per
        active set — an eval run's modality mix is constant, so the gather
        happens once and every batch reuses the compiled compacted shapes."""
        from ..ops.routed_lora import (active_adapter_set,
                                       compact_active_adapters)
        active = active_adapter_set(self.routing_table, route_classes)
        if not hasattr(self, "_compact_cache"):
            self._compact_cache = {}
        if active not in self._compact_cache:
            self._compact_cache[active] = compact_active_adapters(
                self.params, self.routing_table, active)
        return self._compact_cache[active]

    # ------------------------------------------------------------------
    def generate_stream(self, input_ids: Sequence[np.ndarray],
                        modal_inputs: Dict[str, Any], *,
                        max_new_tokens: Sequence[int],
                        temperatures: Sequence[float],
                        emit, rng_seed: Optional[int] = None,
                        bucket_len: Optional[int] = None,
                        cancelled=None, top_ps=None) -> None:
        """Batched streaming decode: one packed prefill, then a decode loop
        that emits each sample's token THE STEP IT DECODES — the role the
        reference's TextIteratorStreamer thread plays
        (reference: serve/model_worker.py:122-192), batched.

        emit(i, event) receives ("token", id) then ("done", None) per
        sample i; per-sample temperature/top_p/max_new_tokens/EOS are
        honored.  Sampling runs ON DEVICE (core/sampling.sample_step —
        temperature + HF-exact top-p, greedy rows bit-identical to argmax)
        so the host round-trip per step is [B] token ids, not [B, V]
        logits; top_p matches the reference worker's generate kwargs
        (reference: serve/model_worker.py:156-178).

        cancelled(i) -> bool, checked every step: a row whose consumer went
        away (stop-string hit, client disconnect) is masked done so the
        packed generation stops burning decode steps on it — and the whole
        batch early-exits once every row is done/cancelled (the reference's
        KeywordsStoppingCriteria role, reference: mm_utils.py:114-140,
        which its streamer thread lacks on disconnect)."""
        from ..core.generate import _decode_step, _prefill
        from ..core.sampling import sample_step

        B = len(input_ids)
        done = [False] * B
        for b in range(B):  # a zero/negative token budget is already done
            if max_new_tokens[b] <= 0:
                done[b] = True
                emit(b, ("done", None))
        if all(done):
            return
        embeds, plan = self.prepare_batch(input_ids, modal_inputs,
                                          bucket_len=bucket_len)
        table = jnp.asarray(self.routing_table)
        decode_table = self.decode_routing_table()
        route_ids = jnp.asarray(plan.route_ids) \
            if self.cfg.routing_active() else None
        lengths = jnp.asarray(plan.lengths, jnp.int32)
        cache_len = int(embeds.shape[1]) + max(0, *max_new_tokens)
        logits, cache = _prefill(
            self.params, self.cfg, embeds, route_ids, table,
            jnp.asarray(plan.segment_ids), lengths, cache_len, "auto",
            False)
        kv_lens = lengths
        eos = self.cfg.eos_token_id
        from ..core.sampling import entropy_seed
        key = jax.random.PRNGKey(
            rng_seed if rng_seed is not None else entropy_seed())
        temps = jnp.asarray(list(temperatures), jnp.float32)
        tps = jnp.asarray([1.0] * B if top_ps is None else list(top_ps),
                          jnp.float32)
        for step in range(max(max_new_tokens)):
            key, sub = jax.random.split(key)
            host_tokens = np.asarray(sample_step(sub, logits, temps, tps))
            tokens = np.zeros(B, np.int32)
            for b in range(B):
                if not done[b] and cancelled is not None and cancelled(b):
                    done[b] = True
                    emit(b, ("done", None))
                if done[b]:
                    tokens[b] = eos if eos is not None else 0
                    continue
                tok = int(host_tokens[b])
                tokens[b] = tok
                if eos is not None and tok == eos:
                    done[b] = True
                    emit(b, ("done", None))
                else:
                    emit(b, ("token", tok))
                    if step == max_new_tokens[b] - 1:
                        done[b] = True
                        emit(b, ("done", None))
            if all(done):
                return
            logits, cache, kv_lens = _decode_step(
                self.params, self.cfg, cache, jnp.asarray(tokens), kv_lens,
                decode_table)
        for b in range(B):
            if not done[b]:
                emit(b, ("done", None))

    # ------------------------------------------------------------------
    def loss(self, input_ids: Sequence[np.ndarray],
             labels: Sequence[np.ndarray],
             modal_inputs: Dict[str, Any],
             bucket_len: Optional[int] = None,
             attn_impl: str = "auto") -> jnp.ndarray:
        embeds, plan = self.prepare_batch(input_ids, modal_inputs,
                                          labels=labels,
                                          bucket_len=bucket_len)
        route_ids = plan.route_ids if self.cfg.routing_active() else None
        logits, _ = forward(
            self.params, self.cfg, embeds, route_ids=route_ids,
            routing_table=self.routing_table,
            segment_ids=plan.segment_ids, attn_impl=attn_impl)
        return causal_lm_loss(logits, jnp.asarray(plan.labels))


def causal_lm_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Shifted CE with IGNORE_INDEX masking (reference:
    multimodal_llama.py:723-733)."""
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return (nll * valid).sum() / jnp.maximum(valid.sum(), 1)
