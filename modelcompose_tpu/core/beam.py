"""Beam-search decoding over the pooled KV cache.

The reference exposes ``--num_beams`` on every eval loader and the demo
(reference: modelcompose/eval/model_multimodal_qa_loader.py:100,137,
model_vqa.py:72,109, demo_app.py:129-134) and runs HF beam search
(transformers==4.31.0 ``BeamSearchScorer``, pinned in the reference's
requirements.txt:4).  TPU-native shape: beams are a batch dimension over
the preallocated cache — one batch-1 routed prefill, the cache tiled to
``num_beams`` rows, then jitted batched decode steps with a device-side
beam gather; only [num_beams, V] logits cross to the host per step (eval
is batch-1/low-rate, matching the reference protocol).

Semantics transcribed from transformers 4.31 ``beam_search``/
``BeamSearchScorer``/``BeamHypotheses`` (the reference's pinned version —
the installed 4.57 rewrote beam search and no longer drives the
reference's tuple-cache model):

- candidate scores: ``log_softmax(logits) + beam_score``, top ``2B`` of
  the flattened [B * V] scores;
- an EOS candidate ranked below ``num_beams`` finalizes that beam's
  hypothesis (tokens WITHOUT the eos, score INCLUDING the eos logprob);
  lower-ranked EOS candidates are dropped; non-EOS candidates fill the
  next ``num_beams`` running beams in score order;
- hypothesis score: ``sum_logprobs / len**length_penalty`` with ``len``
  counting the RAW text prompt ids plus generated tokens (HF's
  ``input_ids`` never expand modal placeholders — the splice happens
  inside the model — so scoring length uses the pre-splice prompt
  length, passed as ``scoring_prompt_len``);
- early_stopping=False convergence: done when the worst kept hypothesis
  already beats ``best_running / cur_len**length_penalty``;
- finalize adds all running beams when not done and returns the best.

``num_beams == 1`` callers should use ``generate`` (HF dispatches beam=1
to greedy search, not degenerate beam search).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from .generate import _decode_step, _prefill


@functools.partial(jax.jit, static_argnames=("num_beams",))
def _tile_beams(tree, num_beams: int):
    """Tile the batch axis (axis 1 for the layer-stacked cache arrays,
    axis 0 for per-row state) of a batch-1 pytree to ``num_beams``."""
    def tile(x):
        axis = 1 if x.ndim >= 3 else 0
        reps = [1] * x.ndim
        reps[axis] = num_beams
        return jnp.tile(x, reps)

    return jax.tree.map(tile, tree)


@jax.jit
def _gather_beams(cache, beam_idx):
    """Reorder the pooled cache rows by parent-beam index (HF's
    ``_reorder_cache`` index_select, transcribed to a batched gather on
    the layer-stacked [NL, B, S, Hkv, D] buffers)."""
    return jax.tree.map(lambda c: jnp.take(c, beam_idx, axis=1), cache)


class _BeamHypotheses:
    """transformers 4.31 BeamHypotheses, transcribed."""

    def __init__(self, num_beams: int, length_penalty: float,
                 early_stopping: bool):
        self.num_beams = num_beams
        self.length_penalty = length_penalty
        self.early_stopping = early_stopping
        self.beams: List[tuple] = []  # (score, tokens)
        self.worst_score = 1e9

    def __len__(self):
        return len(self.beams)

    def add(self, tokens: List[int], sum_logprobs: float, hyp_len: int):
        score = sum_logprobs / (hyp_len ** self.length_penalty)
        if len(self) < self.num_beams or score > self.worst_score:
            self.beams.append((score, tokens))
            if len(self) > self.num_beams:
                worst = min(range(len(self.beams)),
                            key=lambda i: self.beams[i][0])
                del self.beams[worst]
                self.worst_score = min(s for s, _ in self.beams)
            else:
                self.worst_score = min(score, self.worst_score)

    def is_done(self, best_sum_logprobs: float, cur_len: int) -> bool:
        if len(self) < self.num_beams:
            return False
        if self.early_stopping:
            return True
        return self.worst_score >= best_sum_logprobs / (
            cur_len ** self.length_penalty)


def beam_generate(params, cfg: ModelConfig, inputs_embeds, *, lengths,
                  route_ids=None, routing_table=None, segment_ids=None,
                  num_beams: int = 3, max_new_tokens: int = 128,
                  eos_token_id: Optional[int] = None,
                  length_penalty: float = 1.0, early_stopping: bool = False,
                  scoring_prompt_len: Optional[int] = None,
                  cache_len: Optional[int] = None,
                  attn_impl: str = "auto",
                  temperature: float = 0.0, top_p: float = 1.0, rng=None,
                  _draw_override=None) -> List[List[int]]:
    """Beam-search decode for one packed prompt (batch 1).

    Args mirror ``generate``; ``scoring_prompt_len`` is the RAW text
    prompt length used for HF-compatible length normalization (defaults
    to the packed valid length, which matches HF only for text-only
    prompts).  Returns ``[best_tokens]`` (eos excluded), like generate.

    temperature > 0 runs STOCHASTIC beam sampling — transformers 4.31
    ``beam_sample``, which the reference reaches via
    ``generate(num_beams=N, do_sample=temperature>0)`` (reference:
    eval/model_multimodal_qa_loader.py:96-100): the candidate scores
    (logprob + running beam score) are temperature-divided and top-p
    filtered per beam row (4.31's warper order), softmaxed over the
    flattened [beams*V], and 2*num_beams candidates drawn WITHOUT
    replacement, then sorted by warped score and fed to the same scorer.
    The warped values also become the running beam scores — 4.31's
    (quirky) accumulation, kept for parity.  ``_draw_override`` is a
    test hook: per-step arrays of flat candidate indices replacing the
    random draw, so bookkeeping parity vs the HF oracle is testable
    across RNGs (tests/test_beam_golden.py).
    """
    B, L, _ = inputs_embeds.shape
    assert B == 1, "beam_generate packs one prompt (the eval protocol)"
    assert num_beams >= 2, "use generate() for num_beams == 1 (HF greedy)"
    if cache_len is None:
        cache_len = L + max_new_tokens
    lengths = jnp.asarray(lengths, jnp.int32)
    if segment_ids is None:
        segment_ids = (jnp.arange(L)[None, :] < lengths[:, None]
                       ).astype(jnp.int32)
    if routing_table is not None:
        routing_table = jnp.asarray(routing_table)
    eos = cfg.eos_token_id if eos_token_id is None else eos_token_id
    prompt_len = int(np.asarray(lengths)[0]) if scoring_prompt_len is None \
        else int(scoring_prompt_len)

    logits, cache = _prefill(params, cfg, inputs_embeds, route_ids,
                             routing_table, segment_ids, lengths, cache_len,
                             attn_impl, False)
    cache = _tile_beams(cache, num_beams)
    logits = jnp.tile(logits, (num_beams, 1))
    kv_lens = jnp.tile(lengths, (num_beams,))

    # decode runs the default route only (reference decode semantics);
    # beam rows share it
    decode_table = routing_table
    if routing_table is not None and \
            not np.any(np.asarray(routing_table)[0]):
        decode_table = None

    hyps = _BeamHypotheses(num_beams, length_penalty, early_stopping)
    beam_scores = np.full(num_beams, -1e9, np.float64)
    beam_scores[0] = 0.0
    beam_tokens: List[List[int]] = [[] for _ in range(num_beams)]
    done = False
    do_sample = temperature and temperature > 0.0
    if do_sample and rng is None:
        rng = jax.random.PRNGKey(0)

    for step_i in range(max_new_tokens):
        host = np.asarray(logits, np.float32).astype(np.float64)
        # log_softmax, numerically like torch's
        host = host - host.max(axis=-1, keepdims=True)
        host = host - np.log(np.exp(host).sum(axis=-1, keepdims=True))
        V = host.shape[-1]
        scores = host + beam_scores[:, None]
        if do_sample:
            # 4.31 beam_sample: warp (temperature then top-p) the
            # score rows, softmax over the flattened beams*V, draw
            # 2*num_beams WITHOUT replacement, sort by warped score
            from .sampling import top_p_filter
            warped = scores / float(temperature)
            if top_p is not None and top_p < 1.0:
                warped = np.asarray(top_p_filter(
                    jnp.asarray(warped, jnp.float32),
                    jnp.float32(top_p)), np.float64)
                warped[warped <= jnp.finfo(jnp.float32).min] = -np.inf
            flat = warped.reshape(-1)
            if _draw_override is not None:
                drawn = np.asarray(_draw_override[step_i])
            else:
                rng, sub = jax.random.split(rng)
                # Gumbel top-k == categorical sampling w/o replacement.
                # When the combined nucleus holds fewer than 2*num_beams
                # finite entries (sharp temperature + tight top_p), draw
                # only the finite ones — 4.31's torch.multinomial would
                # RAISE here; shrinking the candidate list (the fill loop
                # pads below) is the graceful equivalent.
                z = flat + np.asarray(jax.random.gumbel(
                    sub, (flat.shape[0],), jnp.float32), np.float64)
                z[~np.isfinite(flat)] = -np.inf
                n_finite = int(np.isfinite(flat).sum())
                drawn = np.argsort(-z, kind="stable")[
                    : min(2 * num_beams, max(n_finite, 1))]
            order = np.argsort(-flat[drawn], kind="stable")
            top = drawn[order]
        else:
            flat = scores.reshape(-1)
            top = np.argsort(-flat, kind="stable")[: 2 * num_beams]
        cand_scores = flat[top]
        cand_tokens = top % V
        cand_beams = top // V

        cur_len = prompt_len + len(beam_tokens[0])
        next_scores = np.empty(num_beams, np.float64)
        next_tokens = np.empty(num_beams, np.int64)
        next_beams = np.empty(num_beams, np.int64)
        filled = 0
        for rank in range(len(top)):
            tok, sc, src = (int(cand_tokens[rank]), float(cand_scores[rank]),
                            int(cand_beams[rank]))
            if eos is not None and tok == eos:
                if rank >= num_beams:
                    continue
                hyps.add(list(beam_tokens[src]), sc, cur_len)
            else:
                next_scores[filled] = sc
                next_tokens[filled] = tok
                next_beams[filled] = src
                filled += 1
            if filled == num_beams:
                break
        if filled == 0:  # everything drawn was EOS: all beams finalized
            done = True
        while 0 < filled < num_beams:
            # shrunken sampled draw (tight nucleus): replicate the best
            # running candidate so the beam count stays static-shaped
            next_scores[filled] = next_scores[0]
            next_tokens[filled] = next_tokens[0]
            next_beams[filled] = next_beams[0]
            filled += 1
        done = done or hyps.is_done(float(cand_scores.max()), cur_len)
        if done:
            break

        beam_scores = next_scores
        beam_tokens = [beam_tokens[int(b)] + [int(t)]
                       for b, t in zip(next_beams, next_tokens)]
        cache = _gather_beams(cache, jnp.asarray(next_beams, jnp.int32))
        logits, cache, kv_lens = _decode_step(
            params, cfg, cache, jnp.asarray(next_tokens, jnp.int32),
            kv_lens, decode_table)

    if not done:  # max length reached: running beams become hypotheses
        cur_len = prompt_len + len(beam_tokens[0])
        for b in range(num_beams):
            hyps.add(beam_tokens[b], float(beam_scores[b]), cur_len)

    best = max(hyps.beams, key=lambda sb: sb[0])[1]
    return [best]
