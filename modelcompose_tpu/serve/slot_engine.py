"""Continuous batching: requests join a RUNNING packed generation.

The reference worker serializes requests behind a semaphore (reference:
modelcompose/serve/model_worker.py:230-243) and this framework's
BatchingEngine coalesces arrivals within a window — but a request arriving
mid-generation still waits for the whole batch to drain.  This engine goes
further: a fixed pool of ``max_slots`` decode slots shares ONE preallocated
KV cache; an arrival is prefilled batch-1, its cache spliced into a free
slot, and from the next tick it decodes alongside the requests already in
flight.  Decode is weights-bound, so stepping 8 slots costs almost the
same HBM traffic as stepping 1 — admission mid-flight converts that slack
into throughput (vLLM-style scheduling, built on the static-shape
primitives: no dynamic shapes, one compile per prompt bucket +
one decode-step program).

Greedy tokens per slot are IDENTICAL to a solo run of the same request:
rows are independent under per-row kv_len masking
(tests/test_slot_engine.py pins this).

Chunked admission prefill (``prefill_chunk=N`` / worker
``--prefill-chunk``): the admission's prefill runs in N-token pieces and
in-flight slots get a decode tick between pieces
(core/generate.prefill_chunked) — the per-admission stall drops from the
whole prompt's prefill to one chunk.
"""

from __future__ import annotations

import functools
import queue
import threading
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, donate_argnums=(0,))
def _splice_slot(big, small, slot):
    """Write a batch-1 cache/array into row ``slot`` of the pooled buffer
    (donated: the update is in place, no pooled-cache copy).

    When the pool is int8-quantized but the incoming cache is bf16 (a
    one-shot admission prefill attends over raw bf16 k/v and only
    quantizes at cache write), the splice quantizes here.  A chunked
    admission into an int8 pool instead arrives ALREADY quantized
    (``prefill_chunked(kv_quant=True)`` quantizes at append time so the
    transient stays 1/4 the bf16 bytes) and the splice is a plain int8
    row copy."""
    def put(b, s):
        start = (0,) * b.ndim
        start = (start[0], slot) + start[2:]
        return jax.lax.dynamic_update_slice(b, s.astype(b.dtype), start)

    def splice(b, s):
        if isinstance(b, dict) and not isinstance(s, dict):
            from ..core.llama import quantize_kv
            s = quantize_kv(s)
        if isinstance(b, dict):
            return {part: put(b[part], s[part]) for part in b}
        return put(b, s)

    return jax.tree.map(splice, big, small,
                        is_leaf=lambda x: isinstance(x, dict))


class SlotDecoder:
    """Model-side half: the pooled cache + per-slot decode state."""

    def __init__(self, model, max_slots: int = 8, cache_len: int = 1024,
                 kv_quant: bool = False, prefill_chunk=None):
        from ..core.llama import KVCache

        self.model = model
        self.cfg = model.cfg
        self.max_slots = max_slots
        self.cache_len = cache_len
        self.kv_quant = kv_quant
        # chunked admission prefill: decode ticks interleave between
        # chunks instead of stalling for the whole prompt
        # (core/generate.prefill_chunked).  Composes with an int8 pooled
        # cache: the chunked prefill quantizes each chunk at append time
        # into an int8 transient (memory-bounded long admissions) and
        # ``_splice_slot`` copies the int8 rows into the pool.
        self.prefill_chunk = prefill_chunk
        self.cache = KVCache.zeros(self.cfg, max_slots, cache_len,
                                   quantized=kv_quant)
        V = self.cfg.vocab_size
        self.logits = jnp.zeros((max_slots, V), jnp.float32)
        self.kv_lens = np.ones(max_slots, np.int64)  # host-owned
        self.active = np.zeros(max_slots, bool)  # host-owned
        self.table = jnp.asarray(np.asarray(model.routing_table))
        self.decode_table = model.decode_routing_table()

    def admit(self, slot: int, input_ids, modal_inputs,
              tick_cb=None) -> int:
        """Prefill one request and splice it into ``slot``.  Returns the
        prompt length (its kv_len).  Raises when the prompt alone cannot
        fit the slot cache; the ENGINE clamps the caller's token budget
        to ``cache_len - L`` (reference max-context clamp semantics) so
        decode never writes past the buffer."""
        from ..core.generate import _prefill

        # pack at the smallest standard bucket (short prompts then stall
        # the running decode ticks for half the prefill time or less);
        # fall back to the slot-cache bucket when the standard pick
        # exceeds it OR no standard bucket holds the prompt — one compile
        # per distinct bucket, all bounded.  (The fallback re-encodes the
        # media; it only fires for cache_len below the smallest standard
        # bucket or prompts beyond the largest.)
        embeds = None
        try:
            embeds, plan = self.model.prepare_batch([input_ids],
                                                    modal_inputs)
        except ValueError:
            pass
        if embeds is None or embeds.shape[1] > self.cache_len:
            try:
                embeds, plan = self.model.prepare_batch(
                    [input_ids], modal_inputs, bucket_len=self.cache_len)
            except ValueError as e:
                raise ValueError(
                    f"prompt does not fit the slot cache "
                    f"({self.cache_len}): {e}") from e
        L = int(plan.lengths[0])
        # reference semantics: clamp the token budget to the remaining
        # context (reference: model_worker.py:168-172) and only error
        # when nothing at all fits
        if self.cache_len - L < 1:
            raise ValueError(
                f"prompt ({L} packed positions) exceeds the slot cache "
                f"({self.cache_len})")
        route_ids = jnp.asarray(plan.route_ids) \
            if self.cfg.routing_active() else None
        if self.prefill_chunk:
            from ..core.generate import prefill_chunked
            # int8 pool -> int8 transient (quantize-at-append): the
            # admission's working cache is 1/4 the bf16 bytes, so a
            # long-context admission fits next to the weights + pool
            logits1, cache1 = prefill_chunked(
                self.model.params, self.cfg, embeds, route_ids, self.table,
                plan.lengths, self.cache_len, chunk=self.prefill_chunk,
                tick_cb=tick_cb, kv_quant=self.kv_quant)
        else:
            logits1, cache1 = _prefill(
                self.model.params, self.cfg, embeds, route_ids, self.table,
                jnp.asarray(plan.segment_ids),
                jnp.asarray(plan.lengths, jnp.int32), self.cache_len,
                "auto", self.kv_quant)
        self.cache = _splice_slot(self.cache, cache1, slot)
        self.logits = self.logits.at[slot].set(logits1[0])
        self.kv_lens[slot] = L
        self.active[slot] = True
        return L

    def step(self, tokens: np.ndarray) -> None:
        """Advance every slot one token.  ``tokens``: [max_slots] int32,
        sampled host-side (idle slots feed a dummy token — their cache row
        is fully rewritten at the next admission).  Only ACTIVE rows
        advance their kv_len: an idle row stays pinned at 1 however long
        it idles, so its RoPE position / attention span never grows."""
        from ..core.generate import _decode_step

        logits, cache, _ = _decode_step(
            self.model.params, self.cfg, self.cache,
            jnp.asarray(tokens, jnp.int32),
            jnp.asarray(self.kv_lens, jnp.int32), self.decode_table)
        self.logits, self.cache = logits, cache
        self.kv_lens = np.where(self.active, self.kv_lens + 1, 1)

    def host_logits(self) -> np.ndarray:
        return np.asarray(self.logits, np.float32)

    def sample(self, key, temps: np.ndarray, top_ps: np.ndarray
               ) -> np.ndarray:
        """Sample every slot's next token ON DEVICE (temperature + HF-exact
        top-p, greedy rows bit-identical to argmax; core/sampling) and
        fetch only the [max_slots] token ids — the per-tick D2H shrinks
        from [max_slots, V] fp32 logits to a handful of int32s."""
        from ..core.sampling import sample_step

        return np.asarray(sample_step(
            key, self.logits, jnp.asarray(temps, jnp.float32),
            jnp.asarray(top_ps, jnp.float32)))

    def release(self, slot: int) -> None:
        """Mark the slot idle and pin its kv_len back to 1; ``step`` keeps
        idle rows pinned (active-mask gating), so a long-idle slot's RoPE
        position and attention span stay bounded for arbitrarily long idle
        periods."""
        self.kv_lens[slot] = 1
        self.active[slot] = False


class ContinuousBatchingEngine:
    """Drop-in for BatchingEngine (same ``submit`` -> events-queue API):
    a scheduler thread admits arrivals into free slots between decode
    ticks and emits ("token", id) / ("done", None) / ("error", e) per
    request."""

    def __init__(self, model, prepare, max_slots: int = 8,
                 cache_len: int = 1024, kv_quant: bool = False,
                 rng_seed: Optional[int] = None, prefill_chunk=None):
        self.decoder = SlotDecoder(model, max_slots, cache_len, kv_quant,
                                   prefill_chunk=prefill_chunk)
        # prepare: request -> (ids, modal_inputs, max_new, temp[, top_p])
        self.prepare = prepare
        self.eos = model.cfg.eos_token_id
        self._queue: "queue.Queue" = queue.Queue()
        self._slots: Dict[int, Dict[str, Any]] = {}
        from ..core.sampling import entropy_seed
        self._key = jax.random.PRNGKey(
            rng_seed if rng_seed is not None else entropy_seed())
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, request: dict) -> "queue.Queue":
        events: "queue.Queue" = queue.Queue()
        if self._stop.is_set():  # post-stop submits fail fast, never hang
            events.put(("error", RuntimeError("engine stopped")))
            return events
        self._queue.put((request, events))
        return events

    def stop(self, timeout: float = 5.0) -> None:
        """Tear the scheduler thread down (idempotent).  In-flight AND
        still-queued requests get a ("error", RuntimeError) event;
        without this, every engine ever constructed busy-polls its queue
        (50 ms timeouts) and pins its slot caches for the rest of the
        process lifetime."""
        self._stop.set()
        self._thread.join(timeout)
        err = RuntimeError("engine stopped")
        # Submitted-but-unadmitted requests would otherwise never see a
        # terminal event (queue.get is thread-safe against late submits).
        while True:
            try:
                _, events = self._queue.get_nowait()
            except queue.Empty:
                break
            events.put(("error", err))
        if self._thread.is_alive():
            # join timed out (e.g. a device call wedged mid-tick): the
            # scheduler still owns _slots/decoder — mutating them here
            # would race _advance_slots; the stop flag ends the loop
            # whenever the device call returns.
            return
        for slot, st in list(self._slots.items()):
            st["events"].put(("error", err))
            self.decoder.release(slot)
        self._slots.clear()

    # ------------------------------------------------------------------
    def _admit_pending(self, block: bool) -> None:
        while len(self._slots) < self.decoder.max_slots:
            try:
                request, events = self._queue.get(
                    timeout=0.05 if block and not self._slots else 0)
            except queue.Empty:
                return
            cancel = request.get("_cancel")
            if cancel is not None and cancel.is_set():
                events.put(("done", None))  # client gone before admission
                continue
            slot = next(s for s in range(self.decoder.max_slots)
                        if s not in self._slots)
            try:
                prepared = self.prepare(request)
                ids, modal_inputs, max_new, temp = prepared[:4]
                top_p = prepared[4] if len(prepared) > 4 else 1.0
                if max_new <= 0:
                    events.put(("done", None))
                    continue
                # chunked prefill: in-flight slots keep decoding between
                # the admission's prefill chunks.  Tick failures belong
                # to the IN-FLIGHT slots, not the admitting request —
                # guard here so they don't unwind into the admission's
                # per-request error handler.
                tick = self._guarded_tick \
                    if self.decoder.prefill_chunk else None
                L = self.decoder.admit(slot, ids, modal_inputs,
                                       tick_cb=tick)
                max_new = min(max_new, self.decoder.cache_len - L)
            except Exception as e:  # noqa: BLE001 — surface per request
                events.put(("error", e))
                continue
            self._slots[slot] = {"events": events, "generated": 0,
                                 "max_new": max_new, "temp": temp,
                                 "top_p": top_p, "cancel": cancel}
            block = False

    def _loop(self) -> None:
        while not self._stop.is_set():
            try:
                self._tick()
            except Exception as e:  # noqa: BLE001 — device/XLA errors
                # surface to every in-flight request and keep the
                # scheduler alive (a dead daemon thread would hang every
                # future submit; BatchingEngine has the same guard)
                for slot, st in self._slots.items():
                    st["events"].put(("error", e))
                    # release the decoder row too: clearing _slots alone
                    # leaves active=True, so the phantom row's kv_len
                    # keeps advancing every tick (RoPE position /
                    # attention span grow unbounded until readmission)
                    self.decoder.release(slot)
                self._slots.clear()

    def _tick(self) -> None:
        self._admit_pending(block=True)
        self._advance_slots()

    def _guarded_tick(self) -> None:
        try:
            self._advance_slots()
        except Exception as e:  # noqa: BLE001 — device/XLA errors
            for slot, st in self._slots.items():
                st["events"].put(("error", e))
                self.decoder.release(slot)  # see _loop: avoid phantom rows
            self._slots.clear()

    def _advance_slots(self) -> None:
        if not self._slots:
            return
        # one device-side draw for every slot (idle rows greedy/no-op),
        # then the host loop sees only token ids
        temps = np.zeros(self.decoder.max_slots, np.float32)
        top_ps = np.ones(self.decoder.max_slots, np.float32)
        for slot, st in self._slots.items():
            temps[slot] = st["temp"]
            top_ps[slot] = st["top_p"]
        self._key, sub = jax.random.split(self._key)
        sampled = self.decoder.sample(sub, temps, top_ps)
        tokens = np.zeros(self.decoder.max_slots, np.int32)
        for slot in list(self._slots):
            st = self._slots[slot]
            if st["cancel"] is not None and st["cancel"].is_set():
                st["events"].put(("done", None))
                del self._slots[slot]
                self.decoder.release(slot)
                continue
            tok = int(sampled[slot])
            tokens[slot] = tok
            if self.eos is not None and tok == self.eos:
                st["events"].put(("done", None))
                del self._slots[slot]
                self.decoder.release(slot)
                continue
            st["events"].put(("token", tok))
            st["generated"] += 1
            if st["generated"] >= st["max_new"]:
                st["events"].put(("done", None))
                del self._slots[slot]
                self.decoder.release(slot)
        if not self._slots:
            return
        self.decoder.step(tokens)
