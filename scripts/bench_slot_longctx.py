"""Long-context continuous-batching serving row (round-5 VERDICT #4):
a 3.3k-position 4-modal admission into a RUNNING batch, on the int8
pooled KV cache with chunked admission prefill — the configuration that
was mutually exclusive before round 5 (slot_engine.py required a bf16
pool for chunked prefill).

Protocol (SlotDecoder driven directly, the exact engine code path):
  1. admit a short (256-bucket) request into slot 0; measure the solo
     decode tick rate;
  2. admit the MCUB-4 composed prompt (3,287 positions, 3,328 bucket,
     bench.py composed_longctx layout) with prefill_chunk=512 into
     slot 1 while slot 0 keeps decoding between chunks (tick_cb);
     measure admission wall + ticks slot 0 received during it;
  3. measure the 2-active-slot tick rate (combined tok/s).

Memory at 7B int8 weights (6.7 GB): pool = 2 slots x 3456 int8 KV
(1.8 GB) + the admission's transient batch-1 cache, which this config
quantizes at append time (kv_quant=True): ~0.95 GB int8 — the bf16
transient it replaces was 3.6 GB, the very thing that made a long
admission OOM next to the pool (BASELINE.md round-5).

Appends a row to BENCH_TRAIN.jsonl (variant slot-longctx) for BASELINE.
Run: timeout 3000 python scripts/bench_slot_longctx.py
"""

import json
import os
import sys
import time
from types import SimpleNamespace

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CACHE_LEN = 3456
CHUNK = 512
TICKS = 64


class StubModel:
    """Duck-typed model for SlotDecoder: 7B zero params in the production
    decode structure (int8 + compacted + dense-folded), synthetic
    prepare_batch — short text request vs the composed MCUB-4 prompt."""

    def __init__(self):
        import jax
        import jax.numpy as jnp
        from bench import _composed_cfg
        from modelcompose_tpu.config import ROUTE_CLASS_INDEX
        from modelcompose_tpu.core.llama import init_params
        from modelcompose_tpu.ops.quant import quantize_backbone
        from modelcompose_tpu.ops.routed_lora import (active_adapter_set,
                                                      compact_active_adapters,
                                                      fold_dense)

        self.cfg = _composed_cfg()
        spans = [("vision", 576 + 10), ("video", 8 * 257 + 10),
                 ("audio", 32 + 10), ("point", 513 + 10)]
        n_text = 70
        self.L_valid = sum(n for _, n in spans) + n_text
        from modelcompose_tpu.core.packing import pick_bucket
        self.bucket = pick_bucket(self.L_valid)
        route_row = np.zeros(self.bucket, np.int32)
        pos = n_text // 2
        for modal, n in spans:
            route_row[pos:pos + n] = ROUTE_CLASS_INDEX[modal]
            pos += n
        self._route_row = route_row

        full_table = self.cfg.routing_table()
        active = active_adapter_set(full_table, np.unique(route_row))
        shapes = jax.eval_shape(
            lambda: fold_dense(*compact_active_adapters(
                quantize_backbone(init_params(self.cfg,
                                              jax.random.PRNGKey(0))),
                full_table, active)))
        self.params, table = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        self.routing_table = np.asarray(table)

    def decode_routing_table(self):
        return None  # adapters dense-folded: decode runs the default route

    def prepare_batch(self, input_ids, modal_inputs, bucket_len=None):
        import jax.numpy as jnp
        long = bool(modal_inputs)
        L = self.bucket if long else 256
        n_valid = self.L_valid if long else len(input_ids[0])
        route = self._route_row if long else np.zeros(L, np.int32)
        embeds = jnp.zeros((1, L, self.cfg.hidden_size), jnp.bfloat16)
        plan = SimpleNamespace(
            lengths=np.array([n_valid], np.int32),
            route_ids=np.asarray(route[None]),
            segment_ids=(np.arange(L) < n_valid).astype(np.int32)[None])
        return embeds, plan


def main():
    import jax
    from modelcompose_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    if jax.default_backend() != "tpu":
        print(json.dumps({"error": "not on tpu"}))
        return
    from modelcompose_tpu.serve.slot_engine import SlotDecoder

    model = StubModel()
    dec = SlotDecoder(model, max_slots=2, cache_len=CACHE_LEN,
                      kv_quant=True, prefill_chunk=CHUNK)
    temps = np.zeros(2, np.float32)  # greedy
    top_ps = np.ones(2, np.float32)
    key = jax.random.PRNGKey(0)

    def tick():
        toks = dec.sample(key, temps, top_ps)  # np.asarray -> sync
        dec.step(toks)

    short_ids = np.full(200, 9, np.int64)  # admit() wraps into a batch
    dec.admit(0, short_ids, {})

    for _ in range(4):  # compile + warm the 2-slot decode program
        tick()
    t0 = time.perf_counter()
    for _ in range(TICKS):
        tick()
    np.asarray(dec.logits)
    solo_tick_ms = (time.perf_counter() - t0) / TICKS * 1e3

    # --- the long admission: slot 0 keeps decoding between chunks ---
    ticks_during = [0]
    gaps = []
    last = [None]

    def tick_cb():
        now = time.perf_counter()
        if last[0] is not None:
            gaps.append(now - last[0])
        tick()
        last[0] = time.perf_counter()
        ticks_during[0] += 1

    # pre-compile the chunked-prefill programs + splice with a throwaway
    # admission so the timed run measures execution, not relay compiles
    dec.admit(1, short_ids, {"_composed": True}, tick_cb=tick_cb)
    dec.release(1)
    ticks_during[0] = 0
    gaps.clear()
    last[0] = None

    t0 = time.perf_counter()
    L = dec.admit(1, short_ids, {"_composed": True}, tick_cb=tick_cb)
    admission_s = time.perf_counter() - t0

    for _ in range(4):
        tick()
    t0 = time.perf_counter()
    for _ in range(TICKS):
        tick()
    np.asarray(dec.logits)
    duo_tick_ms = (time.perf_counter() - t0) / TICKS * 1e3

    out = {
        "variant": "slot-longctx",
        "pool": "int8", "prefill_chunk": CHUNK, "slots": 2,
        "cache_len": CACHE_LEN, "admitted_positions": int(L),
        "admission_wall_s": round(admission_s, 2),
        "ticks_during_admission": ticks_during[0],
        "max_tick_gap_ms": round(max(gaps) * 1e3, 1) if gaps else None,
        "solo_tick_ms": round(solo_tick_ms, 1),
        "solo_tok_per_sec": round(1e3 / solo_tick_ms, 1),
        "duo_tick_ms": round(duo_tick_ms, 1),
        "duo_tok_per_sec": round(2e3 / duo_tick_ms, 1),
    }
    print(json.dumps(out), flush=True)
    with open(os.path.join(REPO, "BENCH_TRAIN.jsonl"), "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
