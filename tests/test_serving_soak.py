"""Serving soak test (round-4 VERDICT stretch #9): sustained concurrent
load against the continuous-batching worker — admission churn past slot
capacity, random mid-stream cancellation, mixed temperatures/top_p —
asserting the invariants the per-feature tests can't see under load:

- no slot leak: every slot returns to idle with kv_len pinned at 1;
- no stream interleaving: each greedy stream equals its solo run
  token-for-token even while sampled streams churn around it;
- the worker's wire format stays intact per request (b"\\0"-delimited
  JSON, error_code 0, monotonically growing text);
- clean drain: the engine accepts and completes a request after the
  storm.

Reference role: the semaphore concurrency plane at
modelcompose/serve/model_worker.py:230-243 — here a slot scheduler, so
the load test targets admission/release bookkeeping instead.
"""

import json
import threading
import time

import jax
import numpy as np
import pytest

from modelcompose_tpu.config import tiny_test_config
from modelcompose_tpu.models.model import MultimodalLM
from modelcompose_tpu.serve.model_worker import ModelWorker
from tests.fake_tokenizer import FakeLlamaTokenizer

N_CLIENTS = 12
MAX_SLOTS = 3


@pytest.fixture(scope="module")
def worker():
    cfg = tiny_test_config(mm_vision_encoder="test:32x2", mm_hidden_size=32,
                           mm_projector_type="mlp2x_gelu",
                           eos_token_id=-1)
    model = MultimodalLM.random_init(cfg, jax.random.PRNGKey(0))

    def loader(mp, mb, name):
        return FakeLlamaTokenizer(), model, model.modal_processors(), 2048

    return ModelWorker("http://c", "http://w", "m-multimodal", "b",
                       limit_concurrency=MAX_SLOTS, no_register=True,
                       loader=loader, continuous_batching=True,
                       slot_cache_len=64)


@pytest.mark.slow
def test_soak_concurrent_clients_cancellation_and_drain(worker):
    rs = np.random.RandomState(11)
    prompts = [f"question number {i} about thing {rs.randint(100)}"
               for i in range(N_CLIENTS)]
    # a third greedy (parity-checkable), a third sampled, a third
    # sampled+nucleus; every 4th client cancels mid-stream
    params = []
    for i in range(N_CLIENTS):
        kind = i % 3
        params.append({
            "prompt": prompts[i],
            "max_new_tokens": int(rs.randint(3, 12)),
            "temperature": 0.0 if kind == 0 else 0.8,
            "top_p": 0.7 if kind == 2 else 1.0,
        })

    # solo greedy references BEFORE the storm
    solos = {}
    for i in range(0, N_CLIENTS, 3):
        chunks = list(worker.generate_stream(dict(params[i])))
        solos[i] = json.loads(chunks[-1][:-1])["text"]

    results = [None] * N_CLIENTS
    errors = []

    def client(i):
        try:
            cancel = threading.Event()
            time.sleep(float(rs.rand()) * 0.5)
            text = None
            n_chunks = 0
            prev_len = -1
            for chunk in worker.generate_stream(dict(params[i]), cancel):
                assert chunk.endswith(b"\0")
                payload = json.loads(chunk[:-1])
                assert payload["error_code"] == 0, payload
                # monotonically growing text per stream = no interleaving
                assert len(payload["text"]) >= prev_len
                prev_len = len(payload["text"])
                text = payload["text"]
                n_chunks += 1
                if i % 4 == 3 and n_chunks >= 2:
                    cancel.set()
            results[i] = text
        except Exception as e:  # noqa: BLE001
            errors.append((i, repr(e)))

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(N_CLIENTS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not any(t.is_alive() for t in threads), "client hung"
    assert not errors, errors

    # greedy streams match their solo runs exactly (uncancelled ones)
    for i in range(0, N_CLIENTS, 3):
        if i % 4 == 3:
            continue
        assert results[i] == solos[i], (i, results[i], solos[i])

    # no slot leak: engine drains to all-idle, kv_lens pinned
    dec = worker.engine.decoder
    deadline = time.time() + 60
    while time.time() < deadline and worker.engine._slots:
        time.sleep(0.2)
    assert not worker.engine._slots
    assert not dec.active.any(), dec.active
    assert (dec.kv_lens == 1).all(), dec.kv_lens

    # clean drain: a post-storm request completes normally
    after = list(worker.generate_stream(
        {"prompt": "after the storm", "max_new_tokens": 3,
         "temperature": 0}))
    assert json.loads(after[-1][:-1])["error_code"] == 0
    assert len(after) >= 1
