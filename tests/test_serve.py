"""Serving plane: controller registry/dispatch, worker stream, demo app
(reference: modelcompose/serve/{controller,model_worker}.py, demo_app.py)."""

import asyncio
import json
import time

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from modelcompose_tpu.serve.controller import Controller, build_app


# ------------------------------------------------------------ controller

def test_controller_register_and_dispatch():
    c = Controller("shortest_queue")
    assert c.register_worker("http://w1", True,
                             {"model_names": ["m"], "speed": 1,
                              "queue_length": 0})
    assert c.register_worker("http://w2", True,
                             {"model_names": ["m"], "speed": 1,
                              "queue_length": 5})
    assert c.list_models() == ["m"]
    # shortest queue wins and gets its queue bumped
    assert c.get_worker_address("m") == "http://w1"
    assert c.worker_info["http://w1"].queue_length == 1
    assert c.get_worker_address("nope") == ""


def test_controller_heartbeat_expiry():
    c = Controller()
    c.register_worker("http://w1", True, {"model_names": ["m"],
                                          "speed": 1, "queue_length": 0})
    c.worker_info["http://w1"].last_heart_beat = time.time() - 1000
    c.remove_stale_workers()
    assert c.worker_info == {}
    # heartbeat for unknown worker -> False (triggers re-register)
    assert not c.receive_heart_beat("http://w1", 0)


def test_controller_lottery_dispatch():
    c = Controller("lottery")
    c.register_worker("http://w1", True, {"model_names": ["m"],
                                          "speed": 1, "queue_length": 0})
    picks = {c.get_worker_address("m", np.random.default_rng(i))
             for i in range(3)}
    assert picks == {"http://w1"}


def test_controller_http_api():
    async def run():
        app = build_app(Controller())
        async with TestClient(TestServer(app)) as client:
            r = await client.post("/register_worker", json={
                "worker_name": "http://w1", "check_heart_beat": True,
                "worker_status": {"model_names": ["m"], "speed": 1,
                                  "queue_length": 0}})
            assert (await r.json())["exist"]
            r = await client.post("/list_models", json={})
            assert (await r.json())["models"] == ["m"]
            r = await client.post("/get_worker_address", json={"model": "m"})
            assert (await r.json())["address"] == "http://w1"
            r = await client.post("/receive_heart_beat", json={
                "worker_name": "http://w1", "queue_length": 2})
            assert (await r.json())["exist"]

    asyncio.get_event_loop().run_until_complete(run())


# ---------------------------------------------------------------- worker

class FakeModel:
    def generate(self, ids, modal_inputs, max_new_tokens=16,
                 temperature=0.0, rng=None, num_beams=1, top_p=1.0):
        return [[11, 12, 13]]

    def generate_stream(self, ids, modal_inputs, *, max_new_tokens,
                        top_ps=None,
                        temperatures, emit, rng_seed=None, bucket_len=None,
                        cancelled=None):
        for b in range(len(ids)):
            for tok in (11, 12, 13):
                emit(b, ("token", tok))
            emit(b, ("done", None))


class FakeTokenizer:
    bos_token_id = 1

    def __call__(self, text):
        class R:
            pass
        r = R()
        r.input_ids = [1, 5, 6]
        return r

    def decode(self, ids, skip_special_tokens=True):
        return "hello world"


def _fake_loader(model_path, model_base, model_name):
    return FakeTokenizer(), FakeModel(), {}, 2048


def test_worker_generate_stream_chunks():
    from modelcompose_tpu.serve.model_worker import ModelWorker, build_app \
        as build_worker_app
    worker = ModelWorker("http://c", "http://w", "path-multimodal", "base",
                         no_register=True, loader=_fake_loader)
    chunks = list(worker.generate_stream(
        {"prompt": "hi", "max_new_tokens": 8, "temperature": 0}))
    assert all(c.endswith(b"\0") for c in chunks)
    last = json.loads(chunks[-1][:-1])
    assert last["error_code"] == 0
    assert "hello world" in last["text"]

    async def run():
        app = build_worker_app(worker)
        async with TestClient(TestServer(app)) as client:
            r = await client.post("/worker_get_status", json={})
            status = await r.json()
            assert status["model_names"] == ["path-multimodal"]
            r = await client.post("/worker_generate_stream",
                                  json={"prompt": "hi", "temperature": 0})
            body = await r.read()
            parts = [p for p in body.split(b"\0") if p]
            assert json.loads(parts[-1])["error_code"] == 0

    asyncio.get_event_loop().run_until_complete(run())


# ------------------------------------------------------------------ demo

def test_demo_app_index_and_generate(tmp_path):
    from modelcompose_tpu.serve.demo_app import DemoApp, build_app \
        as build_demo_app

    class DemoModel:
        def generate(self, ids, modal_inputs, max_new_tokens=128,
                     num_beams=1):
            return [[7, 8]]

    def loader(mp, mb, name):
        return FakeTokenizer(), DemoModel(), {}, 2048

    demo = DemoApp("merged-multimodal", "base", loader=loader)

    async def run():
        app = build_demo_app(demo)
        async with TestClient(TestServer(app)) as client:
            r = await client.get("/")
            assert r.status == 200
            assert "ModelCompose" in await r.text()
            r = await client.post("/generate",
                                  data={"question": "what?"})
            text = await r.text()
            assert "hello world" in text

    asyncio.get_event_loop().run_until_complete(run())


def test_web_server_chat_flow():
    """Web UI -> controller -> worker full stream round trip."""
    from modelcompose_tpu.serve.controller import Controller, \
        build_app as build_ctrl
    from modelcompose_tpu.serve.model_worker import ModelWorker, \
        build_app as build_worker_app
    from modelcompose_tpu.serve.web_server import WebServer, \
        build_app as build_web

    async def run():
        worker = ModelWorker("http://c", "http://w", "m-multimodal", "b",
                             no_register=True, loader=_fake_loader)
        worker_server = TestServer(build_worker_app(worker))
        await worker_server.start_server()
        worker_addr = f"http://{worker_server.host}:{worker_server.port}"

        controller = Controller()
        controller.register_worker(worker_addr, True,
                                   {"model_names": ["m-multimodal"],
                                    "speed": 1, "queue_length": 0})
        ctrl_server = TestServer(build_ctrl(controller))
        await ctrl_server.start_server()
        ctrl_url = f"http://{ctrl_server.host}:{ctrl_server.port}"

        web_app = build_web(WebServer(ctrl_url))
        async with TestClient(TestServer(web_app)) as client:
            r = await client.get("/")
            assert "m-multimodal" in await r.text()
            r = await client.post("/chat", data={"model": "m-multimodal",
                                                 "message": "hi"})
            text = await r.text()
            assert "hello world" in text
        await worker_server.close()
        await ctrl_server.close()

    asyncio.get_event_loop().run_until_complete(run())


def test_batching_engine_coalesces_requests():
    from modelcompose_tpu.serve.model_worker import BatchingEngine
    import threading

    seen_batches = []

    def stream(requests, emit):
        seen_batches.append(len(requests))
        for i, r in enumerate(requests):
            emit(i, ("token", int(r["prompt"])))
            emit(i, ("done", None))

    engine = BatchingEngine(stream, max_batch=4, batch_wait_ms=50)
    results = {}

    def call(i):
        q = engine.submit({"prompt": str(i)})
        toks = []
        while True:
            kind, payload = q.get()
            if kind == "done":
                break
            toks.append(payload)
        results[i] = toks

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == {i: [i] for i in range(4)}
    assert max(seen_batches) >= 2  # coalesced


def test_batching_engine_error_propagates():
    from modelcompose_tpu.serve.model_worker import BatchingEngine

    def stream(requests, emit):
        raise RuntimeError("boom")

    engine = BatchingEngine(stream, max_batch=2, batch_wait_ms=1)
    kind, payload = engine.submit({"prompt": "x"}).get()
    assert kind == "error" and isinstance(payload, RuntimeError)


# ------------------------------------------------------------- streaming

def test_streaming_chunks_arrive_before_generation_completes():
    """TRUE incremental streaming over a live socket: a chunk must reach
    the client while the model is still decoding (the reference's
    TextIteratorStreamer semantics, reference: model_worker.py:122-192)."""
    import threading

    from modelcompose_tpu.serve.model_worker import ModelWorker, \
        build_app as build_worker_app

    finished = threading.Event()

    class SlowStreamModel(FakeModel):
        def generate_stream(self, ids, modal_inputs, *, max_new_tokens,
                            top_ps=None,
                            temperatures, emit, rng_seed=None,
                            bucket_len=None, cancelled=None):
            for tok in (11, 12, 13, 14):
                emit(0, ("token", tok))
                time.sleep(0.15)  # still "decoding" after each token
            emit(0, ("done", None))
            finished.set()

    class CountingTokenizer(FakeTokenizer):
        def decode(self, ids, skip_special_tokens=True):
            return "tok " * len(ids)

    def loader(mp, mb, name):
        return CountingTokenizer(), SlowStreamModel(), {}, 2048

    worker = ModelWorker("http://c", "http://w", "m-multimodal", "b",
                         no_register=True, loader=loader)

    async def run():
        app = build_worker_app(worker)
        async with TestClient(TestServer(app)) as client:
            r = await client.post("/worker_generate_stream",
                                  json={"prompt": "hi", "temperature": 0,
                                        "max_new_tokens": 4})
            got_early_chunk = False
            chunks = []
            async for piece in r.content.iter_any():
                chunks.extend(p for p in piece.split(b"\0") if p)
                if chunks and not finished.is_set():
                    got_early_chunk = True
            assert got_early_chunk, \
                "no chunk arrived before generation completed"
            assert len(chunks) >= 2
            assert json.loads(chunks[-1])["error_code"] == 0

    asyncio.get_event_loop().run_until_complete(run())


def test_media_requests_batch_as_one_packed_generation():
    """Two image requests coalesce into ONE packed generation: their
    feature instances concatenate in request order (plan_pack row-major
    consumption) instead of falling back to sequential batch-1."""
    import threading

    import jax

    from modelcompose_tpu.config import tiny_test_config
    from modelcompose_tpu.models.model import MultimodalLM
    from modelcompose_tpu.serve.model_worker import ModelWorker
    from tests.fake_tokenizer import FakeLlamaTokenizer

    cfg = tiny_test_config(mm_vision_encoder="test:8x1", mm_hidden_size=8,
                           mm_projector_type="mlp2x_gelu")
    model = MultimodalLM.random_init(cfg, jax.random.PRNGKey(0))
    calls = []
    orig = model.generate_stream

    def counting(ids, modal_inputs, **kw):
        calls.append((len(ids),
                      {m: np.asarray(v).shape[0]
                       for m, v in modal_inputs.items()}))
        return orig(ids, modal_inputs, **kw)

    model.generate_stream = counting

    def loader(mp, mb, name):
        return FakeLlamaTokenizer(), model, model.modal_processors(), 2048

    worker = ModelWorker("http://c", "http://w", "m-multimodal", "b",
                         no_register=True, loader=loader)
    # widen the coalescence window: under CI load the 5 ms default can
    # miss the second thread's submit and flake the one-batch assertion
    from modelcompose_tpu.serve.model_worker import BatchingEngine
    worker.engine = BatchingEngine(worker._stream_batch, max_batch=5,
                                   batch_wait_ms=300)

    import base64
    import io

    from PIL import Image
    buf = io.BytesIO()
    Image.new("RGB", (28, 28), (255, 0, 0)).save(buf, format="PNG")
    img_b64 = base64.b64encode(buf.getvalue()).decode()

    results = {}

    def call(i):
        chunks = list(worker.generate_stream(
            {"prompt": f"<image>\nquestion {i}", "max_new_tokens": 3,
             "temperature": 0, "modal_inputs": {"vision": [img_b64]}}))
        results[i] = chunks

    threads = [threading.Thread(target=call, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 2
    for chunks in results.values():
        assert json.loads(chunks[-1][:-1])["error_code"] == 0
    # both media requests ran as one packed generation with 2 images
    assert any(n_ids == 2 and feats.get("vision") == 2
               for n_ids, feats in calls), calls


def _tiny_text_worker(stop_decode=False):
    """Worker over a REAL tiny MultimodalLM with a decode-step counter, so
    cancellation tests measure actual decode-loop consumption."""
    import jax

    from modelcompose_tpu.config import tiny_test_config
    from modelcompose_tpu.core import generate as G
    from modelcompose_tpu.models.model import MultimodalLM
    from modelcompose_tpu.serve.model_worker import ModelWorker
    from tests.fake_tokenizer import FakeLlamaTokenizer

    cfg = tiny_test_config(eos_token_id=-1)  # random model: no natural EOS
    model = MultimodalLM.random_init(cfg, jax.random.PRNGKey(0))

    steps = [0]
    orig_step = G._decode_step

    def counting(*a, **kw):
        steps[0] += 1
        return orig_step(*a, **kw)

    class StopTok(FakeLlamaTokenizer):
        def decode(self, ids, skip_special_tokens=True):
            n = len(np.asarray(ids).tolist())
            if stop_decode and n >= 3:  # 3rd token completes the stop str
                return "x" * n + "STOP trailing"
            return "x" * n

    def loader(mp, mb, name):
        return StopTok(), model, {}, 2048

    worker = ModelWorker("http://c", "http://w", "m-multimodal", "b",
                         no_register=True, loader=loader)
    return worker, steps, (G, orig_step, counting)


def test_stop_string_cancels_packed_generation():
    """A stop-string hit releases the row from the packed generation: the
    real decode loop early-exits instead of burning max_new_tokens steps
    (reference stopping-criteria role: mm_utils.py:114-140).  Matching is
    substring (rfind), so a stop landing mid-chunk is caught and the text
    is truncated at the match."""
    worker, steps, (G, orig, counting) = _tiny_text_worker(stop_decode=True)
    G._decode_step = counting
    try:
        chunks = list(worker.generate_stream(
            {"prompt": "hi", "stop": "STOP", "max_new_tokens": 50,
             "temperature": 0}))
    finally:
        G._decode_step = orig
    last = json.loads(chunks[-1][:-1])
    assert last["error_code"] == 0
    assert "STOP" not in last["text"] and "trailing" not in last["text"]
    # stop hit on the 3rd token; allow a few racy extra producer steps
    assert steps[0] <= 10, steps[0]


def test_client_disconnect_cancels_packed_generation():
    """Closing the chunk generator mid-stream (what build_app does on a
    client disconnect) cancels the row: decode stops well short of
    max_new_tokens."""
    worker, steps, (G, orig, counting) = _tiny_text_worker()
    G._decode_step = counting
    try:
        gen = worker.generate_stream(
            {"prompt": "hi", "max_new_tokens": 50, "temperature": 0})
        next(gen)
        next(gen)
        gen.close()  # GeneratorExit -> finally -> cancel event
        time.sleep(1.0)  # let the engine thread observe the cancel
    finally:
        G._decode_step = orig
    assert steps[0] <= 10, steps[0]


def test_external_cancel_event_releases_row():
    """build_app passes its own cancel event so it can release the row
    even while the chunk generator is EXECUTING in an executor thread
    (closing a running generator raises ValueError); setting the event
    alone must stop the packed row's decode consumption."""
    import threading

    worker, steps, (G, orig, counting) = _tiny_text_worker()
    G._decode_step = counting
    try:
        cancel = threading.Event()
        gen = worker.generate_stream(
            {"prompt": "hi", "max_new_tokens": 50, "temperature": 0},
            cancel=cancel)
        next(gen)
        cancel.set()          # endpoint-side cancellation, no close()
        time.sleep(1.0)       # engine observes the event
    finally:
        G._decode_step = orig
        gen.close()
    assert steps[0] <= 10, steps[0]
