"""Profiling utilities (SURVEY.md §5 rebuild)."""

import json
import time

from modelcompose_tpu.config import tiny_test_config
from modelcompose_tpu.utils.profiling import (MetricsLogger, StepTimer,
                                              train_step_flops)


def test_step_timer_and_flops():
    cfg = tiny_test_config(mm_vision_encoder="x", mm_hidden_size=8)
    timer = StepTimer(cfg)
    with timer.step(batch_tokens=128):
        time.sleep(0.01)
    s = timer.summary()
    assert s["step_time_s"] >= 0.01
    assert s["tokens_per_sec"] > 0
    assert s["tflops_per_sec"] >= 0
    assert train_step_flops(cfg, 100) > 0


def test_metrics_logger(tmp_path):
    path = str(tmp_path / "m.jsonl")
    logger = MetricsLogger(path)
    logger.log(1, loss=0.5)
    logger.log(2, loss=0.4, lr=1e-4)
    logger.close()
    recs = [json.loads(l) for l in open(path)]
    assert recs[0]["loss"] == 0.5 and recs[1]["lr"] == 1e-4


def test_annotate_smoke():
    from modelcompose_tpu.utils.profiling import annotate
    with annotate("test-region"):
        pass
