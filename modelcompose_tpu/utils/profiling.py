"""Profiling and step-metrics utilities.

The reference has no tracing (SURVEY.md §5: wandb scalars only); the TPU
rebuild provides first-class observability: ``jax.profiler`` trace capture
(xprof-compatible), named trace annotations, and a cheap step-time /
TFLOP-throughput meter for training loops.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Any, Dict, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a device trace viewable in xprof/tensorboard."""
    import jax
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in traces (jax.profiler.TraceAnnotation)."""
    import jax
    return jax.profiler.TraceAnnotation(name)


def train_step_flops(cfg, batch_tokens: int) -> float:
    """Approximate train-step FLOPs: 6 * params_active * tokens (fwd+bwd),
    counting the dense backbone + the routed adapter branches."""
    H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    L = cfg.num_hidden_layers
    kv = cfg.num_key_value_heads * cfg.head_dim
    dense = L * (2 * H * H + 2 * H * kv + 3 * H * I) + V * H
    n_adapters = len(cfg.adapter_names())
    # attn adapters: q (2H) + k (H+kv) + v (H+kv) + o (2H) = 6H + 2kv
    lora = L * n_adapters * cfg.lora_r * (6 * H + 2 * kv + 3 * (H + I))
    return 6.0 * (dense + lora) * batch_tokens


class StepTimer:
    """Rolling step-time / throughput meter.

    >>> timer = StepTimer(cfg)
    >>> with timer.step(batch_tokens=8192): state, loss = train_step(...)
    >>> print(timer.summary())
    """

    def __init__(self, cfg=None, window: int = 50):
        self.cfg = cfg
        self.window = window
        self.times: list = []
        self.tokens: list = []

    @contextlib.contextmanager
    def step(self, batch_tokens: int = 0):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.times.append(dt)
        self.tokens.append(batch_tokens)
        if len(self.times) > self.window:
            self.times.pop(0)
            self.tokens.pop(0)

    def summary(self) -> Dict[str, Any]:
        if not self.times:
            return {}
        dt = float(np.mean(self.times))
        tokens = float(np.mean(self.tokens))
        out = {"step_time_s": round(dt, 4),
               "steps_per_sec": round(1.0 / dt, 3),
               "tokens_per_sec": round(tokens / dt, 1) if tokens else None}
        if self.cfg is not None and tokens:
            out["tflops_per_sec"] = round(
                train_step_flops(self.cfg, int(tokens)) / dt / 1e12, 2)
        return out


class MetricsLogger:
    """Append-only JSONL metrics (the wandb-scalar role, offline)."""

    def __init__(self, path: str):
        self.path = path
        self._fh = open(path, "a")

    def log(self, step: int, **metrics):
        rec = {"step": step, "time": time.time(), **metrics}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def close(self):
        self._fh.close()


def enable_compile_cache(path: str = "/tmp/mc_jax_cache",
                         min_compile_secs: float = 2.0):
    """Persistent XLA compile cache (verified working through the axon
    relay, round 4): repeated bench/driver runs skip the 10-30 min remote
    recompiles of unchanged 7B programs.  Single definition — the bench
    and probe scripts all route through here."""
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        pass
