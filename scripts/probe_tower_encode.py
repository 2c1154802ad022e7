"""Probe: per-step cost of the on-chip CLIP tower encode in the stage-1
pipeline (b16 x 336px), fp32 vs bf16 params.

The pipeline bench showed ~1.65 s/step of device time beyond the bare
train-step floor; the tower encode (dispatched from make_batch, serialized
before the step on the single chip) is the suspect — towers default to
fp32 params.  This measures it directly.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    from modelcompose_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    if jax.default_backend() != "tpu":
        print(json.dumps({"error": "not on tpu"}))
        return
    import jax.numpy as jnp

    from modelcompose_tpu.config import ModelConfig
    from modelcompose_tpu.models.towers import ClipVisionTower

    cfg = ModelConfig(mm_vision_encoder="openai/clip-vit-large-patch14-336",
                      mm_vision_select_layer=-2)
    pixels = np.random.RandomState(0).rand(16, 336, 336, 3).astype(np.float32)

    out = {}
    for dtype_name, dtype in [("float32", jnp.float32),
                              ("bfloat16", jnp.bfloat16)]:
        tower = ClipVisionTower(cfg.mm_vision_encoder, cfg,
                                rng=jax.random.PRNGKey(0), dtype=dtype)
        # compile + warm
        r = tower.encode(pixels)
        np.asarray(r[..., :8])  # D2H sync (relay gotcha)
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            r = tower.encode(pixels)
        np.asarray(r[..., :8])  # D2H sync (relay gotcha)
        dt = (time.perf_counter() - t0) / iters
        out[dtype_name] = {"encode_ms_b16": round(dt * 1e3, 1),
                           "img_per_sec": round(16 / dt, 1),
                           "out_dtype": str(r.dtype)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
