"""Encoder throughput benchmark: clips/sec per tower on one chip.

The secondary metric in BASELINE.md (driver BASELINE.json): CLIP-ViT-L/336
images/sec, LanguageBind 8-frame clips/sec, BEATs 512-frame (~5 s)
windows/sec, PointBERT 8192-pt clouds/sec.  Random weights (throughput is weight-value agnostic);
timing via D2H fetch (block_until_ready does not sync through the axon
relay).

Usage: python scripts/bench_encoders.py [--batch 8] [--iters 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def timeit(fn, iters):
    # warm BOTH compiles: the tower and the tiny sync reduction (remote
    # compiles take seconds and must stay out of the timed window)
    _ = float(fn().sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _ = float(out.sum())  # sync via a tiny reduction fetch
    return (time.perf_counter() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--iters", type=int, default=4)
    parser.add_argument("--towers", nargs="*",
                        default=["vision", "video", "audio", "point",
                                 "eva", "imagebind"])
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    B = args.batch
    results = {}

    if "vision" in args.towers:
        from modelcompose_tpu.models.vision_clip import (ClipVisionConfig,
                                                         clip_vision_features,
                                                         init_clip_vision)
        cfg = ClipVisionConfig()  # ViT-L/14-336, layer -2
        params = init_clip_vision(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
        pixels = jnp.zeros((B, 336, 336, 3), jnp.bfloat16)
        jfn = jax.jit(lambda p, x: clip_vision_features(p, cfg, x))
        dt = timeit(lambda: jfn(params, pixels), args.iters)
        results["clip_vit_l_336_images_per_sec"] = round(B / dt, 2)

    if "video" in args.towers:
        from modelcompose_tpu.models.video_languagebind import (
            LanguageBindVideoConfig, init_languagebind_video,
            languagebind_video_features)
        cfg = LanguageBindVideoConfig()  # ViT-L/14-224, 8 frames
        params = init_languagebind_video(cfg, jax.random.PRNGKey(0),
                                         jnp.bfloat16)
        vid = jnp.zeros((max(B // 4, 1), 8, 224, 224, 3), jnp.bfloat16)
        jfn = jax.jit(lambda p, x: languagebind_video_features(p, cfg, x))
        dt = timeit(lambda: jfn(params, vid), args.iters)
        results["languagebind_video_clips_per_sec"] = round(
            vid.shape[0] / dt, 2)

    if "audio" in args.towers:
        from modelcompose_tpu.models.audio_beats import (
            BeatsConfig, beats_extract_features, init_beats)
        cfg = BeatsConfig()  # BEATs iter3+, 512-frame window
        params = init_beats(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
        fbank = jnp.zeros((B, 512, 128), jnp.bfloat16)
        jfn = jax.jit(lambda p, x: beats_extract_features(p, cfg, x)[0])
        dt = timeit(lambda: jfn(params, fbank), args.iters)
        results["beats_5s_clips_per_sec"] = round(B / dt, 2)

    if "eva" in args.towers:
        from modelcompose_tpu.models.vision_eva import (PRESETS,
                                                        eva_vision_features,
                                                        init_eva_vision)
        for preset in ("EVA02-CLIP-L-14-336", "EVA01-CLIP-g-14"):
            cfg = PRESETS[preset]
            params = init_eva_vision(cfg, jax.random.PRNGKey(0),
                                     jnp.bfloat16)
            n = B if "L-14" in preset else max(B // 2, 1)  # g-14 is 1.0B
            pixels = jnp.zeros((n, cfg.image_size, cfg.image_size, 3),
                               jnp.bfloat16)
            jfn = jax.jit(lambda p, x, c=cfg: eva_vision_features(p, c, x))
            dt = timeit(lambda: jfn(params, pixels), args.iters)
            key = preset.lower().replace("-", "_") + "_images_per_sec"
            results[key] = round(n / dt, 2)
            del params

    if "imagebind" in args.towers:
        from modelcompose_tpu.models.audio_imagebind import (
            ImageBindAudioConfig, imagebind_audio_features,
            init_imagebind_audio)
        cfg = ImageBindAudioConfig()
        params = init_imagebind_audio(cfg, jax.random.PRNGKey(0),
                                      jnp.bfloat16)
        # 3 clips per audio (the reference's clip sampler default)
        mel = jnp.zeros((B, cfg.clips_per_audio, 1, cfg.num_mel_bins,
                         cfg.target_len), jnp.bfloat16)
        jfn = jax.jit(lambda p, x: imagebind_audio_features(p, cfg, x))
        dt = timeit(lambda: jfn(params, mel), args.iters)
        results["imagebind_audio_3clip_per_sec"] = round(B / dt, 2)

    if "point" in args.towers:
        from modelcompose_tpu.models.point_bert import (PointBertConfig,
                                                        init_point_bert,
                                                        point_bert_features)
        cfg = PointBertConfig()  # 8192 x 6, 512 groups
        params = init_point_bert(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
        pts = jnp.zeros((max(B // 4, 1), 8192, 6), jnp.float32)
        jfn = jax.jit(lambda p, x: point_bert_features(p, cfg, x))
        dt = timeit(lambda: jfn(params, pts), args.iters)
        results["pointbert_8192pt_clouds_per_sec"] = round(
            pts.shape[0] / dt, 2)

    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
