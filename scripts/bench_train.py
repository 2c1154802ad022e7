"""On-chip stage-2 DAMC train-step benchmark (single chip).

Measures the reference's primary workload — the stage-2 DAMC finetune step
(routed LoRA forward + backward + optax on adapters/projectors, remat scan)
— at the reference's own micro-batch shape (per-device batch 4, seq 2048,
gradient checkpointing; reference:
scripts/model_composition/train/run_finetune_vision_damc.sh) and reports
step time, tokens/s and achieved model-FLOPs utilization per variant.

Variants probe the structural levers on this chip:
  - bf16 frozen base weights (the reference configuration), vs
  - int8 frozen base weights (weight-only quantized forward: the frozen
    base GEMMs stream half the HBM bytes; legal because base weights get
    no gradient — their grads are dead-code-eliminated by XLA under the
    optax set_to_zero label).
  - batch scaling (4 -> 8) for MFU.
  - stage-1 projector-only pretrain step (reference:
    run_pretrain_vision.sh — grads flow to the projector through the
    frozen backbone, no weight grads).

Run:  nohup python scripts/bench_train.py > /tmp/bench_train.log 2>&1 &
Emits one JSON line per variant (also appended to BENCH_TRAIN.jsonl).
"""

import gc
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

V5E_BF16_PEAK = 197e12


def stage2_cfg():
    from modelcompose_tpu.config import ModelConfig
    return ModelConfig(
        lora_strategy="modal+language", lora_r=128, lora_alpha=256,
        local_prefix_tokens=5, local_suffix_tokens=5,
        mm_vision_encoder="clip-vit-large-patch14-336", mm_hidden_size=1024,
        mm_projector_type="mlp2x_gelu", dtype="bfloat16", remat=True)


def zeros_like_shapes(fn):
    import jax
    import jax.numpy as jnp
    shapes = jax.eval_shape(fn)
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def make_batch(cfg, B, L, span):
    """Synthetic stage-2 batch: one <image> per sample + text filling the
    bucket (every position valid — the max-work step shape)."""
    import jax.numpy as jnp
    from modelcompose_tpu.constants import MODAL_TOKEN_INDEXES
    from modelcompose_tpu.core.packing import plan_pack

    IMG = MODAL_TOKEN_INDEXES["vision"]
    n_text = L - span - 1
    ids = [np.concatenate([[1, IMG], np.full(n_text, 9, np.int64)])
           for _ in range(B)]
    labels = [np.concatenate([[-100, -100], np.full(n_text, 9, np.int64)])
              for _ in range(B)]
    plan = plan_pack(ids, {"vision": (B, span)}, labels=labels, bucket_len=L)
    feats = jnp.zeros((B, 576, cfg.mm_hidden_size), jnp.bfloat16)
    batch = {
        "encoder_features": {"vision": feats},
        "token_ids": jnp.asarray(plan.token_ids),
        "feat_idx": jnp.asarray(plan.feat_idx),
        "is_feat": jnp.asarray(plan.is_feat),
        "route_ids": jnp.asarray(plan.route_ids),
        "labels": jnp.asarray(plan.labels),
        "segment_ids": jnp.asarray(plan.segment_ids),
    }
    return batch, tuple(plan.feat_layout)


def train_matmul_flops_per_token(cfg, n_adapters, lm_head=True):
    """Forward MXU flops per token: base GEMMs + all stacked adapter rows
    (the routed einsum contracts every row for every token)."""
    H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    kv = cfg.num_key_value_heads * cfg.head_dim
    base = cfg.num_hidden_layers * (
        2 * (H * H + H * kv * 2 + H * H) + 2 * (H * I * 2 + I * H))
    if lm_head:
        base += 2 * H * V
    r, A = cfg.lora_r, n_adapters
    adapters = cfg.num_hidden_layers * 2 * r * A * (
        (H + H) + (H + kv) * 2 + (H + H) + (H + I) * 2 + (I + H))
    return base + adapters


def run_variant(name, cfg, B, L, *, int8_base, mu_dtype, stage1,
                steps=6):
    import jax
    import jax.numpy as jnp
    from modelcompose_tpu.core.llama import init_params
    from modelcompose_tpu.models.projectors import init_projector
    from modelcompose_tpu.ops.quant import quantize_backbone
    from modelcompose_tpu.train.trainer import (TrainConfig, init_train_state,
                                                make_optimizer,
                                                make_train_step)

    if int8_base:
        backbone = zeros_like_shapes(lambda: quantize_backbone(
            init_params(cfg, jax.random.PRNGKey(0)), quantize_lm_head=True))
    else:
        backbone = zeros_like_shapes(
            lambda: init_params(cfg, jax.random.PRNGKey(0)))
    projectors = {"vision": zeros_like_shapes(lambda: init_projector(
        "mlp2x_gelu", jax.random.PRNGKey(1), cfg.mm_hidden_size,
        cfg.hidden_size, dtype=jnp.bfloat16))}

    tc = TrainConfig(learning_rate=2e-4, mm_projector_lr=2e-5,
                     mm_language_lr=1e-5, warmup_ratio=0.03,
                     total_steps=1000, adam_mu_dtype=mu_dtype,
                     tune_mm_mlp_adapter=stage1, loss_chunk=256)
    state = init_train_state(cfg, tc, backbone, projectors)
    tx, _ = make_optimizer(cfg, tc, state.params)
    step = make_train_step(cfg, tc, tx)

    span = 576 + cfg.local_prefix_tokens + cfg.local_suffix_tokens
    batch, layout = make_batch(cfg, B, L, span)

    # compile warmup (relay can drop connections on long compiles — retry)
    for attempt in range(3):
        try:
            state, loss = step(state, batch, layout)
            np.asarray(loss)
            break
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            if "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg:
                raise
            if attempt == 2:
                raise
            print(f"[{name}] compile relay dropped ({msg[:120]}); retrying",
                  file=sys.stderr, flush=True)
            time.sleep(30)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = step(state, batch, layout)
    loss_val = float(np.asarray(loss))  # D2H = hard sync through the relay
    dt = (time.perf_counter() - t0) / steps

    n_adapters = len(cfg.adapter_names())
    fwd_matmul = train_matmul_flops_per_token(cfg, n_adapters) * B * L
    fwd_attn = cfg.num_hidden_layers * 2 * L * L * cfg.hidden_size * B
    fwd = fwd_matmul + fwd_attn
    # stage-1 (projector-only) computes no weight grads: bwd is the
    # dx chain only (~1x fwd), so model work is 2x fwd, not 3x
    bwd_mult = 2 if stage1 else 3
    model_flops = bwd_mult * fwd   # remat recompute excluded
    hw_flops = (bwd_mult + 1) * fwd  # incl. the remat forward recompute
    result = {
        "variant": name, "batch": B, "seq": L,
        "step_ms": round(dt * 1e3, 1),
        "tokens_per_sec": round(B * L / dt, 1),
        "train_mfu_model": round(model_flops / dt / V5E_BF16_PEAK, 3),
        "train_mfu_hw": round(hw_flops / dt / V5E_BF16_PEAK, 3),
        "loss": loss_val,
        "int8_base": int8_base, "mu_dtype": mu_dtype or "float32",
        "stage1": stage1,
    }
    del state, batch, backbone, projectors
    gc.collect()
    return result


def _enable_compile_cache():
    # single definition lives in the package; kept as a named alias here
    # because bench_train_accum.py / probe_train_memory.py import it
    from modelcompose_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()


def main():
    _enable_compile_cache()
    import jax
    if jax.default_backend() != "tpu":
        print(json.dumps({"error": "not on tpu"}))
        return
    cfg = stage2_cfg()
    # 16 GB HBM arithmetic (measured round 4: every bf16-base stage-2
    # variant OOMs — the same arithmetic that forces the reference onto
    # ZeRO-3 over 8 GPUs): int8 frozen base (7.0 GB) + bf16 adapters
    # (1.3 GB, 2 rows x 325M) + bf16 grads (1.35 GB) + Adam mu(bf16)/
    # nu(fp32) (4.05 GB) + remat residuals (~0.5 GB/batch-row at 2048)
    # + chunked CE.  Ladder climbs batch size until OOM.
    variants = [
        ("stage2-int8-b2", dict(B=2, L=2048, int8_base=True,
                                mu_dtype="bfloat16", stage1=False)),
        ("stage2-int8-b4", dict(B=4, L=2048, int8_base=True,
                                mu_dtype="bfloat16", stage1=False)),
        ("stage2-int8-b8", dict(B=8, L=2048, int8_base=True,
                                mu_dtype="bfloat16", stage1=False)),
        ("stage1-proj-b16", dict(B=16, L=1024, int8_base=True,
                                 mu_dtype="bfloat16", stage1=True)),
        # the reference-config datapoint: expected to OOM on one chip
        # (documents WHY int8-frozen-base is the single-chip enabler)
        ("stage2-bf16-b1", dict(B=1, L=2048, int8_base=False,
                                mu_dtype="bfloat16", stage1=False)),
    ]
    fallbacks = {
        "stage2-int8-b2": ("stage2-int8-b1",
                           dict(B=1, L=2048, int8_base=True,
                                mu_dtype="bfloat16", stage1=False)),
        "stage1-proj-b16": ("stage1-proj-b8",
                            dict(B=8, L=1024, int8_base=True,
                                 mu_dtype="bfloat16", stage1=True)),
    }
    out = open(os.path.join(REPO, "BENCH_TRAIN.jsonl"), "a")
    # MC_TRAIN_VARIANTS=name1,name2 runs a subset — an OOMing variant can
    # wedge the shared relay for hours, so re-measurement sessions pick
    # only the variants they need (e.g. stage2-int8-b2).
    only = [v for v in os.environ.get("MC_TRAIN_VARIANTS", "").split(",")
            if v]
    queue = [v for v in variants if not only or v[0] in only]
    oom_batch = None  # smallest stage-2 int8 batch that OOMed
    while queue:
        name, kw = queue.pop(0)
        B, L = kw.pop("B"), kw.pop("L")
        if (oom_batch is not None and kw.get("int8_base")
                and not kw.get("stage1") and B >= oom_batch):
            print(json.dumps({"variant": name, "skipped":
                              f"b{oom_batch} already OOMed"}), flush=True)
            continue
        try:
            res = run_variant(name, cfg, B, L, **kw)
        except Exception as e:  # noqa: BLE001
            msg = f"{type(e).__name__}: {e}"[:300]
            res = {"variant": name, "batch": B, "seq": L, "error": msg}
            if "RESOURCE_EXHAUSTED" in msg or "memory" in msg.lower():
                if name in fallbacks:
                    queue.insert(0, fallbacks[name])
                if kw.get("int8_base") and not kw.get("stage1"):
                    oom_batch = B if oom_batch is None else min(oom_batch, B)
            gc.collect()
        print(json.dumps(res), flush=True)
        out.write(json.dumps(res) + "\n")
        out.flush()
    out.close()


if __name__ == "__main__":
    main()
