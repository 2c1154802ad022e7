"""DAMC training entry point.

Rebuild of the reference's ``train_multimodal.py`` (reference:
modelcompose/train/train_multimodal.py:275-524) on the jitted sharded train
step: stage-1 projector pretrain (``--tune_mm_mlp_adapter``) and stage-2
DAMC finetune (``--lora_strategy modal+language``), with

- the reference's CLI flag names (subset relevant to TPU),
- modality-grouped length sampling (``--group_by_modality_length``),
- warmup-cosine schedule + per-group lrs (mm_projector_lr / mm_language_lr),
- static-shape bucketed packing (one compile per bucket),
- step checkpoints with auto-resume, final adapter_model /
  mm_projector exports in the reference key layout.

Usage (DAMC stage 2, vision):
    python -m modelcompose_tpu.train.train_multimodal \
        --model_name_or_path ckpts/vicuna-7b-v1.5 \
        --version v1 --data_path data/train.json \
        --mm_vision_encoder openai/clip-vit-large-patch14-336 \
        --mm_projector_type mlp2x_gelu --mm_vision_select_layer -2 \
        --pretrain_mm_mlp_adapter ckpts/stage1/mm_projector.safetensors \
        --lora_strategy modal+language --lora_r 128 --lora_alpha 256 \
        --local_prefix_tokens 5 --local_suffix_tokens 5 \
        --learning_rate 2e-4 --mm_projector_lr 2e-5 --mm_language_lr 1e-5 \
        --output_dir out/vision-damc
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np

from ..config import ModelConfig
from ..core.packing import TRAIN_BUCKETS, pick_bucket, plan_pack
from ..data import conversation as conversation_lib
from ..data.conversation import conv_templates
from ..data.dataset import DataCollatorForSupervisedDataset, MultimodalDataset
from ..models.model import MultimodalLM
from ..parallel.mesh import (batch_sharding, mesh_for_batch,
                             shard_encoder_features, shard_params)
from .checkpoint import (latest_checkpoint, restore_step_checkpoint,
                         save_adapter_checkpoint, save_projector_checkpoint,
                         save_step_checkpoint)
from .sampler import (get_length_grouped_indices,
                      get_modality_length_grouped_indices)
from .trainer import (TrainConfig, init_train_state, make_optimizer,
                      make_train_step)


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="DAMC multimodal training")
    # ModelArguments (reference: train_multimodal.py:53-87)
    p.add_argument("--model_name_or_path", type=str, required=True)
    p.add_argument("--version", type=str, default="v0")
    p.add_argument("--tune_mm_mlp_adapter", type=lambda s: s == "True",
                   default=False)
    p.add_argument("--pretrain_mm_mlp_adapter", type=str, default=None)
    p.add_argument("--mm_vision_encoder", type=str, default=None)
    p.add_argument("--mm_audio_encoder", type=str, default=None)
    p.add_argument("--mm_video_encoder", type=str, default=None)
    p.add_argument("--mm_point_encoder", type=str, default=None)
    p.add_argument("--mm_projector_type", type=str, default="linear")
    p.add_argument("--mm_audio_projector_type", type=str, default="linear")
    p.add_argument("--mm_video_projector_type", type=str, default="linear")
    p.add_argument("--mm_point_projector_type", type=str, default="linear")
    p.add_argument("--mm_vision_select_layer", type=int, default=-1)
    p.add_argument("--mm_video_select_layer", type=int, default=-1)
    p.add_argument("--mm_vision_select_feature", type=str, default="patch")
    p.add_argument("--local_prefix_tokens", type=int, default=0)
    p.add_argument("--local_suffix_tokens", type=int, default=0)
    # DataArguments
    p.add_argument("--data_path", type=str, required=True)
    p.add_argument("--image_aspect_ratio", type=str, default="square")
    # TrainingArguments (reference: :101-139)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--num_train_epochs", type=float, default=1.0)
    p.add_argument("--max_steps", type=int, default=-1)
    p.add_argument("--per_device_train_batch_size", type=int, default=4)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=2e-4)
    p.add_argument("--mm_projector_lr", type=float, default=None)
    p.add_argument("--mm_language_lr", type=float, default=None)
    p.add_argument("--mm_vision_tower_lr", type=float, default=None)
    p.add_argument("--mm_vision_tower_layerwise_lr_decay", type=float,
                   default=1.0)
    p.add_argument("--warmup_ratio", type=float, default=0.03)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--model_max_length", type=int, default=2048)
    p.add_argument("--lora_strategy", type=str, default=None)
    p.add_argument("--lora_r", type=int, default=64)
    p.add_argument("--lora_alpha", type=int, default=16)
    p.add_argument("--lora_dropout", type=float, default=0.05)
    p.add_argument("--group_by_modality_length", type=lambda s: s == "True",
                   default=False)
    p.add_argument("--save_steps", type=int, default=500)
    p.add_argument("--dataloader_num_workers", type=int, default=4)
    p.add_argument("--logging_steps", type=int, default=10)
    p.add_argument("--bf16", type=lambda s: s == "True", default=True)
    p.add_argument("--gradient_checkpointing", type=lambda s: s == "True",
                   default=False,
                   help="rematerialize decoder layers in the backward "
                        "(reference recipes pass True; without it the 7B "
                        "step needs ~29 GB of activations)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--random_init_backbone", action="store_true",
                   help="debug/tests: skip base weight loading")
    # Single-chip memory levers (measured round 4, BENCH_TRAIN.jsonl:
    # bf16 frozen base + moments + activations exceed one 16 GB chip at
    # ANY batch — the arithmetic that forces the reference onto ZeRO-3
    # over 8 GPUs; int8 frozen base + chunked CE + bf16 mu fit b4@2048)
    p.add_argument("--quantize_frozen_base", type=lambda s: s == "True",
                   default=False,
                   help="int8-quantize the frozen base weights (requires "
                        "a lora_strategy or stage-1; the 8-bit role of "
                        "bitsandbytes in the reference train entry)")
    p.add_argument("--loss_chunk", type=int, default=None,
                   help="compute the CE loss in N-token chunks with "
                        "rematerialized logits (saves the [B,L,V] fp32 "
                        "logits + cotangent)")
    p.add_argument("--adam_mu_dtype", type=str, default=None,
                   help="dtype for Adam first moments (e.g. bfloat16)")
    p.add_argument("--tower_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="parameter dtype for FROZEN encoder towers "
                        "(bfloat16 halves tower HBM and keeps the "
                        "compiled step identical to the bf16-feature "
                        "device floor; a trained vision tower — "
                        "--mm_vision_tower_lr — always stays float32)")
    return p


def build_model_config(args) -> ModelConfig:
    cfg_kwargs: Dict[str, Any] = dict(
        lora_strategy=args.lora_strategy, lora_r=args.lora_r,
        lora_alpha=args.lora_alpha, lora_dropout=args.lora_dropout,
        local_prefix_tokens=args.local_prefix_tokens,
        local_suffix_tokens=args.local_suffix_tokens,
        mm_vision_encoder=args.mm_vision_encoder,
        mm_audio_encoder=args.mm_audio_encoder,
        mm_video_encoder=args.mm_video_encoder,
        mm_point_encoder=args.mm_point_encoder,
        mm_projector_type=args.mm_projector_type,
        mm_audio_projector_type=args.mm_audio_projector_type,
        mm_video_projector_type=args.mm_video_projector_type,
        mm_point_projector_type=args.mm_point_projector_type,
        mm_vision_select_layer=args.mm_vision_select_layer,
        mm_vision_select_feature=args.mm_vision_select_feature,
        mm_video_select_layer=args.mm_video_select_layer,
        dtype="bfloat16" if args.bf16 else "float32",
        remat=getattr(args, "gradient_checkpointing", False),
    )
    base_cfg_path = os.path.join(args.model_name_or_path, "config.json")
    if os.path.exists(base_cfg_path):
        with open(base_cfg_path) as f:
            base = json.load(f)
        for key in ("vocab_size", "hidden_size", "intermediate_size",
                    "num_hidden_layers", "num_attention_heads",
                    "num_key_value_heads", "max_position_embeddings",
                    "rms_norm_eps", "rope_theta"):
            if key in base:
                cfg_kwargs[key] = base[key]
    cfg = ModelConfig(**cfg_kwargs)
    # mm hidden sizes come from the towers at build time
    return cfg


def build_model(args, cfg: ModelConfig) -> MultimodalLM:
    import jax
    from ..models.projectors import init_projector
    from ..models.towers import build_modal_encoders
    rng = jax.random.PRNGKey(args.seed)
    k_lm, k_enc, k_proj = jax.random.split(rng, 3)

    import jax.numpy as jnp
    tower_dtype = jnp.dtype(getattr(args, "tower_dtype", "bfloat16"))
    # a TRAINED tower keeps float32 master weights (its params join the
    # optimizer); frozen towers BESIDE it still honor --tower_dtype —
    # forcing every tower fp32 doubles frozen-tower HBM for nothing
    overrides = {"vision": jnp.float32} \
        if getattr(args, "mm_vision_tower_lr", None) is not None else None
    encoders = build_modal_encoders(cfg, k_enc, dtype=tower_dtype,
                                    dtype_per_modal=overrides)
    for modal, enc in encoders.items():
        setter = {"vision": "mm_hidden_size", "audio": "mm_audio_hidden_size",
                  "video": "mm_video_hidden_size",
                  "point": "mm_point_hidden_size"}[modal]
        setattr(cfg, setter, enc.hidden_size)

    if args.random_init_backbone:
        from ..core.llama import init_params
        # interleaved init+quantize: the full bf16 tree never exists
        # (13.4 GB at 7B would leave no headroom next to the towers)
        params = init_params(
            cfg, k_lm,
            quantize_base=getattr(args, "quantize_frozen_base", False)
            and (cfg.lora_strategy is not None or args.tune_mm_mlp_adapter))
    else:
        from ..compose.convert import hf_llama_to_params
        from ..core.llama import reinit_lora_a
        from ..models.loader import load_hf_llama_dir
        params = hf_llama_to_params(
            load_hf_llama_dir(args.model_name_or_path), cfg)
        if cfg.lora_strategy not in (None, "none") \
                and not args.tune_mm_mlp_adapter:
            # the converter zero-fills LoRA (A is normally overlaid from
            # a trained adapter); training from scratch needs fresh
            # kaiming A or the adapters get zero gradient forever
            params = reinit_lora_a(params, k_lm,
                                   dtype=jnp.dtype(cfg.dtype))

    projectors = {}
    import jax.numpy as jnp
    for modal in cfg.modalities():
        k_proj, sub = jax.random.split(k_proj)
        projectors[modal] = init_projector(
            cfg.projector_type(modal), sub, encoders[modal].hidden_size,
            cfg.hidden_size, dtype=jnp.dtype(cfg.dtype))

    if args.pretrain_mm_mlp_adapter:
        from ..compose.convert import projector_from_reference
        from ..compose.state_io import load_state
        state = load_state(args.pretrain_mm_mlp_adapter)
        for modal in cfg.modalities():
            prefix = f"model.modal_projectors.{modal}"
            if any(k.startswith(prefix) for k in state):
                tree = projector_from_reference(cfg.projector_type(modal),
                                                state, prefix)
                projectors[modal] = jax.tree.map(
                    lambda x: jnp.asarray(x, jnp.dtype(cfg.dtype)), tree)

    return MultimodalLM(cfg, params, encoders, projectors)


def make_batch(model: MultimodalLM, collated: Dict[str, Any],
               buckets=TRAIN_BUCKETS, tower_train: bool = False):
    """Collator output -> device batch for the jitted step (towers run here,
    outside the step — they're frozen).  With ``tower_train`` the vision
    pixels stay raw and the CLIP forward runs INSIDE the step so tower
    gradients flow (reference: llava_trainer.py:193-249)."""
    import jax.numpy as jnp
    feats = {}
    tower_pixels = {}
    for modal, raw in collated.get("modal_inputs", {}).items():
        enc = model.encoders[modal]
        if modal == "vision" and tower_train:
            tower_pixels[modal] = np.asarray(raw)
            feats[modal] = None  # span accounting below; not pre-encoded
            continue
        if modal == "audio":
            out = enc.encode(**raw) if isinstance(raw, dict) else \
                enc.encode(raw)
            feats[modal] = out[0] if isinstance(out, tuple) else out
        elif modal == "video":
            x = enc.encode(raw)
            b, t, n, d = x.shape
            feats[modal] = x.reshape(b, t * n, d)
        else:
            feats[modal] = enc.encode(raw)
    spans = {}
    for modal, f in feats.items():
        span = model.feature_span_len(modal)
        n = int(tower_pixels[modal].shape[0]) if f is None else \
            int(f.shape[0])
        spans[modal] = (n, span)
        # feature_span_len sizes the STATIC packing plan from the tower's
        # nominal feature_len; a length-preserving projector over an
        # input-dependent encoder length (e.g. multi-window BEATs audio
        # >5.12 s with a linear projector) would silently misalign the
        # splice — fail loudly instead
        if f is not None:
            from ..models.projectors import output_len
            t = int(f.shape[1])
            expect = span - model.cfg.prefix_len(modal) \
                - model.cfg.suffix_len(modal)
            got = output_len(model.cfg.projector_type(modal), t)
            if got != expect:
                raise ValueError(
                    f"{modal} encoder emitted {t} tokens -> projector "
                    f"output {got}, but the packing span expects "
                    f"{expect} (tower feature_len is nominal; clip the "
                    f"input or use a fixed-length projector)")
    feats = {m: f for m, f in feats.items() if f is not None}
    # span lengths include prefix/suffix added INSIDE the loss; but packing
    # plans against the full span.  Each placeholder token is REPLACED by
    # its span (plan_pack consumes the position), so the spliced length
    # adds span-1 per instance — counting the full span overestimates by
    # one token per placeholder, which can cross a bucket boundary (or
    # reject a batch that fits the largest bucket).
    total = max((len(ids) + sum(
        (spans[m][1] - 1) * int((np.asarray(ids) ==
                                 _modal_token(m)).sum())
        for m in spans) for ids in collated["input_ids"]), default=8)
    bucket = pick_bucket(total, buckets)
    plan = plan_pack(collated["input_ids"], spans,
                     labels=collated["labels"], bucket_len=bucket)
    batch = {
        "encoder_features": {m: jnp.asarray(f) for m, f in feats.items()},
        **({"tower_pixels": {m: jnp.asarray(v)
                             for m, v in tower_pixels.items()}}
           if tower_pixels else {}),
        "token_ids": jnp.asarray(plan.token_ids),
        "feat_idx": jnp.asarray(plan.feat_idx),
        "is_feat": jnp.asarray(plan.is_feat),
        "route_ids": jnp.asarray(plan.route_ids),
        "labels": jnp.asarray(plan.labels),
        "segment_ids": jnp.asarray(plan.segment_ids),
    }
    return batch, tuple(plan.feat_layout)


def _modal_token(modal: str) -> int:
    from ..constants import MODAL_TOKEN_INDEXES
    return MODAL_TOKEN_INDEXES[modal]


def train(args, tokenizer=None) -> Dict[str, Any]:
    import jax

    conversation_lib.default_conversation = conv_templates[args.version]
    cfg = build_model_config(args)
    model = build_model(args, cfg)

    if tokenizer is None:
        from ..models.loader import load_tokenizer
        tokenizer = load_tokenizer(args.model_name_or_path)
    tokenizer.model_max_length = args.model_max_length

    dataset = MultimodalDataset(args.data_path, tokenizer)
    collator = DataCollatorForSupervisedDataset(
        tokenizer, model.modal_processors(),
        {"vision": {"image_aspect_ratio": args.image_aspect_ratio}})

    # HF flag semantics: per_device_train_batch_size is PER DEVICE — the
    # global batch is per_device x data-parallel width (the reference's
    # bs 16 x 8 GPUs = 128).  Single device: B = per_device, unchanged.
    # A dataset smaller than per_device x n_devices shrinks the data
    # width (devices idle, loudly) instead of yielding zero batches.
    n_dev_total = len(jax.devices())
    per_dev = args.per_device_train_batch_size
    accum = max(args.gradient_accumulation_steps, 1)
    n = len(dataset)
    data_width = n_dev_total
    if n < per_dev * data_width:
        data_width = max(n // per_dev, 1)
        print(f"[train] WARNING: dataset has {n} samples < "
              f"{per_dev}/device x {n_dev_total} devices; shrinking the "
              f"data-parallel width to {data_width}")
    B = per_dev * data_width
    if n < B:
        raise ValueError(
            f"dataset has {n} samples < the per-device batch {per_dev} "
            "— the epoch loader would yield zero batches")
    # max_steps / save_steps / warmup all count OPTIMIZER steps (HF
    # semantics): one optimizer step consumes `accum` micro-batches
    steps_per_epoch = max(n // (B * accum), 1)
    total_steps = args.max_steps if args.max_steps > 0 else \
        int(steps_per_epoch * args.num_train_epochs)

    tc = TrainConfig(
        learning_rate=args.learning_rate,
        mm_projector_lr=args.mm_projector_lr,
        mm_language_lr=args.mm_language_lr,
        mm_vision_tower_lr=args.mm_vision_tower_lr,
        mm_vision_tower_layerwise_lr_decay=args.mm_vision_tower_layerwise_lr_decay,
        warmup_ratio=args.warmup_ratio, total_steps=total_steps,
        weight_decay=args.weight_decay,
        tune_mm_mlp_adapter=args.tune_mm_mlp_adapter,
        loss_chunk=args.loss_chunk, adam_mu_dtype=args.adam_mu_dtype)

    if args.quantize_frozen_base:
        if cfg.lora_strategy is None and not args.tune_mm_mlp_adapter:
            raise ValueError(
                "--quantize_frozen_base requires frozen base weights "
                "(a lora_strategy, or stage-1 --tune_mm_mlp_adapter)")
        from ..ops.quant import is_quantized
        from ..ops.quant import quantize_leaf_lowmem as quant_leaf
        # Quantize LEAF BY LEAF with donation, dropping each bf16
        # reference before the call: a whole-tree jitted quantize holds
        # both trees at its peak (13.5 GB bf16 + 7 GB int8 + workspace)
        # and OOMs a 16 GB chip next to the towers.  (random_init path
        # arrives pre-quantized from init_params(quantize_base=True).)
        layers = model.params["layers"]
        for grp in ("attn", "mlp"):
            for name in layers[grp]:
                if is_quantized(layers[grp][name]["w"]):
                    continue
                w = layers[grp][name].pop("w")
                layers[grp][name]["w"] = quant_leaf(w)
                del w
        if not is_quantized(model.params["lm_head"]):
            lm = model.params.pop("lm_head")
            model.params["lm_head"] = quant_leaf(lm)
            del lm
        if os.environ.get("MC_TRAIN_DEBUG_SYNC"):
            np.asarray(model.params["layers"]["mlp"]["down"]["w"]["scale"])
            print("[train] debug-sync: quantize done", flush=True)

    mesh = mesh_for_batch(B, allow_partial=True)
    n_dev = len(jax.devices())
    if mesh.devices.size < n_dev:
        print(f"[train] WARNING: global batch {B} does not divide "
              f"{n_dev} devices; using a {mesh.devices.size}-device data "
              f"mesh ({n_dev - mesh.devices.size} devices idle)")
    # Single device: skip the mesh/NamedSharding machinery entirely — the
    # GSPMD execute path measured 5.1x SLOWER than the plain jit for the
    # identical 7B step on this chip (3,336 vs 652 ms,
    # scripts/probe_program_switch.py MC_PROBE_MESH=1); a 1-device mesh
    # buys nothing and the overhead dominates the whole loop.
    single_device = mesh.devices.size == 1
    params = model.params if single_device \
        else shard_params(model.params, mesh)
    if not single_device:
        # free the UNSHARDED backbone: model.params would otherwise pin
        # a full copy on device 0 for the whole run (the loop only needs
        # model.encoders / span metadata; the export reads state.params)
        model.params = None
    tower_train = (tc.mm_vision_tower_lr is not None
                   and "vision" in model.encoders)
    if tower_train:
        from ..models.towers import ClipVisionTower
        if not isinstance(model.encoders["vision"], ClipVisionTower):
            # layerwise decay walks the CLIP param layout (the reference
            # walks vision_model.encoder.layers the same way,
            # llava_trainer.py:98-132); other towers are not supported
            raise NotImplementedError(
                "--mm_vision_tower_lr supports the CLIP vision tower only "
                f"(got {type(model.encoders['vision']).__name__})")
    tower_params = {"vision": model.encoders["vision"].params} \
        if tower_train else None
    # init_train_state applies ZeRO-1 moment sharding over the data axis
    # when the mesh has one (the DeepSpeed-ZeRO role, reference:
    # run_finetune_vision_damc.sh:30 zero3 config)
    if os.environ.get("MC_TRAIN_DEBUG_SYNC"):
        np.asarray(jax.tree.leaves(params)[0])
        print("[train] debug-sync: shard_params done", flush=True)
    train_tree = {"backbone": params, "projectors": model.projectors}
    if tower_params is not None:
        train_tree["towers"] = tower_params
    # ONE optimizer object: the same tx initializes the opt_state and
    # drives the step functions (no rebuilt-in-sync assumption)
    tx, _ = make_optimizer(cfg, tc, train_tree)
    state = init_train_state(cfg, tc, params, model.projectors,
                             tower_params=tower_params,
                             mesh=None if single_device else mesh, tx=tx)
    if os.environ.get("MC_TRAIN_DEBUG_SYNC"):
        np.asarray(state.step)
        print("[train] debug-sync: opt init done", flush=True)
    if accum > 1:
        from .trainer import make_grad_and_apply
        grad_fn, apply_fn, _, grad_accum_fn = make_grad_and_apply(
            cfg, tc, tx,
            vision_tower_cfg=model.encoders["vision"].cfg
            if tower_train else None)
        # RUNNING accumulation: keep one grad-tree total, never the
        # per-micro-batch list — N resident grad trees would be
        # N x 1.35 GB at 7B r=128 and OOM the chip at the reference's
        # accum=16 long before the step runs.  The first micro-step's
        # grad_fn output IS the total; later micro-steps fold into it
        # with the FUSED grad_accum_fn (donated in place — a split
        # grad-then-add holds a third grad tree during the backward and
        # exceeds 16 GB HBM at 7B; see make_grad_and_apply).
        acc_state = {"total": None, "n": 0}

        def step_fn(state, batch, layout):
            if acc_state["total"] is None:
                loss, acc_state["total"] = grad_fn(state.params, batch,
                                                   layout)
            else:
                loss, acc_state["total"] = grad_accum_fn(
                    state.params, acc_state["total"], batch, layout)
            acc_state["n"] += 1
            if acc_state["n"] < accum:
                return state, loss  # state unchanged mid-accumulation
            from .trainer import scale_grads
            total = scale_grads(acc_state["total"], 1.0 / accum)
            acc_state["total"], acc_state["n"] = None, 0
            return apply_fn(state, total), loss
    else:
        step_fn = make_train_step(
            cfg, tc, tx,
            vision_tower_cfg=model.encoders["vision"].cfg
            if tower_train else None)

    resume = latest_checkpoint(args.output_dir)
    if resume:
        print(f"[train] resuming from {resume}")
        # restore rebuilds the state from host arrays: re-place every leaf
        # with the PRE-restore state's sharding (the freshly-initialized
        # state already carries the exact mesh layout — backbone shards AND
        # ZeRO-1 moments with their model-axis merge, which re-deriving
        # from the host arrays would lose) or the resumed run proceeds
        # replicated and OOMs exactly where sharding mattered
        import dataclasses as _dc

        import jax

        def _replace_like(t, x):
            # Only mesh-placed leaves (NamedSharding) are re-placed;
            # single-device leaves stay as host arrays so jit remains
            # free to place them (committing them to device 0 would
            # conflict with the mesh-committed backbone).
            sh = getattr(t, "sharding", None)
            if isinstance(sh, jax.sharding.NamedSharding):
                return jax.device_put(x, sh)
            return x

        template = state
        restored = restore_step_checkpoint(resume, state)
        state = _dc.replace(
            restored,
            params=jax.tree.map(_replace_like, template.params,
                                restored.params),
            opt_state=jax.tree.map(_replace_like, template.opt_state,
                                   restored.opt_state))

    rng = np.random.default_rng(args.seed)
    # state.step counts OPTIMIZER steps (one per apply); the loop below
    # counts MICRO-batches — total/logging/save/resume convert via accum
    start_opt = int(state.step)
    start_step = start_opt * accum
    total_micro = total_steps * accum
    losses = []
    t0 = time.time()
    # steady-state window for throughput measurement: sync once after
    # MC_LOOP_TIME_SKIP steps (first iterations carry jit tracing /
    # compile-cache loads) and time the remainder
    skip = int(os.environ.get("MC_LOOP_TIME_SKIP", "0") or 0)
    t_steady = None
    steady_tokens = 0  # bucket tokens processed inside the steady window
    step_idx = start_step
    # resume fast-forward (HF Trainer semantics): regenerate each
    # consumed epoch's order (advancing rng identically to the original
    # run) and skip the already-trained batches, so the resumed run sees
    # the epoch TAIL instead of retraining the head and dropping the tail
    to_skip = start_step
    bs = None if single_device else batch_sharding(mesh)
    while step_idx < total_micro:
        if args.group_by_modality_length:
            order = get_modality_length_grouped_indices(
                dataset.modality_lengths, B, 1, rng)
        else:
            order = get_length_grouped_indices(
                [abs(l) for l in dataset.modality_lengths], B, 1, rng)
        if to_skip:
            epoch_batches = max((len(order) - B) // B + 1, 0)
            if to_skip >= epoch_batches:
                to_skip -= epoch_batches
                continue  # whole epoch already consumed pre-resume
            order = order[to_skip * B:]
            to_skip = 0
        from ..data.loader import PrefetchLoader
        loader = PrefetchLoader(dataset, order, B, collator,
                                num_workers=args.dataloader_num_workers,
                                prefetch=4)
        trace_loop = os.environ.get("MC_TRAIN_LOOP_TRACE")
        t_mark = time.perf_counter()
        for collated in loader:
            if step_idx >= total_micro:
                break
            t_a = time.perf_counter()
            batch, layout = make_batch(model, collated,
                                       tower_train=tower_train)
            t_b = time.perf_counter()
            with (contextlib.nullcontext() if single_device else mesh):
                if not single_device:
                    batch = {k: (jax.device_put(v, bs)
                                 if k not in ("encoder_features",
                                              "tower_pixels") else
                                 shard_encoder_features(v, mesh))
                             for k, v in batch.items()}
                t_c = time.perf_counter()
                state, loss = step_fn(state, batch, layout)
            if trace_loop:
                t_d = time.perf_counter()
                sync_txt = ""
                if trace_loop == "sync":
                    # block on this step's loss: exposes the true per-step
                    # device time in pipeline context (serializes the loop,
                    # so throughput numbers from a sync run are not valid)
                    jax.block_until_ready(loss)
                    sync_txt = f" device {time.perf_counter() - t_d:.3f}s"
                print(f"[loop-trace] step {step_idx}: loader_wait "
                      f"{t_a - t_mark:.3f}s make_batch {t_b - t_a:.3f}s "
                      f"device_put {t_c - t_b:.3f}s dispatch "
                      f"{t_d - t_c:.3f}s{sync_txt}", flush=True)
                t_mark = time.perf_counter() if sync_txt else t_d
            else:
                t_mark = time.perf_counter()
            step_idx += 1
            if t_steady is not None:
                # count the ACTUAL packed bucket per step (the ladder can
                # pick different buckets across batches) so the pipeline
                # bench's tokens/sec doesn't assume a fixed bucket
                steady_tokens += int(np.prod(batch["token_ids"].shape))
            # keep the DEVICE scalar: float() here would sync the host to
            # every step's completion and stall the prefetch pipeline —
            # conversion happens lazily at logging/exit
            losses.append(loss)
            if skip and step_idx == start_step + skip:
                float(loss)  # hard sync: compiles/tracing end here
                t_steady = time.time()
            if step_idx % (args.logging_steps * accum) == 0:
                avg = np.mean([float(l) for l in
                               losses[-args.logging_steps * accum:]])
                rate = step_idx / max(time.time() - t0, 1e-9)
                print(f"[train] step {step_idx // accum}/{total_steps} "
                      f"loss {avg:.4f} ({rate:.2f} it/s)")
            # save on OPTIMIZER-step boundaries only (HF save_steps
            # semantics; a mid-accumulation-window save would silently
            # drop the partial running gradient total on resume)
            if args.save_steps and                     step_idx % (args.save_steps * accum) == 0:
                save_step_checkpoint(args.output_dir, step_idx // accum,
                                     state)

    # close the steady-state window at LOOP end (sync to the last step's
    # completion): the one-time final export below is amortized over a
    # real epoch's thousands of steps and must not bill into the
    # steady-state throughput the pipeline bench reports
    t_loop_end = None
    if t_steady is not None:
        # sync on the STATE, not just losses[-1]: under accumulation the
        # loss comes from the last grad micro-step program while the
        # final apply_fn (optimizer update over params+moments) may still
        # be running — closing on the loss alone leaves it outside the
        # window.  Both are scalar D2H fetches (np.asarray is the sync
        # that works through the axon relay; state.step is an apply_fn
        # output, losses[-1] covers a trailing partial accum window).
        np.asarray(state.step)
        if losses:
            np.asarray(losses[-1])
        t_loop_end = time.time()

    # final export (reference: train_multimodal.py:505-524)
    backbone = state.params["backbone"]
    projectors = state.params["projectors"]
    if args.tune_mm_mlp_adapter:
        save_projector_checkpoint(args.output_dir, cfg, projectors)
    else:
        if cfg.lora_strategy is None:
            # full finetune: the base weights themselves changed — export
            # the whole backbone, not just the adapter overlay
            from .checkpoint import save_full_checkpoint
            save_full_checkpoint(args.output_dir, cfg, backbone, projectors)
        else:
            save_adapter_checkpoint(args.output_dir, cfg, backbone,
                                    projectors)
    losses = [float(l) for l in losses]  # lazy device scalars -> host
    # the conversion above SYNCS to the last step's completion, so this
    # wall covers exactly the training loop (data pipeline + steps), not
    # the model build/quantize/optimizer setup — the number the pipeline
    # bench needs for the device-idle fraction
    train_loop_seconds = time.time() - t0
    result = {"final_loss": losses[-1] if losses else None,
              # "steps": micro-batches processed (== optimizer steps when
              # accum == 1); "optimizer_steps" is the HF-semantics count
              "steps": step_idx, "optimizer_steps": step_idx // accum,
              "losses": losses,
              "train_loop_seconds": train_loop_seconds}
    if t_steady is not None and step_idx > start_step + skip:
        result["steady_seconds"] = t_loop_end - t_steady
        result["steady_steps"] = step_idx - start_step - skip
        result["steady_bucket_tokens"] = steady_tokens
    return result


def main():
    args = build_arg_parser().parse_args()
    train(args)


if __name__ == "__main__":
    main()
