"""Training: DAMC finetune / projector pretrain on optax.

Rebuild of the reference's trainable-param policy and optimizer grouping
(reference: modelcompose/train/train_multimodal.py:424-466 and
train/llava_trainer.py:193-329):

- **Trainable policy** by ``lora_strategy``: projectors + prefix/suffix soft
  tokens always train; 'same' trains only the 'default' adapter; 'modal'
  trains per-modality adapters; 'modal+language' trains both; base Llama
  weights and encoder towers are always frozen.  ``tune_mm_mlp_adapter``
  (stage-1 pretrain) trains projectors only.
- **LR groups**: ``mm_projector_lr`` for projectors, ``mm_language_lr`` for
  the 'default' adapter, ``learning_rate`` for modal adapters and soft
  tokens; warmup + cosine schedule.
- Frozen leaves get ``optax.set_to_zero`` (no moment memory — the ZeRO-ish
  win); per-adapter-row lrs inside a stacked LoRA leaf are applied by a
  row-scale transform after Adam.

The jitted ``train_step`` is sharding-agnostic: put params/batch on a mesh
(parallel/mesh.py) and GSPMD handles DP/TP collectives.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import ModelConfig
from ..core.llama import forward
from ..core.packing import assemble_embeds
from ..models.model import causal_lm_loss
from ..models.projectors import apply_projector


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 2e-4
    mm_projector_lr: Optional[float] = None   # default: learning_rate
    mm_language_lr: Optional[float] = None    # default: learning_rate
    warmup_ratio: float = 0.03
    total_steps: int = 1000
    weight_decay: float = 0.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    max_grad_norm: Optional[float] = None
    tune_mm_mlp_adapter: bool = False  # stage-1: projector-only
    # Optional vision-tower training with layerwise lr decay (reference:
    # llava_trainer.py:98-132, 193-249 — unused by the DAMC recipes but a
    # reference capability): the top encoder layer trains at
    # mm_vision_tower_lr and each deeper layer at lr * decay^depth.
    mm_vision_tower_lr: Optional[float] = None
    mm_vision_tower_layerwise_lr_decay: float = 1.0
    # CE loss in sequence chunks with rematerialized logits (memory: the
    # fp32 [B, L, V] logits + cotangent are ~2 GB at the reference
    # micro-batch); None = plain whole-sequence loss
    loss_chunk: Optional[int] = None
    # bf16 first moments halve optimizer memory — material here because
    # DAMC adapters at r=128 x n_modalities are billions of parameters
    # (the reason the reference needs ZeRO over 8 GPUs)
    adam_mu_dtype: Optional[str] = None  # e.g. 'bfloat16'

    def proj_lr(self) -> float:
        return self.mm_projector_lr if self.mm_projector_lr is not None \
            else self.learning_rate

    def lang_lr(self) -> float:
        return self.mm_language_lr if self.mm_language_lr is not None \
            else self.learning_rate


def normalized_warmup_cosine(warmup_steps: int, total_steps: int):
    """Multiplier schedule in [0, 1] (HF cosine-with-warmup shape,
    transformers get_cosine_schedule_with_warmup: warmup_steps == 0 goes
    straight to the cosine — multiplier 1.0 at step 0, not 0.0)."""
    warmup_div = max(warmup_steps, 1)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / warmup_div
        denom = jnp.maximum(total_steps - warmup_steps, 1)
        progress = (step - warmup_steps) / denom
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * jnp.clip(progress, 0.0, 1.0)))
        return jnp.where(step < warmup_steps, warm, cos)

    return sched


def adapter_row_lrs(cfg: ModelConfig, tc: TrainConfig) -> np.ndarray:
    """Absolute lr per stacked-adapter row (0 = frozen), implementing the
    reference's strategy table (train_multimodal.py:424-466)."""
    names = cfg.adapter_names()
    lrs = np.zeros(len(names), np.float32)
    if tc.tune_mm_mlp_adapter or cfg.lora_strategy in (None, "none"):
        return lrs
    for i, name in enumerate(names):
        if name == "default":
            if cfg.lora_strategy in ("same", "modal+language"):
                lrs[i] = tc.lang_lr() if cfg.lora_strategy == \
                    "modal+language" else tc.learning_rate
        elif name.startswith("default-"):
            lrs[i] = 0.0  # merge-spawned rows never train
        else:  # modality adapters
            if cfg.lora_strategy in ("modal", "modal+language"):
                lrs[i] = tc.learning_rate
    return lrs


def _scale_adapter_rows(row_lrs: np.ndarray):
    """Multiply LoRA updates rowwise by -row_lr (Adam+schedule output is a
    normalized direction)."""
    scales = jnp.asarray(row_lrs)

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def scale(u):
            # u: [N, A, d1, d2] — adapter axis is 1
            return u * (-scales)[None, :, None, None]

        return jax.tree.map(scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def _scale_tower_layerwise(n_layers: int, lr: float, decay: float):
    """Layerwise-decayed lr for a stacked CLIP tower param pytree
    (models/vision_clip.py layout), matched by leaf PATH so it composes
    with optax.multi_transform's masking.

    Depth order matches the reference's reversed-layer walk
    (llava_trainer.py:98-132): stacked encoder layer l gets
    ``lr * decay^(n_layers - l)``, pre_layernorm one decay step deeper,
    embeddings deepest.  (The reference also walks post_layernorm at the
    top; our tower taps hidden layer -2 and never materializes it.)
    Because layers are STACKED on a leading axis, the whole schedule is
    one broadcast vector per leaf — no per-layer param groups.  Adam +
    schedule output is a normalized direction, so the leaf lr IS the
    step size (multiplied by -1 for descent)."""
    layer_scale = jnp.asarray(
        lr * decay ** (n_layers - np.arange(n_layers, dtype=np.float32)))
    pre_lr = lr * decay ** (n_layers + 1)
    emb_lr = lr * decay ** (n_layers + 2)

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def scale(path, u):
            keys = {getattr(p, "key", None) for p in path}
            if "layers" in keys:
                return u * (-layer_scale).reshape(
                    (n_layers,) + (1,) * (u.ndim - 1))
            if "pre_layernorm" in keys:
                return u * (-pre_lr)
            return u * (-emb_lr)

        return jax.tree_util.tree_map_with_path(scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def trainable_labels(train_params: Dict[str, Any], cfg: ModelConfig,
                     tc: TrainConfig) -> Dict[str, Any]:
    """Label pytree over {'backbone':..., 'projectors':...}.

    lora_strategy semantics mirror the reference exactly
    (train_multimodal.py:436-466): the STRING 'none' freezes the LLM
    (projectors + soft tokens only), while lora_strategy **absent**
    (None) skips the freeze entirely — the legacy full-finetune recipe
    (scripts/pretrain.sh-era): every backbone weight trains at
    learning_rate."""
    backbone = train_params["backbone"]
    full_finetune = (cfg.lora_strategy is None
                     and not tc.tune_mm_mlp_adapter)
    if full_finetune:
        labels = jax.tree.map(lambda _: "base", train_params)
    else:
        labels = jax.tree.map(lambda _: "frozen", train_params)
    lb = labels["backbone"]
    lora_on = not tc.tune_mm_mlp_adapter and \
        cfg.lora_strategy not in (None, "none")
    for grp in ("attn", "mlp"):
        for name in lb["layers"][grp]:
            if lora_on:
                lb["layers"][grp][name]["lora_a"] = "lora"
                lb["layers"][grp][name]["lora_b"] = "lora"
    for kind in ("prefix_tokens", "suffix_tokens"):
        if kind in backbone and not tc.tune_mm_mlp_adapter:
            labels["backbone"][kind] = jax.tree.map(lambda _: "soft",
                                                    backbone[kind])
    labels["projectors"] = jax.tree.map(lambda _: "proj",
                                        train_params["projectors"])
    if "towers" in train_params:
        labels["towers"] = jax.tree.map(lambda _: "tower",
                                        train_params["towers"])
    return labels


def _is_nodecay_path(path) -> bool:
    """HF Trainer's decay exclusion by parameter name (no bias, no
    LayerNorm weights) mapped onto this pytree: any 'norm'/'ln*' ancestor
    key, or a 'b'/'bias' leaf key."""
    for p in path:
        k = getattr(p, "key", None)
        if k is None:
            continue
        k = str(k)
        if "norm" in k or k == "ln" or k.startswith("ln_") \
                or k in ("b", "bias"):
            return True
    return False


def split_nodecay_labels(labels, splittable) -> Dict[str, Any]:
    """Retag norm-scale/bias leaves of decayed groups as '<label>:nodecay'
    so weight decay matches HF's AdamW grouping."""
    return jax.tree_util.tree_map_with_path(
        lambda path, lbl: (lbl + ":nodecay"
                           if lbl in splittable and _is_nodecay_path(path)
                           else lbl), labels)


def make_optimizer(cfg: ModelConfig, tc: TrainConfig,
                   train_params: Dict[str, Any]):
    warmup = int(tc.warmup_ratio * tc.total_steps)
    sched = normalized_warmup_cosine(warmup, tc.total_steps)
    row_lrs = adapter_row_lrs(cfg, tc)

    def adam():
        return optax.scale_by_adam(b1=tc.adam_b1, b2=tc.adam_b2,
                                   eps=tc.adam_eps,
                                   mu_dtype=tc.adam_mu_dtype)

    def group(lr, decay: bool = True):
        chain = [adam()]
        if tc.weight_decay and decay:
            chain.append(optax.add_decayed_weights(tc.weight_decay))
        chain += [optax.scale_by_schedule(sched), optax.scale(-lr)]
        return optax.chain(*chain)

    def lora_group():
        chain = [adam()]
        if tc.weight_decay:
            # HF/peft AdamW decays LoRA A/B (the bias/LayerNorm name
            # rule does not exclude them)
            chain.append(optax.add_decayed_weights(tc.weight_decay))
        chain += [optax.scale_by_schedule(sched),
                  _scale_adapter_rows(row_lrs)]
        return optax.chain(*chain)

    transforms = {
        "frozen": optax.set_to_zero(),
        "base": group(tc.learning_rate),  # full finetune (strategy absent)
        "lora": lora_group(),
        "proj": group(tc.proj_lr()),
        "soft": group(tc.learning_rate),
    }
    tower_trains = "towers" in train_params \
        and tc.mm_vision_tower_lr is not None
    if tower_trains:
        tower = train_params["towers"]["vision"]
        n_layers = int(tower["layers"]["q"]["w"].shape[0])

        def tower_chain(decay: bool = True):
            parts = [adam()]
            if tc.weight_decay and decay:
                parts.append(optax.add_decayed_weights(tc.weight_decay))
            parts += [optax.scale_by_schedule(sched),
                      _scale_tower_layerwise(
                          n_layers, tc.mm_vision_tower_lr,
                          tc.mm_vision_tower_layerwise_lr_decay)]
            return optax.chain(*parts)

        transforms["tower"] = tower_chain()
    else:
        transforms["tower"] = optax.set_to_zero()
    labels = trainable_labels(train_params, cfg, tc)
    if tc.weight_decay:
        # HF AdamW grouping: norm scales and biases are never decayed
        splittable = {"base", "proj", "soft"} | (
            {"tower"} if tower_trains else set())
        labels = split_nodecay_labels(labels, splittable)
        transforms["base:nodecay"] = group(tc.learning_rate, decay=False)
        transforms["proj:nodecay"] = group(tc.proj_lr(), decay=False)
        transforms["soft:nodecay"] = group(tc.learning_rate, decay=False)
        if tower_trains:
            transforms["tower:nodecay"] = tower_chain(decay=False)
    tx = optax.multi_transform(transforms, labels)
    if tc.max_grad_norm:
        # Clip the global norm of TRAINABLE gradients only (HF clips
        # requires_grad params): unmasked, the 7B frozen bf16 base grads
        # (zeroed only later inside multi_transform) would dominate the
        # norm and rescale the trainable updates arbitrarily.
        discarded = {"frozen"} | (set() if tower_trains else {"tower"})
        clip_mask = jax.tree.map(lambda lbl: lbl not in discarded, labels)
        tx = optax.chain(
            optax.masked(optax.clip_by_global_norm(tc.max_grad_norm),
                         clip_mask), tx)
    return tx, labels


def _densify_int_grads(grads, params):
    """allow_int=True makes integer param leaves (int8 frozen base weights,
    ops/quant.quantize_backbone) yield zero-sized float0 grads — and the
    accumulation path shrinks those further to [0]-shaped placeholders at
    the jit boundary (see make_grad_and_apply); the optax chain needs
    structurally real leaves, so swap in same-dtype zeros — they hit
    set_to_zero ('frozen' label) and XLA dead-code-eliminates the whole
    branch."""
    return jax.tree.map(
        lambda g, p: jnp.zeros_like(p) if _is_frozen_grad(g) else g,
        grads, params)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any         # {'backbone':..., 'projectors':...}
    opt_state: Any
    step: jax.Array


def init_train_state(cfg: ModelConfig, tc: TrainConfig, backbone_params,
                     projector_params, tower_params=None,
                     mesh=None, tx=None) -> TrainState:
    """mesh with a data axis > 1 additionally applies ZeRO-1: optimizer
    moments sharded over 'data' (parallel/mesh.shard_opt_state) — kept
    HERE so every caller (train entry, dryrun, resume path) gets the same
    layout without repeating the sharding boilerplate.

    ``tx``: pass the optimizer the step functions will use so the
    opt_state is initialized by the SAME transform object; None rebuilds
    one via make_optimizer (deterministic, so structurally identical —
    but passing it removes the rebuilt-in-sync assumption)."""
    train_params = {"backbone": backbone_params,
                    "projectors": projector_params}
    if tower_params is not None:
        train_params["towers"] = tower_params
    if tx is None:
        tx, _ = make_optimizer(cfg, tc, train_params)
    opt_state = tx.init(train_params)
    if mesh is not None and mesh.shape.get("data", 1) > 1:
        from ..parallel.mesh import shard_opt_state
        opt_state = shard_opt_state(opt_state, mesh)
    return TrainState(params=train_params, opt_state=opt_state,
                      step=jnp.zeros((), jnp.int32))


def chunked_causal_lm_loss(backbone, hidden, labels, chunk: int):
    """Shifted CE computed in sequence chunks with rematerialized logits.

    The plain path materializes fp32 logits [B, L, V] plus their cotangent
    (~2 GB at B=4, L=2048, V=32k) — on a 16 GB chip that buffer decides
    whether the 7B stage-2 step fits at all.  Here the lm_head GEMM +
    log-softmax run per ``chunk`` tokens inside a checkpointed lax.scan:
    forward keeps only the scalar partial sums, backward recomputes each
    chunk's logits.  Numerically identical to models/model.causal_lm_loss
    (same shift, IGNORE_INDEX masking, mean over valid targets).
    """
    from ..core.llama import logits_from_hidden
    from ..constants import IGNORE_INDEX as IGN

    B, L, H = hidden.shape
    assert L % chunk == 0, (L, chunk)
    n = L // chunk
    targets = jnp.concatenate(
        [labels[:, 1:], jnp.full((B, 1), IGN, labels.dtype)], axis=1)
    hid = jnp.moveaxis(hidden.reshape(B, n, chunk, H), 1, 0)
    tgt = jnp.moveaxis(targets.reshape(B, n, chunk), 1, 0)

    @jax.checkpoint
    def piece(carry, xs):
        h, t = xs
        logits = logits_from_hidden(backbone, h).astype(jnp.float32)
        valid = t != IGN
        safe = jnp.where(valid, t, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        s, c = carry
        return (s + (nll * valid).sum(), c + valid.sum()), None

    (s, c), _ = jax.lax.scan(
        piece, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)),
        (hid, tgt))
    return s / jnp.maximum(c, 1)


def multimodal_loss_from_features(train_params, cfg: ModelConfig,
                                  routing_table, batch,
                                  attn_impl: str = "auto",
                                  vision_tower_cfg=None,
                                  loss_chunk: Optional[int] = None):
    """Loss over a pre-encoded batch.

    batch: dict with 'encoder_features' {modal: [n, T_enc, d_enc]} (frozen
    tower outputs), 'plan' arrays (token_ids/feat_idx/is_feat/route_ids/
    labels/segment_ids as jnp arrays), and 'feat_layout'.
    The projector runs *inside* the loss so its gradient flows.  When
    vision-tower training is on (mm_vision_tower_lr), the batch carries
    raw 'tower_pixels' and the CLIP forward runs in-graph so tower
    gradients flow too (reference: llava_trainer.py:221-249).
    """
    backbone = train_params["backbone"]
    projectors = train_params["projectors"]
    encoder_features = dict(batch["encoder_features"])
    if "towers" in train_params and "tower_pixels" in batch:
        from ..models.vision_clip import clip_vision_features
        encoder_features["vision"] = clip_vision_features(
            train_params["towers"]["vision"], vision_tower_cfg,
            batch["tower_pixels"]["vision"])
    feats = {}
    for modal, x in encoder_features.items():
        if modal == "vision" and "towers" in train_params \
                and "tower_pixels" in batch:
            y = apply_projector(cfg.projector_type(modal),
                                projectors[modal], x)  # tower grads flow
        else:
            y = apply_projector(cfg.projector_type(modal),
                                projectors[modal],
                                jax.lax.stop_gradient(x))
        parts = []
        b = y.shape[0]
        prefix = (backbone.get("prefix_tokens") or {}).get(modal)
        suffix = (backbone.get("suffix_tokens") or {}).get(modal)
        if prefix is not None:
            parts.append(jnp.broadcast_to(prefix[None], (b,) + prefix.shape))
        parts.append(y.astype(backbone["embed_tokens"].dtype))
        if suffix is not None:
            parts.append(jnp.broadcast_to(suffix[None], (b,) + suffix.shape))
        feats[modal] = jnp.concatenate(parts, axis=1) if len(parts) > 1 \
            else parts[0]

    class _Plan:  # duck-typed PackPlan view over device arrays
        token_ids = batch["token_ids"]
        feat_idx = batch["feat_idx"]
        is_feat = batch["is_feat"]
        segment_ids = batch["segment_ids"]
        feat_layout = batch["feat_layout"]

    embeds = assemble_embeds(backbone["embed_tokens"], _Plan, feats)
    route_ids = batch.get("route_ids") if cfg.routing_active() else None
    if loss_chunk:
        from ..core.llama import forward_hidden_routed
        hidden, _ = forward_hidden_routed(
            backbone, cfg, embeds, route_ids=route_ids,
            routing_table=routing_table, segment_ids=batch["segment_ids"],
            attn_impl=attn_impl)
        return chunked_causal_lm_loss(backbone, hidden, batch["labels"],
                                      loss_chunk)
    logits, _ = forward(backbone, cfg, embeds, route_ids=route_ids,
                        routing_table=routing_table,
                        segment_ids=batch["segment_ids"],
                        attn_impl=attn_impl)
    return causal_lm_loss(logits, batch["labels"])


def make_train_step(cfg: ModelConfig, tc: TrainConfig, tx,
                    attn_impl: str = "auto", donate: bool = True,
                    vision_tower_cfg=None):
    """donate=True frees the old TrainState's buffers each step (the
    production setting); pass False when the caller keeps references to the
    initial params (tests)."""
    routing_table = jnp.asarray(cfg.routing_table())

    @functools.partial(jax.jit, static_argnames=("feat_layout",),
                       donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch: Dict[str, Any],
                   feat_layout) -> tuple:
        batch = dict(batch)
        batch["feat_layout"] = list(feat_layout)

        def loss_fn(train_params):
            return multimodal_loss_from_features(
                train_params, cfg, routing_table, batch, attn_impl,
                vision_tower_cfg=vision_tower_cfg,
                loss_chunk=tc.loss_chunk)

        loss, grads = jax.value_and_grad(loss_fn, allow_int=True)(
            state.params)
        grads = _densify_int_grads(grads, state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(params=new_params, opt_state=new_opt,
                          step=state.step + 1), loss

    return train_step


def _is_float0(x):
    return getattr(x, "dtype", None) == jax.dtypes.float0


def _is_frozen_grad(x):
    """A frozen leaf's gradient: float0 (inside the grad program) or the
    [0]-shaped placeholder it becomes at the jit boundary."""
    return _is_float0(x) or getattr(x, "size", 1) == 0


@functools.partial(jax.jit, donate_argnums=(0,))
def scale_grads(grads, c):
    """Elementwise grads * c, passing frozen-leaf placeholders through
    — the gradient-accumulation averaging step, jitted so it is one
    dispatch instead of one per leaf.  The input (the finished running
    total) is donated: the averaged copy would otherwise double grad
    memory right before apply_fn's peak."""
    return jax.tree.map(lambda g: g if _is_frozen_grad(g) else g * c,
                        grads)


def make_grad_and_apply(cfg: ModelConfig, tc: TrainConfig, tx,
                        attn_impl: str = "auto", vision_tower_cfg=None,
                        donate: bool = True):
    """Gradient accumulation (reference recipe:
    --gradient_accumulation_steps, run_finetune_vision_damc.sh): a jitted
    per-micro-batch grad fn and a jitted apply fn; the caller averages
    grads over micro-batches between them.

    donate=True (production) frees the old TrainState + the averaged grad
    tree inside apply_fn; pass False when the caller keeps references to
    the pre-step state or its params (tests)."""
    routing_table = jnp.asarray(cfg.routing_table())

    def _loss_and_pruned_grads(train_params, batch, feat_layout):
        batch = dict(batch)
        batch["feat_layout"] = list(feat_layout)

        def loss_fn(p):
            return multimodal_loss_from_features(p, cfg, routing_table,
                                                 batch, attn_impl,
                                                 vision_tower_cfg,
                                                 loss_chunk=tc.loss_chunk)

        loss, grads = jax.value_and_grad(loss_fn, allow_int=True)(
            train_params)
        # Frozen leaves must cross the jit boundary at ZERO size.  float0
        # is zero-sized only in type: XLA lowers a float0 OUTPUT as one
        # byte per element, so returning the raw grad tree ships a
        # base-weight-sized garbage buffer per micro-batch (measured
        # 7.63 GB output for this grad_fn at 7B int8 — the accum bench's
        # RESOURCE_EXHAUSTED; scripts/probe_train_memory.py).  Swap them
        # for [0]-shaped placeholders: the output shrinks to the
        # trainable grads (~1.3 GB), and _densify_int_grads in apply_fn
        # re-inflates to zeros that XLA DCEs under the 'frozen' label.
        grads = jax.tree.map(
            lambda g: jnp.zeros((0,), jnp.bfloat16)
            if _is_float0(g) else g, grads)
        return loss, grads

    @functools.partial(jax.jit, static_argnames=("feat_layout",))
    def grad_fn(train_params, batch, feat_layout):
        return _loss_and_pruned_grads(train_params, batch, feat_layout)

    @functools.partial(jax.jit, static_argnames=("feat_layout",),
                       donate_argnums=(1,) if donate else ())
    def grad_accum_fn(train_params, acc, batch, feat_layout):
        """Fused micro-step: compute this micro-batch's grads AND fold
        them into the DONATED running total in ONE program.  The split
        grad_fn → accumulate sequence keeps THREE trainable-grad-sized
        trees live during the backward (grad_fn output + running total +
        the accumulate result) — at the 7B stage-2 geometry that is
        state 9.9 GB + backward temp 3.3 GB + 2×1.48 GB grad trees ≈
        16.1 GB, over the 15.75 GB chip (the accum-bench
        RESOURCE_EXHAUSTED).  Fusing drops one tree: XLA aliases the
        donated total in place, peak ≈ 14.6 GB.  First micro-step of a
        window uses plain grad_fn (its output IS the initial total)."""
        loss, grads = _loss_and_pruned_grads(train_params, batch,
                                             feat_layout)
        new_acc = jax.tree.map(
            lambda a, g: a if _is_frozen_grad(a) else a + g, acc, grads)
        return loss, new_acc

    @functools.partial(jax.jit,
                       donate_argnums=(0, 1) if donate else ())
    def apply_fn(state: TrainState, grads):
        """Both args DONATED: without state donation the optimizer update
        holds old+new TrainState simultaneously (~2x params+moments —
        24 GB at 7B, instant OOM on a 16 GB chip; the fused
        make_train_step donates for the same reason); the averaged grad
        tree is dead after the update, so it donates too."""
        grads = _densify_int_grads(grads, state.params)  # DCE'd (frozen)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(params=new_params, opt_state=new_opt,
                          step=state.step + 1)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def accumulate(acc, grads, weight):
        """acc is DONATED: the running total updates in place, so peak
        grad memory is 2 trees (total + current micro-batch) regardless
        of the accumulation depth."""
        return jax.tree.map(
            lambda a, g: a if _is_frozen_grad(a) else a + g * weight,
            acc, grads)

    return grad_fn, apply_fn, accumulate, grad_accum_fn
