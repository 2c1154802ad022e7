"""GOLDEN train-step parity: loss AND gradients vs the reference's real
``MultimodalLlamaForCausalLM`` torch backward, per ``lora_strategy``.

The same tiny reference model used by the decode-parity golden is exported
in the reference checkpoint layout and loaded through OUR converter/loader;
then both sides run one fp32 forward+backward over mixed-modal prompts
under the reference's requires-grad policy (reference:
modelcompose/train/train_multimodal.py:424-466 — projectors + prefix/
suffix always train; LoRA rows per strategy) and the reference CE loss
(reference: model/language_model/multimodal_llama.py:723-733).

Reference gradients are mapped into our stacked pytree by overlaying the
torch ``{name: p.grad}`` dict onto a zeros tree through the SAME converter
used for weights (``compose.convert.load_adapter_into_params``) — so the
key mapping and transposes under test are the production ones.  Loss must
match to 1e-5 and every reference-trainable gradient elementwise.
"""

import numpy as np
import pytest

from tests.reference_oracle import reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not mounted")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from modelcompose_tpu.compose.convert import load_adapter_into_params  # noqa: E402
from modelcompose_tpu.constants import IGNORE_INDEX  # noqa: E402
from modelcompose_tpu.core.packing import plan_pack  # noqa: E402
from modelcompose_tpu.train.trainer import multimodal_loss_from_features  # noqa: E402
from tests.test_decode_parity_golden import (  # noqa: E402
    AUD, E_AUD, E_PT, E_VID, E_VIS, F_VID, IMG, N_VID, PT, T_AUD, T_PT,
    T_VIS, VID, _build_reference_model, _export_reference_ckpt, _load_ours)

STRATEGIES = ("none", "same", "modal", "modal+language")


def _apply_requires_grad_policy(model, strategy):
    """The reference's trainable-param policy, verbatim semantics
    (reference: train_multimodal.py:424-466)."""
    model.requires_grad_(False)
    for n, p in model.named_parameters():
        if "prefix_tokens" in n or "suffix_tokens" in n:
            p.requires_grad = True
    for p in model.get_model().modal_projectors.parameters():
        p.requires_grad = True
    for n, p in model.get_model().named_parameters():
        if "lora" not in n or strategy == "none":
            continue
        if strategy == "modal+language":
            p.requires_grad = True
        elif strategy == "same":
            if "lora_A.default" in n or "lora_B.default" in n:
                p.requires_grad = True
        elif strategy == "modal":
            if "lora_A.default" not in n and "lora_B.default" not in n:
                p.requires_grad = True


def _reference_loss_and_grads(model, strategy, ids, labels, modal_inputs):
    import torch
    _apply_requires_grad_policy(model, strategy)
    model.zero_grad(set_to_none=True)
    ids_t = torch.tensor(np.asarray(ids))[None]
    labels_t = torch.tensor(np.asarray(labels))[None]
    out = model(input_ids=ids_t, attention_mask=torch.ones_like(ids_t),
                labels=labels_t, modal_inputs=modal_inputs, use_cache=False)
    out.loss.backward()
    grads = {n: p.grad.detach().numpy().copy()
             for n, p in model.named_parameters()
             if p.requires_grad and p.grad is not None}
    return float(out.loss), grads


def _our_loss_and_grads(ours, ids, labels, feats):
    """Loss+grads through the production train-loss path
    (train/trainer.multimodal_loss_from_features + jax.grad)."""
    cfg = ours.cfg
    feat_arrays, spans = {}, {}
    for m, f in feats.items():
        x = np.asarray(f, np.float32)
        if m == "video":  # b,t,n,d -> b,(t n),d (reference: :236-240)
            b, t, n, d = x.shape
            x = x.reshape(b, t * n, d)
        feat_arrays[m] = jnp.asarray(x)
        spans[m] = (x.shape[0],
                    x.shape[1] + cfg.prefix_len(m) + cfg.suffix_len(m))
    plan = plan_pack([np.asarray(ids)], spans,
                     labels=[np.asarray(labels)], bucket_len=64)
    batch = {
        "encoder_features": feat_arrays,
        "token_ids": jnp.asarray(plan.token_ids),
        "feat_idx": jnp.asarray(plan.feat_idx),
        "is_feat": jnp.asarray(plan.is_feat),
        "route_ids": jnp.asarray(plan.route_ids),
        "labels": jnp.asarray(plan.labels),
        "segment_ids": jnp.asarray(plan.segment_ids),
        "feat_layout": list(plan.feat_layout),
    }
    table = jnp.asarray(cfg.routing_table())
    train_params = {"backbone": ours.params, "projectors": ours.projectors}

    def loss_fn(tp):
        return multimodal_loss_from_features(tp, cfg, table, batch,
                                             attn_impl="xla")

    loss, grads = jax.value_and_grad(loss_fn)(train_params)
    return float(loss), grads


def _ref_grads_as_pytree(ours, ref_grads):
    """Overlay the torch grad dict onto a zeros copy of our pytree via the
    production converter (same key mapping/transposes as weight loading)."""
    zeros = jax.tree.map(jnp.zeros_like, ours.params)
    proj_grads = {}
    leftovers = load_adapter_into_params(zeros, ref_grads, ours.cfg,
                                         projector_params=proj_grads)
    assert not leftovers, f"unmapped reference grads: {leftovers}"
    return zeros, proj_grads


def _trainable_rows(cfg, strategy):
    names = cfg.adapter_names()
    rows = []
    for i, name in enumerate(names):
        if name == "default":
            if strategy in ("same", "modal+language"):
                rows.append(i)
        elif not name.startswith("default-"):
            if strategy in ("modal", "modal+language"):
                rows.append(i)
    return rows


RTOL, ATOL = 2e-4, 1e-6  # fp32 accumulation-order noise between stacks


def _assert_grads_match(ours, strategy, our_grads, ref_grads):
    ref_tree, ref_proj = _ref_grads_as_pytree(ours, ref_grads)
    cfg = ours.cfg
    rows = _trainable_rows(cfg, strategy)
    for grp in ("attn", "mlp"):
        for name, leaf in our_grads["backbone"]["layers"][grp].items():
            for which in ("lora_a", "lora_b"):
                for row in rows:
                    np.testing.assert_allclose(
                        np.asarray(leaf[which][:, row]),
                        np.asarray(
                            ref_tree["layers"][grp][name][which][:, row]),
                        rtol=RTOL, atol=ATOL,
                        err_msg=f"{strategy} {grp}.{name}.{which} "
                                f"row {cfg.adapter_names()[row]}")
    for kind in ("prefix_tokens", "suffix_tokens"):
        for modal, g in our_grads["backbone"].get(kind, {}).items():
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(ref_tree[kind][modal]),
                rtol=RTOL, atol=ATOL, err_msg=f"{strategy} {kind}.{modal}")
    for modal, tree in our_grads["projectors"].items():
        if modal not in ref_proj:
            # modality absent from the prompt: the reference never runs its
            # projector (grad None); ours must agree with exact zeros
            assert all(np.all(np.asarray(g) == 0)
                       for g in jax.tree.leaves(tree)), (
                f"{strategy} projector {modal} got grads for an absent "
                "modality")
            continue
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=RTOL, atol=ATOL,
                err_msg=f"{strategy} projector {modal}"),
            tree, ref_proj[modal])


def _prompt_cases(rs):
    """(ids, labels, feats) — an image+audio prompt and a 4-modal
    MCUB-style prompt; labels mask the 'prompt' prefix like preprocess_v1
    (reference: data/utils.py)."""
    vis = rs.randn(1, T_VIS, E_VIS).astype(np.float32)
    aud = rs.randn(1, T_AUD, E_AUD).astype(np.float32)
    vid = rs.randn(1, F_VID, N_VID, E_VID).astype(np.float32)
    pt = rs.randn(1, T_PT, E_PT).astype(np.float32)
    ign = IGNORE_INDEX
    cases = [
        (np.array([1, 5, IMG, 7, AUD, 9, 10, 11]),
         np.array([ign, ign, ign, ign, ign, 9, 10, 11]),
         {"vision": vis, "audio": aud}),
        (np.array([1, IMG, 15, AUD, 16, VID, 17, PT, 18, 19, 20]),
         np.array([ign, ign, ign, ign, ign, ign, ign, ign, 18, 19, 20]),
         {"vision": vis, "audio": aud, "video": vid, "point": pt}),
    ]
    return cases


@pytest.mark.parametrize("strategy", STRATEGIES)
@pytest.mark.slow
def test_train_step_loss_and_grads_match_reference(strategy, monkeypatch,
                                                   tmp_path):
    import torch
    mm, cfg, ref_model = _build_reference_model()
    # the strategy is a pure forward/requires-grad switch — adapters exist
    # regardless (reference: multimodal_llama.py:68-107, 703-704)
    cfg.lora_strategy = strategy
    ref_model.config.lora_strategy = strategy
    base_dir, ckpt_dir = _export_reference_ckpt(ref_model, cfg, tmp_path)
    ours = _load_ours(base_dir, ckpt_dir, monkeypatch)
    assert ours.cfg.lora_strategy == strategy

    rs = np.random.RandomState(7)
    for ids, labels, feats in _prompt_cases(rs):
        ref_inputs = {}
        for m, f in feats.items():
            if m == "audio":
                ref_inputs[m] = {
                    "audio_inputs": torch.from_numpy(f),
                    "audio_padding_mask": torch.zeros(1, T_AUD)}
            else:
                ref_inputs[m] = torch.from_numpy(f)
        ref_loss, ref_grads = _reference_loss_and_grads(
            ref_model, strategy, ids, labels, ref_inputs)
        our_feats = dict(feats)
        our_loss, our_grads = _our_loss_and_grads(ours, ids, labels,
                                                  our_feats)
        assert abs(our_loss - ref_loss) < 1e-5, (
            f"{strategy}: loss ours={our_loss} ref={ref_loss}")
        _assert_grads_match(ours, strategy, our_grads, ref_grads)


@pytest.mark.slow
def test_frozen_rows_get_zero_update(monkeypatch, tmp_path):
    """End-to-end through make_optimizer: under 'modal' the default row's
    Adam update is exactly zero even though its raw gradient is not (text
    tokens route through it), matching the reference's requires-grad freeze
    (reference: train_multimodal.py:459-466)."""
    from modelcompose_tpu.train.trainer import TrainConfig, make_optimizer
    mm, cfg, ref_model = _build_reference_model()
    cfg.lora_strategy = "modal"
    ref_model.config.lora_strategy = "modal"
    base_dir, ckpt_dir = _export_reference_ckpt(ref_model, cfg, tmp_path)
    ours = _load_ours(base_dir, ckpt_dir, monkeypatch)

    rs = np.random.RandomState(7)
    ids, labels, feats = _prompt_cases(rs)[0]
    _, grads = _our_loss_and_grads(ours, ids, labels, feats)
    default_g = np.asarray(
        grads["backbone"]["layers"]["attn"]["q"]["lora_a"][:, 0])
    assert np.abs(default_g).max() > 0  # text tokens do route default

    tc = TrainConfig(learning_rate=1e-3, total_steps=10, warmup_ratio=0.0)
    train_params = {"backbone": ours.params, "projectors": ours.projectors}
    tx, _ = make_optimizer(ours.cfg, tc, train_params)
    updates, _ = tx.update(grads, tx.init(train_params), train_params)
    upd = np.asarray(
        updates["backbone"]["layers"]["attn"]["q"]["lora_a"][:, 0])
    assert np.all(upd == 0), "frozen 'default' row must not update"
