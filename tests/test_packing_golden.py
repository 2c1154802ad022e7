"""GOLDEN parity: core/packing.py vs the reference's actual
``prepare_inputs_labels_for_multimodal`` (run from /root/reference via the
auto-stub oracle loader).  This is hard part #1 of the rebuild — identical
token layouts decide eval-answer parity (SURVEY.md §7)."""

import numpy as np
import pytest

from tests.reference_oracle import reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not mounted")

import jax.numpy as jnp  # noqa: E402

from modelcompose_tpu.config import ROUTE_CLASS_INDEX  # noqa: E402
from modelcompose_tpu.constants import (IGNORE_INDEX,  # noqa: E402
                                        MODAL_TOKEN_INDEXES)
from modelcompose_tpu.core.packing import (assemble_embeds,  # noqa: E402
                                           plan_pack)


def _build_oracle(embed_weight, feats, masks):
    import torch
    from tests.reference_oracle import load_reference_arch
    arch = load_reference_arch()

    class InnerModel:
        def __init__(self, weight):
            self._emb = torch.nn.Embedding(weight.shape[0], weight.shape[1])
            with torch.no_grad():
                self._emb.weight.copy_(torch.from_numpy(weight))

        def embed_tokens(self, ids):
            return self._emb(ids)

    class Oracle(arch.MultimodalMetaForCausalLM):
        device = "cpu"

        def __init__(self):
            self._model = InnerModel(embed_weight)

        def get_model(self):
            return self._model

        def encode_modal_inputs(self, inputs, prefix_tokens=None,
                                suffix_tokens=None):
            t_feats = {m: torch.from_numpy(np.asarray(f))
                       for m, f in feats.items()}
            t_masks = {m: torch.from_numpy(np.asarray(v))
                       for m, v in masks.items()}
            return t_feats, t_masks

    return Oracle()


def _run_reference(oracle, input_ids, labels, attention_mask, modals):
    import torch
    (_, attn, _, new_embeds, new_labels, modal_mask) = \
        oracle.prepare_inputs_labels_for_multimodal(
            torch.from_numpy(input_ids), torch.from_numpy(attention_mask),
            None, torch.from_numpy(labels), {m: None for m in modals},
            None, None)
    return (new_embeds.detach().numpy(), new_labels.detach().numpy(),
            {m: v.numpy() for m, v in modal_mask.items()},
            attn.numpy())


@pytest.mark.parametrize("case", ["single_image", "multi_modal_batch",
                                  "audio_masked"])
def test_packing_matches_reference_splice(case):
    rs = np.random.RandomState(0)
    V, H = 50, 16
    embed_weight = rs.randn(V, H).astype(np.float32)
    IMG = MODAL_TOKEN_INDEXES["vision"]
    AUD = MODAL_TOKEN_INDEXES["audio"]
    PAD = 0

    if case == "single_image":
        rows = [np.array([1, 5, IMG, 7, 8])]
        feats = {"vision": rs.randn(1, 3, H).astype(np.float32)}
        masks = {"vision": np.ones((1, 3), np.int64)}
    elif case == "multi_modal_batch":
        rows = [np.array([1, IMG, 5, AUD, 6]),
                np.array([1, 9, IMG, 10])]
        feats = {"vision": rs.randn(2, 3, H).astype(np.float32),
                 "audio": rs.randn(1, 4, H).astype(np.float32)}
        masks = {"vision": np.ones((2, 3), np.int64),
                 "audio": np.ones((1, 4), np.int64)}
    else:  # audio_masked: Q-former padding -> default route
        rows = [np.array([1, AUD, 5])]
        feats = {"audio": rs.randn(1, 4, H).astype(np.float32)}
        masks = {"audio": np.array([[1, 1, 0, 0]], np.int64)}

    # right-pad the batch like the reference collator
    max_len = max(len(r) for r in rows)
    B = len(rows)
    input_ids = np.full((B, max_len), PAD, np.int64)
    labels = np.full((B, max_len), IGNORE_INDEX, np.int64)
    attention_mask = np.zeros((B, max_len), np.int64)
    for b, r in enumerate(rows):
        input_ids[b, :len(r)] = r
        # labels mirror the ids (modal-token positions pre-IGNOREd, as the
        # tokenizing collator produces them)
        labels[b, :len(r)] = np.where(r < 0, IGNORE_INDEX, r)
        attention_mask[b, :len(r)] = 1

    oracle = _build_oracle(embed_weight, feats, masks)
    ref_embeds, ref_labels, ref_mask, ref_attn = _run_reference(
        oracle, input_ids, labels, attention_mask, feats)

    # ---- ours: same unpadded rows, same features ----
    spans = {m: (f.shape[0], f.shape[1]) for m, f in feats.items()}
    plan = plan_pack([r for r in rows], spans,
                     labels=[np.where(r < 0, IGNORE_INDEX, r) for r in rows],
                     feat_masks={m: v.astype(bool) for m, v in masks.items()},
                     bucket_len=ref_embeds.shape[1])
    ours_embeds = np.asarray(assemble_embeds(
        jnp.asarray(embed_weight), plan,
        {m: jnp.asarray(f) for m, f in feats.items()}))

    # spliced lengths must agree
    ref_valid = ref_labels != IGNORE_INDEX
    for b in range(B):
        L_ours = int(plan.lengths[b])
        # embeddings identical over the true spliced span
        np.testing.assert_allclose(ours_embeds[b, :L_ours],
                                   ref_embeds[b, :L_ours], atol=1e-6,
                                   err_msg=f"case={case} row={b}")
        # labels identical everywhere (both pad with IGNORE)
        np.testing.assert_array_equal(plan.labels[b], ref_labels[b])
        # per-modality masks == our route classes over the spliced span
        for m in feats:
            cls = ROUTE_CLASS_INDEX[m]
            ours_m = (plan.route_ids[b] == cls)
            np.testing.assert_array_equal(
                ours_m[:L_ours], ref_mask[m][b][:L_ours].astype(bool),
                err_msg=f"case={case} modal={m} row={b}")
        # 'default' complement matches route class 0 over valid positions
        ours_default = (plan.route_ids[b] == 0)
        np.testing.assert_array_equal(
            ours_default[:L_ours], ref_mask["default"][b][:L_ours]
            .astype(bool), err_msg=f"case={case} default row={b}")
    _ = ref_valid, ref_attn
