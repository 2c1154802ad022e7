"""Static-shape multimodal token packing.

TPU-native replacement for the reference's ragged per-sample python splice
``prepare_inputs_labels_for_multimodal`` (reference: modelcompose/model/
multimodal_arch.py:287-459).  The reference loops over every sample, replaces
each modal placeholder token (negative ids, constants.py) with that
modality's projected feature block, and pads the ragged result — a
shape-dynamic pattern that would retrace XLA per batch.

Here the splice is split into two phases:

1. **Host-side planning** (numpy, O(total tokens)): compute *where* every
   text token and every feature row lands in a fixed-size ``[B, L_bucket]``
   buffer.  Output is a ``PackPlan`` of integer index arrays.  Buckets
   (512/1k/2k/4k by default) bound the number of compiled programs.
2. **Device-side assembly** (pure jnp, static shapes): one gather from the
   embedding table + one gather from the flattened feature table, blended by
   a boolean mask.  No data-dependent control flow; compiles once per bucket.

Layout semantics preserved exactly (they decide eval-answer parity):

- modal placeholder tokens are consumed left-to-right, with the per-modality
  instance counter shared **across the whole batch** in sample order
  (reference: multimodal_arch.py:302 initializes ``cur_modal_idx`` outside
  the batch loop);
- each placeholder expands to [prefix soft tokens | features | suffix soft
  tokens] (prefix/suffix are concatenated onto the features before packing,
  reference: multimodal_arch.py:245-253);
- labels over feature spans are IGNORE_INDEX (reference: :361-364);
- per-token route classes: feature positions get their modality's class
  *where the feature's own attention mask is True* (audio Q-former padding
  is False and falls through to the 'default' class, exactly like the
  complement-mask construction at reference :452-453); all text and padding
  positions are 'default';
- every spliced position (including audio-internal padding) is attention-
  valid (the reference left-pads the attention mask with True, :446-448);
  right padding to the bucket is segment 0.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import ROUTE_CLASS_INDEX
from ..constants import IGNORE_INDEX, MODAL_TOKEN_INDEXES

_INDEX_TO_MODAL = {v: k for k, v in MODAL_TOKEN_INDEXES.items()}

# Power-of-two up to 2048, then 256-steps to 4096: multimodal prompts land
# in [2048, 4096] (a 4-modal MCUB prompt is ~3.3k positions) and coarse
# buckets there waste up to 2x the executed positions on padding — at the
# round-3 operating point the 3,287-position prompt padded to 4096 spent
# ~25% of its prefill FLOPs on padding; the 256-step ladder caps the waste
# at <8%.  Above 4096 (beyond the reference's own 2048-ctx training but
# reachable with multi-video prompts) 1024-steps to 8192 keep long prompts
# generating instead of raising (reference behavior: positions beyond the
# trained context simply run, modelcompose/data/multimodal_dataset.py:158
# truncates text only).  One compile per bucket actually used.
DEFAULT_BUCKETS = (512, 1024, 2048, 2304, 2560, 2816, 3072, 3328, 3584,
                   3840, 4096, 5120, 6144, 7168, 8192)

# Training batches vary in length step to step, so the fine ladder would
# multiply recompiles for no steady-state win; the train entry keeps the
# coarse power-of-two set (train/train_multimodal.make_batch).
TRAIN_BUCKETS = (512, 1024, 2048, 4096, 8192)


def pick_bucket(length: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if length <= b:
            return b
    raise ValueError(
        f"sequence of length {length} exceeds the largest bucket "
        f"{buckets[-1]}; pass bucket_len explicitly or shorten the prompt")


@dataclasses.dataclass
class PackPlan:
    """Host-side packing plan; all arrays are numpy, shape [B, L] unless noted.

    token_ids:   vocabulary ids at text positions, 0 elsewhere.
    feat_idx:    row index into the flattened feature table at feature
                 positions, 0 elsewhere.
    is_feat:     True at feature positions.
    route_ids:   per-token route class (see config.ROUTE_CLASSES).
    labels:      CE targets, IGNORE_INDEX over features/padding.
    segment_ids: 1 for valid positions, 0 for right padding.
    lengths:     [B] spliced sequence lengths.
    feat_layout: [(modal, n_instances, span_len)] in table order — the
                 device-side flatten must follow this order.
    """
    token_ids: np.ndarray
    feat_idx: np.ndarray
    is_feat: np.ndarray
    route_ids: np.ndarray
    labels: np.ndarray
    segment_ids: np.ndarray
    lengths: np.ndarray
    feat_layout: List[Tuple[str, int, int]]


def plan_pack(
    input_ids: Sequence[np.ndarray],
    feat_spans: Dict[str, Tuple[int, int]],
    labels: Optional[Sequence[np.ndarray]] = None,
    feat_masks: Optional[Dict[str, np.ndarray]] = None,
    buckets: Sequence[int] = DEFAULT_BUCKETS,
    bucket_len: Optional[int] = None,
) -> PackPlan:
    """Plan the static-shape splice for one batch.

    Args:
      input_ids: per-sample 1-D int arrays (unpadded), with negative modal
        placeholder ids.
      feat_spans: {modal: (n_instances, span_len)} — span_len includes any
        prefix/suffix soft tokens already concatenated onto the features.
      labels: per-sample 1-D arrays aligned with input_ids, or None.
      feat_masks: optional {modal: [n_instances, span_len] bool}; False
        positions are routed 'default' instead of the modality class
        (audio Q-former padding).
      buckets / bucket_len: pad target; bucket_len overrides bucket choice.

    Returns: PackPlan.
    """
    B = len(input_ids)
    # Flattened-feature-table layout: canonical dict order = the order the
    # caller concatenates features (must match assemble_embeds input order).
    feat_layout = [(m, n, t) for m, (n, t) in feat_spans.items()]
    offsets: Dict[str, int] = {}
    off = 0
    for m, n, t in feat_layout:
        offsets[m] = off
        off += n * t

    # Pass 1: spliced lengths.
    spliced: List[List[Tuple[str, np.ndarray]]] = []
    lengths = np.zeros(B, np.int64)
    inst_counter = {m: 0 for m in feat_spans}
    pieces_per_sample = []
    for b in range(B):
        ids = np.asarray(input_ids[b])
        lab = np.asarray(labels[b]) if labels is not None else None
        pieces = []  # list of ('text', ids, labels) | ('feat', modal, inst)
        cur = 0
        for pos in np.nonzero(ids < 0)[0]:
            modal = _INDEX_TO_MODAL.get(int(ids[pos]))
            if modal is None or modal not in feat_spans:
                raise ValueError(
                    f"modal token {int(ids[pos])} at sample {b} has no "
                    f"features (available: {sorted(feat_spans)})")
            if pos > cur:
                pieces.append(("text", ids[cur:pos],
                               lab[cur:pos] if lab is not None else None))
            pieces.append(("feat", modal, inst_counter[modal]))
            inst_counter[modal] += 1
            cur = pos + 1
        if cur < len(ids):
            pieces.append(("text", ids[cur:],
                           lab[cur:] if lab is not None else None))
        pieces_per_sample.append(pieces)
        total = sum(len(p[1]) if p[0] == "text" else feat_spans[p[1]][1]
                    for p in pieces)
        lengths[b] = total
    for m, (n, t) in feat_spans.items():
        if inst_counter[m] != n:
            raise ValueError(
                f"modality {m!r}: {n} feature instances provided but "
                f"{inst_counter[m]} placeholder tokens found in the batch")

    L = bucket_len if bucket_len is not None else pick_bucket(
        int(lengths.max()) if B else buckets[0], buckets)

    token_ids = np.zeros((B, L), np.int32)
    feat_idx = np.zeros((B, L), np.int32)
    is_feat = np.zeros((B, L), bool)
    route_ids = np.zeros((B, L), np.int32)
    out_labels = np.full((B, L), IGNORE_INDEX, np.int32)
    segment_ids = np.zeros((B, L), np.int32)

    for b in range(B):
        pos = 0
        for p in pieces_per_sample[b]:
            if p[0] == "text":
                _, ids, lab = p
                n = len(ids)
                token_ids[b, pos:pos + n] = ids
                if lab is not None:
                    out_labels[b, pos:pos + n] = lab
                pos += n
            else:
                _, modal, inst = p
                t = feat_spans[modal][1]
                feat_idx[b, pos:pos + t] = offsets[modal] + inst * t + np.arange(t)
                is_feat[b, pos:pos + t] = True
                cls = ROUTE_CLASS_INDEX.get(modal, 0)
                if feat_masks is not None and modal in feat_masks:
                    fm = np.asarray(feat_masks[modal][inst], bool)
                    route_ids[b, pos:pos + t] = np.where(fm, cls, 0)
                else:
                    route_ids[b, pos:pos + t] = cls
                pos += t
        segment_ids[b, :pos] = 1

    return PackPlan(token_ids=token_ids, feat_idx=feat_idx, is_feat=is_feat,
                    route_ids=route_ids, labels=out_labels,
                    segment_ids=segment_ids,
                    lengths=lengths.astype(np.int32),
                    feat_layout=feat_layout)


def assemble_embeds(embed_table, plan: PackPlan, feats: Dict[str, jnp.ndarray]):
    """Device-side assembly: [B, L, H] packed input embeddings.

    Args:
      embed_table: [V, H] token embedding table.
      plan: host PackPlan.
      feats: {modal: [n_instances, span_len, H]} projected features with
        prefix/suffix already attached; must cover plan.feat_layout.

    Static-shape: one embedding gather + one feature gather + a select.
    """
    H = embed_table.shape[-1]
    tables = []
    for modal, n, t in plan.feat_layout:
        f = feats[modal]
        if f.shape[:2] != (n, t):
            raise ValueError(f"{modal} features {f.shape} != plan ({n}, {t})")
        tables.append(f.reshape(n * t, H))
    if tables:
        flat = jnp.concatenate(tables, axis=0)
        gathered = jnp.take(flat, jnp.asarray(plan.feat_idx), axis=0)
    else:
        gathered = jnp.zeros(plan.token_ids.shape + (H,), embed_table.dtype)
    text = jnp.take(embed_table, jnp.asarray(plan.token_ids), axis=0)
    mask = jnp.asarray(plan.is_feat)[..., None]
    out = jnp.where(mask, gathered.astype(embed_table.dtype), text)
    # Zero right-padding, matching the reference's zeros-pad
    # (reference: multimodal_arch.py:395).
    valid = jnp.asarray(plan.segment_ids != 0)[..., None]
    return jnp.where(valid, out, jnp.zeros_like(out))
