"""Stroke-mask losses and the MaskPlanner composite losses.

Device-resident redesign of the reference's mask-loss pipeline
(loss_handler.py:596-935): the per-sample Python loops building target
masks, the host scipy LAP, and the −100 fake-mask padding are replaced by
a dense one-hot target tensor, an einsum-computed BCE/MSE cost matrix and
the on-device Hungarian solve — one fused jit region, no host syncs.

Dynamic loss weights (curriculum / delayed activation) enter as traced
scalars via the ``weights`` dict so PSACD/delay scheduling never triggers
recompilation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from ..ops.chamfer import chamfer_distance
from ..ops.hungarian import hungarian
from .common import bce_with_logits, segment_distance_to_confidence
from .chamfer_losses import (
    reverse_asymm_point_chamfer,
    reverse_asymm_segment_chamfer,
    symm_point_chamfer,
)


def per_segment_confidence_loss(nn_distance, seg_logits, weights):
    """YOLO-style confidence regression to a distance-derived target
    (loss_handler.py:566-593)."""
    targets = segment_distance_to_confidence(nn_distance)
    loss = ((seg_logits - targets) ** 2).sum(-1).mean()
    return weights["explicit_weight_segments_confidence"] * loss


def stroke_masks_loss(
    pred_to_gt_match: Array,      # (B, S_pred) NN GT-segment index per pred segment
    pred_stroke_masks: Array,     # (B, M, S_pred) mask logits
    scores: Array,                # (B, M) mask confidence logits
    stroke_ids: Array,            # (B, S_gt) int GT stroke ids, −1 padded
    weights: dict,
    nn_distance: Array | None = None,
    smooth_targets: bool = False,
):
    """Hungarian-matched stroke-mask loss (loss_handler.py:816-935).

    Target mask construction: each predicted segment adopts the stroke id
    of its nearest GT segment (loss_handler.py:838); binary (or
    distance-smoothed) per-stroke target masks are matched to the predicted
    masks with a BCE (or MSE) cost LAP; matched masks get a BCE/MSE loss
    and all mask confidences get a weighted BCE (unmatched masks weighted
    by ``explicit_no_stroke_weight``).
    """
    B, M, S_pred = pred_stroke_masks.shape
    x = pred_stroke_masks.astype(jnp.float32)

    target_ids = jnp.take_along_axis(stroke_ids, pred_to_gt_match, axis=1)
    # one-hot target masks per stroke id k (B, M, S_pred)
    tgt_binary = target_ids[:, None, :] == jnp.arange(M)[None, :, None]
    # only stroke ids that actually appear become target masks — mirrors the
    # reference's unique-id mask construction (loss_handler.py:938-967)
    col_valid = tgt_binary.any(axis=-1)  # (B, M)

    if smooth_targets:
        conf = segment_distance_to_confidence(nn_distance)  # (B, S_pred)
        tgt = jnp.where(tgt_binary, conf[:, None, :], 0.0)
        # MSE cost matrix via expansion: |x|² − 2x·tᵀ + |t|²
        x2 = (x**2).sum(-1)
        t2 = (tgt**2).sum(-1)
        cross = jnp.einsum("bis,bks->bik", x, tgt)
        cost = x2[:, :, None] - 2.0 * cross + t2[:, None, :]
    else:
        tgt = tgt_binary.astype(jnp.float32)
        # BCE cost: Σ_s [max(x,0)+log1pexp(−|x|)] − x·tᵀ
        a = (jnp.maximum(x, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(x)))).sum(-1)
        cross = jnp.einsum("bis,bks->bik", x, tgt)
        cost = a[:, :, None] - cross

    row4col, matched = hungarian(cost, col_valid)  # (B, M) each

    # loss on matched (pred mask, target mask) pairs
    chosen = jnp.take_along_axis(x, row4col[..., None], axis=1)  # (B, M, S_pred)
    if smooth_targets:
        per_col = ((chosen - tgt) ** 2).sum(-1)
    else:
        per_col = bce_with_logits(chosen, tgt).sum(-1)
    total_matched = jnp.maximum(matched.sum(), 1)
    mask_loss = jnp.where(matched, per_col, 0.0).sum() / total_matched

    # confidence (`strokeness`) loss over all predicted masks
    assigned = (
        (jax.nn.one_hot(row4col, M, dtype=jnp.float32) * matched[..., None])
        .sum(axis=1)
        .clip(0.0, 1.0)
    )  # (B, M): 1 where pred mask i was matched to a real target
    w = jnp.where(assigned > 0, 1.0, weights["explicit_no_stroke_weight"])
    conf_loss = (w * bce_with_logits(scores.astype(jnp.float32), assigned)).mean()

    return (
        weights["explicit_weight_stroke_masks"] * mask_loss
        + weights["explicit_weight_stroke_masks_confidence"] * conf_loss
    )


def _forward_segment_chamfer_with_matching(y_pred, y, y_mask):
    """Unreduced forward segment chamfer + matching indices."""
    nn_dist, _, match, _ = chamfer_distance(
        y_pred, y, padded=True, y_mask=y_mask, asymmetric=True,
        return_matching=True, point_reduction=None, batch_reduction=None,
    )
    return nn_dist, match  # (B, S_pred), (B, S_pred)


def asymm_v6_chamfer_with_stroke_masks(
    y_pred, y, pred_stroke_masks, mask_scores, seg_logits, stroke_ids,
    traj_as_pc, outdim, weights, y_mask=None, pc_mask=None,
    per_segment_confidence=False, smooth_targets=False, **_,
):
    """Composite MaskPlanner loss (loss_handler.py:596-666): forward
    segment CD (+ optional per-segment confidence) + reverse point CD +
    reverse segment CD + stroke-mask loss."""
    nn_dist, match = _forward_segment_chamfer_with_matching(y_pred, y, y_mask)
    fwd = 100.0 * nn_dist.mean()

    seg_conf = (
        per_segment_confidence_loss(nn_dist, seg_logits, weights)
        if per_segment_confidence
        else 0.0
    )
    rev_point = reverse_asymm_point_chamfer(y_pred, traj_as_pc, outdim,
                                            pc_mask=pc_mask)
    rev_seg = reverse_asymm_segment_chamfer(y_pred, y, y_mask=y_mask)
    masks = stroke_masks_loss(match, pred_stroke_masks, mask_scores,
                              stroke_ids, weights,
                              nn_distance=nn_dist, smooth_targets=smooth_targets)
    return (
        weights["weight_asymm_segment_chamfer"] * fwd
        + seg_conf
        + weights["weight_reverse_asymm_point_chamfer"] * rev_point
        + weights["weight_reverse_asymm_segment_chamfer"] * rev_seg
        + masks
    )


def asymm_v11_chamfer_with_stroke_masks(
    y_pred, y, pred_stroke_masks, mask_scores, seg_logits, stroke_ids,
    traj_as_pc, outdim, weights, y_mask=None, pc_mask=None,
    per_segment_confidence=False, smooth_targets=False, **_,
):
    """As v6 without the reverse segment term (loss_handler.py:669-730)."""
    nn_dist, match = _forward_segment_chamfer_with_matching(y_pred, y, y_mask)
    fwd = 100.0 * nn_dist.mean()
    seg_conf = (
        per_segment_confidence_loss(nn_dist, seg_logits, weights)
        if per_segment_confidence
        else 0.0
    )
    rev_point = reverse_asymm_point_chamfer(y_pred, traj_as_pc, outdim,
                                            pc_mask=pc_mask)
    masks = stroke_masks_loss(match, pred_stroke_masks, mask_scores,
                              stroke_ids, weights,
                              nn_distance=nn_dist, smooth_targets=smooth_targets)
    return (
        weights["weight_asymm_segment_chamfer"] * fwd
        + seg_conf
        + weights["weight_reverse_asymm_point_chamfer"] * rev_point
        + masks
    )


def symm_v1_chamfer_with_stroke_masks(
    y_pred, y, pred_stroke_masks, mask_scores, stroke_ids, traj_as_pc,
    outdim, weights, y_mask=None, pc_mask=None, **_,
):
    """Symmetric composite (loss_handler.py:733-777): symmetric segment CD
    + symmetric point CD + stroke-mask loss."""
    symm_seg, _, match, _ = chamfer_distance(
        y_pred, y, padded=True, y_mask=y_mask, return_matching=True
    )
    symm_seg = 100.0 * symm_seg
    symm_point = symm_point_chamfer(y_pred, traj_as_pc, outdim, pc_mask=pc_mask)
    masks = stroke_masks_loss(match, pred_stroke_masks, mask_scores,
                              stroke_ids, weights)
    return (
        weights["weight_symm_segment_chamfer"] * symm_seg
        + weights["weight_symm_point_chamfer"] * symm_point
        + masks
    )


def chamfer_with_stroke_masks(
    y_pred, y, pred_stroke_masks, mask_scores, stroke_ids, weights,
    y_mask=None, **_,
):
    """Symmetric segment CD + stroke-mask loss (loss_handler.py:780-801)."""
    cham, _, match, _ = chamfer_distance(
        y_pred, y, padded=True, y_mask=y_mask, return_matching=True
    )
    masks = stroke_masks_loss(match, pred_stroke_masks, mask_scores,
                              stroke_ids, weights)
    return 100.0 * cham + masks
