"""Stroke-level, autoregressive and set-matching losses.

Reference: loss_handler.py:1398-1469 (mse_strokes / nexttoken),
:1504-1573 (masked_mse_strokes, from_segments), :1684-1786
(masked_mse_strokes_v2), :990-1009 (emd), :1632-1681 (hungarian_SoPs).
All matching runs on-device (ops.hungarian); variable stroke counts are
carried as boolean validity masks over static max_n_strokes axes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from ..ops.hungarian import hungarian
from .common import bce_with_logits, euclid_cdist


def mse_strokes(stacked_strokes_pred, stacked_strokes_gt, **_):
    """Sum-over-dims MSE per stroke, mean over strokes
    (loss_handler.py:1398-1407)."""
    return ((stacked_strokes_pred - stacked_strokes_gt) ** 2).sum(-1).mean()


def mse_nexttoken(stacked_pred_nexttoken, stacked_gt_nexttoken, **_):
    """Autoregressive next-segment MSE (loss_handler.py:1410-1423)."""
    return ((stacked_pred_nexttoken - stacked_gt_nexttoken) ** 2).sum(-1).mean()


def mse_nexttoken_v2(stacked_pred_nexttoken, stacked_gt_nexttoken,
                     end_of_path_scores, end_of_path_gt, weights, **_):
    """Next-segment MSE ×100 + imbalance-weighted EoP BCE
    (loss_handler.py:1426-1469)."""
    mse = 100.0 * ((stacked_pred_nexttoken - stacked_gt_nexttoken) ** 2).sum(-1).mean()
    eop = end_of_path_gt.astype(jnp.float32)
    true_count = jnp.maximum(eop.sum(), 1.0)
    false_count = jnp.maximum((1.0 - eop).sum(), 1.0)
    rel = true_count / false_count
    w = jnp.where(eop == 0, rel, 1.0)
    bce = (w * bce_with_logits(end_of_path_scores, eop)).mean()
    return mse + weights["explicit_weight_endofpath_confidence_loss"] * bce


def _masked_mse_rows(pred_rows: Array, gt_rows: Array) -> Array:
    """Σ over dims of (pred−gt)² with −100-padded GT dims zeroed
    (reference _compute_masked_mse_strokes, loss_handler.py:1577-1600)."""
    fake = jnp.isclose(gt_rows, -100.0)
    diff = jnp.where(fake, 0.0, pred_rows - gt_rows)
    return (diff**2).sum(-1)


def masked_mse_strokes(stacked_points_per_stroke_pred,
                       stacked_points_per_stroke_gt,
                       confidence_scores, **_):
    """Ordered per-stroke MSE + per-point length-confidence BCE
    (loss_handler.py:1504-1540). Strokes stacked on axis 0."""
    gt = stacked_points_per_stroke_gt
    n_gt = gt.shape[1]
    pred = stacked_points_per_stroke_pred[:, :n_gt, :]
    fake = jnp.all(gt == -100.0, axis=-1)  # (K, N_gt)
    diff = jnp.where(fake[..., None], 0.0, pred - gt)
    mse = (diff**2).sum(-1).sum(-1).mean()
    conf = confidence_scores[:, :n_gt, 0]
    bce = bce_with_logits(conf, (~fake).astype(jnp.float32)).sum(-1).mean()
    return bce + mse


def masked_mse_strokes_from_segments(stacked_points_per_stroke_pred,
                                     stacked_points_per_stroke_gt,
                                     confidence_scores, output_mask, **_):
    """Masked point MSE + positionally-weighted EoS loss
    (loss_handler.py:1543-1573)."""
    mask = output_mask[..., None].astype(jnp.float32)
    point_loss = (((stacked_points_per_stroke_pred -
                    stacked_points_per_stroke_gt) ** 2) * mask).mean()
    eos_probs = jnp.clip(confidence_scores, 1e-7, 1 - 1e-7)
    K, N = eos_probs.shape[0], eos_probs.shape[1]
    last_idx = (output_mask.sum(axis=1) - 1).astype(jnp.int32)
    eos_targets = jax.nn.one_hot(last_idx, N)[..., None]
    pos_w, neg_w = 10.0, 1.0
    eos_loss = (-pos_w * eos_targets * jnp.log(eos_probs)
                - neg_w * (1 - eos_targets) * jnp.log(1 - eos_probs))
    # the reference's WeightedBCELoss reduces to a scalar BEFORE the mask
    # multiply (loss_handler.py:1815-1818, :1571) — the EoS term is the
    # unmasked mean scaled by the valid fraction; reproduced exactly
    return point_loss + eos_loss.mean() * mask.mean()


def masked_mse_strokes_v2(pred_points_per_stroke, points_per_stroke,
                          pred_point_scores, pred_stroke_scores,
                          gt_stroke_mask, weights, outdim=6, **_):
    """Hungarian-matched whole-stroke loss (loss_handler.py:1684-1786).

    Static-shape port: ``points_per_stroke`` is (B, M_gt, N_gt·outdim)
    (−100-padded within strokes) with ``gt_stroke_mask`` (B, M_gt) marking
    real strokes — instead of the reference's per-sample Python lists.
    """
    B, M_pred, D_pred = pred_points_per_stroke.shape
    M_gt, D_gt = points_per_stroke.shape[1], points_per_stroke.shape[2]

    pred_trunc = pred_points_per_stroke[:, :, :D_gt]
    # cost[b,i,k] = masked MSE between pred stroke i and GT stroke k
    fake = jnp.isclose(points_per_stroke, -100.0)  # (B, M_gt, D_gt)
    gt0 = jnp.where(fake, 0.0, points_per_stroke)
    # expansion with per-(k) masking of pred dims:
    #   Σ_d m[k,d]·(p[i,d]−g[k,d])² = Σ m·p² − 2 Σ m·p·g + Σ m·g²
    m = (~fake).astype(jnp.float32)
    p2 = jnp.einsum("bid,bkd->bik", pred_trunc**2, m)
    cross = jnp.einsum("bid,bkd->bik", pred_trunc, m * gt0)
    g2 = (gt0**2).sum(-1)[:, None, :]
    cost = p2 - 2.0 * cross + g2

    row4col, matched = hungarian(cost, gt_stroke_mask)

    chosen = jnp.take_along_axis(pred_trunc, row4col[..., None], axis=1)
    per_col = _masked_mse_rows(chosen, points_per_stroke)
    total = jnp.maximum(matched.sum(), 1)
    masked_mse = jnp.where(matched, per_col, 0.0).sum() / total

    # per-point confidence: targets = point-validity of the GT stroke in
    # each column, zero beyond the GT point budget (reference
    # _compute_point_confidence_loss, loss_handler.py:1603-1629)
    n_pred_pts = pred_point_scores.shape[-1]
    gt_point_fake = jnp.all(
        points_per_stroke.reshape(B, M_gt, -1, outdim) == -100.0, axis=-1
    )  # (B, M_gt, n_gt_points)
    n_gt_points = gt_point_fake.shape[-1]
    targets_full = jnp.zeros((B, M_gt, n_pred_pts))
    targets_full = targets_full.at[:, :, :n_gt_points].set(
        (~gt_point_fake).astype(jnp.float32)
    )
    chosen_scores = jnp.take_along_axis(
        pred_point_scores, row4col[..., None], axis=1
    )  # (B, M_gt, n_pred_pts): scores of the pred stroke assigned to col k
    point_bce = bce_with_logits(chosen_scores, targets_full).sum(-1)
    point_conf = jnp.where(matched, point_bce, 0.0).sum() / total

    # per-stroke confidence
    assigned = (
        (jax.nn.one_hot(row4col, M_pred, dtype=jnp.float32) * matched[..., None])
        .sum(axis=1)
        .clip(0.0, 1.0)
    )
    w = jnp.where(assigned > 0, 1.0, weights["explicit_no_stroke_weight"])
    stroke_conf = (w * bce_with_logits(pred_stroke_scores, assigned)).mean()

    return (
        weights["explicit_weight_masked_mse_loss"] * masked_mse
        + weights["explicit_weight_point_confidence_loss"] * point_conf
        + weights["explicit_weight_stroke_confidence_loss"] * stroke_conf
    )


def emd(y_pred, y, y_mask=None, **_):
    """Earth mover's distance: Hungarian match (euclidean cost, reference
    models/hungarianMatcher.py:40-61) + sum-over-dims MSE on matched pairs
    (loss_handler.py:990-1009). Large sets (where the O(n^3) exact solver
    would dominate the step) switch to the Sinkhorn soft-EMD
    (ops.sinkhorn), which converges to the same value as eps -> 0."""
    from ..ops.chamfer import mask_from_padding

    if y_mask is None:
        y_mask = mask_from_padding(y)
    if y_pred.shape[1] * y.shape[1] > 128 * 128:
        from ..ops.sinkhorn import sinkhorn_emd

        return sinkhorn_emd(y_pred, y, y_mask=y_mask)
    cost = euclid_cdist(y_pred, y)
    row4col, matched = hungarian(cost, y_mask)
    # with fewer predictions than valid GT entries, hungarian()'s square
    # padding assigns fake rows (index >= n_pred) to the excess columns —
    # exactly the reference matcher's min(n_pred, n_gt)-pair behavior
    # (models/hungarianMatcher.py:17-21); drop those columns from the MSE
    matched = matched & (row4col < y_pred.shape[1])
    safe_rows = jnp.minimum(row4col, y_pred.shape[1] - 1)
    chosen = jnp.take_along_axis(y_pred, safe_rows[..., None], axis=1)
    per_col = ((chosen - jnp.where(y_mask[..., None], y, 0.0)) ** 2).sum(-1)
    total = jnp.maximum(matched.sum(), 1)
    return jnp.where(matched, per_col, 0.0).sum() / total


def hungarian_sops(sop_pred, sop_gt, pred_sop_conf_scores, weights,
                   sop_mask=None, **_):
    """Start-of-path token matching loss (loss_handler.py:1632-1681)."""
    from ..ops.chamfer import mask_from_padding

    if sop_mask is None:
        sop_mask = mask_from_padding(sop_gt)
    cost = euclid_cdist(sop_pred, sop_gt)
    row4col, matched = hungarian(cost, sop_mask)
    chosen = jnp.take_along_axis(sop_pred, row4col[..., None], axis=1)
    per_col = ((chosen - jnp.where(sop_mask[..., None], sop_gt, 0.0)) ** 2).sum(-1)
    total = jnp.maximum(matched.sum(), 1)
    mse = jnp.where(matched, per_col, 0.0).sum() / total

    M = sop_pred.shape[1]
    assigned = (
        (jax.nn.one_hot(row4col, M, dtype=jnp.float32) * matched[..., None])
        .sum(axis=1)
        .clip(0.0, 1.0)
    )
    w = jnp.where(assigned > 0, 1.0, weights["explicit_no_sop_weight"])
    conf = (w * bce_with_logits(pred_sop_conf_scores, assigned)).mean()
    return mse + weights["explicit_weight_sop_confidence_loss"] * conf
