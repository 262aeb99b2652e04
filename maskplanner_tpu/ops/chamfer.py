"""Masked chamfer distance variants (device-resident, jit-compatible).

Re-implements the semantics of the reference's extended pytorch3d chamfer
(``pytorch3d_chamfer.py:77-343``) — symmetric / asymmetric /
reverse-asymmetric, squared-distance nearest neighbours, padded ground truth,
velocity-aware matching, centroid matching, in-sequence-collapse avoidance,
and matching-index return — on top of a single masked pairwise-distance
matrix reduced on-device. The CUDA ``knn_points`` dependency
(pytorch3d_chamfer.py:12) is replaced by an MXU matmul + masked min.

Conventions
-----------
- ``x`` is the prediction set (never padded in the reference drivers),
  ``y`` the ground-truth set (padded). Boolean validity masks replace the
  −100 sentinel rows; ``mask_from_padding`` derives a mask from sentinel
  data for parity with the reference's on-disk formats.
- All distances are *squared* euclidean distances, as in pytorch3d.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from .distance import square_distance
from .sampling import _use_pallas

_BIG = 1e10
PAD_VALUE = -100.0


def _pallas_nn_ok(x: Array, y: Array) -> bool:
    """Fused NN-argmin kernel pays off once the (P1, P2) distance matrix is
    big enough that its HBM round-trip dominates; tiny matrices stay on the
    fully-fused XLA path."""
    P1, P2, D = x.shape[1], y.shape[1], x.shape[2]
    return _use_pallas() and D <= 128 and P1 * P2 >= 128 * 128


def _nn_gather_chamfer(x, y, x_mask, y_mask, need_x=True, need_y=True):
    """Matched indices + squared distances via the Pallas argmin kernel;
    distances recomputed by gather (exact f32, differentiable — identical
    gradient routing to jnp.min over the distance matrix). Directions not
    needed by the asymmetric variants are skipped entirely."""
    from .pallas.nn_argmin import nn_argmin_pallas

    zx = jnp.zeros(x.shape[:2], jnp.float32)
    zy = jnp.zeros(y.shape[:2], jnp.float32)
    cham_x, cham_y, x_idx, y_idx = zx, zy, None, None
    if need_x:
        x_idx = nn_argmin_pallas(x, y, y_mask)
        x_nn = jnp.take_along_axis(y, x_idx[..., None], axis=1)
        cham_x = jnp.sum((x - x_nn) ** 2, axis=-1)
    if need_y:
        y_idx = nn_argmin_pallas(y, x, x_mask)
        y_nn = jnp.take_along_axis(x, y_idx[..., None], axis=1)
        cham_y = jnp.sum((y - y_nn) ** 2, axis=-1)
    return cham_x, cham_y, x_idx, y_idx


def mask_from_padding(y: Array, pad_value: float = PAD_VALUE) -> Array:
    """Validity mask from sentinel-padded data: True until the first padded row.

    Mirrors pytorch3d_chamfer.py:141-153 where ``y_lengths`` is set to the
    first index whose coordinate 0 equals −100 (suffix padding assumed).
    """
    is_pad = y[..., 0] == pad_value  # (..., P)
    # valid = no pad seen yet at or before this position
    return jnp.cumsum(is_pad.astype(jnp.int32), axis=-1) == 0


def lengths_from_padding(y: Array, pad_value: float = PAD_VALUE) -> Array:
    """Per-sample valid lengths from sentinel padding."""
    return mask_from_padding(y, pad_value).sum(axis=-1)


class ChamferOutput(NamedTuple):
    dist: Array               # reduced (or per-point) chamfer distance
    normals: Array | None     # always None (normals path unused by drivers)
    x_idx: Array | None       # (B, P1) NN index of each x point into y
    y_idx: Array | None       # (B, P2) NN index of each y point into x


def _masked_min(d: Array, col_mask: Array | None):
    """Min + argmin over last axis with invalid columns excluded."""
    if col_mask is not None:
        d = jnp.where(col_mask[..., None, :], d, _BIG)
    return jnp.min(d, axis=-1), jnp.argmin(d, axis=-1)


def chamfer_distance(
    x: Array,
    y: Array,
    x_mask: Array | None = None,
    y_mask: Array | None = None,
    batch_reduction: str | None = "mean",
    point_reduction: str | None = "mean",
    velocities: bool = False,
    min_centroids: bool = False,
    padded: bool = False,
    avoid_in_sequence_collapsing: bool = False,
    soft_attraction: bool = False,
    asymmetric: bool = False,
    reverse_asymmetric: bool = False,
    return_matching: bool = False,
):
    """Chamfer distance between two batched point sets.

    Parameters mirror the reference call sites (loss_handler.py uses
    ``padded``, ``asymmetric``, ``reverse_asymmetric``, ``return_matching``,
    ``min_centroids``, ``velocities``, ``point_reduction=None`` /
    ``batch_reduction=None``).

    Returns a 2-tuple ``(dist, None)`` or, with ``return_matching``, a
    4-tuple ``(dist, None, x_idx, y_idx)`` — same as the reference.
    """
    B, P1, D = x.shape
    P2 = y.shape[1]

    if padded and y_mask is None:
        y_mask = mask_from_padding(y)
    x_lengths = (
        jnp.full((B,), P1, dtype=jnp.float32)
        if x_mask is None
        else x_mask.sum(axis=-1).astype(jnp.float32)
    )
    y_lengths = (
        jnp.full((B,), P2, dtype=jnp.float32)
        if y_mask is None
        else y_mask.sum(axis=-1).astype(jnp.float32)
    )

    if min_centroids:
        # Compare λ-segment centroids only (pytorch3d_chamfer.py:244-255).
        lam = D // 3
        x = x.reshape(B, P1, lam, 3).mean(axis=-2)
        y = y.reshape(B, P2, lam, 3).mean(axis=-2)

    if velocities:
        # NN search on positions only; distance on full pose+velocity vector
        # (pytorch3d_chamfer.py:180-198).
        if _pallas_nn_ok(x, y):
            from .pallas.nn_argmin import nn_argmin_pallas

            x_idx = nn_argmin_pallas(x[..., :3], y[..., :3], y_mask)
            y_idx = nn_argmin_pallas(y[..., :3], x[..., :3], x_mask)
        else:
            d_pos = square_distance(x[..., :3], y[..., :3])
            _, x_idx = _masked_min(d_pos, y_mask)
            _, y_idx = _masked_min(jnp.swapaxes(d_pos, -1, -2), x_mask)
        x_nn = jnp.take_along_axis(y, x_idx[..., None], axis=1)
        y_nn = jnp.take_along_axis(x, y_idx[..., None], axis=1)
        cham_x = jnp.sum((x - x_nn) ** 2, axis=-1)
        cham_y = jnp.sum((y - y_nn) ** 2, axis=-1)
    elif avoid_in_sequence_collapsing:
        return _attraction_chamfer(x, y, soft=soft_attraction)
    elif _pallas_nn_ok(x, y):
        cham_x, cham_y, x_idx, y_idx = _nn_gather_chamfer(
            x, y, x_mask, y_mask,
            need_x=not reverse_asymmetric or return_matching,
            need_y=not asymmetric or return_matching)
    else:
        d = square_distance(x, y)
        cham_x, x_idx = _masked_min(d, y_mask)
        cham_y, y_idx = _masked_min(jnp.swapaxes(d, -1, -2), x_mask)

    # Zero out padded rows so they don't contribute to sums
    # (pytorch3d_chamfer.py:264-267).
    if x_mask is not None:
        cham_x = jnp.where(x_mask, cham_x, 0.0)
    if y_mask is not None:
        cham_y = jnp.where(y_mask, cham_y, 0.0)

    if point_reduction is not None:
        cham_x = cham_x.sum(axis=-1)
        cham_y = cham_y.sum(axis=-1)
        if point_reduction == "mean":
            cham_x = cham_x / x_lengths
            cham_y = cham_y / jnp.maximum(y_lengths, 1.0)

    if batch_reduction is not None:
        cham_x = cham_x.sum()
        cham_y = cham_y.sum()
        if batch_reduction == "mean":
            cham_x = cham_x / B
            cham_y = cham_y / B

    if asymmetric:
        dist = cham_x
    elif reverse_asymmetric:
        dist = cham_y
    else:
        dist = cham_x + cham_y

    if return_matching:
        return dist, None, x_idx, y_idx
    return dist, None


def _attraction_chamfer(x: Array, y: Array, soft: bool):
    """Chamfer that skips self-matches at identical sequence positions.

    Used by the rich-attraction loss (pytorch3d_chamfer.py:200-239):
    ``x``/``y`` are per-segment feature sets with P1 == P2 and index i of x
    corresponds to index i of y; a 1-NN match at the same index is a
    degenerate self-match, so the 2nd NN is used instead (hard variant) or
    the row is dropped (soft variant).
    """
    B, P, _ = x.shape
    seq = jnp.arange(P)

    def one_direction(src, dst):
        d = square_distance(src, dst)
        # two smallest distances per row
        neg_top2, idx_top2 = jax.lax.top_k(-d, 2)
        d0, d1 = -neg_top2[..., 0], -neg_top2[..., 1]
        idx0 = idx_top2[..., 0]
        self_match = idx0 == seq[None, :]
        if soft:
            keep = ~self_match
            per_b = jnp.sum(jnp.where(keep, d0, 0.0), axis=-1) / jnp.maximum(
                keep.sum(axis=-1), 1
            )
            return per_b.mean()
        return jnp.sum(jnp.where(self_match, d1, d0), axis=-1)

    cham_x = one_direction(x, y)
    cham_y = one_direction(y, x)
    if soft:
        return cham_x + cham_y, None
    # hard variant: per-batch SUMS averaged over the batch — the
    # reference explicitly skips the per-point mean for this variant
    # (pytorch3d_chamfer.py:294 `point_reduction is not None and not
    # avoid_in_sequence_collapsing`), so the caller's point_reduction
    # argument is intentionally ignored here
    return (cham_x + cham_y).mean(), None
