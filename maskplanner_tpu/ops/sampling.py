"""Point sampling and grouping primitives (FPS, ball query, kNN).

TPU-native reimplementation of the PointNet++ primitives
(``models/pointnet2_utils.py:65-168`` in the reference):

- ``farthest_point_sample``: the reference runs a Python loop of ``npoint``
  iterations on GPU (pointnet2_utils.py:79-85). Here the iteration is a
  ``lax.fori_loop`` of fused distance-update + argmax steps, traced once —
  no per-step dispatch overhead, and the (B, N) distance update vectorizes
  on the VPU.
- ``query_ball_point``: the reference materializes the full (B, S, N)
  distance matrix and *sorts* it to find the first ``nsample`` in-radius
  indices (pointnet2_utils.py:102-109). Sorting is O(N log N) per query; we
  instead take a ``top_k`` over negated masked indices — O(N·k) and lowers
  to an efficient TPU reduction, with identical first-k-by-index semantics.
- ``knn``: masked k-nearest-neighbour indices via ``top_k``.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import Array

from .distance import square_distance

_BIG = 1e10


def _use_pallas() -> bool:
    """Pallas kernels activate on TPU-family backends (opt out with
    MASKPLANNER_NO_PALLAS=1)."""
    if os.environ.get("MASKPLANNER_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def index_points(points: Array, idx: Array) -> Array:
    """Gather points by per-batch indices.

    points: (B, N, C); idx: (B, ...) int -> (B, ..., C)
    Reference: models/pointnet2_utils.py:45-62.
    """
    B, _, C = points.shape
    flat = idx.reshape(B, -1)
    out = jnp.take_along_axis(points, flat[..., None], axis=1)
    return out.reshape(*idx.shape, C)


def farthest_point_sample(
    xyz: Array,
    npoint: int,
    *,
    key: Array | None = None,
    start_idx: int | Array = 0,
    mask: Array | None = None,
) -> Array:
    """Iterative farthest point sampling.

    Parameters
    ----------
    xyz : (B, N, 3) point positions.
    npoint : number of samples (static).
    key : optional PRNG key for a random start point (the reference starts
        from ``randint(0, N)``, pointnet2_utils.py:77); default start is 0.
    mask : optional (B, N) validity mask — invalid points are never selected.

    Returns
    -------
    (B, npoint) int32 indices.
    """
    B, N, _ = xyz.shape
    if mask is None and _use_pallas():
        from .pallas.fps import fps_pallas

        if key is None and start_idx == 0:
            return fps_pallas(xyz, npoint)
        start = (jax.random.randint(key, (B,), 0, N) if key is not None
                 else jnp.full((B,), start_idx, jnp.int32))
        return fps_pallas(xyz, npoint, start=start)
    if key is not None:
        farthest0 = jax.random.randint(key, (B,), 0, N)
    else:
        farthest0 = jnp.full((B,), start_idx, dtype=jnp.int32)

    min_dist0 = jnp.full((B, N), _BIG, dtype=jnp.float32)
    if mask is not None:
        # invalid points keep distance -inf so argmax never picks them
        min_dist0 = jnp.where(mask, min_dist0, -_BIG)
        # the start index must honor the mask too: remap an invalid draw
        # to the sample's first valid point
        first_valid = jnp.argmax(mask, axis=1).astype(farthest0.dtype)
        valid_start = jnp.take_along_axis(
            mask, farthest0[:, None], axis=1)[:, 0]
        farthest0 = jnp.where(valid_start, farthest0, first_valid)

    xyz32 = xyz.astype(jnp.float32)

    def body(i, carry):
        centroids, min_dist, farthest = carry
        centroids = centroids.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(xyz32, farthest[:, None, None], axis=1)
        dist = jnp.sum((xyz32 - centroid) ** 2, axis=-1)  # (B, N)
        min_dist = jnp.minimum(min_dist, dist)
        farthest = jnp.argmax(min_dist, axis=-1).astype(jnp.int32)
        return centroids, min_dist, farthest

    centroids0 = jnp.zeros((B, npoint), dtype=jnp.int32)
    centroids, _, _ = jax.lax.fori_loop(
        0, npoint, body, (centroids0, min_dist0, farthest0.astype(jnp.int32))
    )
    return centroids


def query_ball_point(
    radius: float,
    nsample: int,
    xyz: Array,
    new_xyz: Array,
    mask: Array | None = None,
) -> Array:
    """Fixed-size in-radius grouping.

    For each query point, returns the indices of the first ``nsample`` points
    (in index order) within ``radius``; slots beyond the in-radius count are
    filled with the first in-radius index. Exactly the reference semantics
    (pointnet2_utils.py:89-109) without the full sort.

    xyz: (B, N, 3); new_xyz: (B, S, 3) -> (B, S, nsample) int32.
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    if mask is None and _use_pallas() and N >= 256 and S >= 16:
        from .pallas.ball_query import ball_query_pallas

        tile = 128 if S % 128 == 0 else (64 if S % 64 == 0 else S)
        return ball_query_pallas(radius, nsample, xyz, new_xyz, tile_s=tile)
    sqrdists = square_distance(new_xyz, xyz)  # (B, S, N)
    within = sqrdists <= radius**2
    if mask is not None:
        within = within & mask[:, None, :]

    idx = jnp.arange(N, dtype=jnp.int32)
    # smallest indices within radius == top-k of negated (masked) index
    masked_idx = jnp.where(within, idx[None, None, :], N)
    neg_topk, _ = jax.lax.top_k(-masked_idx, nsample)
    group_idx = -neg_topk  # ascending first-nsample in-radius indices
    first = group_idx[..., :1]
    group_idx = jnp.where(group_idx == N, first, group_idx)
    # degenerate case: no point in radius at all -> fall back to index 0
    # (cannot happen in the reference because the query point is one of xyz)
    return jnp.where(group_idx == N, 0, group_idx).astype(jnp.int32)


def knn(k: int, query: Array, points: Array, points_mask: Array | None = None):
    """Masked k-nearest neighbours.

    query: (B, S, C); points: (B, N, C) -> (dists (B,S,k), idx (B,S,k)),
    squared distances, ascending. Replaces the DGCNN knn
    (models/dgcnn.py:86-92) and 3-NN feature propagation
    (models/pointnet2_utils.py:279-329) index computation.
    """
    d = square_distance(query, points)
    if points_mask is not None:
        d = jnp.where(points_mask[:, None, :], d, _BIG)
    neg_d, idx = jax.lax.top_k(-d, k)
    return -neg_d, idx
