"""Pairwise squared-distance primitives.

The batched ``-2 x·yᵀ + |x|² + |y|²`` expansion maps the O(N·M·D) distance
computation onto the MXU as a single batched matmul — this is the workhorse
behind chamfer, kNN, ball query and FPS. Reference semantics:
``models/pointnet2_utils.py:21-42`` (square_distance).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import Array

_BIG = 1e10


def _deterministic_nn() -> bool:
    """MASKPLANNER_DETERMINISTIC_NN=1 switches the matmul expansion to a
    fixed-order elementwise form whose results are bitwise identical under
    any batch sharding/tiling. The ``|x|²−2x·y+|y|²`` expansion suffers
    catastrophic cancellation at the ulp level and its matmul tiling varies
    with the per-device batch size, which flips nearest-neighbour argmin
    ties between a sharded and an unsharded run of the same global batch —
    the sole source of loss divergence the multi-chip dryrun used to wave
    through with a loose tolerance. Validation-path flag, not a perf path."""
    return bool(os.environ.get("MASKPLANNER_DETERMINISTIC_NN"))


def square_distance(src: Array, dst: Array) -> Array:
    """Batched pairwise squared euclidean distances.

    Parameters
    ----------
    src : (..., N, D)
    dst : (..., M, D)

    Returns
    -------
    (..., N, M) squared distances, computed via the matmul expansion so the
    contraction runs on the MXU. Accumulation in float32.
    """
    if _deterministic_nn():
        # fixed-order unrolled accumulation: each (n, m) output element is
        # an independent chain of D fused elementwise ops — bitwise
        # reproducible across shardings (XLA never reassociates it)
        src32 = src.astype(jnp.float32)
        dst32 = dst.astype(jnp.float32)
        acc = None
        for d in range(src.shape[-1]):
            diff = src32[..., :, None, d] - dst32[..., None, :, d]
            term = diff * diff
            acc = term if acc is None else acc + term
        return acc
    # precision=highest: NN argmins feed matching decisions, so the cross
    # term must be exact f32 (the K dimension is tiny — ≤ λ·outdim — so the
    # extra MXU passes are negligible next to the model's conv matmuls).
    cross = jnp.matmul(src, jnp.swapaxes(dst, -1, -2),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    s2 = jnp.sum(src.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    d2 = jnp.sum(dst.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    return s2 - 2.0 * cross + jnp.swapaxes(d2, -1, -2)


def masked_square_distance(
    src: Array,
    dst: Array,
    src_mask: Array | None = None,
    dst_mask: Array | None = None,
    fill: float = _BIG,
) -> Array:
    """Pairwise squared distances with invalid rows/cols pushed to ``fill``.

    ``src_mask``/``dst_mask`` are boolean validity masks of shape (..., N) /
    (..., M). Invalid entries never win a min/top-k reduction. This replaces
    the reference's −100-sentinel "padded" handling
    (pytorch3d_chamfer.py:138-163) with explicit masks — static shapes, no
    data-dependent ``where`` scans.
    """
    d = square_distance(src, dst)
    if dst_mask is not None:
        d = jnp.where(dst_mask[..., None, :], d, fill)
    if src_mask is not None:
        d = jnp.where(src_mask[..., :, None], d, fill)
    return d
