"""Pairwise squared-distance primitives.

The batched ``-2 x·yᵀ + |x|² + |y|²`` expansion maps the O(N·M·D) distance
computation onto the MXU as a single batched matmul — this is the workhorse
behind chamfer, kNN, ball query and FPS. Reference semantics:
``models/pointnet2_utils.py:21-42`` (square_distance).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

_BIG = 1e10


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
