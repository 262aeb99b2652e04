"""Shared numerics for the loss registry."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def bce_with_logits(logits: Array, targets: Array) -> Array:
    """Elementwise binary cross-entropy on logits (stable form).

    Matches torch.nn.functional.binary_cross_entropy_with_logits
    (used throughout reference loss_handler.py).
    """
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def masked_mean(values: Array, mask: Array, axis=None) -> Array:
    """Mean over entries where mask is True."""
    total = jnp.sum(jnp.where(mask, values, 0.0), axis=axis)
    count = jnp.maximum(jnp.sum(mask, axis=axis), 1)
    return total / count


def segment_distance_to_confidence(distance: Array) -> Array:
    """Map a segment distance to a confidence in [0, 1].

    Reference transform with constants c=2.17, d=−4.63
    (loss_handler.py:554-563, https://www.desmos.com/calculator/esc9rs7jl2).
    """
    c, d = 2.17, -4.63
    logd = jnp.log10(jnp.maximum(distance, 1e-12))
    return 1.0 - 1.0 / (1.0 + jnp.exp(-c * logd + d))


def euclid_cdist(a: Array, b: Array) -> Array:
    """Batched (non-squared) euclidean distance matrix (torch.cdist parity)."""
    from ..ops.distance import square_distance

    return jnp.sqrt(jnp.maximum(square_distance(a, b), 1e-24))
