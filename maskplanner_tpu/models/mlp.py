"""MLP heads (Flax).

Reference: ``models/mlp.py`` — plain MLP (discriminator backbone),
MLPGenerator (stroke generator) and MLPRegressor (stroke-rollout head with
normalized orientations + confidences).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn


class MLP(nn.Module):
    """Dense->BN->ReLU stack + linear output (reference models/mlp.py:8-38)."""

    hidden_sizes: Sequence[int]
    output_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for h in self.hidden_sizes:
            x = nn.Dense(h, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=jnp.float32)(x)
            x = nn.relu(x)
        return nn.Dense(self.output_size, dtype=self.dtype)(x)


class MLPGenerator(nn.Module):
    """MLP emitting (B, out_vectors, outdim) (reference models/mlp.py:41-85)."""

    hidden_sizes: Sequence[int]
    out_vectors: int
    outdim: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = MLP(self.hidden_sizes, self.out_vectors * self.outdim,
                  dtype=self.dtype)(x, train)
        return out.reshape(x.shape[0], self.out_vectors, self.outdim)


class MLPRegressor(nn.Module):
    """Rollout head with unit-normalized orientation channels and optional
    per-vector confidences (reference models/mlp.py:88-169)."""

    out_vectors: int
    outdim_trasl: int
    hidden_sizes: Sequence[int]
    outdim_orient: int = 3
    weight_orient: float = 1.0
    confidence_scores: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, relative_pred: bool = False):
        B = x.shape[0]
        centroids = x[:, :3]
        h = x
        for size in self.hidden_sizes:
            h = nn.Dense(size, dtype=self.dtype)(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=jnp.float32)(h)
            h = nn.relu(h)
        trasl = nn.Dense(self.out_vectors * self.outdim_trasl,
                         dtype=self.dtype, name="output_trasl")(h)

        if self.outdim_orient > 0:
            normals = jnp.tanh(
                nn.Dense(self.out_vectors * self.outdim_orient,
                         dtype=self.dtype, name="output_normals")(h)
            ).reshape(B, -1, 3)
            normals = normals / jnp.maximum(
                jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12
            ) * self.weight_orient
            trasl = trasl.reshape(B, -1, 3)
            if relative_pred:
                trasl = trasl + centroids[:, None, :]
            out = jnp.concatenate([trasl, normals], axis=-1)
            out = out.reshape(B, self.out_vectors, -1)
        else:
            out = trasl.reshape(B, self.out_vectors, self.outdim_trasl)

        if self.confidence_scores:
            scores = nn.Dense(self.out_vectors, dtype=self.dtype,
                              name="out_confidence")(h)
            return out, scores.reshape(B, self.out_vectors, 1)
        return out
