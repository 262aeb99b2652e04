"""DGCNN discriminator (Flax, channel-last).

Reference: ``models/dgcnn.py`` (edge-conv feature graph network used as the
GAN discriminator). The kNN graph is recomputed per edge-conv layer in
feature space; grouping uses the shared ``ops.knn`` top-k (no full sort,
no hard-coded device — the reference hard-codes CUDA at dgcnn.py:104).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.sampling import index_points


def get_graph_feature(x: jax.Array, k: int = 20) -> jax.Array:
    """Edge-conv features: for each point, [neighbour − point, point]
    over its k nearest neighbours in feature space
    (reference models/dgcnn.py:95-121). x: (B, N, C) -> (B, N, k, 2C)."""
    from ..ops.sampling import knn

    _, idx = knn(k, x, x)
    neighbors = index_points(x, idx)  # (B, N, k, C)
    center = jnp.broadcast_to(x[:, :, None, :], neighbors.shape)
    return jnp.concatenate([neighbors - center, center], axis=-1)


class _EdgeConv(nn.Module):
    out_channels: int
    k: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        h = get_graph_feature(x, self.k)  # (B, N, k, 2C)
        h = nn.Dense(self.out_channels, use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32)(h)
        h = nn.leaky_relu(h, negative_slope=0.2)
        return h.max(axis=2)  # (B, N, out_channels)


class DGCNNDiscriminator(nn.Module):
    """Reference models/dgcnn.py:12-83; outputs a realness logit."""

    k: int = 40
    emb_dims: int = 1024
    dropout_rate: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, N, C) point features
        x1 = _EdgeConv(64, self.k, dtype=self.dtype)(x, train)
        x2 = _EdgeConv(64, self.k, dtype=self.dtype)(x1, train)
        x3 = _EdgeConv(128, self.k, dtype=self.dtype)(x2, train)
        x4 = _EdgeConv(256, self.k, dtype=self.dtype)(x3, train)
        h = jnp.concatenate([x1, x2, x3, x4], axis=-1)  # (B, N, 512)
        h = nn.Dense(self.emb_dims, use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32)(h)
        h = nn.leaky_relu(h, negative_slope=0.2)
        pooled = jnp.concatenate([h.max(axis=1), h.mean(axis=1)], axis=-1)
        h = nn.Dense(512, use_bias=False, dtype=self.dtype)(pooled)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32)(h)
        h = nn.leaky_relu(h, negative_slope=0.2)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = nn.Dense(256, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32)(h)
        h = nn.leaky_relu(h, negative_slope=0.2)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        return nn.Dense(1, dtype=self.dtype)(h)
