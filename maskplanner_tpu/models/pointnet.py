"""PointNet backbone family (Flax, channel-last).

Reference: ``models/pointnet.py`` (fxia22-style PointNet): spatial/feature
transform nets, the shared-MLP feature extractor, the trajectory regressor
and the segmentation heads. The reference's Conv1d(k=1) stacks are Dense
layers over the channel axis here — identical math, MXU-friendly layout.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


class _ConvBNStack(nn.Module):
    channels: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        for c in self.channels:
            x = nn.Dense(c, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=jnp.float32)(x)
            x = nn.relu(x)
        return x


class STNkd(nn.Module):
    """Spatial/feature transform net predicting a k×k alignment matrix
    (reference models/pointnet.py:16-90; STN3d is STNkd with k=3)."""

    k: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        # x: (B, N, k)
        h = _ConvBNStack((64, 128, 1024), dtype=self.dtype)(x, train)
        h = h.max(axis=1)  # (B, 1024)
        h = _ConvBNStack((512, 256), dtype=self.dtype)(h, train)
        mat = nn.Dense(self.k * self.k, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros)(h)
        eye = jnp.eye(self.k, dtype=self.dtype).reshape(-1)
        return (mat + eye).reshape(-1, self.k, self.k)


class PointNetFeat(nn.Module):
    """Shared-MLP feature extractor (reference models/pointnet.py:93-144).

    Returns the 1024-d global feature (``global_feat=True``) or per-point
    1088-d features (global ++ level-1 point features).
    """

    global_feat: bool = True
    feature_transform: bool = False
    affinetrans: bool = True
    deeper: bool = False  # 5-conv extractor (reference models/pointnet_deeper.py:99-103)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        # x: (B, N, C)
        if self.affinetrans:
            trans = STNkd(k=3, dtype=self.dtype, name="stn")(x, train)
            x = jnp.einsum("bnc,bcd->bnd", x, trans)

        x = _ConvBNStack((64,), dtype=self.dtype, name="mlp1")(x, train)
        if self.feature_transform:
            ftrans = STNkd(k=64, dtype=self.dtype, name="fstn")(x, train)
            x = jnp.einsum("bnc,bcd->bnd", x, ftrans)
        point_feat = x
        mid = (128, 128, 512) if self.deeper else (128,)
        x = _ConvBNStack(mid, dtype=self.dtype, name="mlp2")(x, train)
        x = nn.Dense(1024, dtype=self.dtype, name="conv3")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32, name="bn3")(x)
        global_feat = x.max(axis=1)  # (B, 1024)
        if self.global_feat:
            return global_feat
        tiled = jnp.broadcast_to(
            global_feat[:, None, :],
            (x.shape[0], x.shape[1], global_feat.shape[-1]),
        )
        return jnp.concatenate([tiled, point_feat], axis=-1)  # (B, N, 1088)


class PointNetRegressor(nn.Module):
    """Trajectory-set regressor on the PointNet backbone
    (reference models/pointnet.py:168-211). Mirrors the reference's
    batch-size-1 BatchNorm bypass via LayerNorm-free plain path."""

    out_vectors: int
    outdim: int = 3
    feature_transform: bool = False
    affinetrans: bool = False
    hidden_size: tuple[int, int] = (1024, 1024)
    deeper: bool = False  # pointnet_deeper backbone (models/pointnet_deeper.py)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, fps_keys=None):
        feat = PointNetFeat(global_feat=True,
                            feature_transform=self.feature_transform,
                            affinetrans=self.affinetrans,
                            deeper=self.deeper,
                            dtype=self.dtype, name="feat")(x, train)
        # reference quirk: BatchNorm is bypassed entirely when batch == 1
        # (models/pointnet.py:200-208); the shape is static under jit so
        # this is a trace-time branch. The BN modules are still invoked
        # (running-average mode, output discarded) so the parameter tree
        # is identical across batch sizes.
        bypass_bn = x.shape[0] == 1

        def maybe_bn(h):
            ra = True if bypass_bn else not train
            bn = nn.BatchNorm(use_running_average=ra, momentum=0.9,
                              dtype=jnp.float32)
            out = bn(h)
            return h if bypass_bn else out

        h = nn.Dense(self.hidden_size[0], dtype=self.dtype)(feat)
        h = nn.relu(maybe_bn(h))
        h = nn.Dense(self.hidden_size[1], dtype=self.dtype)(h)
        h = nn.Dropout(0.3, deterministic=not train)(h)
        h = nn.relu(maybe_bn(h))
        out = nn.Dense(self.out_vectors * self.outdim, dtype=self.dtype)(h)
        return out.reshape(-1, self.out_vectors, self.outdim)


class PointNetSegmenter(nn.Module):
    """Per-point latent/segmentation head (reference models/pointnet.py:214-267),
    with optional one-hot sample conditioning."""

    outdim: int = 2
    feature_transform: bool = False
    affinetrans: bool = False
    augment_point_features_by: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, one_hot_encoding_sample=None):
        feat = PointNetFeat(global_feat=False,
                            feature_transform=self.feature_transform,
                            affinetrans=self.affinetrans,
                            dtype=self.dtype, name="feat")(x, train)
        if one_hot_encoding_sample is not None:
            one_hot = jnp.broadcast_to(
                one_hot_encoding_sample[:, None, :],
                (feat.shape[0], feat.shape[1],
                 one_hot_encoding_sample.shape[-1]),
            )
            feat = jnp.concatenate([feat, one_hot], axis=-1)
        h = _ConvBNStack((512, 256, 128), dtype=self.dtype)(feat, train)
        return nn.Dense(self.outdim, dtype=self.dtype)(h)  # (B, N, outdim)


class PointNetSegmenterConv1d(nn.Module):
    """Point-wise-only segmenter with no cross-point propagation
    (reference models/pointnet.py:270-317)."""

    outdim: int = 2
    lambda_points: int = 1
    input_normals_only: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, N, 6·λ) per-segment vectors
        if self.input_normals_only:
            idx = []
            for l in range(self.lambda_points):
                idx += [l * 6 + 3 + i for i in range(3)]
            x = x[:, :, jnp.array(idx)]
        for c in (32, 64, 64):
            x = nn.relu(nn.Dense(c, dtype=self.dtype)(x))
        return nn.Dense(self.outdim, dtype=self.dtype)(x)
