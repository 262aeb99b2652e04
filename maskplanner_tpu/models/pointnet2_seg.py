"""PointNet++ segmentation variants (Flax).

Reference: ``models/pointnet2_seg.py`` — per-point/per-segment latent
feature networks used by the contrastive-clustering task, plus the
PaintNet per-point pose regressor. (_v2.._v4 raise NotImplementedError in
the reference too and are omitted.)
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from .pointnet2 import SetAbstraction, PointMLP


class PointNet2Segmenter(nn.Module):
    """v1 (reference models/pointnet2_seg.py:14-96): SSG encoder ->
    1024-d global feature tiled to all inputs -> per-point conv head.

    ``ball_in_xyz_space``: when inputs are λ-segment vectors, FPS/ball
    query run on segment centroids in R³ while the grouped features stay
    the full high-dim vectors (reference :58-65).
    """

    outdim: int = 2
    input_orient_dim: int = 0
    lambda_points: int = 1
    ball_in_xyz_space: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_set, train: bool = False, fps_keys=None):
        # input_set: (B, N, D) channel-last
        B, N, D = input_set.shape
        k1 = k2 = None
        if fps_keys is not None:
            k1, k2 = fps_keys

        if self.ball_in_xyz_space:
            per_point = D // self.lambda_points
            xyz = input_set.reshape(B, N, self.lambda_points, per_point)[
                ..., :3].mean(axis=-2)
            full_points = input_set
        else:
            xyz = input_set
            full_points = None

        l1_xyz, l1_f = SetAbstraction(512, 0.2, 32, (64, 64, 128),
                                      dtype=self.dtype, name="sa1")(
            xyz, None, train, fps_key=k1, full_points=full_points)
        l2_xyz, l2_f = SetAbstraction(128, 0.4, 64, (128, 128, 256),
                                      dtype=self.dtype, name="sa2")(
            l1_xyz, l1_f, train, fps_key=k2)
        _, l3_f = SetAbstraction(None, None, None, (256, 512, 1024),
                                 group_all=True, dtype=self.dtype,
                                 name="sa3")(l2_xyz, l2_f, train)
        global_feat = l3_f[:, 0, :]  # (B, 1024)

        tiled = jnp.broadcast_to(global_feat[:, None, :], (B, N, 1024))
        h = jnp.concatenate([tiled, input_set], axis=-1)
        h = PointMLP((512, 256, 128), dtype=self.dtype)(h, train)
        return nn.Dense(self.outdim, dtype=self.dtype)(h)  # (B, N, outdim)


class PointNet2SegmenterPaintNet(nn.Module):
    """Per-point pose regressor (reference models/pointnet2_seg.py:258-339):
    per input point, predicts a λ-segment of poses with unit-normalized
    orientations."""

    outdim_trasl: int = 3
    outdim_orient: int = 3
    weight_orient: float = 1.0
    lambda_points: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_set, train: bool = False, fps_keys=None):
        B, N, _ = input_set.shape
        k1 = k2 = None
        if fps_keys is not None:
            k1, k2 = fps_keys
        l1_xyz, l1_f = SetAbstraction(512, 0.2, 32, (64, 64, 128),
                                      dtype=self.dtype, name="sa1")(
            input_set, None, train, fps_key=k1)
        l2_xyz, l2_f = SetAbstraction(128, 0.4, 64, (128, 128, 256),
                                      dtype=self.dtype, name="sa2")(
            l1_xyz, l1_f, train, fps_key=k2)
        _, l3_f = SetAbstraction(None, None, None, (256, 512, 1024),
                                 group_all=True, dtype=self.dtype,
                                 name="sa3")(l2_xyz, l2_f, train)
        global_feat = l3_f[:, 0, :]

        tiled = jnp.broadcast_to(global_feat[:, None, :], (B, N, 1024))
        h = jnp.concatenate([tiled, input_set], axis=-1)
        last = PointMLP((512, 256, 128), dtype=self.dtype)(h, train)

        trasl = nn.Dense(self.outdim_trasl * self.lambda_points,
                         dtype=self.dtype, name="conv4_trasl")(last)
        normals = jnp.tanh(
            nn.Dense(self.outdim_orient * self.lambda_points,
                     dtype=self.dtype, name="conv4_orient")(last)
        ).reshape(B, N, self.lambda_points, -1)
        normals = normals / jnp.maximum(
            jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12
        ) * self.weight_orient
        trasl = trasl.reshape(B, N, self.lambda_points, -1)
        out = jnp.concatenate([trasl, normals], axis=-1)
        return out.reshape(B, N, -1)
