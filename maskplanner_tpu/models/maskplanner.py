"""MaskPlanner network family (segment set + stroke-mask prediction).

Flax re-implementation of the reference PointNet++ regressors
(``models/pointnet2_cls_ssg.py``): the shared SSG encoder produces a 1024-d
global feature; parallel MLP heads regress the unordered segment set, the
per-segment orientations, the stroke masks, and the mask/segment confidence
scores — all in one forward pass (reference forward at
models/pointnet2_cls_ssg.py:297-344).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .pointnet2 import (
    PointNet2Encoder,
    RegressionHead,
    assemble_pose_output,
)


class MaskPlannerOutput(NamedTuple):
    """Forward-pass outputs; mirrors the reference 4-tuple return
    (models/pointnet2_cls_ssg.py:344)."""

    traj: jax.Array                    # (B, out_vectors, λ·outdim) segments
    stroke_masks: jax.Array | None     # (B, n_stroke_masks, out_vectors) logits
    mask_scores: jax.Array | None      # (B, n_stroke_masks) confidence logits
    seg_conf: jax.Array | None         # (B, out_vectors) sigmoid confidences


def _f32(x):
    """Cast a head output back to float32 at the model boundary.

    Under bf16 compute the interface stays f32: losses reduce in f32 and
    the eval drivers dump ``.npy`` files (numpy has no bfloat16). No-op
    when compute is already f32.
    """
    return None if x is None else x.astype(jnp.float32)


class PointNet2StrokeMasks(nn.Module):
    """The flagship MaskPlanner model.

    Reference: ``PointNet2Regressor_StrokeMasks``
    (models/pointnet2_cls_ssg.py:233-344).
    """

    out_vectors: int
    outdim: int = 3                 # translational dims per pose
    outdim_orient: int = 3          # orientation dims per pose (0 = none)
    weight_orient: float = 1.0
    lambda_points: int = 4
    hidden_size: tuple[int, int] = (1024, 1024)
    pred_stroke_masks: bool = True
    n_stroke_masks: int | None = None
    mask_confidence_scores: bool = True
    segment_confidence_scores: bool = False
    dtype: jnp.dtype = jnp.float32
    encoder_norm: str = "batch"

    @nn.compact
    def __call__(self, xyz, train: bool = False, fps_keys=None) -> MaskPlannerOutput:
        """xyz: (B, N, 3) channel-last point cloud."""
        global_feat = PointNet2Encoder(dtype=self.dtype, norm=self.encoder_norm,
                                       name="encoder")(
            xyz, train=train, fps_keys=fps_keys
        )

        # segment head (fc1/fc2/fc3, models/pointnet2_cls_ssg.py:270-272)
        trunk = RegressionHead(self.hidden_size, dtype=self.dtype, name="head")(
            global_feat, train=train
        )
        n_pose = self.out_vectors * self.lambda_points
        positions = nn.Dense(n_pose * self.outdim, dtype=self.dtype,
                             name="fc_out")(trunk)

        if self.outdim_orient > 0:
            normals = nn.Dense(n_pose * self.outdim_orient, dtype=self.dtype,
                               name="fc_normals")(trunk)
            traj = assemble_pose_output(
                positions, normals, self.out_vectors, self.weight_orient
            )
        else:
            traj = positions.reshape(positions.shape[0], self.out_vectors, -1)

        # per-segment confidence head (models/pointnet2_cls_ssg.py:314-319)
        seg_conf = None
        if self.segment_confidence_scores:
            sc = RegressionHead(self.hidden_size, use_bn=False, dtype=self.dtype,
                                name="seg_conf_head")(global_feat, train=train)
            seg_conf = jax.nn.sigmoid(
                nn.Dense(self.out_vectors, dtype=self.dtype,
                         name="seg_conf_out")(sc)
            )

        # stroke-mask head (models/pointnet2_cls_ssg.py:322-329)
        stroke_masks, mask_scores = None, None
        if self.pred_stroke_masks:
            sm = RegressionHead(self.hidden_size, dtype=self.dtype,
                                name="sm_head")(global_feat, train=train)
            sm_out = nn.Dense(self.out_vectors * self.n_stroke_masks,
                              dtype=self.dtype, name="sm_out")(sm)
            stroke_masks = sm_out.reshape(
                sm_out.shape[0], self.n_stroke_masks, self.out_vectors
            )
            if self.mask_confidence_scores:
                mask_scores = nn.Dense(self.n_stroke_masks, dtype=self.dtype,
                                       name="mask_conf_out")(sm)

        return MaskPlannerOutput(_f32(traj), _f32(stroke_masks),
                                 _f32(mask_scores), _f32(seg_conf))


class PointNet2Regressor(nn.Module):
    """Plain segment-set regressor (segmentWise / pointWise baselines).

    Reference: ``PointNet2Regressor`` (models/pointnet2_cls_ssg.py:12-81).
    """

    out_vectors: int
    outdim: int = 3
    outdim_orient: int = 3
    weight_orient: float = 1.0
    lambda_points: int = 1
    hidden_size: tuple[int, int] = (1024, 1024)
    dtype: jnp.dtype = jnp.float32
    encoder_norm: str = "batch"

    @nn.compact
    def __call__(self, xyz, train: bool = False, fps_keys=None):
        global_feat = PointNet2Encoder(dtype=self.dtype, norm=self.encoder_norm,
                                       name="encoder")(
            xyz, train=train, fps_keys=fps_keys
        )
        trunk = RegressionHead(self.hidden_size, dtype=self.dtype, name="head")(
            global_feat, train=train
        )
        n_pose = self.out_vectors * self.lambda_points
        positions = nn.Dense(n_pose * self.outdim, dtype=self.dtype,
                             name="fc_out")(trunk)
        if self.outdim_orient > 0:
            normals = nn.Dense(n_pose * self.outdim_orient, dtype=self.dtype,
                               name="fc_normals")(trunk)
            return _f32(assemble_pose_output(
                positions, normals, self.out_vectors, self.weight_orient
            ))
        return _f32(positions.reshape(positions.shape[0], self.out_vectors, -1))


class PointNet2SoPs(nn.Module):
    """Start-of-path token regressor with optional per-SoP confidences.

    Reference: ``PointNet2Regressor_SoPs`` (models/pointnet2_cls_ssg.py:85-174).
    Output: (B, out_vectors, token_dim) tokens (+ (B, out_vectors) logits).
    """

    out_vectors: int
    outdim: int = 3
    outdim_orient: int = 3
    weight_orient: float = 1.0
    token_length: int = 1           # poses per start-of-path token
    hidden_size: tuple[int, int] = (1024, 1024)
    sop_confidence_scores: bool = False
    dtype: jnp.dtype = jnp.float32
    encoder_norm: str = "batch"

    @nn.compact
    def __call__(self, xyz, train: bool = False, fps_keys=None):
        global_feat = PointNet2Encoder(dtype=self.dtype, norm=self.encoder_norm,
                                       name="encoder")(
            xyz, train=train, fps_keys=fps_keys
        )
        trunk = RegressionHead(self.hidden_size, dtype=self.dtype, name="head")(
            global_feat, train=train
        )
        n_pose = self.out_vectors * self.token_length
        positions = nn.Dense(n_pose * self.outdim, dtype=self.dtype,
                             name="fc_out")(trunk)
        if self.outdim_orient > 0:
            normals = nn.Dense(n_pose * self.outdim_orient, dtype=self.dtype,
                               name="fc_normals")(trunk)
            tokens = assemble_pose_output(
                positions, normals, self.out_vectors, self.weight_orient
            )
        else:
            tokens = positions.reshape(positions.shape[0], self.out_vectors, -1)
        if not self.sop_confidence_scores:
            return _f32(tokens), None
        conf = nn.Dense(self.out_vectors, dtype=self.dtype,
                        name="sop_conf_out")(trunk)
        return _f32(tokens), _f32(conf)


class PointNet2StrokeWise(nn.Module):
    """Whole-stroke regressor with per-point and per-stroke confidences.

    Reference: ``PointNet2Regressor_StrokeWise``
    (models/pointnet2_cls_ssg.py:463-557). Predicts max_n_strokes strokes of
    max_n_stroke_points poses each, plus end-of-path point confidences and
    per-stroke existence confidences.
    """

    n_strokes: int
    stroke_points: int
    outdim: int = 3
    outdim_orient: int = 3
    weight_orient: float = 1.0
    hidden_size: tuple[int, int] = (1024, 1024)
    dtype: jnp.dtype = jnp.float32
    encoder_norm: str = "batch"

    @nn.compact
    def __call__(self, xyz, train: bool = False, fps_keys=None):
        global_feat = PointNet2Encoder(dtype=self.dtype, norm=self.encoder_norm,
                                       name="encoder")(
            xyz, train=train, fps_keys=fps_keys
        )
        trunk = RegressionHead(self.hidden_size, dtype=self.dtype, name="head")(
            global_feat, train=train
        )
        n_pose = self.n_strokes * self.stroke_points
        positions = nn.Dense(n_pose * self.outdim, dtype=self.dtype,
                             name="fc_out")(trunk)
        if self.outdim_orient > 0:
            normals = nn.Dense(n_pose * self.outdim_orient, dtype=self.dtype,
                               name="fc_normals")(trunk)
            strokes = assemble_pose_output(
                positions, normals, self.n_strokes * self.stroke_points, self.weight_orient
            ).reshape(positions.shape[0], self.n_strokes, -1)
        else:
            strokes = positions.reshape(positions.shape[0], self.n_strokes, -1)
        point_conf = nn.Dense(n_pose, dtype=self.dtype, name="point_conf_out")(
            trunk
        ).reshape(positions.shape[0], self.n_strokes, self.stroke_points)
        stroke_conf = nn.Dense(self.n_strokes, dtype=self.dtype,
                               name="stroke_conf_out")(trunk)
        return _f32(strokes), _f32(point_conf), _f32(stroke_conf)
