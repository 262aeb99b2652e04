"""Model factory and IO-shape computation.

Reference contract: ``models/__init__.py`` — ``get_model(config, which,
io_type)`` builds the backbone named by ``config.model.backbone`` with
input/output sizes derived by ``get_io_info`` (reference
models/__init__.py:220-383).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ..data.pointcloud import get_dim_traj_points, get_dim_orient_traj_points
from .maskplanner import (
    MaskPlannerOutput,
    PointNet2StrokeMasks,
    PointNet2Regressor,
    PointNet2SoPs,
    PointNet2StrokeWise,
)
from .pointnet import (
    PointNetRegressor,
    PointNetSegmenter,
    PointNetSegmenterConv1d,
)
from .pointnet2_seg import PointNet2Segmenter, PointNet2SegmenterPaintNet
from .dgcnn import DGCNNDiscriminator
from .mlp import MLP, MLPGenerator, MLPRegressor
from .point_transformer import PointTransformer

__all__ = [
    "MaskPlannerOutput",
    "PointNet2StrokeMasks",
    "PointNet2Regressor",
    "PointNet2SoPs",
    "PointNet2StrokeWise",
    "PointNetRegressor",
    "PointNetSegmenter",
    "PointNetSegmenterConv1d",
    "PointNet2Segmenter",
    "PointNet2SegmenterPaintNet",
    "DGCNNDiscriminator",
    "MLP",
    "MLPGenerator",
    "MLPRegressor",
    "PointTransformer",
    "get_model",
    "get_io_info",
    "compute_out_vectors",
]


def compute_out_vectors(config) -> int:
    """Number of predicted segments (reference models/__init__.py:307-311):
    ``(n_points − λ) // (λ − overlap) + 1``."""
    lam = config["lambda_points"]
    overlap = config["overlapping"]
    if config.get("traj_with_equally_spaced_points"):
        n_points = config["n_pred_traj_points"]
        assert n_points is not None, "n_pred_traj_points must be set"
    else:
        n_points = config["traj_points"]
    if lam == 1:
        return n_points
    return (n_points - lam) // (lam - overlap) + 1


def get_io_info(io_type: str, config) -> dict[str, Any]:
    """Input/output sizing per task type (reference models/__init__.py:220-383)."""
    outdim = get_dim_traj_points(config["extra_data"])
    orient_outdim = get_dim_orient_traj_points(config["extra_data"])
    lam = config["lambda_points"]

    if io_type in ("paintnet", "MaskPlanner"):
        info = {
            "inputdim": 3,
            "outdim": outdim,
            "orient_outdim": orient_outdim,
            "vector_outdim_transl": (outdim - orient_outdim) * lam,
            "vector_outdim_orient": orient_outdim * lam,
            "out_vectors": compute_out_vectors(config),
        }
        if io_type == "MaskPlanner":
            info["n_stroke_masks"] = config["max_n_strokes"]
        return info

    if io_type == "StrokeWise":
        return {
            "inputdim": 3,
            "outdim": outdim,
            "orient_outdim": orient_outdim,
            "vector_outdim_transl": (outdim - orient_outdim) * config["max_n_stroke_points"],
            "vector_outdim_orient": orient_outdim * config["max_n_stroke_points"],
            "out_vectors": config["max_n_strokes"],
        }

    if io_type == "multipathregression":
        return {
            "inputdim": 3,
            "outdim": outdim,
            "orient_outdim": orient_outdim,
            "vector_outdim_transl": (outdim - orient_outdim) * config["stroke_points"],
            "vector_outdim_orient": orient_outdim * config["stroke_points"],
            "out_vectors": config["n_strokes"],
        }

    if io_type == "ODv1_strokeProposal":
        # start-of-path token sizing (reference models/__init__.py:224-238)
        tok = int(config.get("start_of_path_token_length", 1))
        return {
            "vector_outdim_transl": (outdim - orient_outdim) * tok,
            "vector_outdim_orient": orient_outdim * tok,
        }

    if io_type == "ODv1_strokeRollout":
        # rollout head sizing (reference models/__init__.py:239-277)
        input_size = int(config["stroke_prototype_dim"])
        if config.select("rollout_model.object_features"):
            input_size += 1024
        rollout_loss = config.get("rollout_loss") or []
        eop = False
        if "mse_strokes" in rollout_loss:
            out_vectors = config["stroke_points"]
        elif "chamfer_strokes" in rollout_loss:
            out_vectors = config["out_segments_per_stroke"]
        elif "masked_mse_strokes" in rollout_loss:
            out_vectors = config["out_points_per_stroke"]
            eop = True
        elif "masked_mse_strokes_from_segments" in rollout_loss:
            out_vectors = config["out_points_per_stroke"]
        elif "mse_nexttoken" in rollout_loss:
            out_vectors = 1
            input_size += (config["substroke_points"] - 1) * outdim * lam
        elif "mse_nexttoken_v2" in rollout_loss:
            out_vectors = 1
            input_size += config["substroke_points"] * outdim * lam
            eop = bool(config.get("end_of_path_confidence"))
        else:
            raise ValueError(f"unsupported rollout_loss: {rollout_loss}")
        return {
            "input_size": input_size,
            "outdim_trasl": (outdim - orient_outdim) * lam,
            "outdim_orient": orient_outdim * lam,
            "out_vectors": out_vectors,
            "outdim": outdim,
            "end_of_path_confidence": eop,
        }

    if io_type == "ContrastiveClustering":
        return {"inputdim": outdim * lam}

    raise ValueError(f"unknown io_type: {io_type}")


def get_model(config, which: str | None = None, io_type: str = "MaskPlanner"):
    """Build the Flax module named by ``which`` / ``config.model.backbone``.

    Returns the (uninitialized) module; parameter init happens in the train
    driver with an explicit PRNG key (functional style — the reference's
    in-place pretrained loading (models/__init__.py:386-426) maps to
    checkpoint-restore utilities in ``train.checkpoints``).
    """
    which = which or config["model"]["backbone"]
    outdim = get_dim_traj_points(config["extra_data"])
    orient_outdim = get_dim_orient_traj_points(config["extra_data"])
    hidden = tuple(config["model"].get("hidden_size", (1024, 1024)))
    # bf16 compute (params stay f32; BatchNorm/normalizations run f32):
    # halves MXU/HBM cost of the conv-MLP and head matmuls
    dtype = jnp.bfloat16 if config["model"].get("bf16") else jnp.float32
    # encoder norm study knob (model.norm: batch | layer | none)
    enc_norm = config["model"].get("norm") or "batch"

    if which == "pointnet2_strokemasks_retrocompatible":
        # the reference twin differs only in a layer name
        # (models/pointnet2_cls_ssg.py:348-459); same module here
        which = "pointnet2_strokemasks"

    if which == "pointnet2_strokemasks":
        info = get_io_info("MaskPlanner", config)
        return PointNet2StrokeMasks(
            out_vectors=info["out_vectors"],
            outdim=outdim - orient_outdim,
            outdim_orient=orient_outdim,
            weight_orient=config["weight_orient"],
            lambda_points=config["lambda_points"],
            hidden_size=hidden,
            pred_stroke_masks=True,
            n_stroke_masks=info["n_stroke_masks"],
            mask_confidence_scores=True,
            segment_confidence_scores=bool(config.get("per_segment_confidence")),
            dtype=dtype,
            encoder_norm=enc_norm,
        )

    if which == "pointnet2":
        info = get_io_info("paintnet", config)
        return PointNet2Regressor(
            out_vectors=info["out_vectors"],
            outdim=outdim - orient_outdim,
            outdim_orient=orient_outdim,
            weight_orient=config["weight_orient"],
            lambda_points=config["lambda_points"],
            hidden_size=hidden,
            dtype=dtype,
            encoder_norm=enc_norm,
        )

    if which == "pointnet2_sops":
        return PointNet2SoPs(
            out_vectors=config["out_prototypes"],
            outdim=outdim - orient_outdim,
            outdim_orient=orient_outdim,
            weight_orient=config["weight_orient"],
            token_length=config.get("start_of_path_token_length", 1),
            hidden_size=hidden,
            sop_confidence_scores=bool(config.get("sop_confidence_scores")),
            encoder_norm=enc_norm,
        )

    if which == "pointnet2_strokewise":
        return PointNet2StrokeWise(
            n_strokes=config["max_n_strokes"],
            stroke_points=config["max_n_stroke_points"],
            outdim=outdim - orient_outdim,
            outdim_orient=orient_outdim,
            weight_orient=config["weight_orient"],
            hidden_size=hidden,
            encoder_norm=enc_norm,
        )

    if which == "pointnet":
        info = get_io_info(io_type if io_type != "MaskPlanner" else "paintnet",
                           config)
        assert orient_outdim == 0, (
            "pointnet backbone does not support output normals (reference "
            "models/__init__.py:98-99)")
        return PointNetRegressor(
            out_vectors=info["out_vectors"],
            outdim=info["vector_outdim_transl"],
            affinetrans=bool(config["model"].get("affinetrans")),
            hidden_size=hidden,
        )

    if which == "pointnet_deeper":
        # 5-conv feature extractor (reference models/__init__.py:96-101,
        # models/pointnet_deeper.py:99-103)
        info = get_io_info(io_type if io_type != "MaskPlanner" else "paintnet",
                           config)
        assert orient_outdim == 0, (
            "pointnet_deeper does not support output normals")
        return PointNetRegressor(
            out_vectors=info["out_vectors"],
            outdim=info["vector_outdim_transl"],
            affinetrans=bool(config["model"].get("affinetrans")),
            hidden_size=hidden,
            deeper=True,
        )

    if which == "mlp_generator":
        # random-noise GAN generator (reference models/__init__.py:182-187)
        info = get_io_info(io_type if io_type != "MaskPlanner" else "paintnet",
                           config)
        assert info["vector_outdim_orient"] == 0, (
            "mlp generator does not support output normals (reference "
            "models/__init__.py:183)")
        return MLPGenerator(
            hidden_sizes=(512, 1024),
            out_vectors=info["out_vectors"],
            outdim=info["vector_outdim_transl"],
        )

    if which in ("samplenet", "gnn", "transformer"):
        # parity with the reference: samplenet raises NotImplementedError
        # (models/__init__.py:189-190); gnn/transformer import from
        # models/concat and models/e2e packages that do not exist in the
        # released repo (models/__init__.py:7-15 dead imports)
        raise NotImplementedError(
            f"backbone '{which}' is unreleased in the reference "
            "(models/__init__.py:182-215) and has no behavior to match")

    if which == "pointnet_segmenter":
        return PointNetSegmenter(
            outdim=config["latent_dim"],
            affinetrans=bool(config["model"].get("affinetrans")),
        )

    if which == "pointnet_segmenter_conv1d":
        return PointNetSegmenterConv1d(
            outdim=config["latent_dim"],
            lambda_points=config["lambda_points"],
            input_normals_only=bool(config.get("input_normals_only")),
        )

    if which == "pointnet2_segmenter_v1":
        return PointNet2Segmenter(
            outdim=config["latent_dim"],
            input_orient_dim=orient_outdim,
            lambda_points=config["lambda_points"],
            ball_in_xyz_space=bool(config.get("ball_in_xyz_space")),
        )

    if which == "pointnet2_segmenter_paintnet_v1":
        return PointNet2SegmenterPaintNet(
            outdim_trasl=outdim - orient_outdim,
            outdim_orient=orient_outdim,
            weight_orient=config["weight_orient"],
            lambda_points=config["lambda_points"],
        )

    if which == "pointnet2_3dbbox":
        # 3D-bbox prototype regressor (reference models/__init__.py:84-87,
        # models/pointnet2_cls_ssg.py:177-229): same SoP head with 6-d
        # box encodings and no orientation normalization
        return PointNet2SoPs(
            out_vectors=config["out_prototypes"],
            outdim=6,
            outdim_orient=0,
            hidden_size=hidden,
            sop_confidence_scores=False,
        )

    if which == "mlp_rollout":
        info = get_io_info("ODv1_strokeRollout", config)
        return MLPRegressor(
            out_vectors=info["out_vectors"],
            outdim_trasl=info["outdim_trasl"],
            outdim_orient=info["outdim_orient"],
            weight_orient=config["weight_orient"],
            hidden_sizes=tuple(config["model"].get("hidden_size",
                                                   (1024, 1024))),
            confidence_scores=info["end_of_path_confidence"],
        )

    if which == "point_transformer":
        return PointTransformer(
            input_dim=outdim * config["lambda_points"],
            outdim=outdim * config["lambda_points"],
            max_seq_len=int(config.get("max_seq_len", 100)),
            weight_orient=config["weight_orient"],
        )

    if which == "dgcnn":
        return DGCNNDiscriminator(k=int(config.get("knn_gcn", 20)))

    raise ValueError(f"unknown backbone: {which}")
