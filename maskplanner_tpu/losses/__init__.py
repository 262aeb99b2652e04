"""Loss registry and handler.

JAX re-design of the reference ``LossHandler`` (loss_handler.py:37-231):
the same 33-term registry and per-term ``weight_<name>`` weighting, but
``compute`` is a pure jit-compatible function of (batch, weights, rng).
Loss weights are *traced inputs* (a flat dict of scalars) rather than
Python constants, so the PSACD curriculum and delayed-loss activation
(reference train_maskplanner.py:287-306, :455-503) update weights without
recompiling the train step.

Adversarial losses (discriminator / wdiscriminator) carry trainable
discriminator state; they are provided by ``losses.gan`` and threaded
through the train state explicitly.
"""
from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp

from ..data.pointcloud import get_dim_traj_points
from . import chamfer_losses as C
from . import mask_losses as M
from . import regularizers as R
from . import stroke_losses as S

LOSS_NAMES = [
    "chamfer", "repulsion", "mse", "align", "velcosine", "intra_align",
    "discriminator", "wdiscriminator", "attraction_chamfer",
    "rich_attraction_chamfer", "contrastive_v1", "asymm_segment_chamfer",
    "reverse_asymm_point_chamfer", "stoch_reverse_asymm_segment_chamfer",
    "reverse_asymm_segment_chamfer", "chamfer_bbox", "mse_strokes",
    "chamfer_strokes", "asymm_v6_chamfer_strokes", "masked_mse_strokes",
    "masked_mse_strokes_v2", "symm_segment_chamfer", "symm_point_chamfer",
    "mse_nexttoken", "mse_nexttoken_v2", "emd", "chamfer_with_stroke_masks",
    "asymm_v6_chamfer_with_stroke_masks", "asymm_v11_chamfer_with_stroke_masks",
    "symm_v1_chamfer_with_stroke_masks", "masked_mse_strokes_from_segments",
    "hungarian_SoPs",
]

# weights that are consumed *inside* loss terms (beyond weight_<name>)
_EXPLICIT_WEIGHT_KEYS = [
    "weight_asymm_segment_chamfer",
    "weight_reverse_asymm_point_chamfer",
    "weight_reverse_asymm_segment_chamfer",
    "weight_symm_segment_chamfer",
    "weight_symm_point_chamfer",
    "explicit_weight_stroke_masks",
    "explicit_weight_stroke_masks_confidence",
    "explicit_no_stroke_weight",
    "explicit_weight_segments_confidence",
    "explicit_weight_endofpath_confidence_loss",
    "explicit_no_sop_weight",
    "explicit_weight_sop_confidence_loss",
    "explicit_weight_masked_mse_loss",
    "explicit_weight_point_confidence_loss",
    "explicit_weight_stroke_confidence_loss",
]


class LossHandler:
    """Builds and evaluates the weighted sum of configured loss terms."""

    def __init__(self, loss, config):
        unknown = set(loss) - set(LOSS_NAMES)
        assert not unknown, f"invalid loss names: {unknown}"
        self.loss = list(loss)
        self.config = config
        self.outdim = get_dim_traj_points(config["extra_data"])
        self.lambda_points = int(config["lambda_points"])

        # compatibility asserts (reference loss_handler.py:176-209)
        for name in self.loss:
            assert f"weight_{name}" in config or name in (
                "masked_mse_strokes_from_segments",
            ), f"missing weight_{name} in config"
        assert not ("chamfer" in self.loss and "mse" in self.loss)
        if self.lambda_points > 1:
            allowed = {
                "hungarian_SoPs", "masked_mse_strokes_from_segments",
                "asymm_v6_chamfer_with_stroke_masks",
                "symm_v1_chamfer_with_stroke_masks",
                "asymm_v11_chamfer_with_stroke_masks",
                "chamfer_with_stroke_masks", "emd", "chamfer",
                "symm_segment_chamfer", "symm_point_chamfer", "intra_align",
                "attraction_chamfer", "rich_attraction_chamfer", "repulsion",
                "contrastive_v1", "asymm_segment_chamfer",
                "reverse_asymm_point_chamfer",
                "stoch_reverse_asymm_segment_chamfer",
                "reverse_asymm_segment_chamfer", "chamfer_strokes",
                "mse_nexttoken", "mse_nexttoken_v2",
            }
            assert set(self.loss) <= allowed, (
                f"losses {set(self.loss) - allowed} unsupported for lambda > 1"
            )
        if "intra_align" in self.loss:
            assert self.lambda_points > 3
        if "align" in self.loss:
            assert config["knn_repulsion"] > 1

        self._dispatch = self._build_dispatch()

    # -- dynamic weights ----------------------------------------------------
    def init_weights(self) -> dict[str, jnp.ndarray]:
        """Flat dict of dynamic loss weights, traced into the train step."""
        w: dict[str, Any] = {}
        for name in self.loss:
            key = f"weight_{name}"
            w[key] = float(self.config.get(key, 1.0))
        for key in _EXPLICIT_WEIGHT_KEYS:
            if key in self.config and self.config[key] is not None:
                w[key] = float(self.config[key])
        return {k: jnp.asarray(v, jnp.float32) for k, v in w.items()}

    # -- evaluation ---------------------------------------------------------
    def compute(self, weights, rng=None, return_list=True, **batch):
        """Weighted total + per-term values (reference
        loss_handler.py:212-231). Fully traceable."""
        total = 0.0
        terms = {}
        for name in self.loss:
            value = self._dispatch[name](batch, weights, rng)
            total = total + weights[f"weight_{name}"] * value
            terms[name] = value
        if return_list:
            return total, terms
        return total

    # -- dispatch table -----------------------------------------------------
    def _build_dispatch(self) -> dict[str, Callable]:
        cfg = self.config
        outdim = self.outdim

        def std(batch):
            return dict(
                y_pred=batch["y_pred"], y=batch.get("y"),
                y_mask=batch.get("y_mask"),
                traj_as_pc=batch.get("traj_as_pc"),
                pc_mask=batch.get("pc_mask"),
                outdim=outdim,
            )

        def mask_args(batch, weights):
            return dict(
                pred_stroke_masks=batch["pred_stroke_masks"],
                mask_scores=batch["mask_scores"],
                seg_logits=batch.get("seg_logits"),
                stroke_ids=batch["stroke_ids"],
                weights=weights,
                per_segment_confidence=bool(cfg.get("per_segment_confidence")),
                smooth_targets=bool(cfg.get("smooth_target_stroke_masks")),
            )

        table: dict[str, Callable] = {
            "chamfer": lambda b, w, r: C.chamfer(
                **std(b), min_centroids=bool(cfg.get("min_centroids")),
                velocities="vel" in cfg["extra_data"]),
            "symm_segment_chamfer": lambda b, w, r: C.symm_segment_chamfer(**std(b)),
            "symm_point_chamfer": lambda b, w, r: C.symm_point_chamfer(**std(b)),
            "asymm_segment_chamfer": lambda b, w, r: C.asymm_segment_chamfer(**std(b)),
            "reverse_asymm_point_chamfer": lambda b, w, r:
                C.reverse_asymm_point_chamfer(**std(b)),
            "reverse_asymm_segment_chamfer": lambda b, w, r:
                C.reverse_asymm_segment_chamfer(**std(b)),
            "stoch_reverse_asymm_segment_chamfer": lambda b, w, r:
                C.stoch_reverse_asymm_segment_chamfer(rng=r, **std(b)),
            "attraction_chamfer": lambda b, w, r: C.attraction_chamfer(**std(b)),
            "rich_attraction_chamfer": lambda b, w, r: C.rich_attraction_chamfer(
                soft_attraction=bool(cfg.get("soft_attraction")), **std(b)),
            "chamfer_bbox": lambda b, w, r: C.chamfer_bbox(
                bbox_pred=b["y_pred"], bbox_gt=b["y"],
                bbox_mask=b.get("y_mask")),
            "chamfer_strokes": lambda b, w, r: C.chamfer_strokes(
                b["stacked_segments_per_stroke_pred"],
                b["stacked_segments_per_stroke_gt"],
                gt_mask=b.get("stacked_segments_per_stroke_gt_mask")),
            "repulsion": lambda b, w, r: R.repulsion(
                knn_repulsion=int(cfg["knn_repulsion"]),
                rep_target=cfg.get("rep_target"),
                lambda_points=self.lambda_points, **std(b)),
            "align": lambda b, w, r: R.align(
                b["y_pred"], knn_repulsion=int(cfg["knn_repulsion"])),
            "intra_align": lambda b, w, r: R.intra_align(b["y_pred"]),
            "velcosine": lambda b, w, r: R.velcosine(
                b["y_pred"], knn_repulsion=int(cfg["knn_repulsion"])),
            "mse": lambda b, w, r: R.mse(b["y_pred"], b["y"]),
            "contrastive_v1": lambda b, w, r: R.contrastive_v1(
                b["latent_segments"], b["stroke_ids"], rng=r,
                margin=float(cfg.get("contrastive_loss_margin", 0.3)),
                balance_negatives=bool(
                    cfg.get("contrastive_balance_negatives", True)),
                n_strokes_max=int(cfg.get("max_n_strokes") or 64)),
            "mse_strokes": lambda b, w, r: S.mse_strokes(
                b["stacked_strokes_pred"], b["stacked_strokes_gt"]),
            "mse_nexttoken": lambda b, w, r: S.mse_nexttoken(
                b["stacked_pred_nexttoken"], b["stacked_gt_nexttoken"]),
            "mse_nexttoken_v2": lambda b, w, r: S.mse_nexttoken_v2(
                b["stacked_pred_nexttoken"], b["stacked_gt_nexttoken"],
                b["end_of_path_scores"], b["end_of_path_gt"], w),
            "masked_mse_strokes": lambda b, w, r: S.masked_mse_strokes(
                b["stacked_points_per_stroke_pred"],
                b["stacked_points_per_stroke_gt"],
                b["confidence_scores"]),
            "masked_mse_strokes_v2": lambda b, w, r: S.masked_mse_strokes_v2(
                b["pred_points_per_stroke"], b["points_per_stroke"],
                b["pred_point_scores"], b["pred_stroke_scores"],
                b["gt_stroke_mask"], w, outdim=outdim),
            "masked_mse_strokes_from_segments": lambda b, w, r:
                S.masked_mse_strokes_from_segments(
                    b["stacked_points_per_stroke_pred"],
                    b["stacked_points_per_stroke_gt"],
                    b["confidence_scores"], b["output_mask"]),
            "emd": lambda b, w, r: S.emd(
                b["y_pred"], b["y"], y_mask=b.get("y_mask")),
            "hungarian_SoPs": lambda b, w, r: S.hungarian_sops(
                b["sop_pred"], b["sop_gt"], b["pred_sop_conf_scores"], w,
                sop_mask=b.get("sop_mask")),
            "chamfer_with_stroke_masks": lambda b, w, r:
                M.chamfer_with_stroke_masks(
                    y_pred=b["y_pred"], y=b["y"], y_mask=b.get("y_mask"),
                    pred_stroke_masks=b["pred_stroke_masks"],
                    mask_scores=b["mask_scores"],
                    stroke_ids=b["stroke_ids"], weights=w),
            "asymm_v6_chamfer_with_stroke_masks": lambda b, w, r:
                M.asymm_v6_chamfer_with_stroke_masks(
                    y_pred=b["y_pred"], y=b["y"], y_mask=b.get("y_mask"),
                    traj_as_pc=b["traj_as_pc"], pc_mask=b.get("pc_mask"),
                    outdim=outdim, **mask_args(b, w)),
            "asymm_v11_chamfer_with_stroke_masks": lambda b, w, r:
                M.asymm_v11_chamfer_with_stroke_masks(
                    y_pred=b["y_pred"], y=b["y"], y_mask=b.get("y_mask"),
                    traj_as_pc=b["traj_as_pc"], pc_mask=b.get("pc_mask"),
                    outdim=outdim, **mask_args(b, w)),
            "symm_v1_chamfer_with_stroke_masks": lambda b, w, r:
                M.symm_v1_chamfer_with_stroke_masks(
                    y_pred=b["y_pred"], y=b["y"], y_mask=b.get("y_mask"),
                    traj_as_pc=b["traj_as_pc"], pc_mask=b.get("pc_mask"),
                    outdim=outdim,
                    pred_stroke_masks=b["pred_stroke_masks"],
                    mask_scores=b["mask_scores"],
                    stroke_ids=b["stroke_ids"], weights=w),
        }

        def gan_loss(b, w, r):
            # trainer threads the AdversarialLoss module + its state via the
            # batch; the discriminator update runs outside the generator grad.
            # Without a module (eval loop, non-GAN steps) the term is 0 —
            # the adversarial signal is a training-only objective.
            if b.get("gan_module") is None:
                import jax.numpy as _jnp

                return _jnp.float32(0.0)
            return b["gan_module"].generator_loss(b["gan_state"], b["y_pred"])

        table["discriminator"] = gan_loss
        table["wdiscriminator"] = gan_loss
        table["asymm_v6_chamfer_strokes"] = lambda b, w, r: (
            C.asymm_segment_chamfer(
                y_pred=b["stacked_segments_per_stroke_pred"],
                y=b["stacked_segments_per_stroke_gt"],
                y_mask=b.get("stacked_segments_per_stroke_gt_mask"))
            + C.reverse_asymm_segment_chamfer(
                y_pred=b["stacked_segments_per_stroke_pred"],
                y=b["stacked_segments_per_stroke_gt"],
                y_mask=b.get("stacked_segments_per_stroke_gt_mask")))
        return table
