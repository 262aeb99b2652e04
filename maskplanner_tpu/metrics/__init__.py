"""Evaluation metric registry.

Reference contract: ``metrics_handler.py`` — a ``MetricsHandler(config,
metrics)`` with 8 registry entries, each possibly multi-output; values are
host floats (metrics are eval-only, computed from device arrays once per
eval pass).
"""
from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp

from ..data.pointcloud import get_dim_traj_points
from ..ops.chamfer import chamfer_distance
from ..postprocess.stroke_ids import process_pred_stroke_masks_to_stroke_ids
from .clustering import v_measure_score, adjusted_rand_score

METRIC_OUTPUTS = {
    "pcd": ("point-wise chamfer distance",),
    "chamfer_original": ("chamfer original",),
    "stroke_chamfer": ("stroke chamfer distance",),
    "clustering_metrics": ("v_measure", "adjusted_rand_score",
                           "avg_num_of_outliers"),
    "sop_metrics": (
        "avg_num_of_pred_sops", "avg_num_of_gt_sops",
        "avg_ratio_pred_over_gt_sops",
        "avg_num_of_pred_sops_if_higher_threshold",
        "avg_num_of_pred_sops_if_lower_threshold",
        "avg_ratio_pred_over_gt_sops_if_higher_threshold",
        "avg_ratio_pred_over_gt_sops_if_lower_threshold",
    ),
    "sop_metrics_v2": (
        "perc_correct_n_strokes", "avg_num_of_pred_strokes",
        "avg_num_of_gt_strokes", "mean_absolute_error_NoP",
        "avg_num_of_pred_strokes_if_higher_threshold",
        "avg_num_of_pred_strokes_if_lower_threshold",
        "mean_absolute_error_NoP_if_higher_threshold",
        "mean_absolute_error_NoP_if_lower_threshold",
    ),
    "stroke_masks_metrics": (
        "perc_correct_n_strokes", "avg_num_of_pred_strokes",
        "avg_num_of_gt_strokes", "mean_absolute_error_NoP",
    ),
    "strokewise_num_of_strokes_metrics": (
        "perc_correct_n_strokes", "avg_num_of_pred_strokes",
        "avg_num_of_gt_strokes", "mean_absolute_error_NoP",
    ),
}


class MetricsHandler:
    """Compute evaluation metrics (reference metrics_handler.py:25-166)."""

    def __init__(self, config, metrics=(), renormalize_output_config=None):
        self.config = config
        self.metrics = list(metrics)
        unknown = set(self.metrics) - set(METRIC_OUTPUTS)
        assert not unknown, f"invalid metrics: {unknown}"
        # several families emit the same output names (the reference never
        # combines them in one run); results are keyed by name, so a
        # collision would silently drop one family's values
        names = [n for m in self.metrics for n in METRIC_OUTPUTS[m]]
        dup = {n for n in names if names.count(n) > 1}
        assert not dup, (
            f"metrics {self.metrics} share output names {sorted(dup)}; "
            f"enable only one family per name (reference contract)")
        self.renorm = renormalize_output_config or {}
        self.renormalize_output = bool(self.renorm.get("active"))

        # precompute each getter's required parameters once (per-batch
        # inspect.signature in compute() is measurable host overhead)
        import inspect

        self._required: Dict[str, list] = {}
        for m in self.metrics:
            fn = getattr(self, f"get_{m}")
            self._required[m] = [
                p.name for p in inspect.signature(fn).parameters.values()
                if p.default is inspect.Parameter.empty
                and p.kind in (p.POSITIONAL_OR_KEYWORD, p.KEYWORD_ONLY)
            ]
        # stroke_ids_pred is derivable from the mask heads, but the
        # derivation is a host-side postprocess per eval batch — only pay
        # for it when an enabled metric actually consumes it
        # (stroke_masks_metrics recomputes ids internally with its own
        # threshold, so it does NOT count)
        self._needs_derived_ids = any(
            "stroke_ids_pred" in req for req in self._required.values())

    # -- bookkeeping (reference metrics_handler.py:129-140) ----------------
    def output_names(self):
        names = []
        for m in self.metrics:
            names.extend(METRIC_OUTPUTS[m])
        return names

    def tot_num_of_metrics(self):
        return len(self.output_names())

    # -- computation --------------------------------------------------------
    def compute(self, **kw) -> Dict[str, float]:
        # derivable input: per-segment stroke ids from the mask heads
        # (clustering_metrics needs them; the eval loop provides masks)
        if (self._needs_derived_ids
                and kw.get("stroke_ids_pred") is None
                and kw.get("pred_stroke_masks") is not None
                and kw.get("mask_scores") is not None):
            kw["stroke_ids_pred"] = process_pred_stroke_masks_to_stroke_ids(
                np.asarray(kw["pred_stroke_masks"]),
                np.asarray(kw["mask_scores"]))

        out: Dict[str, float] = {}
        for m in self.metrics:
            fn = getattr(self, f"get_{m}")
            missing = [r for r in self._required[m]
                       if kw.get(r) is None]
            if missing:
                raise ValueError(
                    f"metric '{m}' requires inputs {missing} that this "
                    f"eval path does not produce (e.g. SoP metrics apply "
                    f"to start-of-path models; use the driver that emits "
                    f"those outputs)")
            vals = fn(**kw)
            if not isinstance(vals, (list, tuple)):
                vals = [vals]
            for name, v in zip(METRIC_OUTPUTS[m], vals):
                out[name] = float(v)
        return out

    def _renorm_traj(self, traj):
        """Rescale to a different data_scale_factor for cross-category
        comparison (reference metrics_handler.py:145-166, valid entries
        only)."""
        if not self.renormalize_output:
            return traj
        traj = jnp.asarray(traj)
        fake = jnp.all(traj == -100.0, axis=-1, keepdims=True)
        scaled = traj.at[..., :3].multiply(
            self.renorm["from"] / self.renorm["to"])
        return jnp.where(fake, traj, scaled)

    def get_pcd(self, y_pred, traj_as_pc, pc_mask=None, **kw):
        """Point-wise chamfer ×10⁴ (reference metrics_handler.py:226-262)."""
        B = y_pred.shape[0]
        outdim = get_dim_traj_points(self.config["extra_data"])
        pred_pc = jnp.asarray(y_pred).reshape(B, -1, outdim)
        gt = jnp.asarray(traj_as_pc)
        pred_pc, gt = self._renorm_traj(pred_pc), self._renorm_traj(gt)
        cham, _ = chamfer_distance(pred_pc, gt, padded=True, y_mask=pc_mask)
        return 1e4 * float(cham)

    def get_chamfer_original(self, y_pred, traj_pc, **kw):
        """Chamfer vs the full untrimmed GT pose cloud
        (reference metrics_handler.py:265-282)."""
        B = y_pred.shape[0]
        outdim = get_dim_traj_points(self.config["extra_data"])
        pred_pc = jnp.asarray(y_pred).reshape(B, -1, outdim)
        cham, _ = chamfer_distance(pred_pc, jnp.asarray(traj_pc))
        return 1e4 * float(cham)

    def get_stroke_masks_metrics(self, n_strokes, pred_stroke_masks,
                                 mask_scores, confidence_threshold=0.5, **kw):
        """Stroke-count metrics via the mask->id postprocess
        (reference metrics_handler.py:285-308)."""
        ids_pred = process_pred_stroke_masks_to_stroke_ids(
            np.asarray(pred_stroke_masks), np.asarray(mask_scores),
            confidence_threshold)
        n_pred = np.array([len(np.unique(row)) for row in ids_pred])
        n_gt = np.asarray(n_strokes).astype(int)
        return [
            float(np.mean(n_gt == n_pred)),
            float(np.mean(n_pred)),
            float(np.mean(n_gt)),
            float(np.mean(np.abs(n_pred - n_gt))),
        ]

    def get_strokewise_num_of_strokes_metrics(self, n_strokes, traj_pred, **kw):
        """(reference metrics_handler.py:311-331); traj_pred is a list of
        per-sample retained-stroke arrays."""
        n_pred = np.array([t.shape[0] for t in traj_pred]).astype(int)
        n_gt = np.asarray(n_strokes).astype(int)
        return [
            float(np.mean(n_gt == n_pred)),
            float(np.mean(n_pred)),
            float(np.mean(n_gt)),
            float(np.mean(np.abs(n_pred - n_gt))),
        ]

    def get_clustering_metrics(self, stroke_ids_pred, stroke_ids, **kw):
        """V-measure / ARI over per-point stroke labels
        (reference metrics_handler.py:436-442)."""
        vms, aris, outliers = [], [], []
        for t, p in zip(np.asarray(stroke_ids), np.asarray(stroke_ids_pred)):
            valid = t >= 0
            vms.append(v_measure_score(t[valid], p[valid]))
            aris.append(adjusted_rand_score(t[valid], p[valid]))
            outliers.append(float((p[valid] < 0).sum()))
        return [float(np.mean(vms)), float(np.mean(aris)),
                float(np.mean(outliers))]

    def get_sop_metrics(self, sop_pred, processed_sop_pred, sop_gt,
                        pred_sop_conf_scores, sop_conf_threshold, **kw):
        """SoP count metrics with threshold sensitivity sweep
        (reference metrics_handler.py:334-375)."""
        from ..postprocess.sop import postprocess_sop_predictions, unpad_rows

        n_gt = np.array([len(unpad_rows(g)) for g in np.asarray(sop_gt)])
        n_pred = np.array([len(p) for p in processed_sop_pred])
        res = [float(np.mean(n_pred)), float(np.mean(n_gt)),
               float(np.mean(n_pred / np.maximum(n_gt, 1)))]
        counts, ratios = [], []
        for thr in [(sop_conf_threshold + 1) / 2, sop_conf_threshold / 2]:
            proc = postprocess_sop_predictions(
                np.asarray(sop_pred), np.asarray(pred_sop_conf_scores), thr)
            n_t = np.array([len(p) for p in proc])
            counts.append(float(np.mean(n_t)))
            ratios.append(float(np.mean(n_t / np.maximum(n_gt, 1))))
        return res + counts + ratios

    def get_sop_metrics_v2(self, sop_pred, processed_sop_pred, sop_gt,
                           pred_sop_conf_scores, sop_conf_threshold, **kw):
        """(reference metrics_handler.py:377-433)."""
        from ..postprocess.sop import postprocess_sop_predictions, unpad_rows

        n_gt = np.array([len(unpad_rows(g)) for g in np.asarray(sop_gt)])
        n_pred = np.array([len(p) for p in processed_sop_pred])
        res = [float(np.mean(n_gt == n_pred)), float(np.mean(n_pred)),
               float(np.mean(n_gt)), float(np.mean(np.abs(n_pred - n_gt)))]
        extra = []
        for thr in [(sop_conf_threshold + 1) / 2, sop_conf_threshold / 2]:
            proc = postprocess_sop_predictions(
                np.asarray(sop_pred), np.asarray(pred_sop_conf_scores), thr)
            n_t = np.array([len(p) for p in proc])
            extra.append((float(np.mean(n_t)),
                          float(np.mean(np.abs(n_t - n_gt)))))
        res.extend([extra[0][0], extra[1][0], extra[0][1], extra[1][1]])
        return res

    def get_stroke_chamfer(self, y_pred, traj_pc, stroke_ids, **kw):
        """Debug metric: per-pred-stroke min chamfer to GT strokes ×10⁴
        (reference metrics_handler.py:445-496)."""
        outdim = get_dim_traj_points(self.config["extra_data"])
        y_pred = np.asarray(y_pred)
        traj_pc = np.asarray(traj_pc)
        stroke_ids = np.asarray(stroke_ids)
        B = y_pred.shape[0]
        chamfers = []
        for b in range(B):
            total = 0.0
            n_pred = y_pred.shape[1]
            gt_ids = np.unique(stroke_ids[b][stroke_ids[b] >= 0])
            for i in range(n_pred):
                pred_pc = y_pred[b, i].reshape(1, -1, outdim)
                best = np.inf
                for g in gt_ids:
                    gt_pc = traj_pc[b][stroke_ids[b] == g][None]
                    c, _ = chamfer_distance(jnp.asarray(pred_pc),
                                            jnp.asarray(gt_pc),
                                            asymmetric=True)
                    best = min(best, 1e4 * float(c))
                total += best
            chamfers.append(total / n_pred)
        return float(np.mean(chamfers))
