"""Loss-system parity tests against independent numpy/scipy oracles
re-deriving the reference semantics (loss_handler.py)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from maskplanner_tpu.losses import LossHandler
from maskplanner_tpu.losses.mask_losses import stroke_masks_loss
from maskplanner_tpu.losses.stroke_losses import emd
from maskplanner_tpu.losses.regularizers import intra_align, repulsion
from maskplanner_tpu.utils.args import load_args


def np_bce(x, t):
    return np.maximum(x, 0) - x * t + np.log1p(np.exp(-np.abs(x)))


def np_sqdist(a, b):
    return ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)


def oracle_stroke_masks_loss(match, masks, scores, stroke_ids,
                             w_masks=1.0, w_conf=100.0, no_stroke_w=1.0):
    """Reference semantics (loss_handler.py:816-935), python loops."""
    B, M, S = masks.shape
    matched_losses = []
    target_scores = np.zeros((B, M))
    weight = np.full((B, M), no_stroke_w)
    for b in range(B):
        tgt_ids = stroke_ids[b][match[b]]
        uniq = [k for k in np.unique(tgt_ids) if k != -1]
        T = np.stack([(tgt_ids == k).astype(float) for k in uniq])  # (K, S)
        cost = np.array(
            [[np_bce(masks[b, i], T[k]).sum() for k in range(len(uniq))]
             for i in range(M)]
        )
        ri, ci = linear_sum_assignment(cost)
        for i, k in zip(ri, ci):
            matched_losses.append(np_bce(masks[b, i], T[k]).sum())
            target_scores[b, i] = 1.0
            weight[b, i] = 1.0
    mask_loss = float(np.mean(matched_losses))
    conf = float(np.mean(weight * np_bce(scores, target_scores)))
    return w_masks * mask_loss + w_conf * conf


class TestStrokeMasksLoss:
    def test_matches_oracle(self, rng):
        B, M, S_pred, S_gt = 3, 6, 25, 30
        masks = rng.normal(size=(B, M, S_pred)).astype(np.float32)
        scores = rng.normal(size=(B, M)).astype(np.float32)
        # GT stroke ids: 4 real strokes, some padding
        stroke_ids = np.concatenate(
            [np.repeat(np.arange(4), 7), -np.ones(2)]
        ).astype(np.int64)[None].repeat(B, 0)
        match = rng.integers(0, 28, size=(B, S_pred))  # only real GT segments
        weights = {
            "explicit_weight_stroke_masks": jnp.float32(1.0),
            "explicit_weight_stroke_masks_confidence": jnp.float32(100.0),
            "explicit_no_stroke_weight": jnp.float32(0.25),
        }
        got = float(stroke_masks_loss(
            jnp.array(match), jnp.array(masks), jnp.array(scores),
            jnp.array(stroke_ids), weights))
        expected = oracle_stroke_masks_loss(
            match, masks, scores, stroke_ids, 1.0, 100.0, 0.25)
        np.testing.assert_allclose(got, expected, rtol=1e-4)

    def test_unrepresented_stroke_excluded(self, rng):
        """A GT stroke with no matched segment must not create a target mask
        (reference builds masks only from unique matched ids)."""
        B, M, S_pred = 1, 4, 10
        masks = rng.normal(size=(B, M, S_pred)).astype(np.float32)
        scores = rng.normal(size=(B, M)).astype(np.float32)
        stroke_ids = np.array([[0] * 5 + [1] * 5 + [2] * 5]).astype(np.int64)
        match = np.zeros((B, S_pred), np.int64)  # all match stroke 0 segments
        match[0, 5:] = 7  # some match stroke 1; stroke 2 never matched
        weights = {
            "explicit_weight_stroke_masks": jnp.float32(1.0),
            "explicit_weight_stroke_masks_confidence": jnp.float32(1.0),
            "explicit_no_stroke_weight": jnp.float32(1.0),
        }
        got = float(stroke_masks_loss(
            jnp.array(match), jnp.array(masks), jnp.array(scores),
            jnp.array(stroke_ids), weights))
        expected = oracle_stroke_masks_loss(
            match, masks, scores, stroke_ids, 1.0, 1.0, 1.0)
        np.testing.assert_allclose(got, expected, rtol=1e-4)


class TestEMD:
    def test_matches_oracle(self, rng):
        B, P, G, D = 2, 8, 6, 5
        y_pred = rng.normal(size=(B, P, D)).astype(np.float32)
        y = rng.normal(size=(B, G, D)).astype(np.float32)
        got = float(emd(jnp.array(y_pred), jnp.array(y)))
        vals = []
        for b in range(B):
            cost = np.sqrt(np_sqdist(y_pred[b], y[b]))
            ri, ci = linear_sum_assignment(cost)
            for i, j in zip(ri, ci):
                vals.append(((y_pred[b, i] - y[b, j]) ** 2).sum())
        np.testing.assert_allclose(got, np.mean(vals), rtol=1e-4)


class TestSinkhornEMD:
    def test_converges_to_hungarian_emd(self, rng):
        """Soft EMD at small eps ~ exact Hungarian EMD on separated sets."""
        from maskplanner_tpu.ops.sinkhorn import sinkhorn_emd

        B, N, D = 2, 16, 3
        y = rng.normal(size=(B, N, D)).astype(np.float32) * 2.0
        y_pred = (y[:, rng.permutation(N)]
                  + rng.normal(0, 0.01, (B, N, D))).astype(np.float32)
        exact = []
        for b in range(B):
            cost = np_sqdist(y_pred[b], y[b])
            ri, ci = linear_sum_assignment(np.sqrt(cost))
            exact.append(np.mean([cost[i, j] for i, j in zip(ri, ci)]))
        soft = float(sinkhorn_emd(jnp.array(y_pred), jnp.array(y),
                                  eps=0.001, iters=200))
        np.testing.assert_allclose(soft, np.mean(exact), rtol=0.05, atol=5e-4)

    def test_masked_and_differentiable(self, rng):
        from maskplanner_tpu.ops.sinkhorn import sinkhorn_emd

        B, N, M, D = 2, 12, 15, 3
        y_pred = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
        y_np = rng.normal(size=(B, M, D)).astype(np.float32)
        mask = np.ones((B, M), bool)
        mask[:, 10:] = False
        y_np[:, 10:] = -100.0
        y = jnp.asarray(y_np)
        g = jax.grad(lambda yp: sinkhorn_emd(yp, y, y_mask=jnp.asarray(mask)))(
            y_pred)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

    def test_emd_large_sets_dispatch(self, rng):
        """emd() switches to Sinkhorn above the size cutoff and stays
        close to zero for identical sets."""
        y = jnp.asarray(rng.normal(size=(1, 200, 3)).astype(np.float32))
        val = float(emd(y, y))
        assert val < 0.01


class TestRegularizers:
    def test_intra_align_planar_is_zero(self, rng):
        # segments lying exactly on a plane -> 3rd singular value == 0
        B, S, lam = 2, 5, 4
        pts = rng.normal(size=(B, S, lam, 3)).astype(np.float32)
        pts[..., 2] = 0.0  # flatten to z=0 plane
        val = float(intra_align(jnp.array(pts.reshape(B, S, lam * 3))))
        assert val < 1e-5
        bent = rng.normal(size=(B, S, lam, 3)).astype(np.float32)
        assert float(intra_align(jnp.array(bent.reshape(B, S, lam * 3)))) > 1e-3

    def test_repulsion_sign_and_scale(self, rng):
        # clustered points repel more (more negative) than spread points
        B, S, D = 1, 20, 24
        close = rng.normal(size=(B, S, D)).astype(np.float32) * 0.01
        far = rng.normal(size=(B, S, D)).astype(np.float32) * 10.0
        y = rng.normal(size=(B, 30, D)).astype(np.float32)
        r_close = float(repulsion(jnp.array(close), jnp.array(y), outdim=6,
                                  lambda_points=4, rep_target=0.1))
        r_far = float(repulsion(jnp.array(far), jnp.array(y), outdim=6,
                                lambda_points=4, rep_target=0.1))
        assert r_close < r_far <= 0.0


class TestHandlerEndToEnd:
    def test_flagship_loss_finite_and_differentiable(self, rng):
        cfg = load_args(argv=["config=[maskplanner,cuboids_v2,longx_v2,debug]"])
        handler = LossHandler(cfg.loss, cfg)
        weights = handler.init_weights()
        B, S_pred, S_gt, P, M, D = 2, 12, 15, 40, 6, 24
        y = rng.normal(size=(B, S_gt, D)).astype(np.float32)
        y[:, 13:] = -100.0
        pc = rng.normal(size=(B, P, 6)).astype(np.float32)
        pc[:, 35:] = -100.0
        sids = np.concatenate([np.repeat(np.arange(3), 4), [-1, -1, -1]])
        batch = dict(
            y=jnp.array(y), traj_as_pc=jnp.array(pc),
            stroke_ids=jnp.array(sids[None].repeat(B, 0)),
            pred_stroke_masks=jnp.array(rng.normal(size=(B, M, S_pred)),
                                        dtype=jnp.float32),
            mask_scores=jnp.array(rng.normal(size=(B, M)), dtype=jnp.float32),
            seg_logits=None,
        )

        def loss_fn(y_pred):
            total, terms = handler.compute(weights, y_pred=y_pred, **batch)
            return total

        y_pred = jnp.array(rng.normal(size=(B, S_pred, D)), dtype=jnp.float32)
        val, grad = jax.value_and_grad(loss_fn)(y_pred)
        assert np.isfinite(float(val))
        assert np.isfinite(np.asarray(grad)).all()
        assert float(jnp.abs(grad).sum()) > 0


class TestMetricsHandlerDirect:
    """Direct MetricsHandler coverage for the SoP/strokewise/clustering
    metric families (reference metrics_handler.py:334-442)."""

    def _handler(self, metrics):
        from maskplanner_tpu.metrics import MetricsHandler

        cfg = {"extra_data": ["orientnorm"], "lambda_points": 4}
        return MetricsHandler(cfg, metrics=metrics)

    def test_sop_metrics_and_v2(self):
        from maskplanner_tpu.postprocess.sop import (
            postprocess_sop_predictions)

        B, P, D = 2, 5, 6
        rng = np.random.default_rng(0)
        sop_pred = rng.normal(size=(B, P, D)).astype(np.float32)
        conf = np.array([[5, 5, -5, -5, -5], [5, 5, 5, -5, -5]], np.float32)
        sop_gt = np.full((B, 4, D), -100.0, np.float32)
        sop_gt[0, :2] = 1.0  # 2 GT sops
        sop_gt[1, :3] = 1.0  # 3 GT sops
        processed = postprocess_sop_predictions(sop_pred, conf, 0.5)

        h = self._handler(["sop_metrics", "sop_metrics_v2"])
        out = h.compute(sop_pred=sop_pred, processed_sop_pred=processed,
                        sop_gt=sop_gt, pred_sop_conf_scores=conf,
                        sop_conf_threshold=0.5)
        assert out["avg_num_of_pred_sops"] == 2.5
        assert out["avg_num_of_gt_sops"] == 2.5
        assert out["perc_correct_n_strokes"] == 1.0
        assert out["mean_absolute_error_NoP"] == 0.0
        # names follow the reference exactly (strokes, not sops, in v2)
        for k in ("avg_num_of_pred_strokes_if_higher_threshold",
                  "mean_absolute_error_NoP_if_lower_threshold"):
            assert k in out

    def test_strokewise_num_of_strokes(self):
        h = self._handler(["strokewise_num_of_strokes_metrics"])
        traj_pred = [np.zeros((3, 24)), np.zeros((5, 24))]
        out = h.compute(n_strokes=np.array([3, 4]), traj_pred=traj_pred)
        assert out["perc_correct_n_strokes"] == 0.5
        assert out["avg_num_of_pred_strokes"] == 4.0
        assert out["mean_absolute_error_NoP"] == 0.5

    def test_clustering_metrics(self):
        h = self._handler(["clustering_metrics"])
        ids = np.array([[0, 0, 1, 1, 2, 2]])
        out = h.compute(stroke_ids=ids, stroke_ids_pred=ids + 3)
        assert out["v_measure"] == 1.0
        assert out["adjusted_rand_score"] == 1.0
        assert out["avg_num_of_outliers"] == 0.0


class TestMetricsGuards:
    def test_duplicate_output_names_rejected(self):
        from maskplanner_tpu.metrics import MetricsHandler
        from maskplanner_tpu.utils.args import load_args

        cfg = load_args(argv=["config=[maskplanner,cuboids_v2,longx_v2,debug]"])
        with pytest.raises(AssertionError, match="share output names"):
            MetricsHandler(cfg, ["stroke_masks_metrics",
                                 "strokewise_num_of_strokes_metrics"])

    def test_missing_inputs_raise_informative_error(self):
        from maskplanner_tpu.metrics import MetricsHandler
        from maskplanner_tpu.utils.args import load_args

        cfg = load_args(argv=["config=[maskplanner,cuboids_v2,longx_v2,debug]"])
        h = MetricsHandler(cfg, ["sop_metrics"])
        with pytest.raises(ValueError, match="sop_metrics.*requires"):
            h.compute(y_pred=np.zeros((1, 4, 24), np.float32))

    def test_clustering_derives_ids_from_masks(self):
        """clustering_metrics works from the standard eval loop inputs:
        stroke_ids_pred is derived from the mask heads when absent."""
        from maskplanner_tpu.metrics import MetricsHandler
        from maskplanner_tpu.utils.args import load_args

        rng = np.random.default_rng(0)
        cfg = load_args(argv=["config=[maskplanner,cuboids_v2,longx_v2,debug]"])
        h = MetricsHandler(cfg, ["clustering_metrics"])
        out = h.compute(
            stroke_ids=rng.integers(0, 3, size=(2, 30)),
            pred_stroke_masks=rng.normal(size=(2, 6, 30)).astype(np.float32),
            mask_scores=rng.normal(size=(2, 6)).astype(np.float32))
        assert set(out) == {"v_measure", "adjusted_rand_score",
                            "avg_num_of_outliers"}
        assert all(np.isfinite(v) for v in out.values())


class TestReviewRegressions:
    def test_sinkhorn_padded_identical_sets_near_zero(self, rng):
        """The cost-normalization scale must exclude the 1e6 mask fill:
        identical pred/GT sets with 30% padding must give ~0 EMD (a
        mask-contaminated scale flattened the plan to near-uniform)."""
        from maskplanner_tpu.ops.sinkhorn import sinkhorn_emd

        B, N, D = 2, 20, 3
        y_np = rng.normal(size=(B, N, D)).astype(np.float32)
        mask = np.ones((B, N), bool)
        mask[:, 14:] = False
        y_np[:, 14:] = -100.0
        y_pred = jnp.asarray(np.where(mask[..., None], y_np, 0.0)[:, :14])
        # pred rows = the 14 valid GT rows (permuted); loss must be ~0
        perm = rng.permutation(14)
        y_pred = y_pred[:, perm]
        # pad pred up to >= valid count requirement
        soft = float(sinkhorn_emd(y_pred, jnp.asarray(y_np),
                                  y_mask=jnp.asarray(mask),
                                  eps=0.002, iters=300))
        spread = float(np.var(y_np[:, :14]))
        assert soft < 0.05 * spread, (soft, spread)

    def test_concat_single_pose_rows(self):
        """λ=1 configs produce single-pose rows; segment concatenation
        must order them without inferred velocities (regression: empty
        velocity slice crashed with a broadcast error)."""
        from maskplanner_tpu.postprocess.concat import concat_segments_of_stroke

        t = np.linspace(0, 1, 7)[:, None]
        traj = np.concatenate(
            [t, np.zeros((7, 2)), np.tile([0, 0, 1.0], (7, 1))], axis=1)
        order = np.random.default_rng(0).permutation(7)
        cfg = {"extra_data": ["orientnorm"], "lambda_points": 1}
        out = concat_segments_of_stroke(traj[order].astype(np.float32),
                                        None, cfg)
        xs = out[:, 0]
        assert (np.diff(xs) > 0).all() or (np.diff(xs) < 0).all(), xs

    def test_pad_vectors_truncates_overlong_strokes(self):
        from maskplanner_tpu.data.extras import pad_vectors_per_stroke

        strokes = [np.ones((10, 6), np.float32), np.ones((3, 6), np.float32)]
        out, mask = pad_vectors_per_stroke(strokes, 4, max_len=5)
        assert out.shape == (4, 5, 6)
        assert mask.tolist() == [True, True, False, False]
        np.testing.assert_array_equal(out[0], np.ones((5, 6)))

    def test_fps_masked_start_respects_mask(self, rng):
        """FPS with a validity mask must not select an invalid first
        sample even when the start index is invalid."""
        from maskplanner_tpu.ops.sampling import farthest_point_sample

        pts = rng.normal(size=(2, 32, 3)).astype(np.float32)
        mask = np.ones((2, 32), bool)
        mask[:, 0] = False   # default start index is invalid
        mask[:, 20:] = False
        idx = np.asarray(farthest_point_sample(
            jnp.asarray(pts), 8, mask=jnp.asarray(mask)))
        assert (idx >= 1).all() and (idx < 20).all(), idx
