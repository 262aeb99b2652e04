"""Unit tests for the geometric ops layer against numpy/scipy oracles.

The reference has no test suite (SURVEY.md §4); oracles here re-derive the
semantics of models/pointnet2_utils.py, pytorch3d_chamfer.py and scipy LAP.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from maskplanner_tpu.ops import (
    square_distance,
    chamfer_distance,
    mask_from_padding,
    farthest_point_sample,
    query_ball_point,
    knn,
    index_points,
    hungarian,
    hungarian_cost,
)


def np_sqdist(a, b):
    return ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)


class TestDistance:
    def test_square_distance_matches_numpy(self, rng):
        a = rng.normal(size=(2, 17, 3)).astype(np.float32)
        b = rng.normal(size=(2, 29, 3)).astype(np.float32)
        got = np.asarray(square_distance(jnp.array(a), jnp.array(b)))
        np.testing.assert_allclose(got, np_sqdist(a, b), atol=1e-4)


class TestChamfer:
    def _ref_chamfer(self, x, y, y_len):
        """Oracle: pytorch3d-style squared-dist chamfer with padded y."""
        B, P1, _ = x.shape
        P2 = y.shape[1]
        cx = np.zeros((B, P1))
        cy = np.zeros((B, P2))
        for b in range(B):
            d = np_sqdist(x[b : b + 1], y[b : b + 1, : y_len[b]])[0]
            cx[b] = d.min(1)
            cy[b, : y_len[b]] = d.min(0)
        return cx, cy

    def test_symmetric_padded(self, rng):
        B, P1, P2, D = 3, 20, 15, 6
        x = rng.normal(size=(B, P1, D)).astype(np.float32)
        y = rng.normal(size=(B, P2, D)).astype(np.float32)
        y_len = np.array([15, 9, 1])
        for b in range(B):
            y[b, y_len[b] :] = -100.0
        cx, cy = self._ref_chamfer(x, y, y_len)
        expected = (cx.sum(1) / P1 + cy.sum(1) / y_len).mean()
        got, _ = chamfer_distance(jnp.array(x), jnp.array(y), padded=True)
        np.testing.assert_allclose(float(got), expected, rtol=1e-4)

    def test_asymmetric_and_reverse(self, rng):
        B, P1, P2, D = 2, 12, 10, 3
        x = rng.normal(size=(B, P1, D)).astype(np.float32)
        y = rng.normal(size=(B, P2, D)).astype(np.float32)
        cx, cy = self._ref_chamfer(x, y, np.full(B, P2))
        fwd, _ = chamfer_distance(jnp.array(x), jnp.array(y), asymmetric=True)
        rev, _ = chamfer_distance(jnp.array(x), jnp.array(y), reverse_asymmetric=True)
        np.testing.assert_allclose(float(fwd), (cx.sum(1) / P1).mean(), rtol=1e-4)
        np.testing.assert_allclose(float(rev), (cy.sum(1) / P2).mean(), rtol=1e-4)

    def test_matching_indices(self, rng):
        B, P1, P2, D = 2, 8, 11, 3
        x = rng.normal(size=(B, P1, D)).astype(np.float32)
        y = rng.normal(size=(B, P2, D)).astype(np.float32)
        _, _, x_idx, y_idx = chamfer_distance(
            jnp.array(x), jnp.array(y), return_matching=True
        )
        d = np_sqdist(x, y)
        np.testing.assert_array_equal(np.asarray(x_idx), d.argmin(2))
        np.testing.assert_array_equal(np.asarray(y_idx), d.argmin(1))

    def test_no_reduction_shape(self, rng):
        x = rng.normal(size=(2, 8, 3)).astype(np.float32)
        y = rng.normal(size=(2, 11, 3)).astype(np.float32)
        out, _, _, _ = chamfer_distance(
            jnp.array(x), jnp.array(y), asymmetric=True, return_matching=True,
            point_reduction=None, batch_reduction=None,
        )
        assert out.shape == (2, 8)

    def test_mask_from_padding(self):
        y = np.ones((2, 5, 3), np.float32)
        y[0, 3:] = -100.0
        m = np.asarray(mask_from_padding(jnp.array(y)))
        assert m[0].tolist() == [True, True, True, False, False]
        assert m[1].all()

    def test_min_centroids(self, rng):
        B, P, lam = 2, 6, 4
        x = rng.normal(size=(B, P, lam * 3)).astype(np.float32)
        y = rng.normal(size=(B, P, lam * 3)).astype(np.float32)
        xc = x.reshape(B, P, lam, 3).mean(2)
        yc = y.reshape(B, P, lam, 3).mean(2)
        d = np_sqdist(xc, yc)
        expected = (d.min(2).mean(1) + d.min(1).mean(1)).mean()
        got, _ = chamfer_distance(jnp.array(x), jnp.array(y), min_centroids=True)
        np.testing.assert_allclose(float(got), expected, rtol=1e-4)


class TestSampling:
    def test_fps_covers_space(self, rng):
        # FPS from start 0 must equal the greedy numpy oracle
        B, N, S = 2, 64, 16
        xyz = rng.normal(size=(B, N, 3)).astype(np.float32)
        got = np.asarray(farthest_point_sample(jnp.array(xyz), S))
        for b in range(B):
            sel = [0]
            dist = np.full(N, 1e10)
            for _ in range(S - 1):
                dist = np.minimum(dist, ((xyz[b] - xyz[b, sel[-1]]) ** 2).sum(-1))
                sel.append(int(dist.argmax()))
            assert got[b].tolist() == sel

    def test_ball_query_first_k_semantics(self, rng):
        B, N, S, K, r = 1, 50, 4, 8, 0.7
        xyz = rng.normal(size=(B, N, 3)).astype(np.float32)
        new_xyz = xyz[:, :S]
        got = np.asarray(query_ball_point(r, K, jnp.array(xyz), jnp.array(new_xyz)))
        d = np_sqdist(new_xyz, xyz)[0]
        for s in range(S):
            inside = np.where(d[s] <= r * r)[0][:K]
            expect = list(inside) + [inside[0]] * (K - len(inside))
            assert got[0, s].tolist() == expect

    def test_knn(self, rng):
        q = rng.normal(size=(2, 5, 3)).astype(np.float32)
        p = rng.normal(size=(2, 30, 3)).astype(np.float32)
        dists, idx = knn(3, jnp.array(q), jnp.array(p))
        ref = np_sqdist(q, p)
        np.testing.assert_array_equal(np.asarray(idx), ref.argsort(2)[:, :, :3])
        np.testing.assert_allclose(np.asarray(dists), np.sort(ref, 2)[:, :, :3], atol=1e-4)

    def test_index_points(self, rng):
        p = rng.normal(size=(2, 10, 4)).astype(np.float32)
        idx = rng.integers(0, 10, size=(2, 3, 5))
        got = np.asarray(index_points(jnp.array(p), jnp.array(idx)))
        for b in range(2):
            np.testing.assert_array_equal(got[b], p[b][idx[b]])


class TestHungarian:
    @pytest.mark.parametrize("n,m", [(5, 5), (8, 3), (41, 6), (12, 12)])
    def test_matches_scipy_cost(self, rng, n, m):
        for _ in range(5):
            cost = rng.normal(size=(n, m)).astype(np.float32) * 10
            rows, cols = linear_sum_assignment(cost)
            expected = cost[rows, cols].sum()
            got = float(hungarian_cost(jnp.array(cost)))
            np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-4)

    def test_batched_and_masked(self, rng):
        B, n, m = 4, 10, 6
        cost = rng.normal(size=(B, n, m)).astype(np.float32)
        valid = np.zeros((B, m), bool)
        n_valid = [6, 3, 1, 4]
        for b, k in enumerate(n_valid):
            valid[b, :k] = True
        row4col, matched = jax.device_get(hungarian(jnp.array(cost), jnp.array(valid)))
        for b, k in enumerate(n_valid):
            rows, cols = linear_sum_assignment(cost[b, :, :k])
            expected = cost[b][rows, cols].sum()
            got = cost[b][row4col[b, :k], np.arange(k)].sum()
            np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-4)
            # matched rows must be unique
            assert len(set(row4col[b, :k].tolist())) == k
            assert matched[b].tolist() == valid[b].tolist()
