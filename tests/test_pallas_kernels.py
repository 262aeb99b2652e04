"""Pallas kernel parity vs the XLA reference paths (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    # all kernel modules share the one pallas module object
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp)


class TestBallQueryKernel:
    @pytest.mark.parametrize("r,k", [(0.3, 8), (0.8, 4), (0.05, 8)])
    def test_matches_xla(self, rng, r, k):
        from maskplanner_tpu.ops.pallas.ball_query import ball_query_pallas
        from maskplanner_tpu.ops.sampling import query_ball_point

        xyz = jnp.asarray(rng.normal(size=(2, 256, 3)).astype(np.float32))
        q = xyz[:, :64]
        ref = np.asarray(query_ball_point(r, k, xyz, q))
        got = np.asarray(ball_query_pallas(r, k, xyz, q, tile_s=64))
        np.testing.assert_array_equal(ref, got)


class TestNNArgminKernel:
    def test_matches_xla_unmasked(self, rng):
        from maskplanner_tpu.ops.pallas.nn_argmin import nn_argmin_pallas
        from maskplanner_tpu.ops.distance import square_distance

        # non-multiple-of-tile sizes exercise the padding path
        x = jnp.asarray(rng.normal(size=(2, 150, 24)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(2, 137, 24)).astype(np.float32))
        ref = np.asarray(jnp.argmin(square_distance(x, y), axis=-1))
        got = np.asarray(nn_argmin_pallas(x, y))
        np.testing.assert_array_equal(ref, got)

    def test_masked(self, rng):
        from maskplanner_tpu.ops.pallas.nn_argmin import nn_argmin_pallas
        from maskplanner_tpu.ops.distance import square_distance

        x = jnp.asarray(rng.normal(size=(2, 64, 6)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(2, 70, 6)).astype(np.float32))
        mask = jnp.asarray(rng.random((2, 70)) > 0.4)
        d = jnp.where(mask[:, None, :], square_distance(x, y), 1e10)
        ref = np.asarray(jnp.argmin(d, axis=-1))
        got = np.asarray(nn_argmin_pallas(x, y, mask))
        np.testing.assert_array_equal(ref, got)

    def test_all_invalid_rows_match_xla(self, rng):
        """A sample whose y_mask is entirely False must pin indices to 0
        like jnp.argmin over all-tied +BIG columns (Mosaic's argmin does
        not tie-break to the first index)."""
        from maskplanner_tpu.ops.pallas.nn_argmin import nn_argmin_pallas

        x = jnp.asarray(rng.normal(size=(2, 16, 3)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(2, 20, 3)).astype(np.float32))
        mask = np.ones((2, 20), bool)
        mask[1] = False
        got = np.asarray(nn_argmin_pallas(x, y, jnp.asarray(mask)))
        assert (got[1] == 0).all()

    def test_chamfer_pallas_path_matches_xla(self, rng, monkeypatch):
        """Full chamfer_distance through the fused path == XLA path,
        values and gradients."""
        import jax
        import maskplanner_tpu.ops.chamfer as cham_mod
        from maskplanner_tpu.ops.chamfer import chamfer_distance

        x = jnp.asarray(rng.normal(size=(2, 40, 12)).astype(np.float32))
        y0 = rng.normal(size=(2, 45, 12)).astype(np.float32)
        y0[0, 38:] = -100.0  # suffix padding
        y = jnp.asarray(y0)

        def run():
            f = lambda xx: chamfer_distance(xx, y, padded=True)[0]
            return jax.value_and_grad(f)(x)

        ref_v, ref_g = run()
        monkeypatch.setattr(cham_mod, "_pallas_nn_ok", lambda *a: True)
        got_v, got_g = run()
        np.testing.assert_allclose(float(ref_v), float(got_v), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ref_g), np.asarray(got_g),
                                   rtol=1e-5, atol=1e-6)

    def test_chamfer_asymmetric_matching(self, rng, monkeypatch):
        import maskplanner_tpu.ops.chamfer as cham_mod
        from maskplanner_tpu.ops.chamfer import chamfer_distance

        x = jnp.asarray(rng.normal(size=(2, 32, 6)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(2, 30, 6)).astype(np.float32))
        ref = chamfer_distance(x, y, asymmetric=True, return_matching=True)
        monkeypatch.setattr(cham_mod, "_pallas_nn_ok", lambda *a: True)
        got = chamfer_distance(x, y, asymmetric=True, return_matching=True)
        np.testing.assert_allclose(float(ref[0]), float(got[0]), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(ref[2]), np.asarray(got[2]))
        np.testing.assert_array_equal(np.asarray(ref[3]), np.asarray(got[3]))


class TestFusedGroupGather:
    def test_matches_xla_grouping(self, rng):
        from maskplanner_tpu.ops.pallas.group_gather import ball_group_pallas
        from maskplanner_tpu.ops.sampling import query_ball_point, index_points

        B, N, S, K, F = 2, 256, 64, 8, 5
        xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
        q = xyz[:, :S]
        feat = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32))
        ref_idx = query_ball_point(0.5, K, xyz, q)
        ref_rel = index_points(xyz, ref_idx) - q[:, :, None, :]
        ref_f = index_points(feat, ref_idx)
        grouped, idx = ball_group_pallas(0.5, K, xyz, q, feat)
        np.testing.assert_array_equal(np.asarray(ref_idx), np.asarray(idx))
        # values go through the exact-to-~1e-5 bf16 hi/lo gather
        np.testing.assert_allclose(np.asarray(ref_rel),
                                   np.asarray(grouped[..., :3]),
                                   rtol=1e-4, atol=3e-5)
        np.testing.assert_allclose(np.asarray(ref_f),
                                   np.asarray(grouped[..., 3:]),
                                   rtol=1e-4, atol=3e-5)

    def test_packed_lo_xyz_only_exact(self, rng):
        """C=3 (sa1 eval/train: no features) routes through the packed-lo
        block gather: lo channels ride the 8-sublane padding rows, so the
        single contraction is hi/lo-exact (~1e-5 rel, the two-pass class)
        at single-pass MXU cost."""
        from maskplanner_tpu.ops.pallas.group_gather import ball_group_pallas
        from maskplanner_tpu.ops.sampling import query_ball_point, index_points

        B, N, S, K = 2, 384, 64, 8
        xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
        q = xyz[:, :S]
        ref_idx = query_ball_point(0.5, K, xyz, q)
        ref_rel = index_points(xyz, ref_idx) - q[:, :, None, :]
        grouped, idx = ball_group_pallas(0.5, K, xyz, q)
        np.testing.assert_array_equal(np.asarray(ref_idx), np.asarray(idx))
        np.testing.assert_allclose(np.asarray(ref_rel), np.asarray(grouped),
                                   rtol=1e-4, atol=3e-5)
        # single_pass must stay meaningfully coarser (bf16-rounded): the
        # packed path really is carrying the lo correction
        sp, _ = ball_group_pallas(0.5, K, xyz, q, single_pass=True)
        abs_pack = np.abs(np.asarray(grouped) - np.asarray(ref_rel)).max()
        abs_sp = np.abs(np.asarray(sp) - np.asarray(ref_rel)).max()
        assert abs_pack < abs_sp

    def test_wide_table_stacked_hilo_exact(self, rng):
        """C>16 (feature-bearing levels) uses the full-N one-hot path with
        hi and lo stacked into ONE contraction; values stay in the
        two-pass accuracy class."""
        from maskplanner_tpu.ops.pallas.group_gather import ball_group_pallas
        from maskplanner_tpu.ops.sampling import query_ball_point, index_points

        B, N, S, K, F = 2, 256, 32, 4, 29   # C = 3 + 29 = 32 > 16
        xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
        q = xyz[:, :S]
        feat = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32))
        ref_idx = query_ball_point(0.5, K, xyz, q)
        ref_rel = index_points(xyz, ref_idx) - q[:, :, None, :]
        ref_f = index_points(feat, ref_idx)
        grouped, idx = ball_group_pallas(0.5, K, xyz, q, feat)
        np.testing.assert_array_equal(np.asarray(ref_idx), np.asarray(idx))
        np.testing.assert_allclose(np.asarray(ref_rel),
                                   np.asarray(grouped[..., :3]),
                                   rtol=1e-4, atol=3e-5)
        np.testing.assert_allclose(np.asarray(ref_f),
                                   np.asarray(grouped[..., 3:]),
                                   rtol=1e-4, atol=3e-5)

    def test_gradients_match_take_path(self, rng):
        import jax
        from maskplanner_tpu.ops.pallas.group_gather import ball_group_pallas
        from maskplanner_tpu.ops.sampling import query_ball_point, index_points

        B, N, S, K, F = 2, 128, 32, 4, 6
        xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
        q = xyz[:, :S]
        feat = jnp.asarray(rng.normal(size=(B, N, F)).astype(np.float32))

        def loss_fused(f, x):
            g, _ = ball_group_pallas(0.5, K, x, q, f)
            return jnp.sum(g[..., 3:] ** 2) + jnp.sum(g[..., :3] ** 3)

        def loss_ref(f, x):
            gi = query_ball_point(0.5, K, x, q)
            rel = index_points(x, gi) - q[:, :, None, :]
            return jnp.sum(index_points(f, gi) ** 2) + jnp.sum(rel ** 3)

        gf1 = jax.grad(loss_fused)(feat, xyz)
        gf2 = jax.grad(loss_ref)(feat, xyz)
        np.testing.assert_allclose(np.asarray(gf1), np.asarray(gf2),
                                   rtol=1e-4, atol=1e-5)

    def test_empty_ball_fallback(self, rng):
        """Queries with no in-radius point fall back to index 0; empty
        slots repeat the first neighbour (reference semantics)."""
        from maskplanner_tpu.ops.pallas.group_gather import ball_group_pallas

        xyz = jnp.asarray(rng.normal(size=(1, 128, 3)).astype(np.float32))
        far_q = jnp.full((1, 8, 3), 100.0, jnp.float32)
        grouped, idx = ball_group_pallas(0.1, 4, xyz, far_q)
        np.testing.assert_array_equal(np.asarray(idx), 0)


class TestFPSKernel:
    def test_matches_xla(self, rng):
        from maskplanner_tpu.ops.pallas.fps import fps_pallas
        from maskplanner_tpu.ops.sampling import farthest_point_sample

        xyz = jnp.asarray(rng.normal(size=(2, 200, 3)).astype(np.float32))
        ref = np.asarray(farthest_point_sample(xyz, 48))
        got = np.asarray(fps_pallas(xyz, 48))
        np.testing.assert_array_equal(ref, got)


class TestFusedSetAbstraction:
    def _ref_sa(self, radius, K, xyz, q, feat, folded):
        """Unfused reference: ball query + gather + folded affine MLP + max."""
        from maskplanner_tpu.ops.sampling import query_ball_point, index_points

        gi = query_ball_point(radius, K, xyz, q)
        x = index_points(xyz, gi) - q[:, :, None, :]
        if feat is not None:
            x = jnp.concatenate([x, index_points(feat, gi)], axis=-1)
        for w, b in folded:
            x = jnp.maximum(jnp.einsum("ci,bski->bskc", w, x) + b, 0.0)
        return x.max(axis=2)

    def _folded(self, rng, cin, widths):
        out = []
        c = cin
        for w in widths:
            out.append((jnp.asarray(rng.normal(size=(w, c)).astype(np.float32))
                        * 0.3,
                        jnp.asarray(rng.normal(size=(w,)).astype(np.float32))))
            c = w
        return out

    @pytest.mark.parametrize("feat_dim", [None, 13])
    def test_matches_unfused(self, rng, feat_dim):
        from maskplanner_tpu.ops.pallas.fused_sa import fused_set_abstraction

        B, N, S, K = 2, 200, 70, 8
        xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
        q = xyz[:, :S]
        feat = None
        if feat_dim:
            feat = jnp.asarray(
                rng.normal(size=(B, N, feat_dim)).astype(np.float32))
        folded = self._folded(rng, 3 + (feat_dim or 0), (16, 16, 32))
        ref = self._ref_sa(0.5, K, xyz, q, feat, folded)
        got = fused_set_abstraction(0.5, K, xyz, q, feat, folded, tile_s=64)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   rtol=1e-4, atol=1e-5)

    def test_empty_ball_fallback(self, rng):
        from maskplanner_tpu.ops.pallas.fused_sa import fused_set_abstraction

        xyz = jnp.asarray(rng.normal(size=(1, 128, 3)).astype(np.float32))
        far_q = jnp.full((1, 8, 3), 100.0, jnp.float32)
        folded = self._folded(rng, 3, (8, 16))
        ref = self._ref_sa(0.1, 4, xyz, far_q, None, folded)
        got = fused_set_abstraction(0.1, 4, xyz, far_q, None, folded,
                                    tile_s=8)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   rtol=1e-4, atol=1e-5)

    def test_setabstraction_module_fused_path(self, rng, monkeypatch):
        """SetAbstraction eval forward: fused kernel == unfused module
        (up to BN-folding reassociation)."""
        import jax
        from maskplanner_tpu.models import pointnet2 as p2

        B, N = 2, 128
        xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
        feat = jnp.asarray(rng.normal(size=(B, N, 9)).astype(np.float32))
        sa = p2.SetAbstraction(32, 0.4, 8, (16, 16, 32))
        v = sa.init(jax.random.PRNGKey(0), xyz, feat, True)
        # perturb batch_stats away from init (mean 0 / var 1) so folding
        # is actually exercised
        v = jax.tree.map(lambda a: a, v)
        stats = jax.tree.map(
            lambda a: a + 0.3 * jnp.arange(a.size, dtype=a.dtype) / a.size,
            v["batch_stats"])
        v = {"params": v["params"], "batch_stats": stats}

        monkeypatch.setattr(p2, "_use_fused_sa", lambda: False)
        monkeypatch.setattr(p2, "_use_fused_group", lambda: False)
        ref_xyz, ref_f = sa.apply(v, xyz, feat, False,
                                  fps_key=jax.random.PRNGKey(1))
        monkeypatch.setattr(p2, "_use_fused_sa", lambda: True)
        got_xyz, got_f = sa.apply(v, xyz, feat, False,
                                  fps_key=jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(ref_xyz), np.asarray(got_xyz),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ref_f), np.asarray(got_f),
                                   rtol=1e-3, atol=1e-4)


class TestFPSRandomStart:
    def test_start_parity_with_xla(self, rng):
        import jax
        from maskplanner_tpu.ops.pallas.fps import fps_pallas
        from maskplanner_tpu.ops.sampling import farthest_point_sample

        xyz = jnp.asarray(rng.normal(size=(3, 200, 3)).astype(np.float32))
        start = jnp.asarray([5, 17, 100], dtype=jnp.int32)
        got = np.asarray(fps_pallas(xyz, 32, start=start))
        for b in range(3):
            ref = np.asarray(farthest_point_sample(
                xyz[b:b + 1], 32, start_idx=int(start[b])))
            np.testing.assert_array_equal(ref[0], got[b])

    def test_train_step_uses_fps_rng(self, rng):
        """Different base rngs give different FPS starts in train mode
        (reference random-start sampling, pointnet2_utils.py:77)."""
        import jax
        from maskplanner_tpu.models import pointnet2 as p2

        xyz = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
        sa = p2.SetAbstraction(16, 0.4, 8, (8, 16))
        v = sa.init({"params": jax.random.PRNGKey(0),
                     "fps": jax.random.PRNGKey(0)}, xyz, None, True)
        x1, _ = sa.apply(v, xyz, None, True, mutable=["batch_stats"],
                         rngs={"fps": jax.random.PRNGKey(1)})[0]
        x2, _ = sa.apply(v, xyz, None, True, mutable=["batch_stats"],
                         rngs={"fps": jax.random.PRNGKey(2)})[0]
        assert not np.allclose(np.asarray(x1), np.asarray(x2))
        # eval (train=False) stays deterministic with no fps rng
        e1 = sa.apply(v, xyz, None, False)
        e2 = sa.apply(v, xyz, None, False)
        np.testing.assert_array_equal(np.asarray(e1[0]), np.asarray(e2[0]))


class TestLapKernel:
    """Exact JV LAP in one Pallas program (ops/pallas/lap.py)."""

    @pytest.mark.parametrize("B,n", [(4, 5), (8, 22), (3, 1), (5, 2), (6, 41)])
    def test_exact_vs_scipy(self, rng, B, n):
        from scipy.optimize import linear_sum_assignment

        from maskplanner_tpu.ops.pallas.lap import lap_jv_pallas

        cost = rng.normal(size=(B, n, n)).astype(np.float32) ** 2 * 10
        got = np.asarray(lap_jv_pallas(jnp.asarray(cost)))
        for b in range(B):
            r, c = linear_sum_assignment(cost[b])
            # a permutation with scipy-optimal total cost (ties may
            # resolve to a different equal-cost permutation)
            assert sorted(got[b]) == list(range(n))
            np.testing.assert_allclose(
                cost[b][np.arange(n), got[b]].sum(),
                cost[b][r, c].sum(), rtol=1e-5, atol=1e-4)

    @pytest.mark.slow
    def test_exact_vs_scipy_band(self, rng):
        """The 64-128 dispatch band (kernel wins 1.1-1.7x over the vmapped
        JV there on v5e — ops/hungarian.py routes n <= 128 to the kernel)."""
        from scipy.optimize import linear_sum_assignment

        from maskplanner_tpu.ops.pallas.lap import lap_jv_pallas

        B, n = 2, 96
        cost = rng.normal(size=(B, n, n)).astype(np.float32) ** 2 * 10
        got = np.asarray(lap_jv_pallas(jnp.asarray(cost)))
        for b in range(B):
            r, c = linear_sum_assignment(cost[b])
            assert sorted(got[b]) == list(range(n))
            np.testing.assert_allclose(
                cost[b][np.arange(n), got[b]].sum(),
                cost[b][r, c].sum(), rtol=1e-5, atol=1e-4)

    def test_ties_still_permutation(self, rng):
        from maskplanner_tpu.ops.pallas.lap import lap_jv_pallas

        cost = np.ones((3, 8, 8), np.float32)
        got = np.asarray(lap_jv_pallas(jnp.asarray(cost)))
        for b in range(3):
            assert sorted(got[b]) == list(range(8))

    def test_hungarian_pallas_path_matches_xla(self, rng, monkeypatch):
        """The full hungarian() wrapper (rectangular + masked columns)
        through the kernel == the vmapped XLA JV solve."""
        import jax

        import maskplanner_tpu.ops.sampling as sampling
        from maskplanner_tpu.ops.hungarian import hungarian

        monkeypatch.setattr(sampling, "_use_pallas", lambda: True)

        B, n, m = 4, 10, 6
        cost = rng.normal(size=(B, n, m)).astype(np.float32)
        valid = np.zeros((B, m), bool)
        for b, k in enumerate([6, 3, 1, 4]):
            valid[b, :k] = True
        row4col, matched = jax.device_get(
            hungarian(jnp.asarray(cost), jnp.asarray(valid)))
        from scipy.optimize import linear_sum_assignment

        for b, k in enumerate([6, 3, 1, 4]):
            r, c = linear_sum_assignment(cost[b, :, :k])
            np.testing.assert_allclose(
                cost[b][row4col[b, :k], np.arange(k)].sum(),
                cost[b][r, c].sum(), rtol=1e-5, atol=1e-4)
            assert len(set(row4col[b, :k].tolist())) == k
            assert matched[b].tolist() == valid[b].tolist()
