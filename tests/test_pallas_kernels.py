"""Pallas kernel parity vs the XLA reference paths (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    import maskplanner_tpu.ops.pallas.ball_query as bq_mod
    import maskplanner_tpu.ops.pallas.fps as fps_mod

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(bq_mod.pl, "pallas_call", interp)
    monkeypatch.setattr(fps_mod.pl, "pallas_call", interp)


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


class TestFPSKernel:
    def test_matches_xla(self, rng):
        from maskplanner_tpu.ops.pallas.fps import fps_pallas
        from maskplanner_tpu.ops.sampling import farthest_point_sample

        xyz = jnp.asarray(rng.normal(size=(2, 200, 3)).astype(np.float32))
        ref = np.asarray(farthest_point_sample(xyz, 48))
        got = np.asarray(fps_pallas(xyz, 48))
        np.testing.assert_array_equal(ref, got)
