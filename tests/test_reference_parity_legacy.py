"""Reference-in-the-loop parity for the legacy-loader helper family
(reference utils/pointcloud.py:510-549): per-stroke downsampling with the
reference's drop-short-strokes semantics, and forward-difference
velocities. These are the numeric kernels of ``data/legacy.py``
(reference utils/dataset/paintnet.py:225-255).
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")
from ref_harness import import_reference  # noqa: E402

ref = import_reference()

from maskplanner_tpu.data import pointcloud as mp_pc  # noqa: E402


def _multi_stroke_traj(rng, lengths, D=6):
    """Concatenated strokes with 0..n-1 ids (the reference's layout)."""
    traj = rng.normal(size=(sum(lengths), D))
    ids = np.concatenate([np.full(n, i, np.int64)
                          for i, n in enumerate(lengths)])
    return traj, ids


class TestDownsampleStrokesParity:
    @pytest.mark.parametrize("lengths,n_points", [
        ((60, 45, 80), 16),        # all strokes survive
        ((60, 10, 80), 16),        # middle stroke dropped (10 <= 16)
        ((16, 17, 100), 16),       # boundary: len == n_points is dropped
    ])
    def test_matches_reference(self, lengths, n_points):
        rng = np.random.default_rng(hash(lengths) % 2**31)
        traj, ids = _multi_stroke_traj(rng, lengths)
        r_traj, r_ids = ref.pointcloud.downsample_strokes(
            traj.copy(), ids.copy(), n_points)
        m_traj, m_ids = mp_pc.downsample_strokes(traj, ids, n_points)
        np.testing.assert_allclose(m_traj, r_traj)
        np.testing.assert_array_equal(m_ids, r_ids)

    def test_shapes_are_stacked_per_stroke(self):
        rng = np.random.default_rng(0)
        traj, ids = _multi_stroke_traj(rng, (30, 40))
        m_traj, m_ids = mp_pc.downsample_strokes(traj, ids, 8)
        assert m_traj.shape == (2, 8, 6)
        assert m_ids.shape == (2, 8)

    def test_padding_rows_never_become_a_stroke(self):
        """This repo's padded convention (id -1 / pose -100) must be
        ignored, not renumbered into a fake stroke of pad rows (the
        reference only ever sees unpadded data here)."""
        rng = np.random.default_rng(1)
        traj, ids = _multi_stroke_traj(rng, (30, 40))
        pad = np.full((25, 6), -100.0)
        m_traj, m_ids = mp_pc.downsample_strokes(
            np.concatenate([traj, pad]),
            np.concatenate([ids, np.full(25, -1)]), 8)
        assert m_traj.shape == (2, 8, 6)
        assert not np.any(m_traj == -100.0)


class TestGetVelocitiesParity:
    @pytest.mark.parametrize("lengths", [(60,), (40, 30), (10, 20, 30)])
    def test_matches_reference(self, lengths):
        rng = np.random.default_rng(sum(lengths))
        traj, ids = _multi_stroke_traj(rng, lengths, D=3)
        r = ref.pointcloud.get_velocities(traj.copy(), ids.copy())
        m = mp_pc.get_velocities(traj, ids)
        np.testing.assert_allclose(m, r)
        # boundary poses carry zero velocity in both
        ends = np.cumsum(lengths) - 1
        np.testing.assert_allclose(m[ends], 0.0)
