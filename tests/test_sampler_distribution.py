"""Distribution guards for the Poisson-disk mesh sampler.

The reference's preprocessing contract is pcu.sample_mesh_poisson_disk
(blue-noise ~10k surface points, reference utils/disk.py:274-288); the
in-repo replacement (data/io.py:sample_mesh_surface) must honour the
*distribution*, not just the count. Full characterization: docs/sampler.md.
"""
import numpy as np
import pytest

from maskplanner_tpu.data.fixture_category import box_mesh
from maskplanner_tpu.data.io import sample_mesh_surface


def _nn_dists(pts):
    from scipy.spatial import cKDTree

    d, _ = cKDTree(pts).query(pts, k=2)
    return d[:, 1]


@pytest.fixture(scope="module")
def box():
    return box_mesh(np.array([800.0, 600.0, 400.0]))


@pytest.fixture(scope="module")
def sampled(box):
    v, f = box
    pts, owner = sample_mesh_surface(v, f, 4000, seed=3, poisson=True,
                                     return_face_idx=True)
    return v, f, pts, owner


def _dart_radius(v, f, n):
    tri = v[f]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1).sum()
    return np.sqrt(area / (2.0 * n))


def test_blue_noise_min_spacing(sampled):
    """Dart-throwing invariant: no two points closer than the radius."""
    v, f, pts, _ = sampled
    r = _dart_radius(v, f, 4000)
    assert _nn_dists(pts).min() >= r * (1 - 1e-9)


def test_spacing_tighter_than_uniform(box, sampled):
    """Blue-noise NN-distance spread is far tighter than the uniform
    area-weighted baseline (the distribution property, not just the min)."""
    v, f, pts, _ = sampled
    uni = sample_mesh_surface(v, f, len(pts), seed=3, poisson=False)
    d_pd, d_un = _nn_dists(pts), _nn_dists(uni)
    cv_pd = d_pd.std() / d_pd.mean()
    cv_un = d_un.std() / d_un.mean()
    assert cv_pd < 0.2 and cv_un > 0.35, (cv_pd, cv_un)
    r = _dart_radius(v, f, 4000)
    assert d_un.min() < 0.2 * r  # uniform has no spacing floor


def test_area_proportional_coverage(sampled):
    """Per-source-triangle counts match the area expectation
    (chi2/dof < 2; blue noise is sub-Poisson so ~1 is already loose)."""
    v, f, pts, owner = sampled
    tri = v[f]
    areas = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1)
    counts = np.bincount(owner, minlength=len(f)).astype(float)
    exp = areas / areas.sum() * len(pts)
    chi2 = ((counts - exp) ** 2 / exp).sum() / len(f)
    assert chi2 < 2.0, chi2


def test_count_floor(sampled):
    """Greedy maximal dart throwing returns >= 85% of the request —
    always enough for the pc_points=5120 epoch subsample at the 10k
    preprocessing contract."""
    _, _, pts, _ = sampled
    assert len(pts) >= 0.85 * 4000
