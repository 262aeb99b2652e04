"""PointNet++ primitive parity vs the reference's own `pointnet2_utils`.

The encoder primitives are the hottest path of every forward pass
(reference models/pointnet2_utils.py:21-168). These tests run the
reference's torch functions and this repo's JAX ops on identical inputs
and assert EXACT index-level agreement:

- `square_distance` (matmul expansion)
- `index_points` gather
- `farthest_point_sample` — reference start index forced to 0 by patching
  `torch.randint` (the reference draws a random start,
  pointnet2_utils.py:77; given the same start, FPS is deterministic)
- `query_ball_point` — first-nsample-by-index-within-radius semantics,
  including the fill-with-first-slot behavior
- the full `sample_and_group` composition (grouped relative coordinates
  + feature concat)
- 3-NN inverse-distance interpolation (feature propagation,
  pointnet2_utils.py:310-316)
"""
import sys
from unittest import mock

import numpy as np
import pytest

sys.path.insert(0, "tests")
from ref_harness import REFERENCE, install_stubs  # noqa: E402

install_stubs()

import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from maskplanner_tpu.ops.distance import square_distance  # noqa: E402
from maskplanner_tpu.ops.sampling import (  # noqa: E402
    farthest_point_sample, index_points, knn, query_ball_point)


def _import_ref_utils():
    sys.dont_write_bytecode = True
    added = REFERENCE not in sys.path
    if added:
        sys.path.insert(0, REFERENCE)
    try:
        from models import pointnet2_utils as ref_utils
    finally:
        if added and REFERENCE in sys.path:
            sys.path.remove(REFERENCE)
    return ref_utils


ref_utils = _import_ref_utils()


@pytest.fixture()
def cloud():
    rng = np.random.default_rng(11)
    return rng.uniform(-1, 1, size=(2, 256, 3)).astype(np.float32)


def test_square_distance_parity(cloud):
    q = cloud[:, :40]
    ref = ref_utils.square_distance(torch.from_numpy(q),
                                    torch.from_numpy(cloud)).numpy()
    ours = np.asarray(square_distance(jnp.asarray(q), jnp.asarray(cloud)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_index_points_parity(cloud):
    rng = np.random.default_rng(1)
    idx = rng.integers(0, cloud.shape[1], size=(2, 17, 5))
    ref = ref_utils.index_points(torch.from_numpy(cloud),
                                 torch.from_numpy(idx)).numpy()
    ours = np.asarray(index_points(jnp.asarray(cloud), jnp.asarray(idx)))
    np.testing.assert_array_equal(ours, ref)


def _zero_randint(*a, **k):
    # torch.randint(low, high, size) / randint(high, size)
    size = a[2] if len(a) > 2 else a[1]
    return torch.zeros(size, dtype=torch.long)


def test_farthest_point_sample_parity(cloud):
    with mock.patch.object(torch, "randint", _zero_randint):
        ref = ref_utils.farthest_point_sample(
            torch.from_numpy(cloud), 64).numpy()
    ours = np.asarray(farthest_point_sample(jnp.asarray(cloud), 64))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("radius,nsample", [(0.3, 16), (0.15, 8), (0.8, 32)])
def test_query_ball_point_parity(cloud, radius, nsample):
    with mock.patch.object(torch, "randint", _zero_randint):
        centroids = ref_utils.farthest_point_sample(
            torch.from_numpy(cloud), 48)
        new_xyz = ref_utils.index_points(torch.from_numpy(cloud), centroids)
    ref = ref_utils.query_ball_point(
        radius, nsample, torch.from_numpy(cloud), new_xyz).numpy()
    ours = np.asarray(query_ball_point(
        radius, nsample, jnp.asarray(cloud),
        jnp.asarray(new_xyz.numpy())))
    np.testing.assert_array_equal(ours, ref)


def test_sample_and_group_parity(cloud):
    """Full chain: FPS -> gather -> ball query -> relative coords +
    feature concat (reference pointnet2_utils.py:112-145)."""
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(2, 256, 6)).astype(np.float32)
    npoint, radius, nsample = 32, 0.4, 16

    with mock.patch.object(torch, "randint", _zero_randint):
        ref_new_xyz, ref_new_points = ref_utils.sample_and_group(
            npoint, radius, nsample, torch.from_numpy(cloud),
            torch.from_numpy(feats))

    xyz_j, feats_j = jnp.asarray(cloud), jnp.asarray(feats)
    centroids = farthest_point_sample(xyz_j, npoint)
    new_xyz = index_points(xyz_j, centroids)
    gidx = query_ball_point(radius, nsample, xyz_j, new_xyz)
    grouped_xyz = index_points(xyz_j, gidx) - new_xyz[:, :, None, :]
    grouped = jnp.concatenate(
        [grouped_xyz, index_points(feats_j, gidx)], axis=-1)

    np.testing.assert_allclose(np.asarray(new_xyz),
                               ref_new_xyz.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(grouped),
                               ref_new_points.numpy(), atol=1e-6)


def test_three_nn_interpolation_parity(cloud):
    """3-NN inverse-distance feature interpolation — the reference's
    PointNetFeaturePropagation core (pointnet2_utils.py:310-316) vs this
    repo's knn-based formulation (models/pointnet2.py FP layer math)."""
    rng = np.random.default_rng(3)
    xyz1 = cloud[:, :200]
    xyz2 = cloud[:, 200:230]
    feat2 = rng.normal(size=(2, 30, 8)).astype(np.float32)

    # reference math, using the reference's own primitives
    t_d = ref_utils.square_distance(torch.from_numpy(xyz1),
                                    torch.from_numpy(xyz2))
    t_d, t_i = t_d.sort(dim=-1)
    t_d, t_i = t_d[:, :, :3], t_i[:, :, :3]
    recip = 1.0 / (t_d + 1e-8)
    w = recip / recip.sum(dim=2, keepdim=True)
    ref = (ref_utils.index_points(torch.from_numpy(feat2), t_i)
           * w.unsqueeze(-1)).sum(dim=2).numpy()

    # this repo's formulation (models/pointnet2.py:244-248)
    dists, idx = knn(3, jnp.asarray(xyz1), jnp.asarray(xyz2))
    np.testing.assert_array_equal(np.asarray(idx), t_i.numpy())
    w_j = 1.0 / (dists + 1e-8)
    w_j = w_j / w_j.sum(axis=-1, keepdims=True)
    ours = (index_points(jnp.asarray(feat2), idx)
            * w_j[..., None]).sum(axis=-2)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)
