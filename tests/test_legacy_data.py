"""Legacy single-path loader (reference utils/dataset/paintnet.py):
rotation augmentations, velocity extra-data, stroke_pred downsampling,
per-mesh normalization, and the reference's item-tuple contract.
"""
import json

import numpy as np
import pytest

from tests.test_disk_data import write_obj, write_traj


@pytest.fixture()
def legacy_root(tmp_path):
    cat = tmp_path / "minicubes-v1"
    names = [f"cube_{i:03d}" for i in range(4)]
    for i, name in enumerate(names):
        d = cat / name
        d.mkdir(parents=True)
        write_obj(d / f"{name}.obj", scale=1.0 + 0.1 * i)
        write_traj(d / f"{name}_trajectory.txt", seed=i)
    (cat / "train_split.json").write_text(json.dumps(names[:3]))
    (cat / "test_split.json").write_text(json.dumps(names[3:]))
    return str(tmp_path)


def make(root, **over):
    from maskplanner_tpu.data.legacy import LegacyPaintDataset

    kw = dict(categories="minicubes-v1", split="train", pc_points=128,
              traj_points=120, lambda_points=4, overlapping=0,
              extra_data=("orientnorm",), normalization="per-mesh")
    kw.update(over)
    return LegacyPaintDataset(root, **kw)


class TestLegacyItem:
    def test_tuple_contract_and_shapes(self, legacy_root):
        ds = make(legacy_root)
        assert len(ds) == 3
        pc, traj, traj_as_pc, ids, dirname = ds[0]
        assert pc.shape == (128, 3)
        assert traj.shape == (30, 24)          # 120/λ rows of λ·outdim
        assert traj_as_pc.shape == (120, 6)
        assert ids.shape == (30,)
        assert dirname == "cube_000"
        # per-mesh normalization: mesh max-distance -> unit ball (the pc
        # is centred on the mesh-vertex centroid, not its own mean)
        assert np.linalg.norm(pc, axis=1).max() <= 1.0 + 1e-6
        assert np.linalg.norm(pc, axis=1).max() > 0.5

    def test_cache_reuse(self, legacy_root):
        ds = make(legacy_root)
        a = ds[1]
        b = ds[1]
        np.testing.assert_allclose(a[0], b[0])
        np.testing.assert_allclose(a[1], b[1])

    def test_caller_mutation_does_not_corrupt_cache(self, legacy_root):
        ds = make(legacy_root)
        a = ds[1]
        for arr in a[:4]:  # pc, traj, traj_as_pc, stroke_ids
            np.asarray(arr)[...] = -7
        b = ds[1]
        assert not np.all(b[3] == -7), "cached stroke_ids were aliased"
        assert not np.allclose(b[0], -7)

    def test_normalization_none_keeps_scale(self, legacy_root):
        import os

        from maskplanner_tpu.data.io import get_max_distance

        raw = make(legacy_root, normalization="none")
        unit = make(legacy_root, normalization="per-mesh")
        r = np.linalg.norm(raw[0][0], axis=1).max()
        u = np.linalg.norm(unit[0][0], axis=1).max()
        mesh = os.path.join(legacy_root, "minicubes-v1", "cube_000",
                            "cube_000.obj")
        # per-mesh = raw / mesh max-distance (sqrt(3)/2 for the unit cube)
        np.testing.assert_allclose(r / u, get_max_distance(mesh), rtol=1e-5)

    def test_per_dataset_scale_computed(self, legacy_root):
        ds = make(legacy_root, normalization="per-dataset")
        assert ds.dataset_mean_max_distance is not None
        # mean of three cube max-distances, all ~sqrt(3)/2 * scale
        assert 0.5 < ds.dataset_mean_max_distance < 2.0
        override = make(legacy_root, normalization="per-dataset",
                        data_scale_factor=2.5)
        assert override.dataset_mean_max_distance == 2.5

    def test_train_portion_subset(self, legacy_root):
        ds = make(legacy_root, train_portion=0.4)
        assert len(ds) == 1


class TestStrokePred:
    def test_per_stroke_downsample(self, legacy_root):
        ds = make(legacy_root, stroke_pred=True, stroke_points=16,
                  lambda_points=1, overlapping=0)
        pc, traj, traj_as_pc, ids, _ = ds[0]
        # 2 strokes -> (2, 16*outdim) flat per-stroke rows
        assert traj.shape == (2, 16 * 6)
        assert traj_as_pc.shape == (32, 6)
        assert set(np.unique(ids)) == {0, 1}
        # each flat row unpacks to poses of its own stroke only: y is
        # constant within a stroke in the fixture trajectories
        poses = traj.reshape(2, 16, 6)
        for s in range(2):
            assert np.allclose(poses[s, :, 1], poses[s, 0, 1], atol=1e-6)


class TestVelocities:
    def test_vel_appended_at_lambda1(self, legacy_root):
        ds = make(legacy_root, extra_data=("vel",), lambda_points=1,
                  overlapping=0)
        pc, traj, traj_as_pc, ids, _ = ds[0]
        assert traj.shape == (120, 6)
        # forward differences: traj[i, 3:] == traj[i+1, :3] - traj[i, :3]
        # inside a stroke, zero at the stroke boundary
        d = traj[1:, :3] - traj[:-1, :3]
        inside = ids[:-1] == ids[1:]
        np.testing.assert_allclose(traj[:-1][inside, 3:6], d[inside],
                                   atol=1e-9)
        boundary = np.nonzero(~inside)[0]
        np.testing.assert_allclose(traj[boundary, 3:6], 0.0)

    def test_vel_requires_lambda1(self, legacy_root):
        ds = make(legacy_root, extra_data=("vel",), lambda_points=4)
        with pytest.raises(AssertionError):
            ds[0]


class TestRotationAugmentations:
    def _unpad_poses(self, traj, lam=4, outdim=6):
        from maskplanner_tpu.data.pointcloud import remove_padding

        return remove_padding(traj.reshape(-1, outdim), ("orientnorm",))

    def test_rot_preserves_geometry(self, legacy_root):
        np.random.seed(3)
        plain = make(legacy_root)
        aug = make(legacy_root, augmentations=("rot",))
        pc0, traj0, pcpc0, ids0, _ = plain[0]
        pc1, traj1, pcpc1, ids1, _ = aug[0]
        np.testing.assert_array_equal(ids0, ids1)
        # rotation: norms preserved, coordinates changed
        np.testing.assert_allclose(np.linalg.norm(pc0, axis=1),
                                   np.linalg.norm(pc1, axis=1), atol=1e-9)
        assert not np.allclose(pc0, pc1)
        p0 = self._unpad_poses(traj0)
        p1 = self._unpad_poses(traj1)
        np.testing.assert_allclose(np.linalg.norm(p0[:, :3], axis=1),
                                   np.linalg.norm(p1[:, :3], axis=1),
                                   atol=1e-9)
        # orientation normals rotate with the same R: recover R from the
        # positions (Kabsch) and check it maps the normals too
        h = p0[:, :3].T @ p1[:, :3]
        u, _, vt = np.linalg.svd(h)
        r = (u @ vt).T
        if np.linalg.det(r) < 0:
            u[:, -1] *= -1
            r = (u @ vt).T
        np.testing.assert_allclose(p0[:, 3:6] @ r.T, p1[:, 3:6], atol=1e-6)
        # unit normals stay unit
        np.testing.assert_allclose(np.linalg.norm(p1[:, 3:6], axis=1), 1.0,
                                   atol=1e-6)

    def test_roty_fixes_y(self, legacy_root):
        np.random.seed(4)
        plain = make(legacy_root)
        aug = make(legacy_root, augmentations=("roty",))
        pc0 = plain[1][0]
        pc1 = aug[1][0]
        np.testing.assert_allclose(pc0[:, 1], pc1[:, 1], atol=1e-6)
        assert not np.allclose(pc0[:, 0], pc1[:, 0])

    def test_fresh_rotation_per_access(self, legacy_root):
        np.random.seed(5)
        aug = make(legacy_root, augmentations=("rot",))
        a = aug[0][0]
        b = aug[0][0]
        assert not np.allclose(a, b)  # cache holds the unrotated item

    def test_quat_rotation_rejected(self, legacy_root):
        with pytest.raises(NotImplementedError):
            make(legacy_root, extra_data=("orientquat",),
                 augmentations=("rot",))
