"""Collate semantic parity vs the reference's Paintnet_ODv1_CollateBatch.

This repo's dataset pads every sample to a *static per-category budget*
(TPU redesign: no dynamic batch-max shapes); the reference pads to the
batch max. The parity contract is therefore semantic: the reference's
collated batch must equal the repo's batch cropped to the reference's
(batch-max) shape — identical valid rows AND identical −100/−1 padding in
the overlap region.
"""
import sys

import numpy as np

sys.path.insert(0, "tests")
from ref_harness import import_reference  # noqa: E402

ref = import_reference()

from maskplanner_tpu.data.dataset import collate as mp_collate  # noqa: E402
from maskplanner_tpu.data import extras as mp_extras  # noqa: E402

DictConfig = sys.modules["omegaconf"].DictConfig

PAD = -100.0


def _samples(rng, B=3, D=12, outdim=3):
    """Per-sample dicts in the reference's __getitem__ layout (unpadded,
    variable segment/point counts) plus the same data padded to this
    repo's static budgets."""
    seg_budget, pt_budget = 40, 160
    ref_items, mp_items = [], []
    seg_counts = [17, 31, 24]
    for b in range(B):
        n_seg = seg_counts[b]
        n_pts = n_seg * 4
        pc = rng.normal(size=(64, 3)).astype(np.float64)
        traj = rng.normal(size=(n_seg, D)).astype(np.float64)
        ids = np.sort(rng.integers(0, 4, size=n_seg)).astype(np.float64)
        pts = rng.normal(size=(n_pts, outdim)).astype(np.float64)
        ids_pc = np.sort(rng.integers(0, 4, size=n_pts)).astype(np.float64)
        ref_items.append(dict(point_cloud=pc, traj=traj, traj_as_pc=pts,
                              stroke_ids=ids, stroke_ids_as_pc=ids_pc,
                              dirname=f"s{b}", n_strokes=4))
        t = np.full((seg_budget, D), PAD, np.float32)
        t[:n_seg] = traj
        i = np.full((seg_budget,), -1.0, np.float32)
        i[:n_seg] = ids
        p = np.full((pt_budget, outdim), PAD, np.float32)
        p[:n_pts] = pts
        ip = np.full((pt_budget,), -1.0, np.float32)
        ip[:n_pts] = ids_pc
        mp_items.append(dict(point_cloud=pc.astype(np.float32), traj=t,
                             stroke_ids=i, traj_as_pc=p, stroke_ids_as_pc=ip,
                             n_strokes=np.int32(4)))
    return ref_items, mp_items


def test_collate_semantic_parity(rng):
    ref_items, mp_items = _samples(rng)
    cfg = DictConfig(dict(traj_with_equally_spaced_points=True,
                          load_extra_data=[], out_prototypes=None))
    ref_batch = ref.paintnet_ODv1.Paintnet_ODv1_CollateBatch(cfg)(ref_items)
    mp_batch = mp_collate(mp_items)

    for key, ids_key in (("traj", "stroke_ids"),
                         ("traj_as_pc", "stroke_ids_as_pc")):
        ref_arr = ref_batch[key].numpy()
        mp_arr = mp_batch[key]
        assert mp_arr.shape[1] >= ref_arr.shape[1], "budget below batch max"
        np.testing.assert_allclose(mp_arr[:, : ref_arr.shape[1]], ref_arr,
                                   rtol=1e-6,
                                   err_msg=f"{key} valid+pad region differs")
        # beyond batch max, the static budget must keep padding
        assert np.all(mp_arr[:, ref_arr.shape[1]:] == PAD)

        ref_ids = ref_batch[ids_key].numpy()
        mp_ids = mp_batch[ids_key]
        np.testing.assert_array_equal(mp_ids[:, : ref_ids.shape[1]], ref_ids)
        assert np.all(mp_ids[:, ref_ids.shape[1]:] == -1)

    np.testing.assert_allclose(mp_batch["point_cloud"],
                               ref_batch["point_cloud"].numpy(), rtol=1e-6)
    assert list(mp_batch["n_strokes"]) == list(ref_batch["n_strokes"])


def test_get_vectors_per_stroke_parity(rng):
    n = 37
    traj = rng.normal(size=(n, 12))
    ids = np.sort(rng.integers(0, 5, size=n)).astype(float)
    ids[-4:] = -1  # fake rows are discarded
    ref_strokes, ref_order = ref.paintnet_ODv1.get_vectors_per_stroke(
        traj.copy(), ids.copy())
    mp_strokes, order = mp_extras.get_vectors_per_stroke(traj.copy(),
                                                         ids.copy())
    assert len(ref_strokes) == len(mp_strokes)
    np.testing.assert_array_equal(order, ref_order)
    for a, b in zip(mp_strokes, ref_strokes):
        np.testing.assert_allclose(a, b)
