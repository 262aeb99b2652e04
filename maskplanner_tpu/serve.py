"""Serving: trained run -> one-shot mesh-to-program inference + AOT export.

The reference's inference story is dataset-bound and three processes long
(``test_maskplanner.py`` .npy dumps -> ``render_results.py`` /
``standalone/from_pred_to_offline_v2.py``), and it can only run on items
already in a PaintNet split. This module is the production path: load a
trained run once, compile the forward once, then map arbitrary OBJ meshes
to executable robot programs in a single call. The compiled forward can
also be serialized ahead-of-time (``jax.export`` -> StableHLO bytes) and
served from the artifact alone — no Flax model code, no checkpoint — on
any platform the artifact was lowered for (TPU and/or CPU).

Reference anchors: mesh preprocessing mirrors the dataset item pipeline
(utils/dataset/paintnet_ODv1.py:196-243 — sample ~10k, center on the mesh
vertex centroid, per-dataset downscale, subsample to ``pc_points``);
program export mirrors standalone/from_pred_to_offline_v2.py:101-191
(postprocess -> denormalize -> orientnorm->Euler -> ``;``-CSV rows) —
with one improvement: the mesh is in hand here, so programs are exported
at the true workspace position (the offline tool exports around the
origin because the dumps do not carry the centroid).
"""
from __future__ import annotations

import os

import numpy as np

from .data.io import (
    DATASET_DOWNSCALE_FACTORS,
    get_dataset_name,
    get_mean_mesh,
    orientnorm_to_euler,
    read_mesh_as_pointcloud,
    save_traj_file,
)
from .data.pointcloud import denormalize_traj, get_dim_traj_points
from .utils.config import Config, load_config


def resolve_scale(config, data_scale_factor: float | None = None,
                  allow_probe: bool = True) -> float:
    """Workspace -> model-space downscale factor for a frozen run config.

    Resolution order: explicit override > frozen ``data_scale_factor`` >
    the per-category measured constant (reference utils/disk.py:16-43) >
    a dataset probe (same rule as ``PaintDataset._compute_scale``, needs
    the dataset on disk). ``normalization: none`` is always 1.0.
    """
    if data_scale_factor:
        return float(data_scale_factor)
    if config.get("normalization") == "none":
        return 1.0
    if config.get("data_scale_factor"):
        return float(config["data_scale_factor"])
    known = DATASET_DOWNSCALE_FACTORS.get(get_dataset_name(config["dataset"]))
    if known is not None:
        return float(known)
    if allow_probe:
        from .data.dataset import PaintDataset

        probe = config.copy()
        probe["data_scale_factor"] = None
        return float(PaintDataset(probe, split="train").scale)
    raise ValueError(
        f"no downscale factor known for {config['dataset']}; pass "
        f"data_scale_factor explicitly")


class Predictor:
    """A loaded run: frozen config + restored checkpoint + jitted forward.

    >>> pred = Predictor(run_dir, model="best")
    >>> rows = pred.predict_program("window_031.obj")   # (N, 7) X..C+strokeId
    >>> pred.save_program("window_031.obj", "programs/window_031.txt")
    """

    def __init__(self, run_dir: str, model: str = "last",
                 data_scale_factor: float | None = None,
                 compute_dtype: str | None = None):
        """``compute_dtype``: None keeps the run's training dtype;
        "bf16"/"f32" overrides the forward's compute dtype (params are
        f32 either way, so any checkpoint loads under any override).
        bf16 is the qualified serving default of the CLI driver: the
        clean round-5 record measures it consistently faster than f32
        (6141 vs 5523 pc/s at batch 64, docs/bench_r5_clean.json) at
        traj rel-err ~7e-3 (bf16 rounding class, docs/kernels.md)."""
        import jax

        from .models import get_model
        from .train import checkpoints, create_train_state
        from .train.trainer import make_forward
        from .utils import set_seed
        from .utils.config import apply_retrocompat_defaults

        self.run_dir = run_dir
        self.config = apply_retrocompat_defaults(load_config(run_dir))
        if compute_dtype is not None:
            assert compute_dtype in ("bf16", "f32"), compute_dtype
            self.config["model"]["bf16"] = compute_dtype == "bf16"
        self.pc_points = int(self.config["pc_points"])
        self.extra_data = list(self.config["extra_data"])
        self.outdim = get_dim_traj_points(self.extra_data)
        self.scale = resolve_scale(self.config, data_scale_factor)

        rng = set_seed(self.config.get("seed"))
        net = get_model(self.config)
        sample = np.zeros((1, self.pc_points, 3), np.float32)
        state = create_train_state(net, self.config, rng, sample)
        name = checkpoints.checkpoint_name(model)
        assert checkpoints.checkpoint_exists(run_dir, name), \
            f"checkpoint {name} not found in {run_dir}"
        self.state, self.epoch = checkpoints.load_checkpoint(
            run_dir, name, state)
        self._model = net
        self._forward = make_forward(net)
        self._jax = jax

    # -- preprocessing (paintnet_ODv1.py:196-243 semantics) -----------------
    def preprocess(self, mesh_file: str, n_raw_points: int = 10000):
        """OBJ -> (normalized (pc_points, 3) float32 cloud, centroid)."""
        pc = read_mesh_as_pointcloud(mesh_file, n_raw_points)
        centroid = get_mean_mesh(mesh_file)
        pc = (pc - centroid) / self.scale
        if pc.shape[0] > self.pc_points:
            choice = np.random.default_rng(0).choice(
                pc.shape[0], self.pc_points, replace=False)
            pc = pc[choice]
        assert pc.shape[0] == self.pc_points, (
            f"mesh yielded {pc.shape[0]} < pc_points={self.pc_points} "
            f"samples; raise n_raw_points")
        return pc.astype(np.float32), centroid

    def forward(self, pc_batch: np.ndarray):
        """Jitted model forward on a (B, pc_points, 3) normalized batch."""
        return self._forward(self.state, pc_batch)

    # -- one-shot pipeline ---------------------------------------------------
    def predict_program(self, mesh_file: str, postprocess: bool = True,
                        keep_centroid: bool = True, cover_all: bool = True):
        """Mesh file -> (rows (N, 7) workspace-scale X;Y;Z;A;B;C;strokeId).

        Full pipeline: sample+normalize -> forward -> stroke-mask
        postprocess (mask->ids -> greedy filter -> Edmonds concat ->
        resample/smooth, reference utils/postprocessing.py:92-324) ->
        denormalize -> orientnorm->Euler.

        ``cover_all`` (default True — the serving default): execute ALL
        predicted segments by splitting off-Edmonds-path segments into
        sub-strokes instead of silently dropping them like the reference
        (utils/cluster.py:83-89). Measured on held-out fixtures this is
        the difference between ~89-96% and ≥99% paint coverage
        (docs/floor_rootcause.md). Pass False for reference parity.
        """
        from .postprocess import process_pred_stroke_masks_to_stroke_ids
        from .postprocess.segments import process_stroke_segments

        assert "orientnorm" in self.extra_data, (
            "program export needs orientnorm poses (reference "
            "from_pred_to_offline_v2.py exports Euler from normals)")
        pc, centroid = self.preprocess(mesh_file)
        out = self.forward(pc[None])
        traj = np.asarray(out.traj, np.float64)
        ids = process_pred_stroke_masks_to_stroke_ids(
            np.asarray(out.stroke_masks), np.asarray(out.mask_scores))
        if postprocess:
            trajs, out_ids = process_stroke_segments(traj, ids, self.config,
                                                     cover_all=cover_all)
            pts, pt_ids = np.asarray(trajs[0]), np.asarray(out_ids[0])
        else:
            rows, rid = traj[0], np.asarray(ids[0])
            valid = ~np.all(rows == -100.0, axis=-1)
            lam = rows.shape[-1] // self.outdim
            pts = rows[valid].reshape(-1, self.outdim)
            pt_ids = np.repeat(rid[valid], lam)
        pts = denormalize_traj(
            pts, centroid=centroid if keep_centroid else np.zeros(3),
            scale=self.scale,
            weight_orient=self.config["weight_orient"])
        euler = orientnorm_to_euler(pts[:, 3:6])
        return np.concatenate(
            [pts[:, :3], euler, np.asarray(pt_ids, np.float64)[:, None]],
            axis=1)

    def save_program(self, mesh_file: str, out_path: str, **kw) -> str:
        rows = self.predict_program(mesh_file, **kw)
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        save_traj_file(rows, out_path, kind="euler")
        return out_path

    # -- AOT export (jax.export -> StableHLO) --------------------------------
    def export_compiled(self, path: str, batch: int = 1,
                        platforms: list[str] | None = None) -> bytes:
        """Serialize the inference forward as a self-contained StableHLO
        artifact (weights folded in as constants). ``platforms`` lowers
        for specific backends (e.g. ``["tpu", "cpu"]``); default is the
        current backend. Load with :func:`load_exported` — no model code
        or checkpoint needed at serving time."""
        import jax
        from jax import export as jexport

        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        fn = jax.jit(lambda pc: tuple(
            self._model.apply(variables, pc, train=False)))
        spec = jax.ShapeDtypeStruct((batch, self.pc_points, 3), np.float32)
        exported = jexport.export(
            fn, platforms=platforms)(spec)
        blob = exported.serialize()
        with open(path, "wb") as fh:
            fh.write(blob)
        return blob


def load_exported(path: str):
    """Load a :meth:`Predictor.export_compiled` artifact -> callable
    ``fn(pc_batch) -> (traj, stroke_masks, mask_scores, seg_confidence)``.
    """
    from jax import export as jexport

    with open(path, "rb") as fh:
        exported = jexport.deserialize(fh.read())

    def fn(pc_batch):
        return exported.call(np.asarray(pc_batch, np.float32))

    return fn
