"""Import the reference implementation (/root/reference) under CPU torch.

The reference is a CUDA/pytorch3d codebase; this harness makes its *pure
Python/torch* modules importable on CPU so parity tests can compare this
repo's outputs against the reference's own code instead of re-derived
oracles (VERDICT.md round-1 item #1).

What gets stubbed (all unavailable in this container):
- ``pytorch3d``           — ``knn_points``/``knn_gather`` replaced by an
  exact ``torch.cdist``-based substitute. The padding/asymmetry semantics
  the chamfer variants rely on live in reference *Python*
  (pytorch3d_chamfer.py:138-342), so an exact NN search is a faithful
  drop-in: distances are squared L2 computed in float64 then cast,
  invalid columns masked with +inf, rows beyond ``lengths1`` zeroed —
  matching pytorch3d's documented contract.
- ``omegaconf``           — ``listconfig.ListConfig``/``DictConfig`` shims
  (the reference only isinstance-checks them in the modules we import).
- ``wandb``, ``pyvista``, ``point_cloud_utils`` — inert no-op stubs.
- ``torch.Tensor.cuda`` / ``torch.nn.Module.cuda`` — identity, so the
  reference's hard-coded ``.cuda()`` calls (loss_handler.py:838,
  pytorch3d_chamfer.py:203-233) run on CPU.

Nothing under /root/reference is modified; bytecode writing is disabled.
"""
from __future__ import annotations

import os
import sys
import types
from collections import namedtuple

REFERENCE = "/root/reference"

_KNN = namedtuple("KNN", ["dists", "idx", "knn"])


def _make_pytorch3d_stub(torch):
    def knn_points(p1, p2, lengths1=None, lengths2=None, K=1, version=-1,
                   return_nn=False, return_sorted=True, norm=2):
        N, P1, _ = p1.shape
        P2 = p2.shape[1]
        if lengths1 is None:
            lengths1 = torch.full((N,), P1, dtype=torch.int64)
        if lengths2 is None:
            lengths2 = torch.full((N,), P2, dtype=torch.int64)
        d = torch.cdist(p1.double(), p2.double()) ** 2  # (N, P1, P2)
        col_invalid = torch.arange(P2)[None, :] >= lengths2[:, None].cpu()
        d = d.masked_fill(col_invalid[:, None, :], float("inf"))
        dists, idx = d.topk(K, dim=2, largest=False)
        row_invalid = torch.arange(P1)[None, :] >= lengths1[:, None].cpu()
        dists = dists.masked_fill(row_invalid[..., None], 0.0)
        idx = idx.masked_fill(row_invalid[..., None], 0)
        dists = dists.to(p1.dtype)
        nn = knn_gather(p2, idx, lengths2) if return_nn else None
        return _KNN(dists=dists, idx=idx, knn=nn)

    def knn_gather(x, idx, lengths=None):
        N, P1, K = idx.shape
        U = x.shape[2]
        idx_exp = idx[..., None].expand(N, P1, K, U)
        return x[:, :, None, :].expand(N, x.shape[1], K, U).gather(
            1, idx_exp)

    pytorch3d = types.ModuleType("pytorch3d")
    ops = types.ModuleType("pytorch3d.ops")
    knn_mod = types.ModuleType("pytorch3d.ops.knn")
    structures = types.ModuleType("pytorch3d.structures")
    pc_mod = types.ModuleType("pytorch3d.structures.pointclouds")

    class Pointclouds:  # only isinstance-checked by the reference
        pass

    knn_mod.knn_points = knn_points
    knn_mod.knn_gather = knn_gather
    ops.knn = knn_mod
    ops.knn_points = knn_points
    ops.knn_gather = knn_gather
    pc_mod.Pointclouds = Pointclouds
    structures.pointclouds = pc_mod
    pytorch3d.ops = ops
    pytorch3d.structures = structures
    return {
        "pytorch3d": pytorch3d,
        "pytorch3d.ops": ops,
        "pytorch3d.ops.knn": knn_mod,
        "pytorch3d.structures": structures,
        "pytorch3d.structures.pointclouds": pc_mod,
    }


def _make_omegaconf_stub():
    om = types.ModuleType("omegaconf")
    lc = types.ModuleType("omegaconf.listconfig")
    dc = types.ModuleType("omegaconf.dictconfig")

    class ListConfig(list):
        pass

    class DictConfig(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

    class OmegaConf:
        @staticmethod
        def create(obj=None):
            if isinstance(obj, dict):
                return DictConfig(obj)
            if isinstance(obj, list):
                return ListConfig(obj)
            return DictConfig({})

        @staticmethod
        def to_container(cfg, **kw):
            return dict(cfg)

    lc.ListConfig = ListConfig
    dc.DictConfig = DictConfig
    om.listconfig = lc
    om.dictconfig = dc
    om.ListConfig = ListConfig
    om.DictConfig = DictConfig
    om.OmegaConf = OmegaConf
    return {"omegaconf": om, "omegaconf.listconfig": lc,
            "omegaconf.dictconfig": dc}


def _make_noop_module(name, attrs=()):
    mod = types.ModuleType(name)

    def _noop(*a, **k):
        return None

    for a in attrs:
        setattr(mod, a, _noop)
    return mod


def _install_networkx_edmonds_shim():
    """networkx >= 3.4 removed the ``Edmonds`` class the reference imports
    (utils/cluster.py:7). Reproduce the old
    ``find_optimum(kind='min', style='spanning arborescence')`` behavior:
    old style != 'branching' selected every node's best in-edge regardless
    of sign (spanning whenever possible, forest otherwise) — which modern
    ``minimal_branching`` implements via its uniform weight shift."""
    import networkx as nx
    from networkx.algorithms import tree
    from networkx.algorithms.tree import branchings

    if hasattr(tree, "Edmonds"):
        return

    class Edmonds:
        def __init__(self, G, seed=None):
            self.G = G

        def find_optimum(self, attr="weight", default=1, kind="max",
                         style="branching", preserve_attrs=False,
                         partition=None, seed=None):
            if kind not in ("min", "max"):
                raise nx.NetworkXException("Unknown value for `kind`.")
            if style == "branching":
                fn = (branchings.maximum_branching if kind == "max"
                      else branchings.minimum_branching)
                return fn(self.G, attr, default)
            if kind == "min":
                return branchings.minimal_branching(
                    self.G, attr=attr, default=default)
            # old code spans by shifting weights up uniformly for max-kind
            G2 = self.G.copy()
            shift = max((d.get(attr, default)
                         for _, _, d in G2.edges(data=True)), default=0)
            for _, _, d in G2.edges(data=True):
                d[attr] = d.get(attr, default) - shift - 1
            B = branchings.maximum_branching(G2, attr, default)
            for _, _, d in B.edges(data=True):
                d[attr] = d.get(attr, default) + shift + 1
            return B

    tree.Edmonds = Edmonds
    branchings.Edmonds = Edmonds


_installed = False


def install_stubs():
    global _installed
    if _installed:
        return
    os.environ.setdefault("MPLBACKEND", "Agg")
    import numpy as np

    # numpy 2.0 removed the ``np.round_`` alias the reference calls
    # (utils/pointcloud.py:536, utils/dataset/paintnet.py:233); restore it
    # so the reference's own code runs unmodified.
    if not hasattr(np, "round_"):
        np.round_ = np.round  # type: ignore[attr-defined]

    import torch

    # Identity .cuda() so the reference's hard-coded device moves run on CPU.
    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
    torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore[assignment]

    # Redirect explicit .to('cuda') moves (loss_handler.py:629) and
    # .get_device() round-trips (loss_handler.py:929-930) to CPU.
    def _cpu_device(a):
        if isinstance(a, str) and a.startswith("cuda"):
            return "cpu"
        if isinstance(a, torch.device) and a.type == "cuda":
            return torch.device("cpu")
        return a

    _orig_to = torch.Tensor.to

    def _to(self, *args, **kwargs):
        args = tuple(_cpu_device(a) for a in args)
        if "device" in kwargs:
            kwargs["device"] = _cpu_device(kwargs["device"])
        return _orig_to(self, *args, **kwargs)

    torch.Tensor.to = _to  # type: ignore[assignment]
    torch.Tensor.get_device = lambda self: "cpu"  # type: ignore[assignment]

    # The GAN/contrastive paths construct tensors *on* cuda directly:
    # ``torch.arange(..., device=torch.device('cuda'))`` (dgcnn.py:104-106),
    # ``torch.zeros(..., device='cuda')`` and ``torch.cuda.FloatTensor``
    # (loss_handler.py:511-518). Coerce the device kwarg at the factory
    # functions and alias the cuda tensor type so those run on CPU too.
    if not torch.cuda.is_available():
        torch.cuda.FloatTensor = torch.FloatTensor  # type: ignore[attr-defined]

        def _coerce_factory(orig):
            def f(*a, **k):
                if "device" in k:
                    k["device"] = _cpu_device(k["device"])
                return orig(*a, **k)
            return f

        for _fname in ("zeros", "ones", "arange", "rand", "randn",
                       "empty", "full"):
            setattr(torch, _fname, _coerce_factory(getattr(torch, _fname)))

    stubs = {}
    stubs.update(_make_pytorch3d_stub(torch))
    stubs.update(_make_omegaconf_stub())
    stubs["wandb"] = _make_noop_module(
        "wandb", ("init", "log", "finish", "watch", "save"))
    stubs["pyvista"] = _make_noop_module("pyvista", ("Plotter", "PolyData"))
    stubs["point_cloud_utils"] = _make_noop_module(
        "point_cloud_utils",
        ("load_mesh_vf", "sample_mesh_poisson_disk",
         "interpolate_barycentric_coords"))
    for name, mod in stubs.items():
        sys.modules.setdefault(name, mod)
    _install_networkx_edmonds_shim()
    _installed = True


def import_reference_models():
    """Import the reference's torch model zoo (models/ package).

    Used by the torch→Flax conversion tests to generate *real* reference
    ``state_dict``s instead of hand-built fakes.
    """
    install_stubs()
    sys.dont_write_bytecode = True
    added = REFERENCE not in sys.path
    if added:
        sys.path.insert(0, REFERENCE)
    try:
        from models import pointnet2_cls_ssg  # noqa: F401
    finally:
        if added and REFERENCE in sys.path:
            sys.path.remove(REFERENCE)
    return pointnet2_cls_ssg


def import_reference():
    """Make /root/reference importable and return it as a namespace.

    Returns an object with attributes: ``chamfer`` (pytorch3d_chamfer),
    ``loss_handler``, ``metrics_handler``, ``pointcloud`` (utils.pointcloud),
    ``cluster`` (utils.cluster), ``postprocessing`` (utils.postprocessing),
    ``paintnet_ODv1`` (utils.dataset.paintnet_ODv1).
    """
    install_stubs()
    sys.dont_write_bytecode = True
    # Insert the reference path only for the duration of the imports:
    # leaving it on sys.path would shadow same-named repo root modules
    # (train_maskplanner, render_results, ...) for later tests.
    added = REFERENCE not in sys.path
    if added:
        sys.path.insert(0, REFERENCE)
    try:
        import pytorch3d_chamfer  # noqa: F401
        import loss_handler  # noqa: F401
        import metrics_handler  # noqa: F401
        from utils import pointcloud, cluster, postprocessing  # noqa: F401
        from utils.dataset import paintnet_ODv1  # noqa: F401
    finally:
        if added and REFERENCE in sys.path:
            sys.path.remove(REFERENCE)

    ns = types.SimpleNamespace(
        chamfer=pytorch3d_chamfer,
        loss_handler=loss_handler,
        metrics_handler=metrics_handler,
        pointcloud=pointcloud,
        cluster=cluster,
        postprocessing=postprocessing,
        paintnet_ODv1=paintnet_ODv1,
    )
    return ns
