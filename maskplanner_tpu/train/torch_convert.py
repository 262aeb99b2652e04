"""Torch-checkpoint → Flax parameter conversion (warm starts).

The reference warm-starts its encoder from a ShapeNet-pretrained torch
checkpoint and supports loading full run checkpoints for few-shot
transfer (reference models/__init__.py:386-426):

- ``init_from_pretrained``: loads ``pretrained_models/pointnet2_cls_ssg.pth``
  ``['model_state_dict']``, drops the classifier head
  (fc1/bn1/fc2/bn2/fc3) and loads the rest non-strict — i.e. exactly the
  sa1..sa3 encoder weights.
- ``init_from_pretrained_custom``: loads ``<run>/last_checkpoint.pth``
  ``['model']``; strict, or with fc3/fc_normals filtered when
  ``load_strict`` is false.

This module reproduces both against this repo's Flax trees so users can
carry actual reference ``.pth`` artifacts over. Torch layout → Flax:

- ``sa{i}.mlp_convs.{j}.weight`` (Cout, Cin, 1, 1) →
  ``encoder/sa{i}/PointMLP_0/Dense_{j}/kernel`` (Cin, Cout)
- ``sa{i}.mlp_bns.{j}.{weight,bias}`` → ``.../BatchNorm_{j}/{scale,bias}``;
  ``running_{mean,var}`` → the ``batch_stats`` collection
- heads (full-model only): ``fc1/fc2`` → ``head/Dense_0/1``, ``bn1/bn2`` →
  ``head/BatchNorm_0/1``, ``fc3`` → ``fc_out``, ``fc_normals`` →
  ``fc_normals``, ``sm_fc1/2`` → ``sm_head/Dense_0/1``, ``sm_bn1/2`` →
  ``sm_head/BatchNorm_0/1``, ``sm_fc3`` → ``sm_out``,
  ``mask_conf_out``/``out_confidence`` (retro twin,
  models/pointnet2_cls_ssg.py:410) → ``mask_conf_out``,
  ``seg_conf_fc1/2`` → ``seg_conf_head/Dense_0/1``,
  ``seg_conf_out`` → ``seg_conf_out``.

Torch ``nn.Linear`` stores (out, in); Flax ``Dense`` kernels are
(in, out) — weights are transposed. 1x1 ``Conv2d`` weights squeeze to the
same Linear layout. BatchNorm eps matches (1e-5 both sides).
"""
from __future__ import annotations

import pickle
import zipfile

import numpy as np

# --------------------------------------------------------------------------
# Minimal torch-free .pth reader (zip serialization format, torch >= 1.6 —
# the reference's supported range is torch 1.9-2.2, README.md:83-90).
# Importing torch into a live JAX process deadlocks in some environments
# (observed here: jax initialized first + import torch never returns), and a
# TPU-native runtime should not need torch at all; tensors are rebuilt from
# the archive's raw storages with numpy.
# --------------------------------------------------------------------------

_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class _Storage:
    def __init__(self, dtype, data):
        self.dtype = dtype
        self.data = data


def _rebuild_tensor(storage, storage_offset, size, stride, *unused):
    itemsize = np.dtype(storage.dtype).itemsize
    flat = np.frombuffer(storage.data, dtype=storage.dtype)
    if not size:
        return flat[storage_offset].copy()
    arr = np.lib.stride_tricks.as_strided(
        flat[storage_offset:],
        shape=tuple(size),
        strides=tuple(s * itemsize for s in stride),
    )
    return arr.copy()


def _rebuild_parameter(tensor, *unused):
    return tensor


class _TorchUnpickler(pickle.Unpickler):
    """Unpickler restricted to the handful of globals a state_dict needs."""

    def __init__(self, f, storages):
        super().__init__(f)
        self._storages = storages

    def find_class(self, module, name):  # noqa: D102
        if module == "torch._utils" and name in (
                "_rebuild_tensor_v2", "_rebuild_tensor"):
            return _rebuild_tensor
        if module == "torch._utils" and name == "_rebuild_parameter":
            return _rebuild_parameter
        if module == "torch" and name in _STORAGE_DTYPES:
            return _STORAGE_DTYPES[name]
        if module == "collections" and name == "OrderedDict":
            from collections import OrderedDict
            return OrderedDict
        raise pickle.UnpicklingError(
            f"refusing to unpickle {module}.{name} from torch checkpoint")

    def persistent_load(self, pid):  # noqa: D102
        # ('storage', dtype (resolved via find_class), key, location, numel)
        kind, dtype, key, _location, _numel = pid
        assert kind == "storage"
        return _Storage(dtype, self._storages[str(key)])


def read_torch_pth(path: str):
    """Load a torch zip-format ``.pth`` into nested dicts of numpy arrays.

    Torch-free equivalent of ``torch.load(path, map_location='cpu')`` for
    checkpoints containing only tensors/containers (state_dicts and the
    reference's ``{epoch, model, optimizer, ...}`` blobs).
    """
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl = [n for n in names if n.endswith("/data.pkl") or n == "data.pkl"]
        if not pkl:
            raise ValueError(
                f"{path} is not a torch zip-format checkpoint (torch<1.6 "
                f"legacy format is not supported; re-save with a modern torch)")
        prefix = pkl[0][: -len("data.pkl")]
        storages = {
            n[len(prefix) + len("data/"):]: zf.read(n)
            for n in names
            if n.startswith(f"{prefix}data/")
        }
        with zf.open(pkl[0]) as f:
            return _TorchUnpickler(f, storages).load()

# Classifier-head keys the reference strips from the ShapeNet checkpoint
# (models/__init__.py:394): everything that is not sa1..sa3.
SHAPENET_HEAD_KEYS = (
    "fc1.weight", "fc1.bias",
    "bn1.weight", "bn1.bias", "bn1.running_mean", "bn1.running_var",
    "bn1.num_batches_tracked",
    "fc2.weight", "fc2.bias",
    "bn2.weight", "bn2.bias", "bn2.running_mean", "bn2.running_var",
    "bn2.num_batches_tracked",
    "fc3.weight", "fc3.bias",
)

# Few-shot head filter (reference models/__init__.py:419: non-strict
# custom loads drop only the final output layers).
CUSTOM_FILTER_KEYS = (
    "fc3.weight", "fc3.bias", "fc_normals.weight", "fc_normals.bias",
)


def _to_numpy(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _head_mappings():
    """(torch prefix, flax path, kind) for the MaskPlanner-family heads.

    kind: 'linear' (transpose weight) or 'bn' (scale/bias + running stats).
    Flax paths are tuples into params (and batch_stats for 'bn').
    """
    m = [
        ("fc1", ("head", "Dense_0"), "linear"),
        ("bn1", ("head", "BatchNorm_0"), "bn"),
        ("fc2", ("head", "Dense_1"), "linear"),
        ("bn2", ("head", "BatchNorm_1"), "bn"),
        ("fc3", ("fc_out",), "linear"),
        ("fc_normals", ("fc_normals",), "linear"),
        ("sm_fc1", ("sm_head", "Dense_0"), "linear"),
        ("sm_bn1", ("sm_head", "BatchNorm_0"), "bn"),
        ("sm_fc2", ("sm_head", "Dense_1"), "linear"),
        ("sm_bn2", ("sm_head", "BatchNorm_1"), "bn"),
        ("sm_fc3", ("sm_out",), "linear"),
        ("mask_conf_out", ("mask_conf_out",), "linear"),
        # retro-compatible twin layer name (pointnet2_cls_ssg.py:410)
        ("out_confidence", ("mask_conf_out",), "linear"),
        ("seg_conf_fc1", ("seg_conf_head", "Dense_0"), "linear"),
        ("seg_conf_fc2", ("seg_conf_head", "Dense_1"), "linear"),
        ("seg_conf_out", ("seg_conf_out",), "linear"),
    ]
    return m


def _encoder_mappings():
    m = []
    for i in (1, 2, 3):
        for j in range(3):
            m.append((f"sa{i}.mlp_convs.{j}",
                      ("encoder", f"sa{i}", "PointMLP_0", f"Dense_{j}"),
                      "conv1x1"))
            m.append((f"sa{i}.mlp_bns.{j}",
                      ("encoder", f"sa{i}", "PointMLP_0", f"BatchNorm_{j}"),
                      "bn"))
    return m


def _get_path(tree, path):
    for p in path:
        if tree is None or p not in tree:
            return None
        tree = tree[p]
    return tree


def _set_leaf(tree, path, leaf, value):
    node = tree
    for p in path:
        node = node[p]
    if leaf not in node:
        raise KeyError("/".join(path) + f"/{leaf}")
    target = node[leaf]
    expect = np.shape(target)
    if tuple(expect) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {'/'.join(path)}/{leaf}: "
            f"model {tuple(expect)} vs checkpoint {tuple(value.shape)}")
    # .dtype without np.asarray: device arrays must not round-trip to host
    dtype = getattr(target, "dtype", None) or np.asarray(target).dtype
    node[leaf] = value.astype(dtype)


def _deepcopy_dicts(tree):
    if isinstance(tree, dict) or type(tree).__name__ == "FrozenDict":
        return {k: _deepcopy_dicts(v) for k, v in tree.items()}
    return tree


def convert_state_dict(state_dict, params, batch_stats=None,
                       include_heads: bool = False,
                       filter_keys=()):  # noqa: C901
    """Map a torch ``state_dict`` onto copies of (params, batch_stats).

    Returns ``(params, batch_stats, loaded_keys)``. Only keys present in
    both the state_dict and the target trees are written (the reference's
    ``strict=False`` contract); a shape mismatch raises. ``filter_keys``
    are dropped first (reference ``_filter_out_dict``).
    """
    params = _deepcopy_dicts(params)
    batch_stats = _deepcopy_dicts(batch_stats) if batch_stats else {}
    sd = {k: v for k, v in state_dict.items() if k not in set(filter_keys)}

    mappings = _encoder_mappings()
    if include_heads:
        mappings += _head_mappings()

    loaded = []
    for prefix, path, kind in mappings:
        if _get_path(params, path) is None:
            continue
        if kind in ("linear", "conv1x1"):
            wk, bk = f"{prefix}.weight", f"{prefix}.bias"
            if wk not in sd:
                continue
            w = _to_numpy(sd[wk])
            if kind == "conv1x1":
                w = w[:, :, 0, 0]
            _set_leaf(params, path, "kernel", np.ascontiguousarray(w.T))
            loaded.append(wk)
            if bk in sd:
                _set_leaf(params, path, "bias", _to_numpy(sd[bk]))
                loaded.append(bk)
        else:  # bn
            wk = f"{prefix}.weight"
            if wk not in sd:
                continue
            _set_leaf(params, path, "scale", _to_numpy(sd[wk]))
            _set_leaf(params, path, "bias", _to_numpy(sd[f"{prefix}.bias"]))
            loaded += [wk, f"{prefix}.bias"]
            mk, vk = f"{prefix}.running_mean", f"{prefix}.running_var"
            if batch_stats and mk in sd and _get_path(batch_stats,
                                                      path) is not None:
                _set_leaf(batch_stats, path, "mean", _to_numpy(sd[mk]))
                _set_leaf(batch_stats, path, "var", _to_numpy(sd[vk]))
                loaded += [mk, vk]
    return params, batch_stats, loaded


def load_torch_pretrained(path: str, state, mode: str = "encoder",
                          load_strict: bool = False):
    """Warm-start a train state from a reference torch ``.pth`` file.

    mode='encoder': ShapeNet classifier checkpoint
    (``['model_state_dict']``, reference init_from_pretrained) — loads
    sa1..sa3 only.
    mode='full': reference run checkpoint (``['model']``,
    init_from_pretrained_custom) — loads encoder + heads; when
    ``load_strict`` is false the fc3/fc_normals output layers keep their
    fresh init (reference models/__init__.py:415-420).
    """
    blob = read_torch_pth(path)
    if mode == "encoder":
        sd = blob.get("model_state_dict", blob)
        include_heads = False
        filter_keys = SHAPENET_HEAD_KEYS
    else:
        sd = blob.get("model", blob)
        include_heads = True
        filter_keys = () if load_strict else CUSTOM_FILTER_KEYS

    params, batch_stats, loaded = convert_state_dict(
        sd, state.params, state.batch_stats,
        include_heads=include_heads, filter_keys=filter_keys)
    if not loaded:
        raise ValueError(f"no convertible weights found in {path}")
    return state.replace(params=params, batch_stats=batch_stats), loaded
