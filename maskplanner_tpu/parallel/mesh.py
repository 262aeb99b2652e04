"""Mesh construction and sharding helpers."""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Batch-leading-axis sharding."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Place a host batch dict onto the mesh, sharded on the leading axis."""
    sharding = data_sharding(mesh, axis_name)
    scalar = NamedSharding(mesh, P())
    out = {}
    for k, v in batch.items():
        arr = np.asarray(v)
        out[k] = jax.device_put(arr, sharding if arr.ndim >= 1 else scalar)
    return out


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


# ---------------------------------------------------------------------------
# Multi-host (multi-process) data parallelism.
#
# The reference is single-GPU single-process (SURVEY.md §2.10); this layer is
# new design surface: each host materializes only its shard of the global
# batch, and ``shard_batch_global`` assembles the global jax.Array from the
# per-process local data — XLA's collectives handle the rest. On a single
# process this degenerates to ``shard_batch`` exactly.
# ---------------------------------------------------------------------------

def distributed_init():
    """Initialize multi-process JAX if a coordinator is configured (no-op
    otherwise). Call before any backend use on multi-host TPU pods.

    Config sources, in order:
    - ``JAX_COORDINATOR_ADDRESS`` + ``JAX_NUM_PROCESSES`` +
      ``JAX_PROCESS_ID``: explicit env-driven init (used by the in-repo
      2-process CPU dryrun, tests/test_parallel.py, and any launcher that
      exports them);
    - ``JAX_NUM_PROCESSES`` alone: defer to ``jax.distributed``'s cluster
      auto-detection (TPU pod metadata, SLURM, ...).

    On the CPU backend the cross-process collectives implementation is
    switched to gloo first — pure-CPU multi-process (virtual-device
    dryruns, CI) has no ICI/DCN transport otherwise.
    """
    import os

    num = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num > 1 or coord:
        if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        kwargs = {}
        if coord and os.environ.get("JAX_PROCESS_ID") is not None:
            kwargs = dict(coordinator_address=coord, num_processes=num,
                          process_id=int(os.environ["JAX_PROCESS_ID"]))
        jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def global_mesh(axis_name: str = "data") -> Mesh:
    """1-D data mesh over ALL devices of all processes."""
    return Mesh(np.array(jax.devices()), (axis_name,))


def shard_batch_global(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Assemble a globally-sharded batch from this process's local shard.

    Each process passes its LOCAL per-host batch (global_batch /
    process_count rows); the returned arrays are global jax.Arrays sharded
    on the leading axis across the full mesh. Single-process: identical
    result to ``shard_batch``.
    """
    sharding = data_sharding(mesh, axis_name)
    scalar = NamedSharding(mesh, P())
    out = {}
    for k, v in batch.items():
        arr = np.asarray(v)
        if arr.ndim == 0:
            out[k] = jax.device_put(arr, scalar)
        else:
            # each process holds global/process_count leading rows; the
            # global shape must be stated explicitly (the default takes
            # the local shape as global)
            gshape = (arr.shape[0] * jax.process_count(),) + arr.shape[1:]
            out[k] = jax.make_array_from_process_local_data(
                sharding, arr, gshape)
    return out


def host_shard_bounds(n: int, process_index: int | None = None,
                      process_count: int | None = None) -> tuple[int, int]:
    """Contiguous [start, stop) index range of this host's dataset shard.

    Equal-size shards (floor division) keep per-host batch shapes static;
    the at-most ``process_count - 1`` trailing samples are dropped, like a
    drop-last batch sampler.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = n // pc
    return pi * per, (pi + 1) * per


# ---------------------------------------------------------------------------
# Multi-slice data parallelism (DCN x ICI).
#
# A v5e pod slice scales over ICI; beyond one slice, slices connect over
# DCN. Pure data parallelism shards the batch over BOTH axes — XLA routes
# the gradient all-reduce hierarchically (reduce-scatter over ICI, then
# cross-slice all-reduce over DCN) from the sharding alone. No model-size
# pressure exists at this scale (<=40M params), so DP-only is the right
# multi-slice layout (SURVEY.md §2.10, §7).
# ---------------------------------------------------------------------------

def make_multislice_mesh(n_slices: int, per_slice: int | None = None,
                         axis_names: tuple[str, str] = ("dcn", "ici")) -> Mesh:
    """2-D (n_slices, per_slice) device mesh with the slow axis first.

    On real multi-slice TPU deployments uses
    ``mesh_utils.create_hybrid_device_mesh`` so the outer axis maps to DCN
    granules; elsewhere (single slice, CPU test meshes) falls back to a
    row-major reshape of the device list.
    """
    devices = jax.devices()
    per = per_slice or len(devices) // n_slices
    n = n_slices * per
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    try:
        from jax.experimental import mesh_utils

        dm = mesh_utils.create_hybrid_device_mesh(
            (1, per), (n_slices, 1), devices=devices[:n])
    except Exception:
        dm = np.array(devices[:n]).reshape(n_slices, per)
    return Mesh(dm, axis_names)


def multislice_data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch sharded across both mesh axes (pure DP over DCN x ICI)."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def shard_batch_multislice(batch: dict, mesh: Mesh) -> dict:
    """Like ``shard_batch`` but splitting the batch over both axes."""
    sharding = multislice_data_sharding(mesh)
    scalar = NamedSharding(mesh, P())
    return {k: jax.device_put(np.asarray(v),
                              sharding if np.asarray(v).ndim >= 1 else scalar)
            for k, v in batch.items()}
