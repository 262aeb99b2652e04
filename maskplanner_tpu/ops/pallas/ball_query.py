"""Fused ball-query Pallas kernel.

Replaces the XLA path of ``ops.sampling.query_ball_point`` for large point
counts: the (S, N) squared-distance tile is computed and consumed entirely
in VMEM — the O(S·N) distance matrix (6.7 GB at the windows-v2 training
shape) never reaches HBM, and the sort/top-k over the full N axis becomes
K iterative masked-min extractions on the VPU.

Layout note: the point cloud is passed channel-sublane as (B, C, N) so the
minor (lane) axis is the large N — a channel-minor layout would pad C=3 up
to 128 lanes and blow VMEM 32×.

Semantics identical to the reference (models/pointnet2_utils.py:89-109):
for each query, the first ``nsample`` point indices (ascending) within
``radius``; empty slots filled with the first in-radius index.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e7  # > any point index, exactly representable in f32


def _kernel(xyz_ref, query_ref, out_ref, *, radius2: float, nsample: int):
    # xyz_ref: (1, C, N); query_ref: (1, C, TS); out_ref: (1, TS, nsample)
    # squared distances via per-coordinate broadcasting (VPU)
    d2 = None
    for c in range(3):
        qc = query_ref[0, c, :][:, None]     # (TS, 1)
        xc = xyz_ref[0, c, :][None, :]       # (1, N)
        diff = qc - xc                       # (TS, N)
        d2 = diff * diff if d2 is None else d2 + diff * diff

    within = d2 <= radius2
    # Mosaic iota is integer-only; cast for the f32 min-extraction below
    idx_f = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1).astype(jnp.float32)
    masked_idx = jnp.where(within, idx_f, _BIG)

    # first-K extraction: K successive mins above a running lower bound
    cols = []
    prev = jnp.full((d2.shape[0], 1), -1.0, jnp.float32)
    for _ in range(nsample):
        cand = jnp.where(masked_idx > prev, masked_idx, _BIG)
        cur = jnp.min(cand, axis=1)  # (TS,)
        cols.append(cur)
        prev = cur[:, None]
    out = jnp.stack(cols, axis=1)  # (TS, nsample) f32

    # empty slots -> first in-radius index; no point in radius -> 0
    first = out[:, :1]
    out = jnp.where(out >= _BIG, first, out)
    out = jnp.where(out >= _BIG, 0.0, out)
    out_ref[0] = out.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("radius", "nsample", "tile_s"))
def ball_query_pallas(radius: float, nsample: int, xyz: jax.Array,
                      new_xyz: jax.Array, tile_s: int = 128) -> jax.Array:
    """(B, N, 3), (B, S, 3) -> (B, S, nsample) int32."""
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    tile_s = min(tile_s, S)
    assert S % tile_s == 0, (S, tile_s)

    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)     # (B, 3, N)
    q_t = jnp.swapaxes(new_xyz.astype(jnp.float32), 1, 2)   # (B, 3, S)

    grid = (B, pl.cdiv(S, tile_s))
    return pl.pallas_call(
        functools.partial(_kernel, radius2=float(radius) ** 2,
                          nsample=nsample),
        out_shape=jax.ShapeDtypeStruct((B, S, nsample), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, N), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tile_s), lambda b, s: (b, 0, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_s, nsample), lambda b, s: (b, s, 0),
                               memory_space=pltpu.VMEM),
    )(xyz_t, q_t)
