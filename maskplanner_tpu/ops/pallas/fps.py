"""Farthest point sampling Pallas kernel.

The reference's FPS is a Python loop of ``npoint`` GPU launches
(models/pointnet2_utils.py:79-85); the XLA fallback here is a fori_loop of
fused ops. This kernel runs the entire iteration chain inside one Pallas
program with the point cloud and running min-distances resident in VMEM —
no per-iteration HBM traffic — and the per-step centroid gather becomes a
one-hot contraction on the VPU.

Layout: channel-sublane (BB, C, N) blocks (lane axis = N) with a grid over
batch chunks; batch-parallel distance updates keep the VPU fully occupied.

The farthest-point argmax is expressed as max + masked-min-of-f32-index
(ties -> smallest index, same as jnp.argmax): Mosaic fails to legalize
jnp.argmax's f32->i32 vector materialization when the lane axis is a
single 128-tile. Indices stay f32 throughout (exact for N < 2^24) and the
int cast happens outside the kernel. N is padded to the lane tile
explicitly with the padded columns' running distance pinned to -1 so they
can never be selected (implicit zero-padding would inject fake points at
the origin).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e10


def _kernel(xyz_ref, start_ref, out_ref, *, npoint: int, n_real: int):
    # xyz_ref: (BB, C, N); start_ref: (BB, 1) f32 start indices;
    # out_ref: (BB, npoint) f32 indices
    BB = xyz_ref.shape[0]
    N = xyz_ref.shape[2]
    x0 = xyz_ref[:, 0, :]  # (BB, N)
    x1 = xyz_ref[:, 1, :]
    x2 = xyz_ref[:, 2, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (BB, N), 1).astype(jnp.float32)
    col_out = jax.lax.broadcasted_iota(jnp.int32, (BB, npoint), 1)
    dist0 = jnp.where(col < n_real, jnp.float32(_BIG), -1.0)

    def body(i, carry):
        farthest, dist, acc = carry
        # record selection via one-hot accumulate (Mosaic has no unaligned
        # dynamic lane stores)
        acc = acc + jnp.where(col_out == i, farthest[:, None], 0.0)
        onehot = (col == farthest[:, None]).astype(jnp.float32)
        # per-coordinate centroid then squared distance (VPU)
        c0 = jnp.sum(onehot * x0, axis=1)[:, None]
        c1 = jnp.sum(onehot * x1, axis=1)[:, None]
        c2 = jnp.sum(onehot * x2, axis=1)[:, None]
        d = (x0 - c0) ** 2 + (x1 - c1) ** 2 + (x2 - c2) ** 2
        if n_real < N:
            # keep padded lanes pinned below every real distance
            dist = jnp.where(dist < 0, dist, jnp.minimum(dist, d))
        else:
            dist = jnp.minimum(dist, d)
        if N > 128:
            # native argmax (ties -> first index)
            nxt = jnp.argmax(dist, axis=-1).astype(jnp.float32)
        else:
            # Mosaic fails to legalize argmax's f32->i32 vector
            # materialization when the lane axis is a single 128-tile;
            # max + masked-min-of-f32-index is equivalent (~3x slower,
            # only used at these tiny shapes)
            m = jnp.max(dist, axis=-1, keepdims=True)
            nxt = jnp.min(jnp.where(dist >= m, col, jnp.float32(_BIG)),
                          axis=-1)
        return nxt, dist, acc

    _, _, acc = jax.lax.fori_loop(
        0, npoint, body,
        (start_ref[:, 0],
         dist0,
         jnp.zeros((BB, npoint), jnp.float32)))
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("npoint", "batch_tile"))
def fps_pallas(xyz: jax.Array, npoint: int, batch_tile: int | None = None,
               start: jax.Array | None = None) -> jax.Array:
    """(B, N, 3) -> (B, npoint) int32 FPS indices.

    start: optional (B,) int start indices (the reference starts from
    randint(0, N), pointnet2_utils.py:77); defaults to 0.
    """
    B, N, _ = xyz.shape
    # keep the batch tile at >= 8 sublanes even for tiny batches — Mosaic
    # can't lower some single-sublane broadcasts (observed at bt=1); the
    # batch axis is padded up instead. Wider tiles shorten the serial
    # grid chain (grid programs run back-to-back on the one core, so at
    # bt=8/B=64 the npoint-step dependency chain runs 8x over); bt=32
    # measures 1.68 vs 2.41 ms at the flagship shape, with diminishing
    # returns past 32 as the per-step vector work saturates the VPU.
    bt = batch_tile if batch_tile else min(32, max(8, -(-B // 8) * 8))
    pad_b = (-B) % bt
    pad_n = (-N) % 128
    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # (B, 3, N)
    if pad_b or pad_n:
        xyz_t = jnp.pad(xyz_t, ((0, pad_b), (0, 0), (0, pad_n)))
    if start is None:
        start_f = jnp.zeros((B + pad_b, 1), jnp.float32)
    else:
        start_f = jnp.pad(start.astype(jnp.float32), (0, pad_b)
                          ).reshape(B + pad_b, 1)

    out = pl.pallas_call(
        functools.partial(_kernel, npoint=npoint, n_real=N),
        out_shape=jax.ShapeDtypeStruct((B + pad_b, npoint), jnp.float32),
        grid=(pl.cdiv(B + pad_b, bt),),
        in_specs=[pl.BlockSpec((bt, 3, N + pad_n), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((bt, 1), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bt, npoint), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
    )(xyz_t, start_f)
    return out[:B].astype(jnp.int32)
