"""Fused nearest-neighbour argmin Pallas kernel (chamfer front-end).

The XLA chamfer path materializes the (B, P1, P2) squared-distance matrix
in HBM and reads it back for min/argmin — ~0.9 GB of traffic per direction
at the containers-v2 training shape (B=64, 1333x1333 segments). This kernel
computes the distance tile on the MXU and consumes it immediately with an
argmin on the VPU, so only the O(B.P1) index vector ever leaves VMEM.

Only *indices* are produced: the matched distances are recomputed outside
by a gather + subtraction in pure JAX, which (a) is exact f32, and (b)
restores differentiability — the gradient of a min-distance w.r.t. both
endpoints flows through the gather exactly as it does through jnp.min
(argmin is piecewise constant). Replaces the CUDA ``knn_points`` (K=1)
dependency of the reference (pytorch3d_chamfer.py:12).

Layout: batch tiles of 8 (Mosaic requires the output's second-minor block
dim divisible by 8), x row-tiles (TS, D) and y transposed (D, P2) so each
per-batch contraction is a plain 2-D MXU dot; the additive column mask
folds invalid / padded y rows into +BIG before the argmin.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e10
_BT = 8  # batch tile


def _kernel(x_ref, yt_ref, mask_ref, out_ref):
    # x_ref: (BT, TS, D); yt_ref: (BT, D, P2); mask_ref: (BT, 1, P2) additive
    # out_ref: (BT, TS)
    rows = []
    for b in range(_BT):
        x = x_ref[b]    # (TS, D)
        yt = yt_ref[b]  # (D, P2)
        # argmin_j |x_i - y_j|^2 == argmin_j (|y_j|^2 - 2 x_i.y_j): the
        # |x_i|^2 row constant cannot change the winner, so it is skipped.
        cross = jax.lax.dot_general(
            x, yt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        y2 = jnp.sum(yt * yt, axis=0, keepdims=True)  # (1, P2)
        d2 = y2 - 2.0 * cross + mask_ref[b]           # (TS, P2)
        rows.append(jnp.argmin(d2, axis=1).astype(jnp.int32))
    out_ref[:] = jnp.stack(rows, axis=0)


@functools.partial(jax.jit, static_argnames=("tile_s",))
def nn_argmin_pallas(x: jax.Array, y: jax.Array,
                     y_mask: jax.Array | None = None,
                     tile_s: int = 128) -> jax.Array:
    """Index of the nearest y row for every x row.

    x: (B, P1, D); y: (B, P2, D); y_mask: optional (B, P2) bool validity
    -> (B, P1) int32 with values in [0, P2).
    """
    B, P1, D = x.shape
    P2 = y.shape[1]

    padb = (-B) % _BT
    pad1 = (-P1) % tile_s
    pad2 = (-P2) % 128
    # argmin is piecewise constant: keep the kernel out of the autodiff
    # graph (gradients flow through the caller's gather instead)
    x = jax.lax.stop_gradient(x)
    y = jax.lax.stop_gradient(y)
    xf = jnp.pad(x.astype(jnp.float32), ((0, padb), (0, pad1), (0, 0)))
    yf = jnp.pad(y.astype(jnp.float32), ((0, padb), (0, pad2), (0, 0)))
    valid = jnp.ones((B, P2), jnp.bool_) if y_mask is None else y_mask
    valid = jnp.pad(valid, ((0, padb), (0, pad2)))  # pad cols invalid
    add_mask = jnp.where(valid, 0.0, _BIG).astype(jnp.float32)[:, None, :]
    # fully padded batch rows would argmin over all-BIG columns; harmless
    # (sliced away below)

    yt = jnp.swapaxes(yf, 1, 2)  # (B+padb, D, P2+pad2)
    grid = ((B + padb) // _BT, (P1 + pad1) // tile_s)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B + padb, P1 + pad1), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BT, tile_s, D), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BT, D, P2 + pad2), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BT, 1, P2 + pad2), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BT, tile_s), lambda b, s: (b, s),
                               memory_space=pltpu.VMEM),
    )(xf, yt, add_mask)
    out = out[:B, :P1]
    if y_mask is not None:
        # XLA-fallback parity on degenerate rows: with NO valid column all
        # distances tie at +BIG and Mosaic's argmin does not break ties to
        # the first index (observed: returns the last tile's lane); pin
        # such rows to index 0 like jnp.argmin
        any_valid = y_mask.any(axis=-1, keepdims=True)
        out = jnp.where(any_valid, out, 0)
    return out
