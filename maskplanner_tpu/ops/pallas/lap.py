"""Batched exact linear assignment (Jonker-Volgenant) as one TPU kernel.

The training loss solves a LAP per sample every step (stroke-mask
matching, loss_handler.py:857-877 in the reference — there a host scipy
call; here on-device). The pure-XLA JV in ``ops/hungarian.py`` is exact
but latency-bound: vmap-of-while runs ~n² tiny lockstep steps, each with
XLA loop overhead (~6 ms for 64×22×22 on v5e). This kernel runs the same
shortest-augmenting-path algorithm entirely inside one Pallas program:

- the whole batch advances in lockstep as (B, 128)-lane vector ops on the
  VPU — one iteration costs nanoseconds instead of a loop dispatch;
- all data-dependent control flow (Dijkstra early exit, augmenting path
  walk) becomes fixed-trip ``fori_loop``s with done-masking, so every
  sample executes an identical instruction stream;
- scalar-indexed reads/writes (``u[i]``, ``row4col[j] = i``) become
  one-hot lane selects — Mosaic has no unaligned dynamic lane stores;
- per-sample scalars are carried as 1-D ``(B,)`` vectors (the working
  pattern from the FPS kernel; ``(B, 1)`` loop carries hit an invalid
  non-replicated→replicated relayout in Mosaic) and broadcast transiently
  with ``[:, None]``;
- row/column indices are carried as f32 (exact for n ≤ 2²⁴), which
  sidesteps int/bool vector legalization pitfalls on the lane axis.

Exactness: identical update rules to ``ops.hungarian._solve_square``
(scipy's rectangular_lsap scheme), so the assignment is cost-optimal; ties
may resolve to a different equal-cost permutation than scipy.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl

LN = 128           # lane width: max square problem size per kernel
_INF = 1e30        # python float: jnp scalars would be captured kernel consts


def _lap_kernel(n: int, cost_ref, out_ref):
    """cost_ref: (n, B, LN) f32, row-major-outer so a per-sample row select
    is a fori over static leading-dim slices (no 3D vector ops — Mosaic
    rejects middle-dim insertions like ``x[:, None, :]``);
    out_ref: (B, LN) f32 col4row (assigned column per row lane)."""
    B = cost_ref.shape[1]
    # Mosaic iota must be integer; cast to f32 for index math
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, LN), 1).astype(jnp.float32)
    valid = lane < n

    u0 = jnp.zeros((B, LN), jnp.float32)
    v0 = jnp.zeros((B, LN), jnp.float32)
    col4row0 = jnp.full((B, LN), -1.0, jnp.float32)
    row4col0 = jnp.full((B, LN), -1.0, jnp.float32)

    def outer(cur_row, state):
        u, v, col4row, row4col = state
        cur_f = cur_row.astype(jnp.float32)
        cur_lane = lane == cur_f                     # (B, LN)

        shortest0 = jnp.full((B, LN), jnp.float32(_INF))
        path0 = jnp.full((B, LN), -1.0, jnp.float32)
        # invalid lanes start "scanned" so they can never be selected
        scols0 = jnp.where(valid, 0.0, 1.0)
        srows0 = jnp.zeros((B, LN), jnp.float32)
        i0 = jnp.full((B,), cur_f)                   # Dijkstra row pointer
        minval0 = jnp.zeros((B,), jnp.float32)
        sink0 = jnp.full((B,), -1.0, jnp.float32)

        def dij(_, dstate):
            shortest, path, s_cols, s_rows, i, minval, sink = dstate
            live = sink[:, None] < 0.0               # (B, 1) still running
            # (minor-dim insertion must happen on the f32, not the i1 mask)
            i_lane = lane == i[:, None]              # (B, LN)
            s_rows = jnp.where(i_lane & live, 1.0, s_rows)
            # cost[b, i_b, :]: accumulate static row slices masked by a
            # per-sample f32 one-hot (all 2-D (B, LN) ops)
            def pick_row(k, acc):
                sel = jnp.where(i == k.astype(jnp.float32), 1.0, 0.0)
                return acc + sel[:, None] * cost_ref[k]
            cost_row = jax.lax.fori_loop(
                0, n, pick_row, jnp.zeros((B, LN), jnp.float32))
            u_i = jnp.sum(jnp.where(i_lane, u, 0.0), axis=-1)     # (B,)
            d = (minval - u_i)[:, None] + cost_row - v
            better = (d < shortest) & (s_cols == 0.0) & live
            shortest = jnp.where(better, d, shortest)
            path = jnp.where(better, i[:, None], path)
            cand = jnp.where(s_cols == 1.0, jnp.float32(_INF), shortest)
            mv = jnp.min(cand, axis=-1)              # (B,)
            # argmin as min-of-masked-f32-lane-index (no vector argmin)
            j = jnp.min(jnp.where(cand <= mv[:, None], lane,
                                  jnp.float32(LN)), axis=-1)      # (B,)
            j_lane = lane == j[:, None]
            minval = jnp.where(sink < 0.0, mv, minval)
            s_cols = jnp.where(j_lane & live, 1.0, s_cols)
            nxt = jnp.sum(jnp.where(j_lane, row4col, 0.0), axis=-1)
            sink = jnp.where(sink < 0.0,
                             jnp.where(nxt < 0.0, j, -1.0), sink)
            i = jnp.where((sink >= 0.0) | (nxt < 0.0), i, nxt)
            return shortest, path, s_cols, s_rows, i, minval, sink

        shortest, path, s_cols, s_rows, _, minval, sink = jax.lax.fori_loop(
            0, n, dij,
            (shortest0, path0, scols0, srows0, i0, minval0, sink0),
        )

        # potential updates (scipy rectangular_lsap scheme)
        u = jnp.where(cur_lane, u + minval[:, None], u)
        # scanned rows r != cur_row: u[r] += minval - shortest[col4row[r]]
        # per-lane gather shortest[col4row]: n-step accumulation of
        # lane-broadcast scalars (keeps everything 2-D)
        def gather_short(k, acc):
            kf = k.astype(jnp.float32)
            s_k = jnp.sum(jnp.where(lane == kf, shortest, 0.0), axis=-1)
            return acc + jnp.where(col4row == kf, s_k[:, None], 0.0)
        s_at_c4r = jax.lax.fori_loop(
            0, n, gather_short, jnp.zeros((B, LN), jnp.float32))
        other = (s_rows == 1.0) & ~cur_lane
        u = jnp.where(other, u + minval[:, None] - s_at_c4r, u)
        v = jnp.where(s_cols == 1.0, v + shortest - minval[:, None], v)

        # augment along the alternating path ending at sink
        adone0 = jnp.zeros((B,), jnp.float32)

        def aug(_, astate):
            col4row_, row4col_, j, adone = astate
            go = adone[:, None] == 0.0
            j_lane = lane == j[:, None]
            i = jnp.sum(jnp.where(j_lane, path, 0.0), axis=-1)    # (B,)
            i_lane = lane == i[:, None]
            row4col_ = jnp.where(j_lane & go, i[:, None], row4col_)
            prev_j = jnp.sum(jnp.where(i_lane, col4row_, 0.0), axis=-1)
            col4row_ = jnp.where(i_lane & go, j[:, None], col4row_)
            adone = jnp.maximum(adone, (i == cur_f).astype(jnp.float32))
            j = jnp.where(adone == 1.0, j, prev_j)
            return col4row_, row4col_, j, adone

        col4row, row4col, _, _ = jax.lax.fori_loop(
            0, n, aug, (col4row, row4col, sink, adone0)
        )
        return u, v, col4row, row4col

    _, _, col4row, _ = jax.lax.fori_loop(
        0, n, outer, (u0, v0, col4row0, row4col0)
    )
    out_ref[:, :] = col4row


@functools.partial(jax.jit, static_argnames=("interpret",))
def lap_jv_pallas(cost: Array, interpret: bool = False) -> Array:
    """Solve a batch of square LAPs exactly on-device in one kernel.

    cost: (B, n, n) float32, n <= 128. Returns col4row (B, n) int32 —
    the column assigned to each row (a permutation).
    """
    B, n, n2 = cost.shape
    assert n == n2 and n <= LN, (n, n2)
    # batch to a sublane multiple; lanes padded to LN (padded lanes are
    # masked off inside the kernel, padded batch rows solve a 0-cost LAP)
    Bp = max(8, -(-B // 8) * 8)
    padded = jnp.zeros((n, Bp, LN), jnp.float32)
    padded = padded.at[:, :B, :n].set(
        jnp.swapaxes(cost.astype(jnp.float32), 0, 1))
    out = pl.pallas_call(
        functools.partial(_lap_kernel, n),
        out_shape=jax.ShapeDtypeStruct((Bp, LN), jnp.float32),
        interpret=interpret,
    )(padded)
    return out[:B, :n].astype(jnp.int32)
