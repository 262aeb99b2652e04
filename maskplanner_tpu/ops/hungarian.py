"""On-device linear assignment (Hungarian / Jonker-Volgenant).

The reference solves every LAP on the host with scipy's
``linear_sum_assignment`` — inside the training loss (loss_handler.py:875,
:1734), the EMD matcher (models/hungarianMatcher.py:61) and postprocessing
(utils/postprocessing.py:522) — forcing a device→host sync every step. Here
the solve runs on-device under ``jit``/``vmap`` using the shortest
augmenting path (Jonker-Volgenant) algorithm with dense cost matrices; the
mask-matching matrices are tiny (≤ max_n_strokes ≈ 41 rows), so the O(n³)
scalar loop is negligible next to the model matmuls and removes the
per-step host round-trip entirely.

Rectangular problems (n_rows ≥ n_cols) are handled by padding the cost to
square with a large constant: every fake column has identical cost in all
rows, so the real columns' optimal assignment is unchanged.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

_INF = jnp.float32(1e18)


def _solve_square(cost: Array) -> Array:
    """JV shortest-augmenting-path on an (n, n) float32 cost matrix.

    Returns ``col4row``: for each row i, the assigned column. Matches
    scipy.optimize.linear_sum_assignment on square inputs (cost-optimal;
    ties may resolve to a different, equal-cost permutation).
    """
    n = cost.shape[0]
    cost = cost.astype(jnp.float32)

    def assign_row(carry, cur_row):
        u, v, col4row, row4col = carry

        # Dijkstra over columns from cur_row.
        shortest0 = jnp.full((n,), _INF)
        path0 = jnp.full((n,), -1, dtype=jnp.int32)
        scanned_cols0 = jnp.zeros((n,), dtype=bool)
        scanned_rows0 = jnp.zeros((n,), dtype=bool)

        def dij_cond(state):
            _, _, _, _, _, sink, _ = state
            return sink < 0

        def dij_body(state):
            shortest, path, s_cols, s_rows, i, sink, minval = state
            s_rows = s_rows.at[i].set(True)
            # tentative distances through row i
            d = minval + cost[i] - u[i] - v
            better = (d < shortest) & (~s_cols)
            shortest = jnp.where(better, d, shortest)
            path = jnp.where(better, i, path)
            # pick the unscanned column with smallest tentative distance
            cand = jnp.where(s_cols, _INF, shortest)
            j = jnp.argmin(cand).astype(jnp.int32)
            minval = cand[j]
            s_cols = s_cols.at[j].set(True)
            nxt_row = row4col[j]
            sink = jnp.where(nxt_row < 0, j, -1)
            i = jnp.where(nxt_row < 0, i, nxt_row)
            return shortest, path, s_cols, s_rows, i, sink, minval

        shortest, path, s_cols, s_rows, _, sink, minval = jax.lax.while_loop(
            dij_cond,
            dij_body,
            (shortest0, path0, scanned_cols0, scanned_rows0,
             cur_row.astype(jnp.int32), jnp.int32(-1), jnp.float32(0.0)),
        )

        # Potential updates (scipy rectangular_lsap scheme).
        u = u.at[cur_row].add(minval)
        other_rows = s_rows & (jnp.arange(n) != cur_row)
        # for scanned rows i != cur_row: u[i] += minval - shortest[col4row[i]]
        delta_r = minval - shortest[jnp.clip(col4row, 0, n - 1)]
        u = jnp.where(other_rows, u + delta_r, u)
        v = jnp.where(s_cols, v + shortest - minval, v)

        # Augment along the alternating path ending at sink.
        def aug_cond(state):
            _, _, j, done = state
            return ~done

        def aug_body(state):
            col4row_, row4col_, j, _ = state
            i = path[j]
            row4col_ = row4col_.at[j].set(i)
            prev_j = col4row_[i]
            col4row_ = col4row_.at[i].set(j)
            done = i == cur_row
            return col4row_, row4col_, prev_j, done

        col4row, row4col, _, _ = jax.lax.while_loop(
            aug_cond, aug_body, (col4row, row4col, sink, jnp.bool_(False))
        )
        return (u, v, col4row, row4col), None

    u0 = jnp.zeros((n,), jnp.float32)
    v0 = jnp.zeros((n,), jnp.float32)
    col4row0 = jnp.full((n,), -1, dtype=jnp.int32)
    row4col0 = jnp.full((n,), -1, dtype=jnp.int32)
    (_, _, col4row, _), _ = jax.lax.scan(
        assign_row, (u0, v0, col4row0, row4col0), jnp.arange(n)
    )
    return col4row


@jax.jit
def hungarian(
    cost: Array,
    col_mask: Array | None = None,
) -> tuple[Array, Array]:
    """Solve the LAP for a (possibly batched, possibly masked) cost matrix.

    Parameters
    ----------
    cost : (..., n_rows, n_cols) with n_rows >= n_cols after masking.
    col_mask : optional (..., n_cols) bool — invalid columns are treated as
        fake (constant large cost) and never matched to preferentially.

    Returns
    -------
    (row4col, matched) where ``row4col[..., j]`` is the row assigned to
    column j and ``matched[..., j]`` says whether column j was a real
    (unmasked) column. With k = #valid columns, exactly the k best rows are
    matched to the k valid columns at minimal total cost.
    """
    *batch, n_rows, n_cols = cost.shape
    n = max(n_rows, n_cols)

    flat_cost = cost.reshape((-1, n_rows, n_cols)).astype(jnp.float32)
    Bf = flat_cost.shape[0]
    flat_mask = (col_mask.reshape((-1, n_cols))
                 if col_mask is not None else None)

    # batched square padding: fake rows/columns cost the same `big` in
    # every position, so the real columns' optimal assignment is unchanged.
    # `big` must exceed n * max|cost| — with fake *rows* present
    # (n_rows < n_cols) the solver may otherwise trade one fewer real
    # pairing (saving `big`) against cheaper real pairs (costing up to
    # n * max|cost|), undershooting scipy's always-maximum-cardinality
    # rectangular matching.
    big = (
        jnp.max(jnp.abs(jnp.where(jnp.isfinite(flat_cost), flat_cost, 0.0)),
                axis=(-1, -2), keepdims=True) * (2.0 * n) + 1.0
    )  # (Bf, 1, 1)
    sq = jnp.broadcast_to(big, (Bf, n, n))
    real = flat_cost
    if flat_mask is not None:
        real = jnp.where(flat_mask[:, None, :], real,
                         jnp.broadcast_to(big, real.shape))
    sq = sq.at[:, :n_rows, :n_cols].set(real)

    from .sampling import _use_pallas

    # Kernel dispatch bounds: the kernel's row select is an O(n) scan per
    # Dijkstra step (O(n^3) sequential vector ops total). Measured wins
    # over the vmapped XLA JV across the full lane range on v5e (~17x at
    # the mask/stroke matching sizes n<=41+pad; 1.1-1.7x in the 64-128
    # band, e.g. n=96 B=64: 43.8 vs 75.1 ms, n=128 B=64: 61.0 vs
    # 100.4 ms). The whole padded (n, Bp, 128) cost plus carries live in
    # one un-gridded program, so the batch x n footprint must fit VMEM;
    # n > 128 exceeds the kernel's lane width and falls back (ops/sinkhorn
    # covers the large-set regime).
    Bp = max(8, -(-Bf // 8) * 8)
    fits_vmem = n * Bp * 128 * 4 <= (4 << 20)
    if _use_pallas() and n <= 128 and fits_vmem:
        # single-kernel batched JV: the whole batch advances in lockstep
        # inside one Pallas program (~17x over the vmapped XLA loop)
        from .pallas.lap import lap_jv_pallas

        # indices are integer/non-differentiable (the reference's scipy LAP
        # likewise); stop_gradient keeps autodiff from linearizing the
        # kernel, which has no VJP rule
        col4row = lap_jv_pallas(jax.lax.stop_gradient(sq))  # (Bf, n)
    else:
        col4row = jax.vmap(_solve_square)(sq)
    # invert the permutation: row4col[b, j] = row assigned to column j
    row4col = (
        jnp.zeros((Bf, n), jnp.int32)
        .at[jnp.arange(Bf)[:, None], col4row]
        .set(jnp.arange(n, dtype=jnp.int32)[None, :])
    )[:, :n_cols]

    matched = (flat_mask if flat_mask is not None
               else jnp.ones((Bf, n_cols), dtype=bool))
    row4col = row4col.reshape(*batch, n_cols)
    matched = matched.reshape(*batch, n_cols)
    return row4col, matched


def hungarian_cost(cost: Array, col_mask: Array | None = None) -> Array:
    """Total cost of the optimal assignment (for testing/metrics)."""
    row4col, matched = hungarian(cost, col_mask)
    gathered = jnp.take_along_axis(
        jnp.swapaxes(cost, -1, -2),  # (..., n_cols, n_rows)
        row4col[..., None],
        axis=-1,
    )[..., 0]
    return jnp.where(matched, gathered, 0.0).sum(axis=-1)
