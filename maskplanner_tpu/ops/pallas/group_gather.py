"""Fused ball-query + neighbourhood gather Pallas kernel.

The PointNet++ grouping path is the encoder's dominant cost on TPU: XLA
lowers the (B, S, K)-indexed row gathers of width-3/width-128 rows to
tile-granular DMAs (a (1,3) row costs a full (8,128) tile), measured at
6.4 ms (sa1) and most of sa2's 10 ms at the flagship training shape. This
kernel keeps the whole pipeline in VMEM: squared distances on the VPU,
first-K in-radius index extraction by iterative masked min, and the
neighbour *values* (coordinates + features) extracted with per-k one-hot
MXU contractions — HBM sees only the final (B, C, K, S) block.

Index semantics match ``ops.sampling.query_ball_point`` exactly
(reference models/pointnet2_utils.py:89-109): first ``nsample`` in-radius
indices ascending; empty slots repeat the first in-radius neighbour; a
query with no in-radius point falls back to index 0.

Differentiability: the forward also emits the chosen indices, and a
``jax.custom_vjp`` wrapper routes the backward through a scatter-add over
those indices (exactly the gradient of the take-based path). Gradients
w.r.t. query positions/radius do not exist on this op (indices are
piecewise constant, and gathered values depend only on the source table).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e7  # > any point index, exactly representable in f32


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.DEFAULT)


def _kernel(xt_ref, qt_ref, *refs, radius2: float, K: int, block_w: int = 0,
            single_pass: bool = False, packed_lo: bool = False):
    # xt_ref: (1, C, N) channels (rows 0..2 = xyz); qt_ref: (1, 3, TS)
    # refs: [xtb (1, C_pad*block_w, N/block_w) if block_w], out_ref
    # (1, C, K, TS), idx_ref (1, K, TS)
    xtb_ref = refs[0] if block_w else None
    out_ref, idx_ref = refs[-2], refs[-1]
    xt = xt_ref[0]                      # (C, N)
    N = xt.shape[1]
    TS = qt_ref.shape[2]

    d2 = None
    for c in range(3):
        qc = qt_ref[0, c, :][:, None]   # (TS, 1)
        xc = xt[c, :][None, :]          # (1, N)
        diff = qc - xc
        d2 = diff * diff if d2 is None else d2 + diff * diff

    within = d2 <= radius2
    idx_f = jax.lax.broadcasted_iota(jnp.int32, (TS, N), 1).astype(jnp.float32)
    masked_idx = jnp.where(within, idx_f, _BIG)

    # value extraction: exact two-pass bf16 hi/lo one-hot contractions
    # (one-hot factors exact in bf16; hi+lo rebuilds f32 to ~1e-5 rel),
    # ~3x cheaper than a HIGHEST-precision f32 contraction. Narrow
    # channel counts use the two-stage block gather (see fused_sa.py):
    # block one-hot over N/block_w columns, then in-block lane select +
    # constant segment-sum matmul. ``single_pass`` skips the lo
    # contraction — values land bf16-rounded, which is exactly the
    # rounding a bf16 consumer applies anyway (bf16 models' MLPs cast
    # the grouped tensor to bf16), at half the extraction MXU work.
    # ``packed_lo`` gets the same halving WITHOUT giving up the lo bits:
    # when 2C fits the 8-sublane channel padding (sa1: C=3, c_pad=8), the
    # caller packs the lo channels into the otherwise-zero padding rows,
    # so the single hi contraction extracts hi AND lo and the final
    # per-channel add rebuilds f32 — exact two-pass values at single-pass
    # MXU cost (the block table stays one 128-row MXU tile either way).
    if block_w:
        xtb = xtb_ref[0]
        xtb_hi = xtb.astype(jnp.bfloat16)  # exact when packed_lo
        if not (single_pass or packed_lo):
            xtb_lo = (xtb - xtb_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        NB, R = xtb.shape[1], xtb.shape[0]
        c_pad = R // block_w
        iota_nb = jax.lax.broadcasted_iota(
            jnp.int32, (NB, TS), 0).astype(jnp.float32)
        row_mod = (jax.lax.broadcasted_iota(jnp.int32, (R, TS), 0)
                   % block_w).astype(jnp.float32)
        seg_r = jax.lax.broadcasted_iota(jnp.int32, (c_pad, R), 1)
        seg_c = jax.lax.broadcasted_iota(jnp.int32, (c_pad, R), 0)
        seg_m = seg_r // block_w == seg_c
        if packed_lo:
            # channel c also collapses its lo row-block c + C: the seg
            # contraction itself performs the hi + lo f32 rebuild (no
            # sublane-offset slicing, which Mosaic restricts)
            C0 = xt.shape[0]
            seg_m = seg_m | ((seg_c < C0)
                             & (seg_r // block_w == seg_c + C0))
        seg = seg_m.astype(jnp.float32)
    else:
        iota_n = jax.lax.broadcasted_iota(
            jnp.int32, (N, TS), 0).astype(jnp.float32)
        xt_hi = xt.astype(jnp.bfloat16)
        if not single_pass:
            # stack hi over lo so ONE contraction computes both partial
            # products: MXU row tiles go from 2*ceil(C/128) (two passes)
            # to ceil(2C/128) — a 2x extraction win for C <= 64 and 4->3
            # at sa2's C=131. The hi+lo rebuild is a constant 0/1 combine
            # matmul (exact at one bf16 pass: every gathered element is a
            # single one-hot-selected bf16 value), avoiding
            # sublane-offset slices Mosaic restricts.
            C0 = xt.shape[0]
            xt_lo = (xt - xt_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            xt_hi = jnp.concatenate([xt_hi, xt_lo], axis=0)  # (2C, N)
            comb_r = jax.lax.broadcasted_iota(jnp.int32, (C0, 2 * C0), 1)
            comb_c = jax.lax.broadcasted_iota(jnp.int32, (C0, 2 * C0), 0)
            comb = ((comb_r == comb_c)
                    | (comb_r == comb_c + C0)).astype(jnp.float32)

    # Phase 1 — selection only (the masked-min chain is serial across k;
    # keeping it free of MXU work lets the gather phase's independent
    # matmuls pipeline instead of stalling behind each min-reduce)
    prev = jnp.full((TS, 1), -1.0, jnp.float32)
    first = None
    selections = []
    for k in range(K):
        cand = jnp.where(masked_idx > prev, masked_idx, _BIG)
        cur = jnp.min(cand, axis=1)     # (TS,) f32 index or BIG
        if k == 0:
            first = cur
            cur_eff = jnp.where(cur >= _BIG, 0.0, cur)
        else:
            # exhausted -> repeat first in-radius (0 if none at all)
            cur_eff = jnp.where(cur >= _BIG,
                                jnp.where(first >= _BIG, 0.0, first), cur)
        prev = cur[:, None]
        selections.append(cur_eff)
        idx_ref[0, k, :] = cur_eff.astype(jnp.int32)

    # Phase 2 — value extraction (independent per k)
    for k in range(K):
        cur_eff = selections[k]
        if block_w:
            hi = jnp.floor(cur_eff * (1.0 / block_w))
            lo = cur_eff - hi * block_w
            bohot = (iota_nb == hi[None, :]).astype(jnp.bfloat16)
            gb = _mm(xtb_hi, bohot)                               # (R, TS)
            if not (single_pass or packed_lo):
                gb = gb + _mm(xtb_lo, bohot)
            sel = jnp.where(row_mod == lo[None, :], gb, 0.0)
            # packed_lo/single_pass: sel rows are single one-hot-selected
            # bf16 values (exact in bf16), so the 0/1 seg contraction is
            # exact at ONE bf16 pass; the two-pass case accumulates f32
            # sums in sel and needs the 6-pass f32 contraction
            seg_prec = (jax.lax.Precision.DEFAULT
                        if (packed_lo or single_pass)
                        else jax.lax.Precision.HIGHEST)
            g = jax.lax.dot_general(
                seg, sel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=seg_prec)[:xt.shape[0]]
        else:
            onehot = (iota_n == cur_eff[None, :]).astype(jnp.bfloat16)
            g = _mm(xt_hi, onehot)                                # (·, TS)
            if not single_pass:
                g = jax.lax.dot_general(
                    comb, g, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
        out_ref[0, :, k, :] = g


@functools.partial(jax.jit, static_argnames=("radius", "nsample", "tile_s",
                                              "single_pass"))
def _ball_group_raw(radius: float, nsample: int, xt: jax.Array,
                    qt: jax.Array, tile_s: int = 128,
                    single_pass: bool = False):
    """xt: (B, C, N) source channels; qt: (B, 3, S) query coords.
    Returns (out (B, C, K, S), idx (B, K, S) int32)."""
    B, C, N = xt.shape
    S = qt.shape[2]
    padn = (-N) % 128
    pads = (-S) % tile_s
    if padn:
        # padded source columns sit far outside any radius
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, padn)), constant_values=1e9)
    if pads:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, pads)))

    grid = (B, (S + pads) // tile_s)
    npd = N + padn

    # two-stage block gather for narrow channel counts (sa1 grouping:
    # C=3, N=5120) — full-N one-hot tiles scale with N/128 per slot
    block_w = 16 if C <= 16 else 0
    c_pad = -(-C // 8) * 8
    # exact-f32 extraction at single-pass cost: when the lo channels fit
    # the 8-sublane padding (C <= 4), pack bf16(lo) into the padding rows
    # so one contraction carries both hi and lo partial products
    packed_lo = bool(block_w) and not single_pass and 2 * C <= c_pad
    extra_specs, extra_ops = [], []
    if block_w:
        nb = npd // block_w
        xtp = xt.astype(jnp.float32)
        if packed_lo:
            hi = xtp.astype(jnp.bfloat16).astype(jnp.float32)
            lo = (xtp - hi).astype(jnp.bfloat16).astype(jnp.float32)
            xtp = jnp.concatenate([hi, lo], axis=1)
        if c_pad > xtp.shape[1]:
            xtp = jnp.pad(xtp, ((0, 0), (0, c_pad - xtp.shape[1]), (0, 0)))
        xtb = jnp.transpose(xtp.reshape(B, c_pad, nb, block_w),
                            (0, 1, 3, 2)).reshape(B, c_pad * block_w, nb)
        extra_specs.append(pl.BlockSpec((1, c_pad * block_w, nb),
                                        lambda b, s: (b, 0, 0),
                                        memory_space=pltpu.VMEM))
        extra_ops.append(xtb)

    out, idx = pl.pallas_call(
        functools.partial(_kernel, radius2=float(radius) ** 2, K=nsample,
                          block_w=block_w, single_pass=single_pass,
                          packed_lo=packed_lo),
        out_shape=(
            jax.ShapeDtypeStruct((B, C, nsample, S + pads), jnp.float32),
            jax.ShapeDtypeStruct((B, nsample, S + pads), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, C, npd), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tile_s), lambda b, s: (b, 0, s),
                         memory_space=pltpu.VMEM),
        ] + extra_specs,
        out_specs=(
            pl.BlockSpec((1, C, nsample, tile_s), lambda b, s: (b, 0, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nsample, tile_s), lambda b, s: (b, 0, s),
                         memory_space=pltpu.VMEM),
        ),
    )(xt.astype(jnp.float32), qt.astype(jnp.float32), *extra_ops)
    return out[..., :S], idx[..., :S]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _ball_group_diff(radius: float, nsample: int, single_pass: bool,
                     xyz: jax.Array, new_xyz: jax.Array,
                     features: jax.Array | None):
    return _ball_group_fwd_impl(radius, nsample, xyz, new_xyz, features,
                                single_pass)


def ball_group_pallas(radius: float, nsample: int, xyz: jax.Array,
                      new_xyz: jax.Array, features: jax.Array | None = None,
                      single_pass: bool = False):
    """Fused grouping: for each query, the first-K in-radius neighbours'
    relative coordinates (and features, if given).

    xyz: (B, N, 3); new_xyz: (B, S, 3); features: optional (B, N, F).
    Returns (grouped (B, S, K, 3+F), idx (B, S, K) int32) where grouped
    channels are [xyz - query, features].

    ``single_pass``: extract values with the hi contraction only —
    bf16-rounded values at half the MXU extraction work. Use when the
    consumer is a bf16 MLP (it would round the grouped tensor to bf16
    anyway); the backward scatter is index-based and unaffected.
    """
    return _ball_group_diff(radius, nsample, bool(single_pass), xyz,
                            new_xyz, features)


def _ball_group_fwd_impl(radius, nsample, xyz, new_xyz, features,
                         single_pass=False):
    xt = jnp.swapaxes(xyz, 1, 2)                    # (B, 3, N)
    if features is not None:
        xt = jnp.concatenate([xt, jnp.swapaxes(features, 1, 2)], axis=1)
    qt = jnp.swapaxes(new_xyz, 1, 2)                # (B, 3, S)
    out, idx = _ball_group_raw(radius, nsample,
                               jax.lax.stop_gradient(xt),
                               jax.lax.stop_gradient(qt),
                               single_pass=single_pass)
    out = jnp.transpose(out, (0, 3, 2, 1))          # (B, S, K, C)
    idx = jnp.swapaxes(idx, 1, 2)                   # (B, S, K)
    rel = out[..., :3] - new_xyz[:, :, None, :]
    if features is not None:
        grouped = jnp.concatenate([rel, out[..., 3:]], axis=-1)
    else:
        grouped = rel
    return grouped, idx


def _ball_group_fwd(radius, nsample, single_pass, xyz, new_xyz, features):
    grouped, idx = _ball_group_fwd_impl(radius, nsample, xyz, new_xyz,
                                        features, single_pass)
    res = (idx, xyz.shape, new_xyz.shape,
           None if features is None else features.shape)
    return (grouped, idx), res


def _scatter_by_onehot(flat_idx, d_vals, n_rows):
    """Index scatter-add expressed as a one-hot contraction.

    XLA's native scatter-add serializes on TPU (measured 10.9 ms at the
    sa2 training shape); the equivalent one-hot einsum rides the MXU with
    the comparison fused into the operand load (0.4-2 ms). flat_idx:
    (B, M); d_vals: (B, M, C) -> (B, n_rows, C)."""
    onehot = (flat_idx[:, :, None]
              == jnp.arange(n_rows)[None, None, :]).astype(d_vals.dtype)
    return jnp.einsum("bmn,bmc->bnc", onehot, d_vals,
                      precision=jax.lax.Precision.HIGHEST)


def _ball_group_bwd(radius, nsample, single_pass, res, cts):
    """VJP of the fused gather: cotangents scatter back to the gathered
    sources (indices are piecewise constant). Unused branches (e.g. d_xyz
    when the point cloud is input data) are dead-code-eliminated by XLA."""
    idx, xyz_shape, new_shape, feat_shape = res
    d_grouped, _ = cts
    B, N, _ = xyz_shape

    # rel = xyz[idx] - new_xyz  ->  d_xyz scatter(+), d_new -sum over K
    d_rel = d_grouped[..., :3]
    flat_idx = idx.reshape(B, -1)                   # (B, S*K)
    d_xyz = _scatter_by_onehot(flat_idx, d_rel.reshape(B, -1, 3), N)
    d_new = -d_rel.sum(axis=2)

    d_feat = None
    if feat_shape is not None:
        d_g = d_grouped[..., 3:]
        d_feat = _scatter_by_onehot(flat_idx,
                                    d_g.reshape(B, -1, feat_shape[-1]), N)
    return d_xyz, d_new, d_feat


_ball_group_diff.defvjp(_ball_group_fwd, _ball_group_bwd)
