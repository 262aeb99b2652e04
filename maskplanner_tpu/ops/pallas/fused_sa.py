"""Fully fused PointNet++ set-abstraction Pallas kernel (inference path).

Fuses the entire SA level — ball query, neighbour gather, the shared
per-point MLP (BatchNorm folded into affine weights), and the max-pool
over the neighbourhood — into one VMEM-resident kernel. The XLA path
materializes the grouped activations (B, S, K, C) through every MLP layer
(0.5-1 GB of HBM round-trips per level at the flagship shape, measured
13.2 ms sa1 / 4.5 ms sa2 in eval); here HBM sees only the source channels
and the final (B, C_out, S) pooled block.

Reference semantics: ``PointNetSetAbstraction``
(models/pointnet2_utils.py:171-216) with ``query_ball_point`` first-K
ascending in-radius selection (models/pointnet2_utils.py:89-109). The
neighbour values are extracted with per-k one-hot MXU contractions (no
gather instruction on TPU); layer-1 is algebraically split so the
relative-coordinate shift rides a per-query offset::

    W1 @ [x_n - q; f_n] = W1 @ [x_n; f_n] - W1[:, :3] @ q

so the kernel computes ``relu(W1 @ g_k - q1)`` with ``q1 = W1[:, :3] @ q
- b1`` precomputed outside (one tiny XLA matmul).

Inference-only: BatchNorm must be in running-average mode to fold into
the Dense weights (`fold_pointmlp_params`), and the kernel defines no
VJP. The training path keeps the unfused modules (global batch stats).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e7  # > any point index, exactly representable in f32


def _mm(a, b, precision=jax.lax.Precision.HIGHEST):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=precision)


def _kernel(xt_ref, qt_ref, q1_ref, *wref, radius2: float, K: int,
            n_layers: int, block_w: int = 0):
    # xt_ref: (1, Cin_pad, N) rows 0..2 = xyz; qt_ref: (1, 3, TS)
    # q1_ref: (1, C1, TS) = W1[:, :3] @ q - b1
    # wref: [xtb (1, Cin_pad*block_w, N/block_w) if block_w], w1
    # (C1, Cin_pad), then per extra layer (w (Co, Ci), b (Co, 1)), then
    # out_ref (1, C_last, TS), then grouped scratch (Cin_pad, K*TS)
    out_ref, grouped_ref = wref[-2], wref[-1]
    xtb_ref = None
    if block_w:
        xtb_ref, wref = wref[0], wref[1:]
    w1 = wref[0][...]
    xt = xt_ref[0]                       # (Cin_pad, N)
    N = xt.shape[1]
    TS = qt_ref.shape[2]

    d2 = None
    for c in range(3):
        qc = qt_ref[0, c, :][:, None]    # (TS, 1)
        xc = xt[c, :][None, :]           # (1, N)
        diff = qc - xc
        d2 = diff * diff if d2 is None else d2 + diff * diff

    within = d2 <= radius2
    idx_f = jax.lax.broadcasted_iota(jnp.int32, (TS, N), 1).astype(jnp.float32)
    masked_idx = jnp.where(within, idx_f, _BIG)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (N, TS), 0).astype(jnp.float32)

    # Phase 1 — neighbourhood extraction into a VMEM scratch. fori_loop
    # (not python unroll: unrolled K=64 keeps every iteration's (N, TS)
    # temps on the Mosaic stack and OOMs VMEM); stores land at k*TS which
    # is 128-lane aligned. The one-hot contraction runs as TWO native
    # bf16 MXU passes on a hi/lo split of the source values (one-hot
    # factors are exact in bf16; hi+lo reconstructs the f32 table to
    # ~1e-5 rel) — ~3x cheaper than a HIGHEST-precision f32 contraction,
    # which dominated the kernel at sa1's N=5120.
    if block_w:
        # Two-stage gather for narrow channel counts (sa1: Cin_pad=8,
        # N=5120): a full-N one-hot spends ceil(Cin/128)*N/128 MXU tiles
        # per slot on 8 useful rows. Instead gather the whole block_w-wide
        # block containing the index from the interleaved table xtb
        # (row c*block_w+j = xt[c, blk*block_w+j]) — 13x fewer tiles —
        # then select the in-block lane on the VPU and collapse with a
        # constant block-diagonal segment-sum matmul.
        xtb = xtb_ref[0]                 # (Cin_pad*bw, N/bw)
        xtb_hi = xtb.astype(jnp.bfloat16)
        xtb_lo = (xtb - xtb_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        NB = xtb.shape[1]
        R = xtb.shape[0]
        Cin_pad = R // block_w
        iota_nb = jax.lax.broadcasted_iota(
            jnp.int32, (NB, TS), 0).astype(jnp.float32)
        row_mod = (jax.lax.broadcasted_iota(jnp.int32, (R, TS), 0)
                   % block_w).astype(jnp.float32)
        seg_r = jax.lax.broadcasted_iota(jnp.int32, (Cin_pad, R), 1)
        seg_c = jax.lax.broadcasted_iota(jnp.int32, (Cin_pad, R), 0)
        seg = (seg_r // block_w == seg_c).astype(jnp.float32)
    else:
        xt_hi = xt.astype(jnp.bfloat16)
        xt_lo = (xt - xt_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def body(k, carry):
        prev, first = carry
        cand = jnp.where(masked_idx > prev, masked_idx, _BIG)
        cur = jnp.min(cand, axis=1)      # (TS,) f32 index or BIG
        first = jnp.where(k == 0, cur, first)
        # exhausted -> repeat first in-radius (0 if none at all); at k=0
        # first == cur so this reduces to the no-neighbour fallback
        cur_eff = jnp.where(cur >= _BIG,
                            jnp.where(first >= _BIG, 0.0, first), cur)
        if block_w:
            hi = jnp.floor(cur_eff * (1.0 / block_w))
            lo = cur_eff - hi * block_w
            bohot = (iota_nb == hi[None, :]).astype(jnp.bfloat16)  # (NB, TS)
            gb = (_mm(xtb_hi, bohot, jax.lax.Precision.DEFAULT)
                  + _mm(xtb_lo, bohot, jax.lax.Precision.DEFAULT))
            sel = jnp.where(row_mod == lo[None, :], gb, 0.0)       # (R, TS)
            g = _mm(seg, sel)                                      # (Cin, TS)
        else:
            onehot = (iota_n == cur_eff[None, :]).astype(jnp.bfloat16)
            g = (_mm(xt_hi, onehot, jax.lax.Precision.DEFAULT)
                 + _mm(xt_lo, onehot, jax.lax.Precision.DEFAULT))
        grouped_ref[:, pl.ds(k * TS, TS)] = g
        return cur[:, None], first

    jax.lax.fori_loop(
        0, K, body,
        (jnp.full((TS, 1), -1.0, jnp.float32), jnp.zeros((TS,), jnp.float32)))

    # Phase 2 — folded MLP + max-pool over K, in column chunks of KC
    # neighbour slices so each matmul is MXU-sized (serialized per-k
    # (C, TS) matmuls are latency-bound: measured 2x slower than the
    # unfused XLA path) while chunk temps stay bounded.
    q1 = q1_ref[0]                       # (C1, TS)
    kc = max(1, min(K, 2048 // TS))
    acc = None
    for k0 in range(0, K, kc):
        cols = min(kc, K - k0)
        chunk = grouped_ref[:, pl.ds(k0 * TS, cols * TS)]
        q1_tiled = jnp.concatenate([q1] * cols, axis=1) if cols > 1 else q1
        h = jnp.maximum(_mm(w1, chunk) - q1_tiled, 0.0)
        for li in range(1, n_layers):
            w = wref[2 * li - 1][...]
            b = wref[2 * li][...]
            h = jnp.maximum(_mm(w, h) + b, 0.0)
        for i in range(cols):
            hi = h[:, i * TS:(i + 1) * TS]
            acc = hi if acc is None else jnp.maximum(acc, hi)
    out_ref[0] = acc


@functools.partial(jax.jit,
                   static_argnames=("radius", "nsample", "tile_s"))
def _fused_sa_raw(radius: float, nsample: int, xt: jax.Array, qt: jax.Array,
                  q1: jax.Array, weights: tuple, tile_s: int = 128):
    """xt: (B, Cin, N) source channels (rows 0..2 xyz); qt: (B, 3, S);
    q1: (B, C1, S); weights: (w1, w2, b2, w3, b3, ...). Returns
    (B, C_last, S) max-pooled MLP features."""
    B, Cin, N = xt.shape
    S = qt.shape[2]
    n_layers = (len(weights) + 1) // 2
    c_last = weights[-2].shape[0] if n_layers > 1 else weights[0].shape[0]

    padc = (-Cin) % 8
    padn = (-N) % 128
    pads = (-S) % tile_s
    if padc:
        xt = jnp.pad(xt, ((0, 0), (0, padc), (0, 0)))
    if padn:
        # padded source columns sit far outside any radius
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, padn)), constant_values=1e9)
    if pads:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, pads)))
        q1 = jnp.pad(q1, ((0, 0), (0, 0), (0, pads)))
    w1 = weights[0]
    if padc:
        w1 = jnp.pad(w1, ((0, 0), (0, padc)))

    grid = (B, (S + pads) // tile_s)
    cp, npd = Cin + padc, N + padn

    # two-stage block gather pays off only for narrow channel counts
    # (full one-hot tiles scale with ceil(Cin/128)*N; blocked with
    # Cin_pad*block_w rows x N/block_w contraction)
    block_w = 16 if cp <= 16 else 0
    w_specs, w_ops = [], []
    if block_w:
        nb = npd // block_w
        xtb = jnp.transpose(
            xt.astype(jnp.float32).reshape(B, cp, nb, block_w),
            (0, 1, 3, 2)).reshape(B, cp * block_w, nb)
        w_specs.append(pl.BlockSpec((1, cp * block_w, nb),
                                    lambda b, s: (b, 0, 0),
                                    memory_space=pltpu.VMEM))
        w_ops.append(xtb)
    for w in (w1,) + tuple(weights[1:]):
        w_specs.append(pl.BlockSpec(w.shape, lambda b, s: (0, 0),
                                    memory_space=pltpu.VMEM))
        w_ops.append(w.astype(jnp.float32))

    out = pl.pallas_call(
        functools.partial(_kernel, radius2=float(radius) ** 2, K=nsample,
                          n_layers=n_layers, block_w=block_w),
        out_shape=jax.ShapeDtypeStruct((B, c_last, S + pads), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, cp, npd), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tile_s), lambda b, s: (b, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q1.shape[1], tile_s), lambda b, s: (b, 0, s),
                         memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=pl.BlockSpec((1, c_last, tile_s), lambda b, s: (b, 0, s),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((cp, nsample * tile_s), jnp.float32)],
    )(xt.astype(jnp.float32), qt.astype(jnp.float32),
      q1.astype(jnp.float32), *w_ops)
    return out[..., :S]


def fold_pointmlp_params(variables, eps: float = 1e-5):
    """Fold Dense+BatchNorm(running stats) stacks into affine (W, b) pairs.

    ``variables`` is a PointMLP variable dict ({'params': {'Dense_i': ...,
    'BatchNorm_i': ...}, 'batch_stats': ...}). Returns [(W (Cout, Cin),
    b (Cout,)), ...] such that relu(W @ x + b) == Dense->BN(eval)->relu.
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    out = []
    n = len([k for k in params if k.startswith("Dense_")])
    for i in range(n):
        kernel = params[f"Dense_{i}"]["kernel"]          # (Cin, Cout)
        bias = params[f"Dense_{i}"]["bias"]
        scale = params[f"BatchNorm_{i}"]["scale"]
        beta = params[f"BatchNorm_{i}"]["bias"]
        mean = stats[f"BatchNorm_{i}"]["mean"]
        var = stats[f"BatchNorm_{i}"]["var"]
        s = scale / jnp.sqrt(var + eps)
        out.append((kernel.T * s[:, None], (bias - mean) * s + beta))
    return out


def fused_set_abstraction(radius: float, nsample: int, xyz: jax.Array,
                          new_xyz: jax.Array, features: jax.Array | None,
                          folded, tile_s: int = 128):
    """Fused SA level: returns (B, S, C_out) pooled features.

    xyz: (B, N, 3); new_xyz: (B, S, 3); features: optional (B, N, F);
    folded: [(W, b), ...] from `fold_pointmlp_params`. Inference-only
    (no VJP defined on the kernel).
    """
    xt = jnp.swapaxes(xyz, 1, 2)                        # (B, 3, N)
    if features is not None:
        xt = jnp.concatenate([xt, jnp.swapaxes(features, 1, 2)], axis=1)
    qt = jnp.swapaxes(new_xyz, 1, 2)                    # (B, 3, S)
    w1, b1 = folded[0]
    # q1 = W1[:, :3] @ q - b1  (layer-1 relative-coordinate offset)
    q1 = jnp.einsum("ci,biS->bcS", w1[:, :3], qt,
                    precision=jax.lax.Precision.HIGHEST) - b1[None, :, None]
    weights = [w1]
    for w, b in folded[1:]:
        weights.extend([w, b.reshape(-1, 1)])
    out = _fused_sa_raw(radius, nsample, jax.lax.stop_gradient(xt),
                        jax.lax.stop_gradient(qt.astype(jnp.float32)),
                        jax.lax.stop_gradient(q1), tuple(weights),
                        tile_s=tile_s)
    return jnp.swapaxes(out, 1, 2)                      # (B, S, C_out)
