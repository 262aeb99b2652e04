"""Fused PointNet++ set-abstraction Pallas kernels for the TRAINING path.

Round-1 left the fused SA kernel inference-only (BatchNorm folding,
``fused_sa.py``); the training step kept the unfused grouped MLPs, which
is where ~90% of the model fwd+bwd time goes — every (B, S, K, C)
activation round-trips HBM through each layer in both directions, while
the arithmetic is a fraction of a millisecond of MXU time (the step is
HBM-bound, see docs/kernels.md). This module fuses the whole level for
training:

forward  (one kernel): ball query -> neighbour gather -> per-point MLP
          (LayerNorm or no norm) -> max-pool over K. HBM sees the source
          channels, the pooled output, and the (B, K, S) neighbour
          indices kept for the backward. No (B, S, K, C) tensor exists.
backward (one kernel): re-gathers from the saved indices, RECOMPUTES the
          layer activations chunk-by-chunk in VMEM (rematerialization:
          FLOPs are free here, bandwidth is not), routes the max-pool
          cotangent to the first winning neighbour, backpropagates
          through the MLP, and accumulates dW/db (+ dgamma/dbeta),
          d_source-channels (in-kernel one-hot-transpose scatter) and
          d_query positions across the sequential grid.

Both kernels split the sequential first-K neighbour SELECTION (cheap VPU
compares, unrolled over K) from the neighbour GATHER, and batch the
gather/scatter of a whole chunk of K columns into one pair of hi/lo bf16
one-hot MXU matmuls — kc small (C, N)x(N, TS) products are
overhead-bound on the MXU; one (C, N)x(N, kc*TS) product is not. The
gathered chunk feeds the MLP directly from registers/VMEM; there is no
whole-(K*TS) scratch buffer (the first cut kept one and blew the 16 MB
VMEM scope at sa2 shapes).

BatchNorm cannot fuse this way (cross-element statistics); the kernels
support ``norm in ("layer", "none")`` — the convergence study behind the
LayerNorm swap is in docs/convergence.md. Reference semantics otherwise
match ``PointNetSetAbstraction`` (reference models/pointnet2_utils.py:
171-216) with ``query_ball_point`` first-K in-radius selection
(reference models/pointnet2_utils.py:89-109).

Max-pool tie handling: the backward routes the whole cotangent to the
first neighbour attaining the max, while XLA's ``jnp.max`` VJP splits it
among ties. Exact ties only arise from duplicated neighbours (in-radius
padding repeats the first neighbour), and duplicates gather from — and
scatter to — the same source point with the same activations, so every
accumulated gradient (d_source, d_query, dW, db) is identical either way.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e7  # > any point index, exactly representable in f32
_LN_EPS = 1e-6


def _hi_lo(x):
    hi = x.astype(jnp.bfloat16)
    return hi, (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)


def _dot(a, b, dims, prec):
    """MXU contraction with f32 accumulation at one of three precisions:
    "highest" = 6-pass f32, "default" = 1-pass bf16, "high" = manual
    bf16_3x (ah@bh + ah@bl + al@bh — Mosaic's dot lowering rejects
    jax.lax.Precision.HIGH, so the decomposition is spelled out)."""
    kw = dict(preferred_element_type=jnp.float32)
    if prec == "high":
        ah, al = _hi_lo(a)
        bh, bl = _hi_lo(b)
        d = jax.lax.Precision.DEFAULT
        return (jax.lax.dot_general(ah, bh, dims, precision=d, **kw)
                + jax.lax.dot_general(ah, bl, dims, precision=d, **kw)
                + jax.lax.dot_general(al, bh, dims, precision=d, **kw))
    p = (jax.lax.Precision.HIGHEST if prec == "highest"
         else jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(a, b, dims, precision=p, **kw)


def _mm(a, b, prec="highest"):
    return _dot(a, b, (((1,), (0,)), ((), ())), prec)


def _mm_t(a, b, prec="highest"):
    """a.T @ b with a (Ci, Co) read transposed: (Co, Ci)·rows contraction."""
    return _dot(a, b, (((0,), (0,)), ((), ())), prec)


def _mm_bt(a, b):
    """a @ b.T contracting the column axis of both (bf16 ok, f32 acc)."""
    return _dot(a, b, (((1,), (1,)), ((), ())), "default")


def _layer_stats(h, c_true: int):
    """LayerNorm stats over the channel rows (padded rows hold zeros and
    are excluded by dividing by the true channel count)."""
    mu = jnp.sum(h, axis=0, keepdims=True) / c_true
    xc = h - mu
    var = jnp.sum(xc * xc, axis=0, keepdims=True) / c_true
    inv = jax.lax.rsqrt(var + _LN_EPS)
    return xc, inv


def _forward_chunk(chunk, wrefs, norm: str, n_layers: int, prec,
                   keep: bool = False):
    """MLP layers on one column block. chunk: (Cin_pad, cols) gathered
    source rows (xyz rows already query-relative). Returns the last
    activation, plus (per layer: pre-norm h, xhat, inv, act) when
    ``keep`` (backward recompute)."""
    saved = []
    h = chunk
    for li in range(n_layers):
        w = wrefs[li]["w"][...]
        b = wrefs[li]["b"][...]
        pre = _mm(w, h, prec) + b
        if norm == "layer":
            gamma = wrefs[li]["gamma"][...]
            beta = wrefs[li]["beta"][...]
            xc, inv = _layer_stats(pre, pre.shape[0])
            xhat = xc * inv
            y = xhat * gamma + beta
        else:
            xhat, inv, y = None, None, pre
        act = jnp.maximum(y, 0.0)
        if keep:
            saved.append((h, xhat, inv, act))
        h = act
    return h, saved


def _select_neighbours(q, xt, radius2: float, K: int, TS: int, N: int,
                       idx_ref):
    """Sequential first-K in-radius selection (reference
    models/pointnet2_utils.py:89-109 semantics): writes K rows of (TS,)
    f32 effective source indices (missing -> repeat-first) to
    ``idx_ref[0]``. A ``fori_loop`` (not an unrolled python loop): the
    per-step compare/min work is large, and K-fold unrolling of it blows
    up Mosaic compile time."""
    d2 = None
    for c in range(3):
        diff = q[c, :][:, None] - xt[c, :][None, :]
        d2 = diff * diff if d2 is None else d2 + diff * diff
    idx_f = jax.lax.broadcasted_iota(jnp.int32, (TS, N), 1).astype(jnp.float32)
    masked_idx = jnp.where(d2 <= radius2, idx_f, _BIG)

    def body(k, carry):
        prev, first = carry
        cand = jnp.where(masked_idx > prev, masked_idx, _BIG)
        cur = jnp.min(cand, axis=1)       # (TS,)
        first = jnp.where(k == 0, cur, first)
        idx_ref[0, k, :] = jnp.where(
            cur >= _BIG, jnp.where(first >= _BIG, 0.0, first), cur)
        return cur[:, None], first

    jax.lax.fori_loop(
        0, K, body,
        (jnp.full((TS, 1), -1.0, jnp.float32), jnp.zeros((TS,), jnp.float32)))
    if K < idx_ref.shape[1]:
        # idx is padded to a multiple of 8 rows: initialize the pad so
        # the jit output (and VJP residual) is deterministic VMEM, not
        # whatever the block held before
        idx_ref[0, K:, :] = jnp.zeros((idx_ref.shape[1] - K, TS),
                                      jnp.float32)


class _Gather:
    """Batched one-hot MXU gather shared by fwd/bwd: extracts a CHUNK of
    kc neighbour columns with one pair of hi/lo matmuls (instead of kc
    small per-k matmuls — the per-call overhead, not FLOPs, dominated the
    serial form). Retains the one-hot factors for the transposed scatter
    in the backward (d_src accumulation as one a@b.T matmul per chunk).

    ``single``: bf16-model mode — feature rows gather/scatter in ONE
    bf16 MXU pass (a one-hot contraction of a bf16-rounded value is
    exact at bf16 value precision, which is all a bf16 model carries);
    only the xyz rows (relative-coordinate cancellation after the q
    subtraction) keep the hi/lo f32 reconstruction."""

    def __init__(self, xt, xtb_ref, q, block_w: int, cp: int,
                 single: bool = False, packed_c: int = 0):
        self.block_w = block_w
        self.q = q
        self.cp = cp
        self.single = single
        self.packed_c = packed_c
        if block_w:
            xtb = xtb_ref[0]
            if packed_c:
                # xtb rows already hold [hi(:C); bf16(lo)(C:2C); 0] — all
                # bf16-representable, so the cast is exact and ONE
                # contraction carries both partial products (see
                # group_gather.py packed_lo)
                self.xtb_hi = xtb.astype(jnp.bfloat16)
            else:
                self.xtb_hi, self.xtb_lo = _hi_lo(xtb)
            self.NB = xtb.shape[1]
            self.R = xtb.shape[0]
            TS = q.shape[1]
            self.iota_nb = jax.lax.broadcasted_iota(
                jnp.int32, (self.NB, TS), 0).astype(jnp.float32)
            self.row_mod = (jax.lax.broadcasted_iota(
                jnp.int32, (self.R, TS), 0) % block_w).astype(jnp.float32)
            seg_r = jax.lax.broadcasted_iota(jnp.int32, (cp, self.R), 1)
            seg_c = jax.lax.broadcasted_iota(jnp.int32, (cp, self.R), 0)
            seg = seg_r // block_w == seg_c
            if packed_c:
                # channel c also collapses its lo row-block c + C; the
                # backward transpose puts real dg into the lo blocks, whose
                # scatter lands in padded channels the wrapper drops
                seg = seg | ((seg_c < packed_c)
                             & (seg_r // block_w == seg_c + packed_c))
            self.seg = seg.astype(jnp.float32)
        else:
            self.N = xt.shape[1]
            self.split = single and cp > 8  # hi/lo xyz rows + single rest
            if self.split:
                self.xt_hi, self.xt_lo = _hi_lo(xt[:8])
                self.xt_rest = xt[8:].astype(jnp.bfloat16)
            else:
                self.xt_hi, self.xt_lo = _hi_lo(xt)
            TS = q.shape[1]
            self.iota_n = jax.lax.broadcasted_iota(
                jnp.int32, (self.N, TS), 0).astype(jnp.float32)

    def onehots(self, effs):
        """effs: list of (TS,) -> (one-hot (Nsrc, cols*TS) bf16, aux)."""
        if self.block_w:
            bw = float(self.block_w)
            his = [jnp.floor(e * (1.0 / bw)) for e in effs]
            los = [e - h * bw for e, h in zip(effs, his)]
            boh = [(self.iota_nb == h[None, :]).astype(jnp.bfloat16)
                   for h in his]
            boh = boh[0] if len(boh) == 1 else jnp.concatenate(boh, axis=1)
            lom = [self.row_mod == lo[None, :] for lo in los]
            lom = lom[0] if len(lom) == 1 else jnp.concatenate(lom, axis=1)
            return boh, lom
        oh = [(self.iota_n == e[None, :]).astype(jnp.bfloat16) for e in effs]
        return (oh[0] if len(oh) == 1 else jnp.concatenate(oh, axis=1)), None

    def gather(self, onehot, aux, cols: int):
        """(Cin_pad, cols*TS) chunk with query-relative xyz rows."""
        if self.block_w:
            gb = _mm(self.xtb_hi, onehot, "default")
            if not self.packed_c:
                gb = gb + _mm(self.xtb_lo, onehot, "default")
            sel = jnp.where(aux, gb, 0.0)
            if self.packed_c:
                # packed: sel rows are single one-hot-selected bf16 values
                # (exact in bf16), so the collapsing seg contraction is
                # exact at ONE bf16 pass — and it also performs the hi+lo
                # f32 rebuild via the packed seg rows
                g = _mm(self.seg, sel, "default")
            else:
                # seg is 0/1 (bf16-exact); sel needs hi/lo for f32 values
                g = _mm(self.seg, sel,
                        "default" if self.single else "high")
        elif self.split:
            g_xyz = (_mm(self.xt_hi, onehot, "default")
                     + _mm(self.xt_lo, onehot, "default"))
            g_rest = _mm(self.xt_rest, onehot, "default")
            g = jnp.concatenate([g_xyz, g_rest], axis=0)
        else:
            g = (_mm(self.xt_hi, onehot, "default")
                 + _mm(self.xt_lo, onehot, "default"))
        qc = (self.q if cols == 1
              else jnp.concatenate([self.q] * cols, axis=1))
        rows = jax.lax.broadcasted_iota(jnp.int32, g.shape, 0)
        return jnp.where(
            rows < 3, g - jnp.pad(qc, ((0, g.shape[0] - 3), (0, 0))), g)

    def scatter_add(self, dsrc_ref, dg, onehot, aux):
        """dsrc += dg @ onehot.T (hi/lo split keeps f32 accuracy with
        bf16 MXU passes; the one-hot factor is exact in bf16; single
        mode scatters in one bf16 pass — bf16-model gradient noise)."""
        if self.block_w:
            d_sel = jnp.where(aux, _mm_t(
                self.seg, dg, "default" if self.single else "high"), 0.0)
            if self.single:
                dsrc_ref[0] += _mm_bt(d_sel.astype(jnp.bfloat16), onehot)
            else:
                d_hi, d_lo = _hi_lo(d_sel)
                dsrc_ref[0] += _mm_bt(d_hi, onehot) + _mm_bt(d_lo, onehot)
        elif self.single:
            dsrc_ref[0] += _mm_bt(dg.astype(jnp.bfloat16), onehot)
        else:
            d_hi, d_lo = _hi_lo(dg)
            dsrc_ref[0] += _mm_bt(d_hi, onehot) + _mm_bt(d_lo, onehot)


def _fwd_kernel(xt_ref, qt_ref, *refs, radius2: float, K: int,
                n_layers: int, norm: str, block_w: int, prec,
                chunk_cols: int, packed_c: int = 0):
    """Grid (B, S/TS). Outputs pooled (1, C_last, TS) and the selected
    neighbour indices (1, K_pad, TS) (f32)."""
    # refs: [xtb] + weights... + out_ref, idx_ref
    out_ref, idx_ref = refs[-2], refs[-1]
    wflat = refs[:-2]
    xtb_ref = None
    if block_w:
        xtb_ref, wflat = wflat[0], wflat[1:]
    per = 4 if norm == "layer" else 2
    wrefs = [{"w": wflat[per * i], "b": wflat[per * i + 1],
              **({"gamma": wflat[per * i + 2], "beta": wflat[per * i + 3]}
                 if norm == "layer" else {})}
             for i in range(n_layers)]

    xt = xt_ref[0]                        # (Cin_pad, N)
    N = xt.shape[1]
    TS = qt_ref.shape[2]
    q = qt_ref[0]                         # (3, TS)

    _select_neighbours(q, xt, radius2, K, TS, N, idx_ref)

    gat = _Gather(xt, xtb_ref, q, block_w, xt.shape[0],
                  single=prec == "default", packed_c=packed_c)
    kc = max(1, min(K, chunk_cols // TS))
    c_last = wrefs[-1]["w"].shape[0]

    def process(k0, cols, acc):
        """One gather+MLP chunk folded into the max-pool accumulator."""
        oh, aux = gat.onehots(
            [idx_ref[0, k0 + i, :] for i in range(cols)])
        chunk = gat.gather(oh, aux, cols)
        h, _ = _forward_chunk(chunk, wrefs, norm, n_layers, prec)
        for i in range(cols):
            acc = jnp.maximum(acc, h[:, i * TS:(i + 1) * TS])
        return acc

    # fori over equal-width chunks (NOT an unrolled python loop: Mosaic
    # keeps every unrolled chunk's temporaries live on the VMEM stack
    # simultaneously — 7 chunks blew the 16 MB scope at sa2 shapes)
    acc = jnp.full((c_last, TS), -jnp.inf, jnp.float32)
    n_full = K // kc
    if n_full:
        acc = jax.lax.fori_loop(
            0, n_full, lambda ci, a: process(ci * kc, kc, a), acc)
    if K % kc:
        acc = process(n_full * kc, K % kc, acc)
    out_ref[0] = acc


def _bwd_kernel(xt_ref, qt_ref, idx_ref, pooled_ref, dout_ref, *refs,
                K: int, n_layers: int, norm: str, block_w: int, prec,
                chunk_cols: int, packed_c: int = 0):
    """Grid (B, S/TS). Recompute + backprop one tile; accumulate weight
    grads across the whole (sequential) grid and source grads across the
    tile dimension."""
    # refs: [xtb] + weights + outputs [d_src, d_q, per-layer dW, db,
    # (dgamma, dbeta)] + scratch avail
    avail_ref = refs[-1]
    per = 4 if norm == "layer" else 2
    n_outs = 2 + per * n_layers
    out_refs = refs[-1 - n_outs:-1]
    wflat = refs[:-1 - n_outs]
    xtb_ref = None
    if block_w:
        xtb_ref, wflat = wflat[0], wflat[1:]
    wrefs = [{"w": wflat[per * i], "b": wflat[per * i + 1],
              **({"gamma": wflat[per * i + 2], "beta": wflat[per * i + 3]}
                 if norm == "layer" else {})}
             for i in range(n_layers)]
    dsrc_ref, dq_ref = out_refs[0], out_refs[1]
    grad_refs = out_refs[2:]

    b_id, s_id = pl.program_id(0), pl.program_id(1)
    first_step = jnp.logical_and(b_id == 0, s_id == 0)

    xt = xt_ref[0]
    TS = qt_ref.shape[2]
    q = qt_ref[0]
    pooled = pooled_ref[0]
    d_out = dout_ref[0]

    # zero the cross-grid accumulators on their first visit
    @pl.when(first_step)
    def _init_weight_grads():
        for r in grad_refs:
            r[...] = jnp.zeros_like(r)

    @pl.when(s_id == 0)
    def _init_src_grad():
        dsrc_ref[0] = jnp.zeros_like(dsrc_ref[0])

    avail_ref[...] = jnp.ones_like(avail_ref)

    gat = _Gather(xt, xtb_ref, q, block_w, xt.shape[0],
                  single=prec == "default", packed_c=packed_c)
    kc = max(1, min(K, chunk_cols // TS))

    def process(k0, cols, carry):
        """Recompute + backprop one chunk; returns updated (dq, wgrads)."""
        dq_acc, wg = carry
        wg = list(wg)
        # re-gather this chunk from the saved indices
        effs = [idx_ref[0, k0 + i, :] for i in range(cols)]
        oh, aux = gat.onehots(effs)
        chunk = gat.gather(oh, aux, cols)
        h, saved = _forward_chunk(chunk, wrefs, norm, n_layers, prec,
                                  keep=True)
        # max-pool cotangent: first winner takes all (see module doc)
        d_parts = []
        for i in range(cols):
            hk = h[:, i * TS:(i + 1) * TS]
            win = jnp.where(hk >= pooled, avail_ref[...], 0.0)
            avail_ref[...] = avail_ref[...] * (1.0 - win)
            d_parts.append(d_out * win)
        d = (jnp.concatenate(d_parts, axis=1) if cols > 1 else d_parts[0])

        for li in range(n_layers - 1, -1, -1):
            h_in, xhat, inv, act = saved[li]
            d = jnp.where(act > 0, d, 0.0)
            if norm == "layer":
                gamma = wrefs[li]["gamma"][...]
                c_true = act.shape[0]
                wg[per * li + 2] = wg[per * li + 2] + jnp.sum(
                    d * xhat, axis=1, keepdims=True)
                wg[per * li + 3] = wg[per * li + 3] + jnp.sum(
                    d, axis=1, keepdims=True)
                dxhat = d * gamma
                m1 = jnp.sum(dxhat, axis=0, keepdims=True) / c_true
                m2 = jnp.sum(dxhat * xhat, axis=0, keepdims=True) / c_true
                d = inv * (dxhat - m1 - xhat * m2)
            # d is now d_pre: bias grad + weight grad + input cotangent
            wg[per * li + 1] = wg[per * li + 1] + jnp.sum(
                d, axis=1, keepdims=True)
            # dW = d @ h_in^T  (contract columns)
            wg[per * li] = wg[per * li] + _dot(
                d, h_in, (((1,), (1,)), ((), ())), prec)
            d = _mm_t(wrefs[li]["w"][...], d, prec)     # (Ci, cols)

        # d wrt gathered chunk: query grad + batched source scatter
        for i in range(cols):
            dq_acc = dq_acc - d[:3, i * TS:(i + 1) * TS]
        gat.scatter_add(dsrc_ref, d, oh, aux)
        return dq_acc, tuple(wg)

    # fori over equal-width chunks (see fwd kernel: unrolled chunks keep
    # all temporaries live on the VMEM stack at once)
    carry = (jnp.zeros((3, TS), jnp.float32),
             tuple(jnp.zeros_like(r[...]) for r in grad_refs))
    n_full = K // kc
    if n_full:
        carry = jax.lax.fori_loop(
            0, n_full, lambda ci, c: process(ci * kc, kc, c), carry)
    if K % kc:
        carry = process(n_full * kc, K % kc, carry)

    dq_acc, wg = carry
    dq_ref[0] = dq_acc
    for j, g in enumerate(wg):
        grad_refs[j][...] += g


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _prep(radius, nsample, xt, qt, tile_s):
    """Shared padding/layout: returns dict of padded operands + dims."""
    B, Cin, N = xt.shape
    S = qt.shape[2]
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
    cp, npd, sp = Cin + padc, N + padn, S + pads
    block_w = 16 if cp <= 16 else 0
    # pack bf16(lo) into the channel-padding rows when they fit (sa1:
    # Cin=3, cp=8): halves the block-gather contractions at identical
    # accuracy (see group_gather.py packed_lo)
    packed_c = Cin if (block_w and 2 * Cin <= cp) else 0
    ops = dict(xt=xt.astype(jnp.float32), qt=qt.astype(jnp.float32))
    if block_w:
        nb = npd // block_w
        src = ops["xt"]
        if packed_c:
            base = src[:, :Cin]
            hi = base.astype(jnp.bfloat16).astype(jnp.float32)
            lo = (base - hi).astype(jnp.bfloat16).astype(jnp.float32)
            src = jnp.concatenate(
                [hi, lo, jnp.zeros((B, cp - 2 * Cin, npd), jnp.float32)],
                axis=1)
        ops["xtb"] = jnp.transpose(
            src.reshape(B, cp, nb, block_w),
            (0, 1, 3, 2)).reshape(B, cp * block_w, nb)
    return ops, dict(B=B, Cin=Cin, cp=cp, npd=npd, S=S, sp=sp,
                     block_w=block_w, padc=padc, packed_c=packed_c)


def _flatten_params(params, cp, norm):
    """Per-layer (w (Co, Ci), b, [gamma, beta]) -> flat f32 operand list
    with layer-1 columns padded to cp; plus the layer channel list."""
    flat, chans = [], []
    for li, layer in enumerate(params):
        w = layer[0].astype(jnp.float32)
        if li == 0 and w.shape[1] < cp:
            w = jnp.pad(w, ((0, 0), (0, cp - w.shape[1])))
        flat.append(w)
        chans.append(w.shape[0])
        for a in layer[1:]:
            flat.append(a.astype(jnp.float32).reshape(-1, 1))
    return flat, chans


def _wspecs(flat):
    return [pl.BlockSpec(a.shape, lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM) for a in flat]


def _pick_chunk_cols(npd, cp, chans, block_w, bwd=False):
    """Gather/MLP chunk width (columns) sized to a VMEM live-set budget.

    Per-column live bytes: the bf16 one-hot factor (one row per source
    point or per block), blocked-gather intermediates, and the layer
    activations (the backward holds (h_in, xhat, act) per layer for the
    in-chunk backprop, the forward only the running pair). Oversized
    chunks blow the 16 MB scoped-VMEM stack at wide levels (sa2:
    cp=136, c_last=256)."""
    oh_rows = (npd // block_w) if block_w else npd
    per_col = 2 * oh_rows
    if block_w:
        per_col += 6 * cp * block_w
    per_col += int(4 * (cp + sum(chans)) * (3.0 if bwd else 1.5))
    budget = (5 << 20) if bwd else (6 << 20)
    cc = (budget // per_col // 128) * 128
    return int(max(128, min(2048, cc)))


@functools.partial(jax.jit, static_argnames=("radius", "nsample", "norm",
                                             "precision", "tile_s",
                                             "chunk_cols", "interpret"))
def _fsa_train_fwd_raw(radius, nsample, norm, xt, qt, params,
                       precision="highest", tile_s=128, chunk_cols=None,
                       interpret=False):
    ops, d = _prep(radius, nsample, xt, qt, tile_s)
    flat, chans = _flatten_params(params, d["cp"], norm)
    c_last = chans[-1]
    K = nsample
    kp = K + ((-K) % 8)
    if chunk_cols is None:
        chunk_cols = _pick_chunk_cols(d["npd"], d["cp"], chans,
                                      d["block_w"])

    in_specs = [
        pl.BlockSpec((1, d["cp"], d["npd"]), lambda b, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, tile_s), lambda b, s: (b, 0, s),
                     memory_space=pltpu.VMEM),
    ]
    operands = [ops["xt"], ops["qt"]]
    if d["block_w"]:
        in_specs.append(pl.BlockSpec(
            (1, d["cp"] * d["block_w"], d["npd"] // d["block_w"]),
            lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM))
        operands.append(ops["xtb"])
    in_specs += _wspecs(flat)
    operands += flat

    out, idx = pl.pallas_call(
        functools.partial(_fwd_kernel, radius2=float(radius) ** 2, K=K,
                          n_layers=len(params), norm=norm,
                          block_w=d["block_w"], prec=precision,
                          chunk_cols=chunk_cols, packed_c=d["packed_c"]),
        out_shape=(jax.ShapeDtypeStruct((d["B"], c_last, d["sp"]),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((d["B"], kp, d["sp"]), jnp.float32)),
        grid=(d["B"], d["sp"] // tile_s),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((1, c_last, tile_s), lambda b, s: (b, 0, s),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, kp, tile_s), lambda b, s: (b, 0, s),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(*operands)
    return out[..., :d["S"]], idx


@functools.partial(jax.jit, static_argnames=("radius", "nsample", "norm",
                                             "precision", "tile_s",
                                             "chunk_cols", "interpret"))
def _fsa_train_bwd_raw(radius, nsample, norm, xt, qt, idx, pooled, d_out,
                       params, precision="highest", tile_s=128,
                       chunk_cols=None, interpret=False):
    ops, d = _prep(radius, nsample, xt, qt, tile_s)
    flat, chans = _flatten_params(params, d["cp"], norm)
    c_last = chans[-1]
    K = nsample
    kp = idx.shape[1]
    if chunk_cols is None:
        chunk_cols = _pick_chunk_cols(d["npd"], d["cp"], chans,
                                      d["block_w"], bwd=True)
    if pooled.shape[-1] < d["sp"]:
        pad = d["sp"] - pooled.shape[-1]
        pooled = jnp.pad(pooled, ((0, 0), (0, 0), (0, pad)))
        d_out = jnp.pad(d_out, ((0, 0), (0, 0), (0, pad)))
    if idx.shape[-1] < d["sp"]:
        idx = jnp.pad(idx, ((0, 0), (0, 0),
                            (0, d["sp"] - idx.shape[-1])))

    in_specs = [
        pl.BlockSpec((1, d["cp"], d["npd"]), lambda b, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, tile_s), lambda b, s: (b, 0, s),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kp, tile_s), lambda b, s: (b, 0, s),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c_last, tile_s), lambda b, s: (b, 0, s),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c_last, tile_s), lambda b, s: (b, 0, s),
                     memory_space=pltpu.VMEM),
    ]
    operands = [ops["xt"], ops["qt"], idx.astype(jnp.float32),
                pooled.astype(jnp.float32), d_out.astype(jnp.float32)]
    if d["block_w"]:
        in_specs.append(pl.BlockSpec(
            (1, d["cp"] * d["block_w"], d["npd"] // d["block_w"]),
            lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM))
        operands.append(ops["xtb"])
    in_specs += _wspecs(flat)
    operands += flat

    # outputs: d_src (blocked or direct), d_q, per-layer weight grads
    if d["block_w"]:
        src_shape = (d["B"], d["cp"] * d["block_w"],
                     d["npd"] // d["block_w"])
    else:
        src_shape = (d["B"], d["cp"], d["npd"])
    out_shapes = [jax.ShapeDtypeStruct(src_shape, jnp.float32),
                  jax.ShapeDtypeStruct((d["B"], 3, d["sp"]), jnp.float32)]
    out_specs = [pl.BlockSpec((1,) + src_shape[1:], lambda b, s: (b, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, 3, tile_s), lambda b, s: (b, 0, s),
                              memory_space=pltpu.VMEM)]
    for a in flat:
        out_shapes.append(jax.ShapeDtypeStruct(a.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(a.shape, lambda b, s: (0, 0),
                                      memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, K=K, n_layers=len(params), norm=norm,
                          block_w=d["block_w"], prec=precision,
                          chunk_cols=chunk_cols, packed_c=d["packed_c"]),
        out_shape=tuple(out_shapes),
        grid=(d["B"], d["sp"] // tile_s),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM((c_last, tile_s), jnp.float32)],
        interpret=interpret,
    )(*operands)

    d_src = outs[0]
    if d["block_w"]:
        bw = d["block_w"]
        nb = d["npd"] // bw
        d_src = jnp.transpose(
            d_src.reshape(d["B"], d["cp"], bw, nb),
            (0, 1, 3, 2)).reshape(d["B"], d["cp"], d["npd"])
    d_src = d_src[:, :d["Cin"], :xt.shape[2]]
    d_q = outs[1][..., :d["S"]]
    wgrads = list(outs[2:])

    # unflatten into the params structure (slice layer-1 column padding)
    per = 4 if norm == "layer" else 2
    d_params = []
    i = 0
    for li, layer in enumerate(params):
        dw = wgrads[i]
        if li == 0 and dw.shape[1] > layer[0].shape[1]:
            dw = dw[:, :layer[0].shape[1]]
        entry = [dw]
        for a in layer[1:]:
            i += 1
            entry.append(wgrads[i].reshape(a.shape))
        i += 1
        d_params.append(tuple(entry))
    return d_src, d_q, tuple(d_params)


# ---------------------------------------------------------------------------
# public custom-VJP op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 7))
def fused_sa_train(radius, nsample, norm, xyz, new_xyz, features, params,
                   precision="highest"):
    """Fused trainable SA level: returns pooled features (B, S, C_last).

    xyz: (B, N, 3); new_xyz: (B, S, 3) (FPS centroids); features:
    optional (B, N, F); params: tuple of per-layer tuples in kernel
    layout — (w (Co, Ci), b (Co,)) for ``norm='none'``,
    (w, b, gamma (Co,), beta (Co,)) for ``norm='layer'`` (pass flax
    Dense kernels transposed; grads chain back automatically).
    ``precision``: "highest" = f32 MXU passes for the MLP matmuls;
    "default" = single-pass bf16 (the bf16-model training precision).

    Differentiable in features / new_xyz / xyz (through the gathered
    values and relative coordinates; the neighbour SELECTION is
    piecewise-constant like every kNN/ball query) and in params.
    """
    out, _ = _fsa_fwd_res(radius, nsample, norm, xyz, new_xyz, features,
                          params, precision)
    return out


def _pack_xt(xyz, features):
    xt = jnp.swapaxes(xyz, 1, 2)
    if features is not None:
        xt = jnp.concatenate([xt, jnp.swapaxes(features, 1, 2)], axis=1)
    return xt


def _fsa_fwd_res(radius, nsample, norm, xyz, new_xyz, features, params,
                 precision):
    xt = _pack_xt(xyz, features)
    qt = jnp.swapaxes(new_xyz, 1, 2)
    out, idx = _fsa_train_fwd_raw(radius, nsample, norm, xt, qt,
                                  tuple(tuple(l) for l in params),
                                  precision=precision)
    return jnp.swapaxes(out, 1, 2), (out, idx)


def _fsa_fwd(radius, nsample, norm, xyz, new_xyz, features, params,
             precision="highest"):
    pooled, (out, idx) = _fsa_fwd_res(radius, nsample, norm, xyz, new_xyz,
                                      features, params, precision)
    return pooled, (xyz, new_xyz, features, params, out, idx)


def _fsa_bwd(radius, nsample, norm, precision, res, ct):
    xyz, new_xyz, features, params, out, idx = res
    d_out = jnp.swapaxes(ct, 1, 2).astype(jnp.float32)
    xt = _pack_xt(xyz, features)
    qt = jnp.swapaxes(new_xyz, 1, 2)
    d_src, d_q, d_params = _fsa_train_bwd_raw(
        radius, nsample, norm, xt, qt, idx, out, d_out,
        tuple(tuple(l) for l in params), precision=precision)
    d_xyz = jnp.swapaxes(d_src[:, :3, :], 1, 2).astype(xyz.dtype)
    d_new = jnp.swapaxes(d_q, 1, 2).astype(new_xyz.dtype)
    d_feat = None
    if features is not None:
        d_feat = jnp.swapaxes(d_src[:, 3:, :], 1, 2).astype(features.dtype)
    d_params = jax.tree_util.tree_map(
        lambda g, p: g.astype(p.dtype),
        tuple(d_params), tuple(tuple(l) for l in params))
    return d_xyz, d_new, d_feat, d_params


fused_sa_train.defvjp(_fsa_fwd, _fsa_bwd)
