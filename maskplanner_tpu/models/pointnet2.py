"""PointNet++ (SSG) building blocks in Flax.

TPU-native redesign of the reference primitives
(``models/pointnet2_utils.py:171-329``): grouping indices come from the
``ops`` layer (scan-FPS + top-k ball query), and the shared per-point MLPs
are expressed as Dense layers over the channel axis so XLA lowers them to
batched MXU matmuls fused with the BatchNorm/ReLU epilogue. Channel-last
layout throughout (the reference permutes to channel-first for Conv2d; on
TPU channel-last keeps the 128-lane axis dense).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.sampling import (farthest_point_sample, query_ball_point,
                            index_points, knn, _use_pallas)


def _use_fused_group() -> bool:
    return _use_pallas()


def _use_algebraic_bn() -> bool:
    """Folded-stats BatchNorm training path — OPT-IN experiment
    (MASKPLANNER_ALGEBRAIC_BN=1).

    Math-equal to nn.BatchNorm (tests/test_algebraic_bn.py) but measured
    SLOWER on v5e at the flagship shape (scripts/ab_algebraic_bn.py,
    round 4: f32 81.1 vs 46.8 ms, bf16 51.3 vs 32.8 ms at batch 64) — the
    per-layer (Cin,Cin) Gram over M≈1M rows at sa1 costs more than the
    HBM passes it saves. Default off; kept as a measured dead-end record
    and for future shapes where the fold could win."""
    import os

    return bool(os.environ.get("MASKPLANNER_ALGEBRAIC_BN"))


@jax.custom_vjp
def _relu_saveout(a):
    """ReLU whose VJP keys off the *output* instead of the input.

    ``jnp.maximum(a, 0)``'s VJP saves the pre-activation ``a`` — a
    full-size residual the folded-BN path otherwise never materializes.
    ``z > 0  <=>  a > 0`` (and at ``a <= 0`` both give zero cotangent),
    so gating on the saved output is gradient-identical while the
    residual dedups with the next layer's input."""
    return jnp.maximum(a, 0)


def _relu_saveout_fwd(a):
    z = jnp.maximum(a, 0)
    return z, z


def _relu_saveout_bwd(z, g):
    return (jnp.where(z > 0, g, jnp.zeros_like(g)),)


_relu_saveout.defvjp(_relu_saveout_fwd, _relu_saveout_bwd)


class _AlgebraicBatchNorm(nn.Module):
    """BatchNorm statistics holder with ``nn.BatchNorm``'s exact variable
    layout (params ``scale``/``bias``, batch_stats ``mean``/``var``) whose
    __call__ takes the *algebraically computed* batch moments of the
    pre-activation and returns the folded (inv, shift) pair. Checkpoints
    are interchangeable with the ``nn.BatchNorm`` branch."""

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, mu_y, var_y, train: bool):
        c = mu_y.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if train:
            mu, var = mu_y, var_y
            m = self.momentum
            ra_mean.value = (m * ra_mean.value
                             + (1.0 - m) * jax.lax.stop_gradient(mu))
            ra_var.value = (m * ra_var.value
                            + (1.0 - m) * jax.lax.stop_gradient(var))
        else:
            mu, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        return inv, bias - mu * inv


def _use_fused_sa() -> bool:
    """Whole-level fused SA kernel (opt out with MASKPLANNER_NO_FUSED_SA=1
    for A/B benchmarking)."""
    import os

    if os.environ.get("MASKPLANNER_NO_FUSED_SA"):
        return False
    return _use_pallas()


class PointMLP(nn.Module):
    """Shared per-point MLP: Dense -> norm -> ReLU stack.

    Equivalent to the reference's Conv2d(1x1)+BatchNorm2d+ReLU chains
    (models/pointnet2_utils.py:176-216). BatchNorm statistics are computed
    over all non-channel axes; under a sharded ``jit`` the batch axis is
    global, which gives cross-replica batch stats for free (no SyncBN
    machinery needed).

    ``norm`` selects the normalization (TPU study, SURVEY §7 hard parts):
    - "batch": reference-parity BatchNorm (cross-element stats — forces
      the unfused training path: every layer's (B,S,K,C) activations take
      extra HBM passes for the stats reductions).
    - "layer": per-element LayerNorm over channels — stats are local to
      each (b,s,k) element, so the whole level fuses into one kernel with
      no cross-element reductions. Convergence parity is validated by
      ``scripts/tpu_convergence_study.py --norm layer`` (docs/convergence.md).
    - "none": no normalization (ablation).
    """

    channels: Sequence[int]
    dtype: jnp.dtype = jnp.float32
    norm: str = "batch"

    def _folded_bn_layer(self, dense, li, x):
        """One training-mode Dense+BN+ReLU layer with *algebraic* batch
        statistics: the moments of ``y = xW + b`` over the batch set are
        computed from the input's mean and Gram matrix
        (``mu_y = x̄W + b``, ``var_c = w_cᵀ Cov(x) w_c``) — tiny
        (Cin, Cin) matmuls — after which the BN scale/shift folds into
        the Dense weights. The pre-BN tensor ``y`` and the normalized
        ``x̂`` are never materialized, in forward OR backward: each layer
        is one folded dot with a fused ReLU epilogue, cutting the
        HBM traffic of the BN-heavy grouped MLPs (the round-2 roofline
        gap, PARITY.md §6) while computing the same statistics up to
        float reassociation. Gradients flow through the moment algebra,
        reproducing true BatchNorm training gradients."""
        f32 = jnp.float32
        xl = x.astype(self.dtype)
        # materialize/bind the Dense params without running the big dot
        dense(jnp.zeros((1, x.shape[-1]), self.dtype))
        p = dense.variables["params"]
        w = p["kernel"].astype(f32)                       # (Cin, C)
        b = p["bias"].astype(f32)                         # (C,)
        x2 = xl.reshape(-1, xl.shape[-1])                 # (M, Cin)
        m = x2.shape[0]
        # stats precision: bf16 inputs multiply exactly into the f32
        # accumulator (one pass); f32 inputs take the 3-pass split so the
        # moments are f32-grade even where the backend's default matmul
        # precision is a single bf16 pass
        prec = (None if self.dtype == jnp.bfloat16
                else jax.lax.Precision.HIGH)
        xbar = jnp.mean(x2, axis=0, dtype=f32)            # (Cin,)
        gram = jnp.matmul(x2.T, x2, preferred_element_type=f32,
                          precision=prec) / m
        cov = gram - jnp.outer(xbar, xbar)                # (Cin, Cin)
        hi = jax.lax.Precision.HIGHEST
        mu_y = jnp.matmul(xbar, w, precision=hi) + b      # (C,)
        var_y = jnp.maximum(
            jnp.einsum("jc,jk,kc->c", w, cov, w, precision=hi), 0.0)
        inv, shift = _AlgebraicBatchNorm(name=f"BatchNorm_{li}")(
            mu_y, var_y, True)
        wf = (w * inv[None, :]).astype(self.dtype)
        # the Dense bias rides the shift: out = x(W·inv) + (b - mu_y)·inv
        # + beta. Under BN, b cancels against its own contribution to
        # mu_y — autodiff reproduces its exactly-zero gradient
        a = (jnp.matmul(xl, wf, preferred_element_type=self.dtype)
             + (b * inv + shift)).astype(self.dtype)
        return _relu_saveout(a)

    @nn.compact
    def __call__(self, x, train: bool):
        algebraic = (self.norm == "batch" and train and _use_algebraic_bn())
        for li, c in enumerate(self.channels):
            dense = nn.Dense(c, dtype=self.dtype, name=f"Dense_{li}")
            if algebraic:
                x = self._folded_bn_layer(dense, li, x)
                continue
            x = dense(x)
            if self.norm == "batch":
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    axis=-1,
                    dtype=jnp.float32,
                    name=f"BatchNorm_{li}",
                )(x)
            elif self.norm == "layer":
                x = nn.LayerNorm(dtype=jnp.float32, name=f"LayerNorm_{li}")(x)
            elif self.norm != "none":
                raise ValueError(f"unknown norm: {self.norm!r}")
            x = nn.relu(x)
        return x


class SetAbstraction(nn.Module):
    """PointNet++ set-abstraction level (single-scale grouping).

    Reference: ``PointNetSetAbstraction`` (models/pointnet2_utils.py:171-216).
    Input/output are channel-last: xyz (B, N, 3), features (B, N, D) or None.
    """

    npoint: int | None
    radius: float | None
    nsample: int | None
    mlp: Sequence[int]
    group_all: bool = False
    dtype: jnp.dtype = jnp.float32
    norm: str = "batch"

    def _fused_level(self, xyz, features, fps_key, train: bool):
        """Whole-level fused Pallas path for ``norm in ("layer", "none")``,
        differentiable end-to-end (``ops/pallas/fused_sa_train.py``): ball
        query + gather + MLP(+LayerNorm) + max-pool in one kernel, with a
        recompute-based custom VJP — no (B, S, K, C) activation tensor in
        HBM in either direction. Used for BOTH train and eval (these norms
        carry no cross-element state, so the paths coincide)."""
        from ..ops.pallas.fused_sa_train import fused_sa_train

        fps_idx = farthest_point_sample(xyz, self.npoint, key=fps_key)
        new_xyz = index_points(xyz, fps_idx)            # (B, S, 3)
        mlp = PointMLP(self.mlp, dtype=self.dtype, norm=self.norm)
        cin = 3 + (0 if features is None else features.shape[-1])
        # bind/materialize the submodule params (identical names to the
        # unfused path) without running the big unfused compute
        mlp(jnp.zeros((1, 1, 1, cin), xyz.dtype), train=False)
        p = mlp.variables["params"]
        layers = []
        for li in range(len(self.mlp)):
            dense = p[f"Dense_{li}"]
            layer = [jnp.swapaxes(dense["kernel"], 0, 1), dense["bias"]]
            if self.norm == "layer":
                ln = p[f"LayerNorm_{li}"]
                layer += [ln["scale"], ln["bias"]]
            layers.append(tuple(layer))
        f32 = jnp.float32
        feats32 = None if features is None else features.astype(f32)
        # bf16 models run the in-kernel MLP matmuls single-pass (same
        # compute precision as the unfused bf16 path) and the
        # feature-row gathers/scatters in one bf16 pass; f32 models use
        # bf16_3x passes (~1e-6 rel, half the MXU time of the 6-pass
        # f32 mode the parity tests pin)
        prec = "default" if self.dtype == jnp.bfloat16 else "high"
        pooled = fused_sa_train(
            float(self.radius), int(self.nsample), self.norm,
            xyz.astype(f32), new_xyz.astype(f32), feats32, tuple(layers),
            precision=prec)
        return new_xyz, pooled

    def _folded_inference(self, xyz, features, fps_key):
        """Folded-BN eval path: ball query + fused Pallas gather + plain
        Dense/ReLU chain with the eval-mode BatchNorm (running-stats scale +
        shift) folded into the Dense weights. Numerically equivalent to the
        unfused path up to BN-folding reassociation (same class as the
        retired whole-level fused kernel it replaces — which measured
        SLOWER than this: 4.85 vs 2.78 ms for sa2 at batch 64 on v5e; the
        fused kernel's serial per-tile MLP phases don't pipeline as well as
        XLA's batched matmul over the gathered tensor).

        Under bf16 the entire activation chain stays bf16 — this is what
        makes bf16 inference beat f32 (the unfused path's f32 BatchNorm
        layers kept all inter-layer traffic f32, which is why round-2 bf16
        eval measured slower than f32 on a bandwidth-bound model)."""
        from ..ops.pallas.group_gather import ball_group_pallas

        fps_idx = farthest_point_sample(xyz, self.npoint, key=fps_key)
        new_xyz = index_points(xyz, fps_idx)            # (B, S, 3)
        grouped, _ = ball_group_pallas(
            self.radius, self.nsample, xyz, new_xyz, features,
            single_pass=self.dtype == jnp.bfloat16)
        return new_xyz, self._folded_mlp(grouped, features)

    def _folded_mlp(self, grouped, features):
        """Eval-only folded Dense/ReLU chain over a grouped tensor."""
        from ..ops.pallas.fused_sa import fold_pointmlp_params

        mlp = PointMLP(self.mlp, dtype=self.dtype)
        cin = 3 + (0 if features is None else features.shape[-1])
        # materialize/bind the submodule params without running the big
        # unfused compute (eval mode: BatchNorm does not mutate stats)
        mlp(jnp.zeros((1, 1, 1, cin), grouped.dtype), train=False)
        folded = fold_pointmlp_params(mlp.variables)
        h = grouped.astype(self.dtype)
        for w, b in folded:  # w: (Cout, Cin) from fold_pointmlp_params
            h = jnp.maximum(
                jnp.matmul(h, jnp.swapaxes(w, 0, 1).astype(self.dtype),
                           preferred_element_type=self.dtype)
                + b.astype(self.dtype), 0)
        return jnp.max(h.astype(jnp.float32), axis=-2)

    @nn.compact
    def __call__(self, xyz, features, train: bool, fps_key=None,
                 full_points=None):
        B, N, _ = xyz.shape
        if fps_key is None and train and self.has_rng("fps"):
            # random FPS start per forward — the reference's sampling
            # stochasticity (models/pointnet2_utils.py:77); supplied by
            # the trainer via rngs={"fps": ...}, eval stays deterministic
            fps_key = self.make_rng("fps")
        # Eval-mode BN folding: always a win for feature-bearing levels
        # (sa2: 4.85 -> 2.78/2.44 ms f32/bf16 at batch 64). The xyz-only
        # first level stays unfused in f32 for F32 MODELS (its MLP is
        # 0.8 ms; folding buys nothing there) — but for BF16 MODELS the
        # folded path now pays off at sa1 too: the single-pass (hi-only)
        # gather halves the extraction matmuls that dominate the level,
        # and the folded bf16 Dense chain avoids the Dense(bf16)->BN(f32)
        # cast churn that caused round-2's bf16 inference regression.
        if (not train and not self.group_all and full_points is None
                and self.norm == "batch" and _use_fused_sa()
                and (features is not None
                     or self.dtype == jnp.bfloat16)):
            return self._folded_inference(xyz, features, fps_key)
        mlp_dtype = self.dtype
        if (not train and features is None and not self.group_all
                and self.dtype == jnp.bfloat16):
            mlp_dtype = jnp.float32
        if (not self.group_all and full_points is None
                and self.norm in ("layer", "none") and _use_fused_sa()):
            # trainable whole-level fusion (custom VJP, remat backward)
            return self._fused_level(xyz, features, fps_key, train)
        if self.group_all:
            # single global group (models/pointnet2_utils.py:152-168)
            new_xyz = jnp.zeros((B, 1, 3), xyz.dtype)
            grouped = xyz[:, None, :, :]  # (B, 1, N, 3)
            if features is not None:
                grouped = jnp.concatenate(
                    [grouped, features[:, None, :, :]], axis=-1
                )
            if not train and self.dtype == jnp.bfloat16:
                # bf16 eval at the global level: run the unfused chain in
                # f32, like sa1 (measured: f32 unfused ~0.0 ms at the
                # flagship shape vs 0.48 ms for the bf16 folded matmuls
                # and ~0.8 ms for the bf16 unfused cast-churn chain — the
                # (B, 1, S, C) tensors here are small enough that XLA's
                # fused f32 path wins outright)
                mlp_dtype = jnp.float32
        else:
            fps_idx = farthest_point_sample(xyz, self.npoint, key=fps_key)
            new_xyz = index_points(xyz, fps_idx)  # (B, S, 3)
            if full_points is not None:
                # group the full high-dim vectors while sampling/balling in
                # R^3 (reference sample_and_group full_points path,
                # models/pointnet2_utils.py:139-143)
                group_idx = query_ball_point(self.radius, self.nsample, xyz,
                                             new_xyz)
                grouped = index_points(full_points, group_idx)
            elif _use_fused_group():
                # fused ball-query + gather: XLA's row gathers are
                # tile-granular DMAs (6.4 ms for sa1's (B,S,K) rows of
                # width-3 xyz; most of sa2's cost for the wide feature
                # table); the Pallas kernel extracts neighbour values with
                # one-hot MXU contractions entirely in VMEM (blocked
                # two-stage for the narrow sa1 table)
                from ..ops.pallas.group_gather import ball_group_pallas

                # bf16 models: the MLP casts the grouped tensor to bf16
                # anyway — extract with the hi pass only (half the one-hot
                # MXU work; sa1's extraction dominates the encoder eval)
                grouped, _ = ball_group_pallas(
                    self.radius, self.nsample, xyz, new_xyz, features,
                    single_pass=mlp_dtype == jnp.bfloat16)
            else:
                group_idx = query_ball_point(self.radius, self.nsample, xyz,
                                             new_xyz)
                grouped_xyz = index_points(xyz, group_idx)  # (B, S, K, 3)
                grouped = grouped_xyz - new_xyz[:, :, None, :]
                if features is not None:
                    grouped = jnp.concatenate(
                        [grouped, index_points(features, group_idx)], axis=-1
                    )

        feat = PointMLP(self.mlp, dtype=mlp_dtype,
                        norm=self.norm)(grouped, train=train)
        # max over neighbourhood K, pooled at f32 regardless of norm mode
        # (batch/layer already emit f32 from the norm layer; norm=none
        # would otherwise pool in bf16, and the reduce_max VJP rejects the
        # f32 cotangent arriving from the f32 head/loss boundary)
        new_features = jnp.max(feat.astype(jnp.float32), axis=-2)
        return new_xyz, new_features


class SetAbstractionMsg(nn.Module):
    """PointNet++ set-abstraction level with multi-scale grouping (MSG).

    Reference: ``PointNetSetAbstractionMsg``
    (models/pointnet2_utils.py:219-276) — defined but never instantiated in
    any released reference path; ported for completeness (VERDICT r3 item 9).
    One FPS draw of ``npoint`` centers shared across scales; each scale i
    ball-queries ``radii[i]``/``nsamples[i]`` neighbours, concatenates the
    gathered features with the RELATIVE xyz offsets (feature-first order,
    reference :261-263), runs its own Conv-BN-ReLU stack (``PointMLP``),
    max-pools over the neighbourhood, and the per-scale descriptors
    concatenate along channels. Channel-last throughout, like
    ``SetAbstraction``.
    """

    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    dtype: jnp.dtype = jnp.float32
    norm: str = "batch"

    @nn.compact
    def __call__(self, xyz, features, train: bool, fps_key=None):
        assert len(self.radii) == len(self.nsamples) == len(self.mlps)
        if fps_key is None and train and self.has_rng("fps"):
            fps_key = self.make_rng("fps")
        fps_idx = farthest_point_sample(xyz, self.npoint, key=fps_key)
        new_xyz = index_points(xyz, fps_idx)            # (B, S, 3)
        scale_feats = []
        for i, (radius, nsample, mlp) in enumerate(
                zip(self.radii, self.nsamples, self.mlps)):
            group_idx = query_ball_point(radius, nsample, xyz, new_xyz)
            grouped_xyz = (index_points(xyz, group_idx)
                           - new_xyz[:, :, None, :])    # (B, S, K, 3)
            if features is not None:
                grouped = jnp.concatenate(
                    [index_points(features, group_idx), grouped_xyz],
                    axis=-1)
            else:
                grouped = grouped_xyz
            feat = PointMLP(mlp, dtype=self.dtype, norm=self.norm,
                            name=f"mlp_{i}")(grouped, train=train)
            scale_feats.append(jnp.max(feat.astype(jnp.float32), axis=-2))
        return new_xyz, jnp.concatenate(scale_feats, axis=-1)


class FeaturePropagation(nn.Module):
    """Inverse-distance 3-NN feature upsampling.

    Reference: ``PointNetFeaturePropagation``
    (models/pointnet2_utils.py:279-329). Used by the segmentation variants.
    """

    mlp: Sequence[int]
    dtype: jnp.dtype = jnp.float32
    norm: str = "batch"

    @nn.compact
    def __call__(self, xyz1, xyz2, feat1, feat2, train: bool):
        B, N, _ = xyz1.shape
        S = xyz2.shape[1]
        if S == 1:
            interpolated = jnp.broadcast_to(feat2, (B, N, feat2.shape[-1]))
        else:
            dists, idx = knn(3, xyz1, xyz2)
            w = 1.0 / (dists + 1e-8)
            w = w / w.sum(axis=-1, keepdims=True)
            neighbors = index_points(feat2, idx)  # (B, N, 3, C)
            interpolated = (neighbors * w[..., None]).sum(axis=-2)
        x = (
            jnp.concatenate([feat1, interpolated], axis=-1)
            if feat1 is not None
            else interpolated
        )
        return PointMLP(self.mlp, dtype=self.dtype,
                        norm=self.norm)(x, train=train)


class PointNet2Encoder(nn.Module):
    """The shared SSG encoder: sa1 -> sa2 -> sa3(group_all) -> 1024-d global.

    Layer sizes follow the reference backbone
    (models/pointnet2_cls_ssg.py:266-268).

    ``norm`` is either one mode for all levels ("batch" | "layer" |
    "none") or a per-level hybrid spec joined with "+"
    (e.g. ``"layer+batch+batch"`` = fused layer-norm at sa1, reference
    BatchNorm at sa2/sa3): the fused whole-level Pallas train path only
    exists for layer/none levels, so a hybrid buys most of the fused
    path's step-time win while keeping BatchNorm where convergence
    demands it (docs/convergence.md norm study).
    """

    dtype: jnp.dtype = jnp.float32
    norm: str = "batch"

    @nn.compact
    def __call__(self, xyz, train: bool, fps_keys=None):
        norms = self.norm.split("+")
        if len(norms) == 1:
            norms = norms * 3
        assert len(norms) == 3, f"per-level norm spec needs 3 entries: " \
                                f"{self.norm!r}"
        k1 = k2 = None
        if fps_keys is not None:
            k1, k2 = fps_keys
        l1_xyz, l1_f = SetAbstraction(512, 0.2, 32, (64, 64, 128), dtype=self.dtype,
                                      norm=norms[0],
                                      name="sa1")(xyz, None, train, fps_key=k1)
        l2_xyz, l2_f = SetAbstraction(128, 0.4, 64, (128, 128, 256), dtype=self.dtype,
                                      norm=norms[1],
                                      name="sa2")(l1_xyz, l1_f, train, fps_key=k2)
        _, l3_f = SetAbstraction(None, None, None, (256, 512, 1024), group_all=True,
                                 dtype=self.dtype, norm=norms[2],
                                 name="sa3")(l2_xyz, l2_f, train)
        return l3_f[:, 0, :]  # (B, 1024)


class RegressionHead(nn.Module):
    """fc1 -> BN -> ReLU -> dropout -> fc2 -> BN -> ReLU -> dropout trunk.

    Reference trunk of every regressor head
    (models/pointnet2_cls_ssg.py:270-276, 297-343). ``use_bn=False``
    reproduces heads that use plain ReLU (e.g. seg-confidence head,
    models/pointnet2_cls_ssg.py:314-317).
    """

    hidden: Sequence[int] = (1024, 1024)
    dropout: float = 0.3
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        for h in self.hidden:
            x = nn.Dense(h, dtype=self.dtype)(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 dtype=jnp.float32)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


def assemble_pose_output(positions, normals, out_vectors: int, weight_orient: float):
    """Interleave per-point positions and unit orientations into segments.

    positions: (B, out_vectors*λ*3) raw head output
    normals:   (B, out_vectors*λ*3) raw orientation head output (pre-tanh'd)
    Returns (B, out_vectors, λ*6) with per-point [x,y,z,nx,ny,nz] layout —
    reference models/pointnet2_cls_ssg.py:330-341.
    """
    B = positions.shape[0]
    p = positions.reshape(B, -1, 3)
    n = jnp.tanh(normals).reshape(B, -1, 3)
    # rsqrt(|n|^2 + eps): keeps the backward finite when a raw orientation
    # is exactly 0 (happens when BatchNorm sees a batch of identical rows —
    # e.g. overfitting mode at batch 1 — and its output collapses to beta=0;
    # x / max(|x|, 1e-12) NaNs there)
    n = n * jax.lax.rsqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-12)
    n = n * weight_orient
    out = jnp.concatenate([p, n], axis=-1)  # (B, out_vectors*λ, 6)
    return out.reshape(B, out_vectors, -1)
