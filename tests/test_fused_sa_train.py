"""Trainable fused SA kernel parity (interpret mode on CPU).

``ops/pallas/fused_sa_train.py`` fuses a whole PointNet++ set-abstraction
level (ball query + gather + MLP(+LayerNorm) + max-pool) into one forward
kernel and one recompute-based backward kernel for ``norm in ("layer",
"none")``. These tests assert numeric parity — values AND every gradient
(d_xyz, d_new_xyz, d_features, d_params) — against the unfused XLA path
(reference semantics: models/pointnet2_utils.py:171-216, first-K in-radius
selection :89-109), both at the raw-op level and through the
``SetAbstraction`` Flax module.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp)


def _unfused(radius, K, norm, xyz, new_xyz, features, params):
    from maskplanner_tpu.ops.sampling import query_ball_point

    gi = query_ball_point(radius, K, xyz, new_xyz)          # (B, S, K)
    g = (jnp.take_along_axis(xyz[:, None], gi[..., None], axis=2)
         - new_xyz[:, :, None, :])
    if features is not None:
        f = jnp.take_along_axis(features[:, None].repeat(gi.shape[1], 1),
                                gi[..., None], axis=2)
        g = jnp.concatenate([g, f], axis=-1)
    h = g
    for layer in params:
        w, b = layer[0], layer[1]
        h = jnp.einsum("bskc,oc->bsko", h, w) + b
        if norm == "layer":
            gamma, beta = layer[2], layer[3]
            mu = h.mean(-1, keepdims=True)
            var = ((h - mu) ** 2).mean(-1, keepdims=True)
            h = (h - mu) * jax.lax.rsqrt(var + 1e-6) * gamma + beta
        h = jnp.maximum(h, 0.0)
    return h.max(axis=2)                                    # (B, S, C)


def _make_case(rng, norm, with_features, B=2, N=256, S=64, chans=(16, 24)):
    xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32)) * 0.5
    new_xyz = xyz[:, :S]
    feats = (jnp.asarray(rng.normal(size=(B, N, 5)).astype(np.float32))
             if with_features else None)
    ci = 3 + (5 if with_features else 0)
    params = []
    for co in chans:
        layer = [
            jnp.asarray(rng.normal(size=(co, ci)).astype(np.float32)) * 0.3,
            jnp.asarray(rng.normal(size=(co,)).astype(np.float32)) * 0.1,
        ]
        if norm == "layer":
            layer += [
                jnp.asarray(rng.normal(size=(co,)).astype(np.float32)) * 0.2
                + 1.0,
                jnp.asarray(rng.normal(size=(co,)).astype(np.float32)) * 0.1,
            ]
        params.append(tuple(layer))
        ci = co
    return xyz, new_xyz, feats, tuple(params)


class TestFusedSATrainOp:
    @pytest.mark.parametrize("norm", ["none", "layer"])
    @pytest.mark.parametrize("with_features", [False, True])
    def test_forward_and_grads_match_unfused(self, rng, norm, with_features):
        from maskplanner_tpu.ops.pallas.fused_sa_train import fused_sa_train

        radius, K = 0.35, 16
        xyz, new_xyz, feats, params = _make_case(rng, norm, with_features)

        a = fused_sa_train(radius, K, norm, xyz, new_xyz, feats, params)
        b = _unfused(radius, K, norm, xyz, new_xyz, feats, params)
        scale = float(jnp.abs(b).max())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5 * scale)

        ct = jnp.asarray(rng.normal(size=a.shape).astype(np.float32))

        def loss_fused(xyz, new_xyz, feats, params):
            return jnp.sum(fused_sa_train(radius, K, norm, xyz, new_xyz,
                                          feats, params) * ct)

        def loss_ref(xyz, new_xyz, feats, params):
            return jnp.sum(_unfused(radius, K, norm, xyz, new_xyz, feats,
                                    params) * ct)

        argnums = (0, 1, 3) if feats is None else (0, 1, 2, 3)
        ga = jax.grad(loss_fused, argnums)(xyz, new_xyz, feats, params)
        gb = jax.grad(loss_ref, argnums)(xyz, new_xyz, feats, params)
        for xi, yi in zip(jax.tree_util.tree_leaves(ga),
                          jax.tree_util.tree_leaves(gb)):
            s = float(jnp.abs(yi).max()) + 1e-9
            np.testing.assert_allclose(np.asarray(xi), np.asarray(yi),
                                       atol=5e-4 * s)

    @pytest.mark.parametrize("precision", ["high", "default"])
    def test_reduced_precision_modes(self, rng, precision):
        """bf16-model ("default": single-pass MXU matmuls + single-pass
        feature gathers) and f32-model ("high": bf16_3x) precision modes
        stay within their expected tolerance of the f32 reference."""
        from maskplanner_tpu.ops.pallas.fused_sa_train import fused_sa_train

        radius, K = 0.35, 16
        xyz, new_xyz, feats, params = _make_case(rng, "layer", True)
        a = fused_sa_train(radius, K, "layer", xyz, new_xyz, feats, params,
                           precision=precision)
        b = _unfused(radius, K, "layer", xyz, new_xyz, feats, params)
        tol = 2e-2 if precision == "default" else 1e-4
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b),
            atol=tol * float(jnp.abs(b).max()))

    def test_nonaligned_shapes(self, rng):
        """S not a tile multiple, K not a multiple of 8, odd channels."""
        from maskplanner_tpu.ops.pallas.fused_sa_train import fused_sa_train

        radius, K = 0.4, 10
        xyz, new_xyz, feats, params = _make_case(
            rng, "layer", True, B=1, N=200, S=50, chans=(12, 20))
        a = fused_sa_train(radius, K, "layer", xyz, new_xyz, feats, params)
        b = _unfused(radius, K, "layer", xyz, new_xyz, feats, params)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b),
            atol=2e-5 * float(jnp.abs(b).max()))


class TestFusedSetAbstractionModule:
    @pytest.mark.parametrize("norm", ["none", "layer"])
    def test_module_parity_values_and_param_grads(self, rng, norm,
                                                  monkeypatch):
        """SetAbstraction fused path == unfused path through Flax, with
        identical param naming (checkpoints interchangeable) and matching
        parameter gradients."""
        import maskplanner_tpu.models.pointnet2 as pn2

        xyz = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
        feats = jnp.asarray(rng.normal(size=(2, 128, 8)).astype(np.float32))
        sa = pn2.SetAbstraction(32, 0.4, 8, (16, 32), norm=norm)
        variables = sa.init(jax.random.PRNGKey(0), xyz, feats, train=False)

        monkeypatch.setattr(pn2, "_use_fused_sa", lambda: False)
        ref_xyz, ref_f = sa.apply(variables, xyz, feats, train=True)

        monkeypatch.setattr(pn2, "_use_fused_sa", lambda: True)
        got_xyz, got_f = sa.apply(variables, xyz, feats, train=True)

        np.testing.assert_allclose(np.asarray(got_xyz), np.asarray(ref_xyz))
        np.testing.assert_allclose(
            np.asarray(got_f), np.asarray(ref_f),
            atol=3e-5 * float(jnp.abs(ref_f).max()))

        ct = jnp.asarray(rng.normal(size=ref_f.shape).astype(np.float32))

        def loss(params, fused):
            monkeypatch.setattr(pn2, "_use_fused_sa", lambda: fused)
            _, f = sa.apply({"params": params}, xyz, feats, train=True)
            return jnp.sum(f * ct)

        g_ref = jax.grad(loss)(variables["params"], False)
        g_fused = jax.grad(loss)(variables["params"], True)
        flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
        flat_fused = jax.tree_util.tree_leaves_with_path(g_fused)
        assert [p for p, _ in flat_ref] == [p for p, _ in flat_fused]
        for (path, a), (_, b) in zip(flat_fused, flat_ref):
            s = float(jnp.abs(b).max()) + 1e-9
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4 * s,
                err_msg=str(path))
