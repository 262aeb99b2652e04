"""Algebraic-stats folded BatchNorm training path.

``models/pointnet2.py::PointMLP._folded_bn_layer`` computes each layer's
BatchNorm batch statistics from the *input's* mean and Gram matrix
(``mu_y = x̄W + b``, ``var_c = w_cᵀ Cov(x) w_c``) and folds the
normalization into the Dense weights, so the pre-BN tensor is never
materialized (reference semantics: the Conv2d+BatchNorm2d+ReLU chains of
models/pointnet2_utils.py:176-216). These tests assert the path is
numerically interchangeable with the flax ``nn.BatchNorm`` branch —
forward values, running-stats updates, and every parameter/input
gradient — and that the variable tree (checkpoint layout) is identical.

Run under HIGHEST matmul precision: the comparison target is math
equality up to f32 reassociation, not the backend's default bf16-pass
matmul noise.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from maskplanner_tpu.models import pointnet2 as pn2
from maskplanner_tpu.models.pointnet2 import PointMLP


@pytest.fixture(autouse=True)
def highest_precision():
    with jax.default_matmul_precision("highest"):
        yield


def _switch(monkeypatch, on: bool):
    monkeypatch.setattr(pn2, "_use_algebraic_bn", lambda: on)


def _run(mlp, v, x, params=None):
    params = v["params"] if params is None else params

    def loss(p):
        out, mut = mlp.apply({"params": p, "batch_stats": v["batch_stats"]},
                             x, train=True, mutable=["batch_stats"])
        return jnp.sum(out ** 2) / out.size, (out, mut["batch_stats"])

    (l, (out, stats)), g = jax.value_and_grad(loss, has_aux=True)(params)
    return l, out, stats, g


class TestAlgebraicBN:
    @pytest.fixture()
    def setup(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(4, 16, 8, 7).astype(np.float32) * 2 + 0.5)
        mlp = PointMLP((12, 24), dtype=jnp.float32, norm="batch")
        v = mlp.init(jax.random.PRNGKey(0), x, train=False)
        return mlp, v, x

    def test_variable_tree_identical(self, setup, monkeypatch):
        mlp, v, x = setup
        _switch(monkeypatch, True)
        _, _, stats, g = _run(mlp, v, x)
        assert set(g) == {"Dense_0", "Dense_1", "BatchNorm_0", "BatchNorm_1"}
        assert set(stats["BatchNorm_0"]) == {"mean", "var"}
        assert set(g["BatchNorm_0"]) == {"scale", "bias"}
        # init (train=False, nn.BatchNorm branch) produced this tree; the
        # algebraic apply must consume/emit the very same structure
        assert (jax.tree_util.tree_structure(stats)
                == jax.tree_util.tree_structure(v["batch_stats"]))

    def test_forward_stats_grad_parity(self, setup, monkeypatch):
        mlp, v, x = setup
        # perturb every param away from init — zero Dense biases and unit
        # BN scales would mask folding mistakes (the bias folds into the
        # shift and must cancel exactly out of the normalized output)
        keys = jax.random.split(jax.random.PRNGKey(3), 64)
        leaves, treedef = jax.tree_util.tree_flatten(v["params"])
        params = jax.tree_util.tree_unflatten(treedef, [
            leaf + 0.3 * jax.random.normal(k, leaf.shape, leaf.dtype)
            for leaf, k in zip(leaves, keys)])
        _switch(monkeypatch, False)
        l0, o0, s0, g0 = _run(mlp, v, x, params)
        _switch(monkeypatch, True)
        l1, o1, s1, g1 = _run(mlp, v, x, params)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                                   rtol=1e-4, atol=1e-4)
        assert abs(float(l1 - l0)) <= 1e-4 * abs(float(l0)) + 1e-6
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4),
            s1, s0)
        # atol floor 1e-6: the Dense bias grad is exactly 0 in the
        # algebraic path (b cancels out of the normalized output) and only
        # numerically ~1e-7 in the unfused one; real grads here are O(0.1)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3,
                atol=2e-3 * float(jnp.max(jnp.abs(b))) + 1e-6),
            g1, g0)

    def test_three_dim_input(self, monkeypatch):
        # FeaturePropagation feeds (B, N, C) tensors through PointMLP
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(3, 32, 5).astype(np.float32))
        mlp = PointMLP((8,), dtype=jnp.float32, norm="batch")
        v = mlp.init(jax.random.PRNGKey(0), x, train=False)
        _switch(monkeypatch, False)
        _, o0, s0, _ = _run(mlp, v, x)
        _switch(monkeypatch, True)
        _, o1, s1, _ = _run(mlp, v, x)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                                   rtol=1e-4, atol=1e-4)

    def test_bf16_runs_and_matches_class(self, setup, monkeypatch):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(4, 16, 8, 7).astype(np.float32))
        mlp16 = PointMLP((12, 24), dtype=jnp.bfloat16, norm="batch")
        v = mlp16.init(jax.random.PRNGKey(0), x, train=False)
        _switch(monkeypatch, False)
        _, o0, _, _ = _run(mlp16, v, x)
        _switch(monkeypatch, True)
        _, o1, _, _ = _run(mlp16, v, x)
        assert o1.dtype == jnp.bfloat16
        assert bool(jnp.all(jnp.isfinite(o1.astype(jnp.float32))))
        # bf16 rounding class: unfused path emits f32 post-BN activations,
        # folded path emits bf16 — agreement is bounded by bf16 eps
        np.testing.assert_allclose(np.asarray(o1, dtype=np.float32),
                                   np.asarray(o0, dtype=np.float32),
                                   rtol=0.1, atol=0.1)

    def test_eval_path_untouched(self, setup, monkeypatch):
        mlp, v, x = setup
        # eval always runs the nn.BatchNorm branch — flag must not matter
        _switch(monkeypatch, True)
        e1 = mlp.apply(v, x, train=False)
        _switch(monkeypatch, False)
        e0 = mlp.apply(v, x, train=False)
        np.testing.assert_array_equal(np.asarray(e1), np.asarray(e0))

    def test_running_stats_momentum_semantics(self, setup, monkeypatch):
        mlp, v, x = setup
        _switch(monkeypatch, True)
        _, _, s1, _ = _run(mlp, v, x)
        # fresh stats: ra = 0.9*init + 0.1*batch; init mean=0, var=1
        b0 = s1["BatchNorm_0"]
        batch_mean = np.asarray(b0["mean"]) / 0.1
        x2 = np.asarray(x, dtype=np.float64).reshape(-1, x.shape[-1])
        # layer-0 pre-activation moments from f64 ground truth
        k = np.asarray(v["params"]["Dense_0"]["kernel"], dtype=np.float64)
        bb = np.asarray(v["params"]["Dense_0"]["bias"], dtype=np.float64)
        y = x2 @ k + bb
        np.testing.assert_allclose(batch_mean, y.mean(0), rtol=1e-4,
                                   atol=1e-5)
        batch_var = (np.asarray(b0["var"]) - 0.9) / 0.1
        np.testing.assert_allclose(batch_var, y.var(0), rtol=1e-3,
                                   atol=1e-5)
