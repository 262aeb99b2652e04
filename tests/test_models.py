"""Shape/finite checks for the model zoo (reference models/ parity)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from maskplanner_tpu.models import (
    DGCNNDiscriminator,
    MLPRegressor,
    PointNet2Segmenter,
    PointNet2SegmenterPaintNet,
    PointNet2SoPs,
    PointNet2StrokeWise,
    PointNetRegressor,
    PointNetSegmenter,
    PointTransformer,
    get_model,
)
from maskplanner_tpu.utils.args import load_args


def _pc(rng, B=2, N=64, C=3):
    return jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))


class TestModelZoo:
    def test_pointnet_regressor(self, rng):
        m = PointNetRegressor(out_vectors=10, outdim=3, affinetrans=True)
        v = m.init(jax.random.PRNGKey(0), _pc(rng), train=False)
        out = m.apply(v, _pc(rng), train=False)
        assert out.shape == (2, 10, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_pointnet_deeper(self, rng):
        m = PointNetRegressor(out_vectors=10, outdim=3, deeper=True)
        v = m.init(jax.random.PRNGKey(0), _pc(rng), train=False)
        out = m.apply(v, _pc(rng), train=False)
        assert out.shape == (2, 10, 3)
        # deeper extractor has the extra conv stages (3 Dense in mlp2)
        stack = v["params"]["feat"]["mlp2"]
        assert len([k for k in stack if k.startswith("Dense")]) == 3

    def test_factory_deeper_and_generator(self, rng):
        cfg = load_args(argv=["config=[maskplanner,cuboids_v2]",
                              "extra_data=[]", "lambda_points=1",
                              "overlapping=0", "traj_points=40",
                              "n_pred_traj_points=40",
                              "random_input_dim=16"])
        m = get_model(cfg, which="pointnet_deeper", io_type="paintnet")
        v = m.init(jax.random.PRNGKey(0), _pc(rng), train=False)
        out = m.apply(v, _pc(rng), train=False)
        assert out.shape[0] == 2 and np.isfinite(np.asarray(out)).all()

        g = get_model(cfg, which="mlp_generator", io_type="paintnet")
        noise = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
        gv = g.init(jax.random.PRNGKey(0), noise, train=False)
        gout = g.apply(gv, noise, train=False)
        assert gout.shape[0] == 2

        for dead in ("samplenet", "gnn", "transformer"):
            with pytest.raises(NotImplementedError):
                get_model(cfg, which=dead, io_type="paintnet")

    def test_pointnet_segmenter(self, rng):
        m = PointNetSegmenter(outdim=8)
        v = m.init(jax.random.PRNGKey(0), _pc(rng), train=False)
        out = m.apply(v, _pc(rng), train=False)
        assert out.shape == (2, 64, 8)

    def test_pointnet2_segmenter_ball_in_xyz(self, rng):
        m = PointNet2Segmenter(outdim=4, lambda_points=4,
                               ball_in_xyz_space=True)
        x = _pc(rng, N=40, C=24)  # 40 segments of lambda=4 x 6d poses
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        out = m.apply(v, x, train=False)
        assert out.shape == (2, 40, 4)

    def test_pointnet2_segmenter_paintnet(self, rng):
        m = PointNet2SegmenterPaintNet(lambda_points=2)
        x = _pc(rng, N=48, C=3)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        out = m.apply(v, x, train=False)
        assert out.shape == (2, 48, 12)
        # orientations unit-normalized * weight_orient
        n = np.asarray(out).reshape(2, 48, 2, 6)[..., 3:]
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)

    @pytest.mark.parametrize("norm", ["layer", "none"])
    def test_encoder_norm_knob(self, rng, norm):
        """model.norm selects the encoder normalization (TPU norm study:
        LayerNorm removes BatchNorm's cross-element stats reductions so the
        train path fuses; see PointMLP docstring)."""
        cfg = load_args(argv=["config=[maskplanner,cuboids_v2]",
                              "pc_points=64", "n_pred_traj_points=80",
                              f"model.norm={norm}"])
        m = get_model(cfg)
        x = _pc(rng, N=64)
        keys = {"params": jax.random.PRNGKey(0),
                "fps": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2)}
        v = m.init(keys, x, train=True)
        # no BatchNorm state: the whole model is stateless under train
        assert "batch_stats" not in v or not any(
            "encoder" in k for k in v.get("batch_stats", {}))
        out, _ = m.apply(v, x, train=True, mutable=["batch_stats"],
                         rngs=keys)
        assert np.isfinite(np.asarray(out.traj)).all()

        def loss(params):
            o, _ = m.apply({**v, "params": params}, x, train=True,
                           mutable=["batch_stats"], rngs=keys)
            return jnp.sum(jnp.abs(o.traj))

        g = jax.grad(loss)(v["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

    def test_encoder_norm_hybrid_per_level(self, rng):
        """Per-level hybrid spec "layer+batch+batch": sa1 runs the fused
        layer-norm path, sa2/sa3 keep reference BatchNorm (the step-time /
        convergence compromise — PointNet2Encoder docstring)."""
        import flax

        cfg = load_args(argv=["config=[maskplanner,cuboids_v2]",
                              "pc_points=64", "n_pred_traj_points=80",
                              "model.norm=layer+batch+batch"])
        m = get_model(cfg)
        x = _pc(rng, N=64)
        keys = {"params": jax.random.PRNGKey(0),
                "fps": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2)}
        v = m.init(keys, x, train=True)
        names = {"/".join(k) for k in
                 flax.traverse_util.flatten_dict(v["params"])}
        assert any("sa1" in n and "LayerNorm" in n for n in names)
        assert not any("sa1" in n and "BatchNorm" in n for n in names)
        assert any("sa2" in n and "BatchNorm" in n for n in names)
        out, _ = m.apply(v, x, train=True, mutable=["batch_stats"],
                         rngs=keys)
        assert np.isfinite(np.asarray(out.traj)).all()

        def loss(params):
            o, _ = m.apply({**v, "params": params}, x, train=True,
                           mutable=["batch_stats"], rngs=keys)
            return jnp.sum(jnp.abs(o.traj))

        g = jax.grad(loss)(v["params"])
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree_util.tree_leaves(g))

    def test_encoder_norm_unknown_raises(self, rng):
        cfg = load_args(argv=["config=[maskplanner,cuboids_v2]",
                              "pc_points=64", "n_pred_traj_points=80",
                              "model.norm=group"])
        m = get_model(cfg)
        with pytest.raises(ValueError, match="unknown norm"):
            m.init({"params": jax.random.PRNGKey(0),
                    "fps": jax.random.PRNGKey(1),
                    "dropout": jax.random.PRNGKey(2)},
                   _pc(rng, N=64), train=True)

    def test_dgcnn_discriminator(self, rng):
        m = DGCNNDiscriminator(k=8)
        v = m.init(jax.random.PRNGKey(0), _pc(rng, N=32), train=False)
        out = m.apply(v, _pc(rng, N=32), train=False)
        assert out.shape == (2, 1)

    def test_mlp_regressor_with_confidence(self, rng):
        m = MLPRegressor(out_vectors=5, outdim_trasl=3, hidden_sizes=(32, 16),
                         outdim_orient=3, confidence_scores=True)
        x = jnp.asarray(rng.normal(size=(2, 12)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        out, scores = m.apply(v, x, train=False)
        assert out.shape == (2, 5, 6) and scores.shape == (2, 5, 1)

    def test_strokewise(self, rng):
        m = PointNet2StrokeWise(n_strokes=4, stroke_points=6,
                                hidden_size=(64, 64))
        v = m.init(jax.random.PRNGKey(0), _pc(rng), train=False)
        strokes, point_conf, stroke_conf = m.apply(v, _pc(rng), train=False)
        assert strokes.shape == (2, 4, 36)
        assert point_conf.shape == (2, 4, 6)
        assert stroke_conf.shape == (2, 4)

    def test_point_transformer_teacher_forcing_and_ar(self, rng):
        m = PointTransformer(d_model=32, nhead=2, num_layers=1,
                             dim_feedforward=64, max_seq_len=6,
                             input_dim=3, outdim=6)
        src = _pc(rng, N=10)
        tgt = jnp.asarray(rng.normal(size=(2, 5, 6)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), src, tgt, train=False)
        pts, eos = m.apply(v, src, tgt, train=False)
        assert pts.shape == (2, 6, 6) and eos.shape == (2, 6, 1)
        pts_ar, eos_ar = m.apply(v, src, None, train=False)
        assert pts_ar.shape == (2, 6, 6) and eos_ar.shape == (2, 6, 1)

    def test_autoregressive_sop_rollout(self, rng):
        """lax.scan rollout: shapes, finiteness, and history causality
        (reference utils/training.py:8-67 contract)."""
        from maskplanner_tpu.train import sample_autoregressive_inference_sop

        H, D, steps, n_strokes, proto = 3, 6, 5, 4, 8
        m = MLPRegressor(out_vectors=1, outdim_trasl=3, outdim_orient=3,
                         hidden_sizes=(32,), confidence_scores=True)
        x0 = jnp.zeros((n_strokes, proto + H * D), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x0, train=False)
        sops = jnp.asarray(rng.normal(size=(n_strokes, proto)).astype(np.float32))
        paths, eops = sample_autoregressive_inference_sop(
            m.apply, v, sops, history_length=H, output_length=D,
            max_rollout_steps=steps)
        assert paths.shape == (n_strokes, steps, D)
        assert eops.shape == (n_strokes, steps, 1)
        assert np.isfinite(np.asarray(paths)).all()
        # different SoPs -> different rollouts (conditioning works)
        paths2, _ = sample_autoregressive_inference_sop(
            m.apply, v, sops + 1.0, history_length=H, output_length=D,
            max_rollout_steps=steps)
        assert not np.allclose(np.asarray(paths), np.asarray(paths2))

    def test_factory_sops(self, rng):
        cfg = load_args(argv=["config=[maskplanner,cuboids_v2]",
                              "out_prototypes=8", "pc_points=64"])
        m = get_model(cfg, which="pointnet2_sops")
        x = _pc(rng, N=64)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        tokens, conf = m.apply(v, x, train=False)
        assert tokens.shape == (2, 8, 6)


class TestBatchOneBNBypass:
    def test_pointnet_regressor_batch1_bypasses_bn(self, rng):
        """Reference quirk: PointNetRegressor skips head BatchNorm when
        batch == 1 (models/pointnet.py:200-208). Param tree must be
        identical across batch sizes."""
        import jax
        import jax.numpy as jnp
        from maskplanner_tpu.models.pointnet import PointNetRegressor

        m = PointNetRegressor(out_vectors=5, outdim=6)
        x1 = jnp.asarray(rng.normal(size=(1, 32, 3)).astype(np.float32))
        x2 = jnp.concatenate([x1, x1], axis=0)
        v1 = m.init(jax.random.PRNGKey(0), x1, train=True)
        v2 = m.init(jax.random.PRNGKey(0), x2, train=True)
        assert (jax.tree_util.tree_structure(v1)
                == jax.tree_util.tree_structure(v2))

        out1, _ = m.apply(v1, x1, train=True, mutable=["batch_stats"],
                          rngs={"dropout": jax.random.PRNGKey(1)})
        assert np.isfinite(np.asarray(out1)).all()
        # batch-2 of identical rows goes THROUGH BN (zero-variance
        # normalization) -> different output than the bypassed batch-1
        out2, _ = m.apply(v1, x2, train=True, mutable=["batch_stats"],
                          rngs={"dropout": jax.random.PRNGKey(1)})
        assert not np.allclose(np.asarray(out1[0]), np.asarray(out2[0]))
