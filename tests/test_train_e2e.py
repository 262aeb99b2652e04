"""End-to-end training smoke tests (tiny shapes, CPU)."""
import os

import numpy as np
import pytest

from maskplanner_tpu.utils.args import load_args


def tiny_config(tmp_path, **over):
    argv = ["config=[maskplanner,cuboids_v2,longx_v2,debug]",
            "pc_points=64", "n_pred_traj_points=80", "batch_size=2",
            "epochs=4", "eval_freq=2", "dataset_size=2",
            "test_dataset_size=2", "no_save=false", "seed=1",
            f"output_dir={tmp_path}"]
    argv += [f"{k}={v}" for k, v in over.items()]
    return load_args(argv=argv)


class TestTrainDriver:
    def test_full_driver_trains_and_checkpoints(self, tmp_path):
        import train_maskplanner

        run_dir, state = train_maskplanner.main(tiny_config(tmp_path))
        assert os.path.isdir(os.path.join(run_dir, "last_checkpoint"))
        assert os.path.isdir(os.path.join(run_dir, "best_model"))
        assert os.path.isfile(os.path.join(run_dir, "config.yaml"))
        assert os.path.isfile(os.path.join(run_dir, "summary.json"))
        results = os.listdir(os.path.join(run_dir, "results"))
        assert any("test_batch" in f for f in results)

        # learning signal over 4 epochs: per-epoch train loss is noisy at
        # 1 step/epoch (batch 2), so assert on the eval curve instead
        # (deterministic synthetic data, seed 1); deep convergence is
        # covered by test_overfitting_mode_converges
        import json

        logs = [json.loads(l) for l in
                open(os.path.join(run_dir, "logs.jsonl"))]
        losses = [l["train_loss"] for l in logs if "train_loss" in l]
        evals = [l["eval_loss"] for l in logs if l.get("eval_loss")]
        assert len(losses) == 4 and len(evals) == 2
        assert all(np.isfinite(losses))
        assert evals[-1] < evals[0]

    def test_resume_continues_from_checkpoint(self, tmp_path):
        import train_maskplanner
        from maskplanner_tpu.utils.config import load_config
        from maskplanner_tpu.train import checkpoints
        from maskplanner_tpu.models import get_model
        from maskplanner_tpu.train.trainer import create_train_state
        import jax

        cfg = tiny_config(tmp_path)
        run_dir, state = train_maskplanner.main(cfg)

        cfg2 = load_config(run_dir)
        model = get_model(cfg2)
        fresh = create_train_state(model, cfg2, jax.random.PRNGKey(0),
                                   np.zeros((1, 64, 3), np.float32))
        restored, epoch = checkpoints.load_checkpoint(run_dir,
                                                      "last_checkpoint", fresh)
        assert epoch == 4
        assert int(restored.step) > 0
        # params actually restored (differ from fresh init)
        p0 = jax.tree.leaves(fresh.params)[0]
        p1 = jax.tree.leaves(restored.params)[0]
        assert not np.allclose(np.asarray(p0), np.asarray(p1))

    def test_bf16_config_trains_finite(self, tmp_path):
        """config=[...,bf16] trains with bfloat16 compute (params stay
        f32) and produces finite losses + f32 outputs. Convergence parity
        with f32 is established on hardware by
        scripts/tpu_convergence_study.py --bf16."""
        import json

        import jax
        import jax.numpy as jnp
        import train_maskplanner
        from maskplanner_tpu.models import get_model
        from maskplanner_tpu.utils.config import load_config

        cfg = tiny_config(tmp_path)
        cfg["model"]["bf16"] = True
        run_dir, state = train_maskplanner.main(cfg)
        logs = [json.loads(l) for l in
                open(os.path.join(run_dir, "logs.jsonl"))]
        losses = [l["train_loss"] for l in logs if "train_loss" in l]
        assert len(losses) == 4 and all(np.isfinite(losses))
        # params stayed f32 (mixed-precision contract: bf16 compute only)
        assert all(p.dtype == jnp.float32
                   for p in jax.tree.leaves(state.params))
        # model outputs cast back to f32 at the boundary (.npy dumps,
        # f32 loss reductions)
        model = get_model(cfg)
        pc = np.zeros((1, 64, 3), np.float32)
        out = model.apply({"params": state.params,
                           "batch_stats": state.batch_stats}, pc, train=False)
        assert out.traj.dtype == jnp.float32
        assert out.stroke_masks.dtype == jnp.float32
        # frozen run config round-trips the flag for test/render drivers
        assert load_config(run_dir)["model"]["bf16"] is True

    @pytest.mark.slow
    def test_overfitting_mode_converges(self, tmp_path):
        """Learning-sanity harness: overfitting=true trains on a single
        sample (reference paintnet_ODv1.py:185-187, train_maskplanner.py:
        310-312) and the loss must collapse substantially."""
        import json
        import train_maskplanner

        cfg = tiny_config(tmp_path, overfitting="true", epochs=30,
                          eval_freq=30, batch_size=1, lr="3e-3")
        run_dir, _ = train_maskplanner.main(cfg)
        logs = [json.loads(l) for l in
                open(os.path.join(run_dir, "logs.jsonl"))]
        losses = [l["train_loss"] for l in logs if "train_loss" in l]
        assert len(losses) == 30
        assert all(np.isfinite(losses)), "loss diverged to NaN/inf"
        start = np.mean(losses[:3])
        end = np.mean(losses[-3:])
        # batch-1 BN collapses head activations to beta (the model
        # memorizes through the output-layer path only), so convergence
        # is steady but slow — measured ~23% drop in 30 epochs
        assert end < 0.85 * start, (start, end)
