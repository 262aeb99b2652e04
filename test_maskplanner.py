"""MaskPlanner evaluation driver.

User contract identical to the reference ``test_maskplanner.py``:

    python test_maskplanner.py --run RUN_DIR --model last [--target CAT]
        [--data_scale_factor F] [--renormalize_data_to_default] [--save]

Loads the frozen run config, restores the requested checkpoint
(best / last / intermediate_epochN), optionally overrides the evaluation
category for cross-category transfer testing (reference
test_maskplanner.py:70-83), measures per-sample inference latency, and
writes .npy prediction dumps.
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import jax

from maskplanner_tpu.utils import set_seed, create_dirs
from maskplanner_tpu.utils.config import load_config
from maskplanner_tpu.data.dataset import PaintDataset, DataLoader
from maskplanner_tpu.models import get_model
from maskplanner_tpu.losses import LossHandler
from maskplanner_tpu.metrics import MetricsHandler
from maskplanner_tpu.train import checkpoints, create_train_state, make_eval_step
from maskplanner_tpu.train.trainer import make_forward
from maskplanner_tpu.train.loop import evaluate


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--run", required=True, help="run directory")
    p.add_argument("--model", default="last",
                   help="checkpoint: best | last | intermediate_epochN")
    p.add_argument("--target", default=None,
                   help="override evaluation category (transfer testing)")
    p.add_argument("--data_scale_factor", type=float, default=None)
    p.add_argument("--renormalize_data_to_default", action="store_true",
                   help="renormalize outputs to the target category's "
                        "default scale for comparable PCD")
    p.add_argument("--save", action="store_true", help="save .npy dumps")
    p.add_argument("--split", default="test", choices=["test", "train"])
    p.add_argument("--batch_size", type=int, default=None)
    return p.parse_args()


# shared with the serving layer (maskplanner_tpu/serve.py)
from maskplanner_tpu.utils.config import apply_retrocompat_defaults  # noqa: E402,F401
from maskplanner_tpu.train.checkpoints import checkpoint_name  # noqa: E402,F401


def main():
    args = parse_args()
    config = apply_retrocompat_defaults(load_config(args.run))
    rng = set_seed(config.get("seed"))

    renorm_cfg = {}
    if args.target:
        # cross-category transfer (reference test_maskplanner.py:109-155)
        default_scale = None
        if args.renormalize_data_to_default:
            probe = config.copy()
            probe["dataset"] = [args.target]
            probe["data_scale_factor"] = None
            default_scale = PaintDataset(probe, split="test").scale
        config["dataset"] = [args.target]
        if args.data_scale_factor is not None:
            config["data_scale_factor"] = args.data_scale_factor
        if args.renormalize_data_to_default and default_scale:
            renorm_cfg = {"active": True,
                          "from": float(config.get("data_scale_factor")
                                        or default_scale),
                          "to": float(default_scale)}

    dataset = PaintDataset(config, split=args.split,
                           size=config.get("test_dataset_size"))
    batch_size = args.batch_size or min(int(config["batch_size"]), len(dataset))
    loader = DataLoader(dataset, batch_size, shuffle=False, drop_last=False)

    model = get_model(config)
    sample_pc = np.asarray(dataset[0]["point_cloud"])[None]
    state = create_train_state(model, config, rng, sample_pc)
    name = checkpoint_name(args.model)
    assert checkpoints.checkpoint_exists(args.run, name), \
        f"checkpoint {name} not found in {args.run}"
    state, epoch = checkpoints.load_checkpoint(args.run, name, state)
    print(f"Loaded {name} (epoch {epoch})")

    loss_handler = LossHandler(config["loss"], config)
    weights = loss_handler.init_weights()
    metrics_handler = MetricsHandler(config, config.get("eval_metrics") or [],
                                     renormalize_output_config=renorm_cfg)
    eval_step = make_eval_step(model, loss_handler, config)
    forward = make_forward(model)

    save_dir = None
    if args.save:
        save_dir = create_dirs(os.path.join(args.run, "results"))
    loss, terms, metrics, ms = evaluate(
        state, loader, eval_step, weights, metrics_handler, rng,
        save=args.save, save_dir=save_dir, split=args.split,
        eval_ckpt=args.model, forward=forward)

    print(f"{args.split} loss: {loss:.4f}")
    for k, v in terms.items():
        print(f"  {k}: {v:.4f}")
    for k, v in metrics.items():
        print(f"  {k}: {v:.4f}")
    return loss, terms, metrics


if __name__ == "__main__":
    main()
