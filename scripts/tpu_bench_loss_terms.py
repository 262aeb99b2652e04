"""Sub-term breakdown of the composite asymm_v9 loss (loop-bench).

Times the four pieces of asymm_v6_chamfer_with_stroke_masks separately at
the flagship windows_v2 training shape to find the next loss-side target:
forward segment chamfer (+matching), reverse point chamfer, reverse
segment chamfer, and the Hungarian stroke-mask loss.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpu_bench_ops import loop_bench


def main():
    from maskplanner_tpu.utils.args import load_args
    from maskplanner_tpu.data.dataset import PaintDataset, DataLoader
    from maskplanner_tpu.losses import LossHandler
    from maskplanner_tpu.losses.mask_losses import (
        _forward_segment_chamfer_with_matching, stroke_masks_loss)
    from maskplanner_tpu.losses.chamfer_losses import (
        reverse_asymm_point_chamfer, reverse_asymm_segment_chamfer)
    from maskplanner_tpu.models import get_model
    from maskplanner_tpu.train import create_train_state
    from maskplanner_tpu.train.trainer import build_loss_batch

    config = load_args(argv=[
        "config=[maskplanner,windows_v2,longx_v2]", "dataset_size=64",
    ])
    bs = int(config["batch_size"])
    dataset = PaintDataset(config, split="train", size=bs)
    batch = next(iter(DataLoader(dataset, bs)))
    batch = jax.device_put(batch)
    model = get_model(config)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, config, rng,
                               batch["point_cloud"][:1], steps_per_epoch=1)
    handler = LossHandler(config["loss"], config)
    weights = handler.init_weights()
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out, _ = model.apply(variables, batch["point_cloud"], train=True,
                         mutable=["batch_stats"],
                         rngs={"fps": rng, "dropout": rng})
    lb = build_loss_batch(out, batch, config)
    lb = {k: jax.device_put(v) for k, v in lb.items()}
    outdim = 6

    y_pred, y, y_mask = lb["y_pred"], lb["y"], lb.get("y_mask")
    traj_as_pc, pc_mask = lb["traj_as_pc"], lb.get("pc_mask")

    def fwd_match(t):
        nn_dist, match = _forward_segment_chamfer_with_matching(t, y, y_mask)
        return jnp.sum(nn_dist) + jnp.sum(match)

    print(f"fwd_seg_chamfer+match: {loop_bench(fwd_match, y_pred, iters=10)*1000:.2f} ms")

    def rev_pt(t):
        return reverse_asymm_point_chamfer(t, traj_as_pc, outdim,
                                           pc_mask=pc_mask)

    print(f"reverse_point_chamfer: {loop_bench(rev_pt, y_pred, iters=10)*1000:.2f} ms")

    def rev_seg(t):
        return reverse_asymm_segment_chamfer(t, y, y_mask=y_mask)

    print(f"reverse_seg_chamfer: {loop_bench(rev_seg, y_pred, iters=10)*1000:.2f} ms")

    nn_dist, match = _forward_segment_chamfer_with_matching(y_pred, y, y_mask)
    nn_dist, match = jax.device_put(nn_dist), jax.device_put(match)
    mask_weights = {
        "explicit_weight_stroke_masks":
            weights.get("explicit_weight_stroke_masks", 1.0),
        "explicit_weight_stroke_masks_confidence":
            weights.get("explicit_weight_stroke_masks_confidence", 1.0),
        "explicit_no_stroke_weight":
            weights.get("explicit_no_stroke_weight", 0.1),
    }

    def mask_loss(sm):
        return stroke_masks_loss(match, sm, lb["mask_scores"],
                                 lb["stroke_ids"], mask_weights,
                                 nn_distance=nn_dist)

    print(f"stroke_masks_loss: {loop_bench(mask_loss, lb['pred_stroke_masks'], iters=10)*1000:.2f} ms")


if __name__ == "__main__":
    main()
