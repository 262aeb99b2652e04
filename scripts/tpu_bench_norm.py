"""A/B the encoder normalization on the real TPU (train step timing).

Measures the flagship (windows_v2, batch 64) fwd+loss+grad step for
model.norm in {batch, layer, none} x {f32, bf16}. BatchNorm's
cross-element statistics force extra HBM passes over every (B,S,K,C)
activation; per-element LayerNorm fuses into the matmul epilogue.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from tpu_bench_ops import loop_bench


def step_ms(norm: str, bf16: bool) -> float:
    from maskplanner_tpu.utils.args import load_args
    from maskplanner_tpu.data.dataset import PaintDataset, DataLoader
    from maskplanner_tpu.losses import LossHandler
    from maskplanner_tpu.models import get_model
    from maskplanner_tpu.train import create_train_state
    from maskplanner_tpu.train.trainer import build_loss_batch

    argv = ["config=[maskplanner,windows_v2,longx_v2]", "dataset_size=64",
            f"model.norm={norm}"]
    if bf16:
        argv.append("model.bf16=true")
    config = load_args(argv=argv)
    batch_size = int(config["batch_size"])
    dataset = PaintDataset(config, split="train", size=batch_size)
    batch = next(iter(DataLoader(dataset, batch_size)))
    batch = jax.device_put(batch)

    model = get_model(config)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, config, rng,
                               batch["point_cloud"][:1], steps_per_epoch=1)
    handler = LossHandler(config["loss"], config)
    weights = handler.init_weights()

    def grad_only(a):
        def lf(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": state.batch_stats}, a,
                train=True, mutable=["batch_stats"],
                rngs={"fps": rng, "dropout": rng})
            lb = build_loss_batch(out, batch, config)
            loss, _ = handler.compute(weights, rng=rng, **lb)
            return loss
        g = jax.grad(lf)(state.params)
        return jax.tree_util.tree_reduce(
            lambda s, x: s + jnp.sum(jnp.abs(x)), g, 0.0)

    return loop_bench(grad_only, batch["point_cloud"], iters=10) * 1000


def main():
    for bf16 in (False, True):
        for norm in ("batch", "layer", "none"):
            ms = step_ms(norm, bf16)
            tag = "bf16" if bf16 else "f32 "
            print(f"norm={norm:<6} {tag}: {ms:7.2f} ms/step (batch 64)")


if __name__ == "__main__":
    main()
