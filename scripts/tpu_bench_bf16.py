"""Loop-bench f32 vs bf16 flagship model (windows_v2) on the real chip.

Measures jitted inference and the full training step with the
input-perturbation fori_loop harness (the only trustworthy timing through
the axon tunnel — see scripts/tpu_bench_ops.py).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_bench_ops import loop_bench


def build(bf16: bool):
    from maskplanner_tpu.utils.args import load_args
    from maskplanner_tpu.data.dataset import PaintDataset, DataLoader
    from maskplanner_tpu.losses import LossHandler
    from maskplanner_tpu.models import get_model
    from maskplanner_tpu.train import create_train_state, make_train_step

    config = load_args(argv=[
        "config=[maskplanner,windows_v2,longx_v2]", "dataset_size=64",
        f"model.bf16={'true' if bf16 else 'false'}",
    ])
    bs = int(config["batch_size"])
    dataset = PaintDataset(config, split="train", size=bs)
    batch = next(iter(DataLoader(dataset, bs)))
    model = get_model(config)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, config, rng,
                               batch["point_cloud"][:1], steps_per_epoch=1)
    handler = LossHandler(config["loss"], config)
    weights = handler.init_weights()
    train_step = make_train_step(model, handler, config)
    return config, model, state, batch, weights, train_step, rng


def main():
    for bf16 in (False, True):
        config, model, state, batch, weights, train_step, rng = build(bf16)
        tag = "bf16" if bf16 else "f32 "

        pc = jnp.asarray(batch["point_cloud"])
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        t_inf = loop_bench(
            lambda a: model.apply(variables, a, train=False).traj,
            pc, iters=10)
        bs = pc.shape[0]
        print(f"{tag} inference: {t_inf*1000:.2f} ms/batch{bs} "
              f"= {bs/t_inf:.0f} pc/s")

        # train step: state threading gives a true dependency chain
        db = {k: jnp.asarray(v) for k, v in batch.items()}
        s, loss, _ = train_step(state, db, weights, rng)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            s, loss, _ = train_step(s, db, weights, rng)
        jax.block_until_ready(loss)
        print(f"{tag} train step: {(time.perf_counter()-t0)/n*1000:.2f} ms "
              f"(batch {bs}) | loss {float(loss):.2f}")


if __name__ == "__main__":
    main()
