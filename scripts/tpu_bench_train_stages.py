"""Train-step breakdown on the real TPU (loop-bench harness).

Splits the flagship training step (windows_v2, batch 64) into
forward / forward+loss / full grad+update, and times each composite-loss
term in isolation, to locate the next optimization target.
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
    from maskplanner_tpu.models import get_model
    from maskplanner_tpu.train import create_train_state
    from maskplanner_tpu.train.trainer import build_loss_batch

    config = load_args(argv=[
        "config=[maskplanner,windows_v2,longx_v2]", "dataset_size=64",
    ])
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
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    pc = batch["point_cloud"]

    # forward (train mode, with BN batch stats + fps rng like the step)
    def fwd(a):
        out, _ = model.apply(
            variables, a, train=True, mutable=["batch_stats"],
            rngs={"fps": rng, "dropout": rng})
        return out.traj

    print(f"forward_train: {loop_bench(fwd, pc, iters=10)*1000:.2f} ms")

    def fwd_loss(a):
        out, _ = model.apply(
            variables, a, train=True, mutable=["batch_stats"],
            rngs={"fps": rng, "dropout": rng})
        lb = build_loss_batch(out, batch, config)
        loss, _ = handler.compute(weights, rng=rng, **lb)
        return loss

    print(f"forward+loss: {loop_bench(fwd_loss, pc, iters=10)*1000:.2f} ms")

    def grad_only(a):
        def lf(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": state.batch_stats}, a,
                train=True, mutable=["batch_stats"], rngs={"fps": rng, "dropout": rng})
            lb = build_loss_batch(out, batch, config)
            loss, _ = handler.compute(weights, rng=rng, **lb)
            return loss
        g = jax.grad(lf)(state.params)
        return jax.tree_util.tree_reduce(
            lambda s, x: s + jnp.sum(jnp.abs(x)), g, 0.0)

    print(f"forward+loss+grad: {loop_bench(grad_only, pc, iters=10)*1000:.2f} ms")

    # per-term loss timing (forward output fixed, loss term recomputed)
    out, _ = model.apply(variables, pc, train=True,
                         mutable=["batch_stats"], rngs={"fps": rng, "dropout": rng})
    lb0 = build_loss_batch(out, batch, config)
    lb0 = {k: jax.device_put(v) for k, v in lb0.items()}
    # (full-step timing lives in bench.py: k data-chained steps inside one
    # jit + value fetch — dispatch-loop timing under-reads through the
    # remote-execution tunnel)
    for name in handler.loss:
        sub = LossHandler([name], config)
        w = sub.init_weights()

        def term2(t, sub=sub, w=w):
            lb = dict(lb0)
            lb["y_pred"] = t
            val, _ = sub.compute(w, rng=rng, **lb)
            return val

        print(f"loss[{name}]: {loop_bench(term2, lb0['y_pred'], iters=10)*1000:.2f} ms")


def backward_split():
    """Isolate model fwd+bwd vs loss fwd+bwd."""
    from maskplanner_tpu.utils.args import load_args
    from maskplanner_tpu.data.dataset import PaintDataset, DataLoader
    from maskplanner_tpu.losses import LossHandler
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
    pc = batch["point_cloud"]

    def model_only_grad(a):
        def lf(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": state.batch_stats}, a,
                train=True, mutable=["batch_stats"],
                rngs={"fps": rng, "dropout": rng})
            s = jnp.sum(out.traj) + jnp.sum(out.stroke_masks)
            if out.mask_scores is not None:
                s += jnp.sum(out.mask_scores)
            return s
        g = jax.grad(lf)(state.params)
        return jax.tree_util.tree_reduce(
            lambda s, x: s + jnp.sum(jnp.abs(x)), g, 0.0)

    print(f"model fwd+bwd: {loop_bench(model_only_grad, pc, iters=10)*1000:.2f} ms")

    out, _ = model.apply(variables, pc, train=True,
                         mutable=["batch_stats"], rngs={"fps": rng, "dropout": rng})
    lb0 = build_loss_batch(out, batch, config)
    lb0 = {k: jax.device_put(v) for k, v in lb0.items()}

    def loss_grad(t):
        def lf(tt):
            lb = dict(lb0)
            lb["y_pred"] = tt
            val, _ = handler.compute(weights, rng=rng, **lb)
            return val
        return jnp.sum(jnp.abs(jax.grad(lf)(t)))

    print(f"loss fwd+bwd(wrt y_pred): {loop_bench(loss_grad, lb0['y_pred'], iters=10)*1000:.2f} ms")


if __name__ == "__main__":
    import sys as _s

    if "--split" in _s.argv:
        backward_split()
    else:
        main()
