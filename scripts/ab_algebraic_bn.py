"""A/B the algebraic (folded-stats) BatchNorm train path on hardware.

VERDICT r3 item 1: BENCH_r03 measured the default f32 train step at 81.1 ms
vs 46.6 ms in round 2, with the default-on `_AlgebraicBatchNorm` path the
primary suspect. This script measures the flagship train step (batch 64,
windows_v2 shapes, full composite loss + Adam) with the fold ON vs OFF, for
f32 and bf16, on the real chip, and prints one JSON line.

Usage: python scripts/ab_algebraic_bn.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def measure(algebraic: bool, bf16: bool):
    if algebraic:
        os.environ.pop("MASKPLANNER_NO_ALGEBRAIC_BN", None)
    else:
        os.environ["MASKPLANNER_NO_ALGEBRAIC_BN"] = "1"

    import jax
    import jax.numpy as jnp

    from maskplanner_tpu.data.dataset import PaintDataset, DataLoader
    from maskplanner_tpu.losses import LossHandler
    from maskplanner_tpu.models import get_model
    from maskplanner_tpu.parallel import make_mesh, replicate, shard_batch
    from maskplanner_tpu.train import create_train_state, make_train_step
    from maskplanner_tpu.utils.args import load_args

    cfgs = "maskplanner,windows_v2,longx_v2" + (",bf16" if bf16 else "")
    config = load_args(argv=[f"config=[{cfgs}]", "dataset_size=64"])
    batch_size = int(config["batch_size"])
    dataset = PaintDataset(config, split="train", size=batch_size)
    loader = DataLoader(dataset, batch_size)
    batch = next(iter(loader))

    mesh = make_mesh()
    model = get_model(config)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, config, rng,
                               batch["point_cloud"][:1], steps_per_epoch=1)
    state = replicate(state, mesh)
    handler = LossHandler(config["loss"], config)
    weights = handler.init_weights()
    train_step = make_train_step(model, handler, config)
    device_batch = shard_batch(batch, mesh)

    def body(i, carry):
        st, _ = carry
        b = dict(device_batch)
        b["point_cloud"] = device_batch["point_cloud"] * (
            1.0 + i.astype(jnp.float32) * 1e-7)
        st2, loss_i, _ = train_step(st, b, weights, jax.random.fold_in(rng, i))
        return st2, loss_i

    k = 10

    @jax.jit
    def run(st):
        return jax.lax.fori_loop(0, k, body, (st, jnp.float32(0.0)))

    st, l = run(state)
    float(l)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        st, l = run(state)
        final = float(l)
        best = min(best, (time.perf_counter() - t0) / k * 1000)
    return round(best, 2), round(final, 4)


def main():
    out = {}
    for bf16 in (False, True):
        tag = "bf16" if bf16 else "f32"
        for alg in (True, False):
            ms, loss = measure(alg, bf16)
            out[f"{tag}_{'algebraic' if alg else 'plain'}_ms"] = ms
            out[f"{tag}_{'algebraic' if alg else 'plain'}_loss"] = loss
    print(json.dumps(out))


if __name__ == "__main__":
    main()
