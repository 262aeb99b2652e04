"""Train-step timing for per-level hybrid encoder norms (VERDICT r3 item 5).

Measures the flagship batch-64 train step (full composite loss + Adam) for
candidate norm specs, f32 and bf16, on the real chip. The fused Pallas
train path runs at every 'layer'/'none' level; 'batch' levels keep the
reference BatchNorm semantics (unfused).

Usage: python scripts/tpu_bench_hybrid_norm.py [spec ...]
       (default: batch, layer+batch+batch, layer+layer+batch, layer)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def measure(norm: str, bf16: bool):
    import jax
    import jax.numpy as jnp

    from maskplanner_tpu.data.dataset import PaintDataset, DataLoader
    from maskplanner_tpu.losses import LossHandler
    from maskplanner_tpu.models import get_model
    from maskplanner_tpu.parallel import make_mesh, replicate, shard_batch
    from maskplanner_tpu.train import create_train_state, make_train_step
    from maskplanner_tpu.utils.args import load_args

    cfgs = "maskplanner,windows_v2,longx_v2" + (",bf16" if bf16 else "")
    config = load_args(argv=[f"config=[{cfgs}]", "dataset_size=64",
                             f"model.norm={norm}"])
    batch_size = int(config["batch_size"])
    dataset = PaintDataset(config, split="train", size=batch_size)
    batch = next(iter(DataLoader(dataset, batch_size)))

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
    specs = sys.argv[1:] or ["batch", "layer+batch+batch",
                             "layer+layer+batch", "layer"]
    out = {}
    for spec in specs:
        for bf16 in (False, True):
            ms, loss = measure(spec, bf16)
            tag = f"{spec}_{'bf16' if bf16 else 'f32'}"
            out[f"{tag}_ms"] = ms
            out[f"{tag}_loss"] = loss
            print(f"{tag}: {ms} ms (loss {loss})", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
