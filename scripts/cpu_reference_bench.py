"""Apples-to-apples architectural bench: reference train step (CPU torch)
vs this repo's train step (CPU JAX) at identical flagship shapes.

The container has no CUDA, so the reference's published hardware can't be
measured here (BASELINE.md). What CAN be measured is both *architectures*
on the same host CPU, same core budget, same tensor shapes, same
composite loss (asymm_chamfer_v9 recipe incl. the Hungarian stroke-mask
matching): the reference's torch eager pipeline (python-loop FPS,
per-sample scipy LAP, dynamic padding — reference
``models/pointnet2_utils.py:65-86``, ``loss_handler.py:863-875``) against
this repo's single jitted XLA program. The ratio isolates the *design*
speedup from the hardware speedup.

Both sides consume the SAME batch (this repo's static-shape collate
output; loss-semantics equality is proven by tests/test_reference_parity*
— so the two steps do the same math).

Usage: python scripts/cpu_reference_bench.py [--batch 8] [--iters 3]
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def time_fn(fn, iters, warmup=1):
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times) * 1000.0


def repo_side(config, batch, iters):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from maskplanner_tpu.losses import LossHandler
    from maskplanner_tpu.models import get_model
    from maskplanner_tpu.train import create_train_state, make_train_step

    model = get_model(config)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, config, rng,
                               batch["point_cloud"][:1], steps_per_epoch=1)
    handler = LossHandler(config["loss"], config)
    weights = handler.init_weights()
    train_step = make_train_step(model, handler, config)

    device_batch = jax.device_put(batch)
    # the jitted step donates its state argument — grab inference
    # variables before the first call deletes the initial buffers
    variables = {
        "params": jax.tree.map(lambda x: x.copy(), state.params),
        "batch_stats": jax.tree.map(lambda x: x.copy(), state.batch_stats),
    }
    holder = {"state": state}

    def step():
        st, loss, _ = train_step(holder["state"], device_batch, weights,
                                 rng)
        jax.block_until_ready(loss)
        holder["state"] = st

    step_ms = time_fn(step, iters)

    fwd = jax.jit(lambda a: model.apply(variables, a, train=False).traj)

    def infer():
        jax.block_until_ready(fwd(device_batch["point_cloud"]))

    infer_ms = time_fn(infer, iters)
    return step_ms, infer_ms


def reference_side(config, batch, iters):
    import numpy as np
    import torch

    import ref_harness
    ref_harness.install_stubs()
    models_mod = ref_harness.import_reference_models()
    ref = ref_harness.import_reference()
    DictConfig = sys.modules["omegaconf"].DictConfig

    torch.manual_seed(0)
    lam = int(config["lambda_points"])

    # io shapes exactly as the reference factory computes them
    # (reference models/__init__.py:297-325)
    out_vectors = (int(config["n_pred_traj_points"]) - lam) \
        // (lam - int(config["overlapping"])) + 1
    model = models_mod.PointNet2Regressor_StrokeMasks(
        out_vectors=out_vectors,
        outdim=3 * lam,
        outdim_orient=3 * lam,
        weight_orient=float(config["weight_orient"]),
        hidden_size=(1024, 1024),
        pred_stroke_masks=True,
        n_stroke_masks=int(config["max_n_strokes"]),
        mask_confidence_scores=True,
        segment_confidence_scores=False,
    )
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)

    loss_cfg = {
        "extra_data": ["orientnorm"],
        "lambda_points": lam,
        "stroke_pred": False,
        "min_centroids": False,
        "per_segment_confidence": False,
        "smooth_target_stroke_masks": False,
        "asymm_overlapping": False,
        # asymm_chamfer_v9 weights (reference configs/maskplanner/)
        "weight_asymm_chamfer_v9": 1.0,
        "weight_asymm_v6_chamfer_with_stroke_masks": 1.0,
        "weight_asymm_segment_chamfer": 1.0,
        "weight_reverse_asymm_point_chamfer": 100.0,
        "weight_reverse_asymm_segment_chamfer": 0.01,
        "explicit_weight_stroke_masks": 1.0,
        "explicit_weight_stroke_masks_confidence": 1.0,
        "explicit_no_stroke_weight": 0.1,
        "explicit_weight_segments_confidence": 1.0,
    }
    handler = ref.loss_handler.LossHandler(
        ["asymm_v6_chamfer_with_stroke_masks"], config=DictConfig(loss_cfg))

    pc = torch.from_numpy(np.asarray(
        batch["point_cloud"], np.float32)).permute(0, 2, 1).contiguous()
    y = torch.from_numpy(np.asarray(batch["traj"], np.float32))
    ids = torch.from_numpy(np.asarray(batch["stroke_ids"], np.int64))
    as_pc = torch.from_numpy(np.asarray(batch["traj_as_pc"], np.float32))

    def step():
        opt.zero_grad()
        traj_pred, masks, scores, seg_logits = model(pc)
        loss, _ = handler.compute(
            y_pred=traj_pred, y=y, pred_stroke_masks=masks,
            mask_scores=scores, seg_logits=seg_logits,
            stroke_ids=ids, traj_as_pc=as_pc)
        loss.backward()
        opt.step()

    step_ms = time_fn(step, iters)

    model.eval()

    def infer():
        with torch.no_grad():
            model(pc)

    infer_ms = time_fn(infer, iters)
    return step_ms, infer_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--threads", type=int, default=None,
                    help="torch thread cap (default: leave as-is)")
    args = ap.parse_args()

    import numpy as np

    from maskplanner_tpu.data.dataset import PaintDataset, DataLoader
    from maskplanner_tpu.utils.args import load_args

    config = load_args(argv=[
        "config=[maskplanner,windows_v2,longx_v2]",
        f"batch_size={args.batch}", f"dataset_size={args.batch}",
    ])
    dataset = PaintDataset(config, split="train", size=args.batch)
    batch = next(iter(DataLoader(dataset, args.batch)))
    batch = {k: np.asarray(v) for k, v in batch.items()}

    repo_step, repo_infer = repo_side(config, batch, args.iters)

    import torch
    if args.threads:
        torch.set_num_threads(args.threads)
    ref_step, ref_infer = reference_side(config, batch, args.iters)

    print(json.dumps({
        "metric": "cpu_arch_bench_windows_v2",
        "batch": args.batch,
        "repo_train_step_ms": round(repo_step, 1),
        "ref_train_step_ms": round(ref_step, 1),
        "train_step_speedup": round(ref_step / repo_step, 2),
        "repo_infer_ms": round(repo_infer, 1),
        "ref_infer_ms": round(ref_infer, 1),
        "infer_speedup": round(ref_infer / repo_infer, 2),
        "torch_threads": torch.get_num_threads(),
        "note": "same host CPU, same shapes/batch/loss; isolates the "
                "architectural (XLA-fused, static-shape, on-device-LAP) "
                "speedup from hardware",
    }))


if __name__ == "__main__":
    main()
