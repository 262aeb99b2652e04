"""Shared evaluation loop + prediction dumps.

Reference: ``test_maskplanner.py:226-303`` — batch loop computing loss +
metrics, single-sample latency, and ``.npy`` prediction dumps in the
reference's exact format (consumed by render_results / standalone tools).
"""
from __future__ import annotations

import os
import time

import jax
import numpy as np

from ..metrics import MetricsHandler


def _batch_names(loader, split: str, count: int, B: int) -> list[str]:
    """Real per-item names (mesh-dir names for disk data — the
    reference's ``dirnames``, consumed by export/render tools); falls
    back to positional names when the loader carries no index info."""
    dataset = getattr(loader, "dataset", None)
    indices = getattr(loader, "last_indices", None)
    if dataset is not None and indices is not None \
            and hasattr(dataset, "item_name") and len(indices) == B:
        return [dataset.item_name(int(j)) for j in indices]
    return [f"{split}_{int(j)}" for j in range(count, count + B)]


def evaluate(state, loader, eval_step, weights, metrics_handler: MetricsHandler,
             rng, save=False, save_dir=None, split="test", eval_ckpt="last",
             forward=None, mesh=None):
    """Run the eval loop; returns (avg_loss, avg_terms, avg_metrics, ms)."""
    from ..parallel import shard_batch

    tot_loss, count = 0.0, 0
    tot_terms: dict[str, float] = {}
    tot_metrics: dict[str, float] = {}
    all_ms = []

    for i, batch in enumerate(loader.epoch(0) if hasattr(loader, "epoch")
                              else loader):
        B = batch["point_cloud"].shape[0]
        # shard eval batches over the mesh when they divide evenly; the
        # (drop_last=False) trailing partial batch runs unsharded
        device_batch = (shard_batch(batch, mesh)
                        if mesh is not None and B % mesh.size == 0
                        else batch)
        loss, terms, out = eval_step(state, device_batch, weights, rng)

        # single-sample inference latency (reference test_maskplanner.py:253-257)
        if forward is not None:
            one = {k: v[:1] for k, v in batch.items()}
            fwd_out = forward(state, one["point_cloud"])
            jax.block_until_ready(fwd_out.traj if hasattr(fwd_out, "traj")
                                  else fwd_out)
            start = time.time()
            fwd_out = forward(state, one["point_cloud"])
            jax.block_until_ready(fwd_out.traj if hasattr(fwd_out, "traj")
                                  else fwd_out)
            all_ms.append((time.time() - start) * 1000)

        tot_loss += float(loss) * B
        for k, v in terms.items():
            tot_terms[k] = tot_terms.get(k, 0.0) + float(v) * B

        if metrics_handler is not None and metrics_handler.metrics:
            m = metrics_handler.compute(
                y_pred=out.traj if hasattr(out, "traj") else out,
                traj_as_pc=batch["traj_as_pc"],
                traj_pc=batch["traj_as_pc"],
                stroke_ids=batch["stroke_ids"],
                pc_mask=batch["stroke_ids_as_pc"] >= 0,
                n_strokes=batch["n_strokes"],
                pred_stroke_masks=np.asarray(out.stroke_masks)
                if getattr(out, "stroke_masks", None) is not None else None,
                mask_scores=np.asarray(out.mask_scores)
                if getattr(out, "mask_scores", None) is not None else None,
            )
            for k, v in m.items():
                tot_metrics[k] = tot_metrics.get(k, 0.0) + v * B

        if save and (split != "train" or i == 0):
            # .npy dump in the reference format (test_maskplanner.py:280-293)
            dump = {
                "dirnames": _batch_names(loader, split, count, B),
                "traj": np.asarray(batch["traj"]),
                "stroke_ids": np.asarray(batch["stroke_ids"]),
                "stroke_ids_as_pc": np.asarray(batch["stroke_ids_as_pc"]),
                "traj_as_pc": np.asarray(batch["traj_as_pc"]),
                "traj_pred": np.asarray(out.traj if hasattr(out, "traj") else out),
                "pred_stroke_masks": np.asarray(out.stroke_masks)
                if getattr(out, "stroke_masks", None) is not None else None,
                "stroke_masks_scores": np.asarray(out.mask_scores)
                if getattr(out, "mask_scores", None) is not None else None,
                "seg_logits": np.asarray(out.seg_conf)
                if getattr(out, "seg_conf", None) is not None else None,
                "n_strokes": np.asarray(batch["n_strokes"]),
                "point_cloud": np.asarray(batch["point_cloud"]),
                "batch": i,
                "suffix": split,
            }
            np.save(os.path.join(save_dir, f"{eval_ckpt}_{split}_batch{i}.npy"),
                    dump)
        count += B

    avg_terms = {k: v / count for k, v in tot_terms.items()}
    avg_metrics = {k: v / count for k, v in tot_metrics.items()}
    ms = float(np.mean(all_ms)) if all_ms else None
    if ms is not None:
        print(f"Elapsed: {round(ms, 1)}ms | FPS: {round(1000 / ms, 1)}")
    return tot_loss / count, avg_terms, avg_metrics, ms
