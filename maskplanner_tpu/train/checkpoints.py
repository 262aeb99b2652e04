"""Checkpoint save/restore (orbax).

Reference contract (train_maskplanner.py:243-284): ``last_checkpoint`` every
eval_freq epochs, ``best_model`` copied on best eval loss, optional
``intermediate_checkpoint_epoch<N>``. Improvement over the reference: the
optimizer state is restored too, enabling true mid-training resume (the
reference saves it but never reloads, SURVEY.md §5).
"""
from __future__ import annotations

import os
import shutil
from typing import Any

import jax
import orbax.checkpoint as ocp


def _ckptr():
    return ocp.StandardCheckpointer()


def save_checkpoint(run_dir: str, name: str, state, epoch: int,
                    train_loss: float | None = None):
    """Save params/batch_stats/opt_state/step under run_dir/name."""
    path = os.path.abspath(os.path.join(run_dir, name))
    if os.path.exists(path):
        shutil.rmtree(path)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": epoch,
        "epoch_train_loss": float(train_loss or 0.0),
    }
    ckptr = _ckptr()
    ckptr.save(path, payload)
    ckptr.wait_until_finished()


def copy_checkpoint(run_dir: str, src: str, dst: str):
    src_p, dst_p = (os.path.join(run_dir, n) for n in (src, dst))
    if os.path.exists(dst_p):
        shutil.rmtree(dst_p)
    shutil.copytree(src_p, dst_p)


def load_checkpoint(run_dir: str, name: str, state):
    """Restore into an existing (abstract-compatible) train state.

    Returns (state, epoch). Pass a freshly created state of the right
    shapes; params/batch_stats/opt_state/step are replaced.
    """
    path = os.path.abspath(os.path.join(run_dir, name))
    target = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": 0,
        "epoch_train_loss": 0.0,
    }
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
    restored = _ckptr().restore(path, abstract)
    state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    return state, int(restored["epoch"])


def load_params_only(run_dir: str, name: str, state, filter_heads: bool = False):
    """Transfer-learning restore: params (+batch_stats) only, optionally
    dropping the output heads (reference init_from_pretrained_custom,
    models/__init__.py:406-420 filters fc3/fc_normals)."""
    path = os.path.abspath(os.path.join(run_dir, name))
    target = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": 0,
        "epoch_train_loss": 0.0,
    }
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
    restored = _ckptr().restore(path, abstract)
    params = dict(restored["params"])
    if filter_heads:
        for head in ("fc_out", "fc_normals"):
            if head in state.params:
                params[head] = state.params[head]
    return state.replace(params=params, batch_stats=restored["batch_stats"])


def checkpoint_exists(run_dir: str, name: str) -> bool:
    return os.path.isdir(os.path.join(run_dir, name))


def checkpoint_name(model: str) -> str:
    """CLI checkpoint selector -> on-disk name (reference
    test_maskplanner.py:162-173): best | last | intermediate_epochN."""
    if model == "best":
        return "best_model"
    if model == "last":
        return "last_checkpoint"
    if model.startswith("intermediate"):
        return f"intermediate_checkpoint_{model.split('_', 1)[1]}" \
            if "_" in model else model
    return model


def save_aux_state(run_dir: str, name: str, aux: Any):
    """Save an auxiliary pytree (e.g. GAN discriminator state) alongside a
    checkpoint, under ``<name>_aux``."""
    path = os.path.abspath(os.path.join(run_dir, f"{name}_aux"))
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr = _ckptr()
    ckptr.save(path, jax.tree.map(lambda x: x, aux))
    ckptr.wait_until_finished()


def load_aux_state(run_dir: str, name: str, aux_example: Any) -> Any:
    """Restore an auxiliary pytree saved by ``save_aux_state``; returns the
    example unchanged if no aux checkpoint exists."""
    path = os.path.abspath(os.path.join(run_dir, f"{name}_aux"))
    if not os.path.isdir(path):
        return aux_example
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, aux_example)
    return _ckptr().restore(path, abstract)
