"""Autoregressive stroke rollout conditioned on Start-of-Path tokens.

Reference: ``utils/training.py:8-67`` (sample_autoregressive_inference_sop)
— a Python loop of ``max_rollout_steps`` model dispatches. Here the whole
rollout is ONE ``lax.scan`` inside jit: the (n_strokes, H, D) history ring
lives on device, each step consumes the previous prediction, and all of a
sample's strokes roll out batched in parallel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def sample_autoregressive_inference_sop(
    apply_fn,
    variables,
    sops: Array,
    history_length: int,
    output_length: int,
    max_rollout_steps: int,
    object_features: Array | None = None,
):
    """Roll out strokes from SoP tokens.

    apply_fn(variables, x, train=False) must return
    ``(next_token (n, 1, D), eop_logits (n, 1, 1))`` — the mlp_rollout
    contract (models/mlp.py MLPRegressor with confidence_scores).

    sops: (n_strokes, prototype_dim); object_features: optional (latent,)
    broadcast to every stroke (reference utils/training.py:40-43).

    Returns (paths (n_strokes, steps, D), eop_logits (n_strokes, steps, 1)).
    """
    n_strokes = sops.shape[0]
    H, D = history_length, output_length
    sops = jnp.asarray(sops, jnp.float32)
    obj = None
    if object_features is not None:
        obj = jnp.broadcast_to(
            jnp.asarray(object_features, jnp.float32)[None, :],
            (n_strokes, object_features.shape[-1]))

    def step(history, _):
        flat = history.reshape(n_strokes, -1)
        x = jnp.concatenate([sops, flat], axis=1)
        if obj is not None:
            x = jnp.concatenate([x, obj], axis=1)
        nxt, eop = apply_fn(variables, x, train=False)
        nxt = nxt.reshape(n_strokes, 1, D)
        history = jnp.concatenate([history[:, 1:, :], nxt], axis=1)
        return history, (nxt[:, 0, :], eop.reshape(n_strokes))

    history0 = jnp.zeros((n_strokes, H, D), jnp.float32)
    _, (paths, eops) = jax.lax.scan(step, history0, None,
                                    length=max_rollout_steps)
    # scan stacks the step axis first
    paths = jnp.swapaxes(paths, 0, 1)           # (n_strokes, steps, D)
    eops = jnp.swapaxes(eops, 0, 1)[..., None]  # (n_strokes, steps, 1)
    return paths, eops
