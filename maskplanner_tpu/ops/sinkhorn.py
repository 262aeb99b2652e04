"""Entropic-regularized optimal transport (Sinkhorn) for large-set EMD.

The reference's ``emd`` loss Hungarian-matches prediction and GT sets with
scipy LAP on the host (loss_handler.py:990-1009, models/hungarianMatcher.py)
— O(n^3) and a device->host sync. The on-device JV solver (ops.hungarian)
covers the small mask-matching matrices; for large sets (hundreds+ of
segments) this module provides the TPU-native alternative: log-domain
Sinkhorn iterations, fully vectorized over the batch, whose soft transport
plan converges to the exact EMD as eps -> 0.

Gradient: the potentials are treated as constants (Danskin/envelope
gradient — exact at convergence), so the backward pass is just the
transport-weighted cost gradient; no differentiation through the loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

_NEG_INF = -1e30


def log_sinkhorn_potentials(cost: Array, log_a: Array, log_b: Array,
                            eps: float, iters: int):
    """Fixed-iteration log-domain Sinkhorn.

    cost: (B, N, M); log_a: (B, N) log source marginals (-inf = masked);
    log_b: (B, M). Returns potentials (f (B,N), g (B,M)).
    """

    def body(carry, _):
        f, g = carry
        # f_i = -eps logsumexp_j((g_j - C_ij)/eps + log b_j)
        f = -eps * jax.nn.logsumexp(
            (g[:, None, :] - cost) / eps + log_b[:, None, :], axis=-1)
        # masked marginals use the -1e30 sentinel (true -inf would NaN
        # the logsumexp arithmetic); isfinite(-1e30) is True, so compare
        # against the sentinel instead
        f = jnp.where(log_a > _NEG_INF / 2, f, 0.0)
        g = -eps * jax.nn.logsumexp(
            (f[:, :, None] - cost) / eps + log_a[:, :, None], axis=-2)
        g = jnp.where(log_b > _NEG_INF / 2, g, 0.0)
        return (f, g), None

    B, N, M = cost.shape
    f0 = jnp.zeros((B, N), cost.dtype)
    g0 = jnp.zeros((B, M), cost.dtype)
    (f, g), _ = jax.lax.scan(body, (f0, g0), None, length=iters)
    return f, g


def transport_plan(cost: Array, log_a: Array, log_b: Array, f: Array,
                   g: Array, eps: float) -> Array:
    """P_ij = exp((f_i + g_j - C_ij)/eps + log a_i + log b_j)."""
    logits = ((f[:, :, None] + g[:, None, :] - cost) / eps
              + log_a[:, :, None] + log_b[:, None, :])
    return jnp.exp(jnp.clip(logits, _NEG_INF, 30.0))


def masked_log_marginals(mask: Array | None, n: int, batch: int):
    """Uniform log-marginals over valid entries (-inf on masked)."""
    if mask is None:
        return jnp.full((batch, n), -jnp.log(float(n)))
    count = jnp.maximum(mask.sum(axis=-1, keepdims=True), 1)
    return jnp.where(mask, -jnp.log(count.astype(jnp.float32)), _NEG_INF)


def sinkhorn_emd(y_pred: Array, y: Array, y_mask: Array | None = None,
                 x_mask: Array | None = None, eps: float = 0.005,
                 iters: int = 60) -> Array:
    """Soft EMD between batched sets: transport-weighted squared distance.

    Matches the reference emd semantics (mean matched squared distance,
    loss_handler.py:1005-1008) in the eps->0 limit; the plan is computed
    with stop-gradient (envelope gradient), the cost term stays
    differentiable w.r.t. both sets.
    """
    B, N, _ = y_pred.shape
    M = y.shape[1]
    diff = y_pred[:, :, None, :] - jnp.where(
        (y_mask[..., None] if y_mask is not None else jnp.bool_(True)),
        y, 0.0)[:, None, :, :]
    cost = (diff ** 2).sum(-1)  # squared euclidean (B, N, M)
    if y_mask is not None:
        cost = jnp.where(y_mask[:, None, :], cost, 1e6)
    if x_mask is not None:
        cost = jnp.where(x_mask[:, :, None], cost, 1e6)

    log_a = masked_log_marginals(x_mask, N, B)
    log_b = masked_log_marginals(y_mask, M, B)

    c0 = jax.lax.stop_gradient(cost)
    # normalize the scale so eps is data-independent (relative entropy).
    # Valid entries only: the 1e6 mask fill would dominate the mean and
    # flatten (g - C)/eps into a near-uniform transport plan
    valid = jnp.ones_like(c0, dtype=bool)
    if y_mask is not None:
        valid = valid & y_mask[:, None, :]
    if x_mask is not None:
        valid = valid & x_mask[:, :, None]
    scale = jnp.maximum(
        jnp.where(valid, c0, 0.0).sum() / jnp.maximum(valid.sum(), 1), 1e-8)
    f, g = log_sinkhorn_potentials(c0 / scale, log_a, log_b, eps, iters)
    P = jax.lax.stop_gradient(
        transport_plan(c0 / scale, log_a, log_b, f, g, eps))
    # each valid column carries mass 1/M_valid, so sum_ij P_ij C_ij is the
    # per-sample mean matched squared distance (the reference's per-pair
    # mean, loss_handler.py:1005-1008); batches average sample means where
    # the reference pools pairs globally — identical for equal set sizes
    per_sample = (P * cost).sum(axis=(-1, -2))
    return per_sample.mean()
