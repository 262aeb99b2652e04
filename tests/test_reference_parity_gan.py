"""GAN + contrastive loss parity vs the reference's own LossHandler.

Round-1 VERDICT noted these were the only loss names without
reference-in-the-loop parity because the reference allocates tensors on
CUDA inside them (loss_handler.py:511-518, models/dgcnn.py:104-106,
models/gradient_penalty.py). ref_harness now coerces those constructions
to CPU, so the reference code itself runs here:

- ``contrastive_v1`` (loss_handler.py:480-521) in its deterministic
  regime (``contrastive_balance_negatives=False`` — the uniform()>0
  negative mask is almost-surely all-True on both sides).
- ``wdiscriminator`` (loss_handler.py:299-375) with the MLP backbone and
  ``singlestrokes`` input: generator loss with identical discriminator
  weights (torch state_dict copied into the Flax module), plus the
  WGAN-GP gradient penalty (models/gradient_penalty.py:22-40) at a fixed
  mixing coefficient, plus one full discriminator Adam step (torch Adam
  vs optax.adam on the same math).
- ``discriminator`` (minimax, loss_handler.py:259-296) with the DGCNN
  backbone (models/dgcnn.py): generator loss in eval mode with converted
  weights.
"""
import sys
from unittest import mock

import numpy as np
import pytest

sys.path.insert(0, "tests")
from ref_harness import import_reference  # noqa: E402

ref = import_reference()

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from maskplanner_tpu.losses import regularizers as R  # noqa: E402
from maskplanner_tpu.losses.gan import AdversarialLoss, DState  # noqa: E402

DictConfig = sys.modules["omegaconf"].DictConfig


def _np(t):
    # .copy() matters: jnp.asarray zero-copies CPU numpy buffers, so a
    # view of torch storage would be silently mutated by torch's in-place
    # Adam step, corrupting the "frozen" JAX-side initial state.
    return t.detach().cpu().numpy().copy()


# ---------------------------------------------------------------- contrastive

def test_contrastive_v1_parity():
    rng = np.random.default_rng(7)
    B, n_pts, C, n_strokes = 2, 24, 16, 5
    latent = rng.normal(size=(B, n_pts, C)).astype(np.float32)
    ids = rng.integers(0, n_strokes, size=(B, n_pts))
    ids[:, :n_strokes] = np.arange(n_strokes)  # every stroke id present

    cfg = DictConfig(dict(
        weight_contrastive_v1=1.0,
        contrastive_loss_margin=0.3,
        contrastive_balance_negatives=False,
        max_workers=2,
        lambda_points=1,
    ))
    lh = ref.loss_handler.LossHandler(["contrastive_v1"], config=cfg)
    ref_val = float(lh.get_contrastive_v1(
        torch.from_numpy(latent), torch.from_numpy(ids)))

    got = float(R.contrastive_v1(
        jnp.asarray(latent), jnp.asarray(ids), rng=jax.random.PRNGKey(0),
        margin=0.3, balance_negatives=False, n_strokes_max=n_strokes))
    assert got == pytest.approx(ref_val, rel=1e-5)


# ----------------------------------------------------------- weight transfer

def _mlp_state_to_flax(sd, n_hidden):
    """torch models/mlp.py:8-38 state_dict -> (params, batch_stats) for
    maskplanner_tpu.models.mlp.MLP (Dense_i/BatchNorm_i, output=Dense_n)."""
    params, stats = {}, {}
    for i in range(n_hidden):
        params[f"Dense_{i}"] = {
            "kernel": _np(sd[f"linears.{i}.weight"]).T,
            "bias": _np(sd[f"linears.{i}.bias"]),
        }
        params[f"BatchNorm_{i}"] = {
            "scale": _np(sd[f"batch_norms.{i}.weight"]),
            "bias": _np(sd[f"batch_norms.{i}.bias"]),
        }
        stats[f"BatchNorm_{i}"] = {
            "mean": _np(sd[f"batch_norms.{i}.running_mean"]),
            "var": _np(sd[f"batch_norms.{i}.running_var"]),
        }
    params[f"Dense_{n_hidden}"] = {
        "kernel": _np(sd["output.weight"]).T,
        "bias": _np(sd["output.bias"]),
    }
    return params, stats


def _bn(sd, prefix):
    return (
        {"scale": _np(sd[f"{prefix}.weight"]),
         "bias": _np(sd[f"{prefix}.bias"])},
        {"mean": _np(sd[f"{prefix}.running_mean"]),
         "var": _np(sd[f"{prefix}.running_var"])},
    )


def _dgcnn_state_to_flax(sd):
    """torch models/dgcnn.py:12-83 state_dict -> (params, batch_stats) for
    maskplanner_tpu.models.dgcnn.DGCNNDiscriminator."""
    params, stats = {}, {}
    for i in range(4):  # edge convs conv1..conv4 (Conv2d 1x1, bias=False)
        w = _np(sd[f"conv{i + 1}.0.weight"])[:, :, 0, 0].T  # (in, out)
        bn_p, bn_s = _bn(sd, f"conv{i + 1}.1")
        params[f"_EdgeConv_{i}"] = {
            "Dense_0": {"kernel": w}, "BatchNorm_0": bn_p}
        stats[f"_EdgeConv_{i}"] = {"BatchNorm_0": bn_s}
    # conv5: Conv1d 512->emb_dims, bias=False
    params["Dense_0"] = {"kernel": _np(sd["conv5.0.weight"])[:, :, 0].T}
    params["BatchNorm_0"], stats["BatchNorm_0"] = _bn(sd, "conv5.1")
    params["Dense_1"] = {"kernel": _np(sd["linear1.weight"]).T}
    params["BatchNorm_1"], stats["BatchNorm_1"] = _bn(sd, "bn6")
    params["Dense_2"] = {"kernel": _np(sd["linear2.weight"]).T,
                         "bias": _np(sd["linear2.bias"])}
    params["BatchNorm_2"], stats["BatchNorm_2"] = _bn(sd, "bn7")
    params["Dense_3"] = {"kernel": _np(sd["linear3.weight"]).T,
                         "bias": _np(sd["linear3.bias"])}
    return params, stats


def _as_jnp(tree):
    return jax.tree.map(jnp.asarray, tree)


# ------------------------------------------------------------ wdiscriminator

def _wdiscr_setup(seed=0):
    B, n_strokes, stroke_points, outdim = 2, 3, 10, 3
    cfg = dict(
        extra_data=[], n_strokes=n_strokes, stroke_points=stroke_points,
        discr_backbone="mlp", discr_input_type="singlestrokes",
        singlestrokes_norm=True, discr_lambdaGP=10.0,
        weight_discr_training=0.7, discr_train_iter=1, discr_train_freq=1,
        weight_wdiscriminator=1.0, knn_gcn=4, lambda_points=1,
    )
    torch.manual_seed(seed)
    lh = ref.loss_handler.LossHandler(
        ["wdiscriminator"], config=DictConfig(dict(cfg)))

    rng = np.random.default_rng(seed)
    D = stroke_points * outdim
    y = rng.normal(size=(B, n_strokes, D)).astype(np.float32)
    y_pred = rng.normal(size=(B, n_strokes, D)).astype(np.float32)

    adv = AdversarialLoss(cfg, kind="wdiscriminator")
    params, stats = _mlp_state_to_flax(lh.D.state_dict(), n_hidden=3)
    state = DState(params=_as_jnp(params), batch_stats=_as_jnp(stats),
                   opt_state=adv.tx.init(_as_jnp(params)))
    return lh, adv, state, y, y_pred


def test_wdiscriminator_generator_loss_parity():
    lh, adv, state, y, y_pred = _wdiscr_setup()
    ref_val = float(lh.get_wdiscr_loss(
        torch.from_numpy(y_pred), torch.from_numpy(y), train=False))
    got = float(adv.generator_loss(state, jnp.asarray(y_pred)))
    assert got == pytest.approx(ref_val, rel=1e-5, abs=1e-6)


def test_gradient_penalty_parity_fixed_alpha():
    lh, adv, state, y, y_pred = _wdiscr_setup()
    real = np.asarray(adv.prepare(jnp.asarray(y)))
    fake = np.asarray(adv.prepare(jnp.asarray(y_pred)))
    alpha = 0.37

    lh.D.train()  # reference computes GP with D in train mode

    def fixed_rand(*size, **kw):
        kw.pop("requires_grad", None)
        return torch.full(size, alpha, requires_grad=True)

    with mock.patch.object(torch, "rand", fixed_rand):
        ref_gp = float(lh.GradPenalty(
            lh.D, torch.from_numpy(real), torch.from_numpy(fake)))

    # reference mixes real + α(fake − real) = (1−α)·real + α·fake
    got = float(adv.gradient_penalty(
        state.params, state.batch_stats, jnp.asarray(real),
        jnp.asarray(fake), eps=1.0 - alpha))
    assert got == pytest.approx(ref_gp, rel=1e-4, abs=1e-5)


def test_wdiscriminator_one_adam_step_parity():
    """One full internal discriminator update (W-loss + GP at fixed α,
    torch Adam vs optax.adam) leaves byte-similar parameters."""
    lh, adv, state, y, y_pred = _wdiscr_setup()
    alpha = 0.37

    def fixed_rand(*size, **kw):
        kw.pop("requires_grad", None)
        return torch.full(size, alpha, requires_grad=True)

    with mock.patch.object(torch, "rand", fixed_rand):
        lh.get_wdiscr_loss(
            torch.from_numpy(y_pred), torch.from_numpy(y), train=True)
    ref_params, _ = _mlp_state_to_flax(lh.D.state_dict(), n_hidden=3)

    # our update draws eps from rng; replicate the reference's fixed mix
    # by calling the building blocks directly with eps = 1 − α
    real = adv.prepare(jax.lax.stop_gradient(jnp.asarray(y)))
    fake = adv.prepare(jax.lax.stop_gradient(jnp.asarray(y_pred)))

    def d_loss_fn(params, batch_stats):
        out_r, bs = adv._apply(params, batch_stats, real, True)
        out_f, bs = adv._apply(params, bs, fake, True)
        w_loss = adv.weight_discr_training * (-out_r.mean() + out_f.mean())
        gp = adv.gradient_penalty(params, bs, real, fake, eps=1.0 - alpha)
        return w_loss + gp

    grads = jax.grad(d_loss_fn)(state.params, state.batch_stats)
    import optax
    updates, _ = adv.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    lr = 1e-4
    for layer in ref_params:
        for k, want in ref_params[layer].items():
            got = np.asarray(new_params[layer][k])
            # Adam's first step is ~sign(g)·lr, so elements whose gradient
            # is numerically ~0 may take a ±lr step in opposite directions
            # across frameworks. Bound every element by the step size and
            # require the overwhelming majority to match tightly.
            np.testing.assert_allclose(
                got, want, atol=2.05 * lr,
                err_msg=f"{layer}.{k} diverged after one Adam step")
            if k == "bias" and layer != "Dense_3":
                # hidden Dense biases feed straight into BatchNorm, which
                # cancels constant shifts — their true gradient is exactly
                # 0 and the Adam step is noise-signed; the atol bound above
                # is the only meaningful check for them
                continue
            close = np.isclose(got, want, rtol=2e-4, atol=2e-6)
            assert close.mean() > 0.98, (
                f"{layer}.{k}: only {close.mean():.1%} of elements match "
                "tightly after one Adam step")


# ------------------------------------------------------- minimax (DGCNN) GAN

def test_minimax_discriminator_generator_loss_parity():
    B, N, k = 2, 24, 4
    cfg = dict(
        extra_data=[], knn_gcn=k, weight_discriminator=1.0,
        weight_discr_training=1.0, discr_input_type="pointcloud",
        discr_backbone="dgcnn", lambda_points=1,
    )
    torch.manual_seed(3)
    lh = ref.loss_handler.LossHandler(
        ["discriminator"], config=DictConfig(dict(cfg)))

    rng = np.random.default_rng(3)
    y = rng.normal(size=(B, N, 3)).astype(np.float32)
    y_pred = rng.normal(size=(B, N, 3)).astype(np.float32)

    ref_val = float(lh.get_discr_loss(
        torch.from_numpy(y_pred), torch.from_numpy(y), train=False))

    adv = AdversarialLoss(cfg, kind="discriminator")
    params, stats = _dgcnn_state_to_flax(lh.D.state_dict())
    state = DState(params=_as_jnp(params), batch_stats=_as_jnp(stats),
                   opt_state=None)
    got = float(adv.generator_loss(state, jnp.asarray(y_pred)))
    assert got == pytest.approx(ref_val, rel=1e-5, abs=1e-6)
