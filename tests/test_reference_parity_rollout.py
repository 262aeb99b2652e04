"""SoP autoregressive-rollout parity vs the reference's own loop.

Drives the reference ``sample_autoregressive_inference_sop``
(``utils/training.py:8-67``, a Python loop of model dispatches) and this
repo's ``lax.scan`` rollout with the SAME deterministic linear model and
asserts identical paths + end-of-path logits. Exercises the history ring
update, SoP/object-feature concatenation order, and output stacking.
"""
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, "tests")
from ref_harness import REFERENCE, install_stubs  # noqa: E402

install_stubs()

import torch  # noqa: E402

from maskplanner_tpu.train.rollout import (  # noqa: E402
    sample_autoregressive_inference_sop as mp_rollout,
)

DictConfig = sys.modules["omegaconf"].DictConfig


def _import_ref_training():
    sys.dont_write_bytecode = True
    added = REFERENCE not in sys.path
    if added:
        sys.path.insert(0, REFERENCE)
    try:
        from utils import training as ref_training
    finally:
        if added and REFERENCE in sys.path:
            sys.path.remove(REFERENCE)
    return ref_training


ref_training = _import_ref_training()


class _LinearModel:
    """Deterministic next-token model: one shared affine map, used as a
    torch module by the reference loop and as an apply_fn by ours."""

    def __init__(self, rng, in_dim, out_dim):
        self.W = rng.normal(scale=0.1, size=(in_dim, out_dim)) \
            .astype(np.float32)
        self.b = rng.normal(scale=0.1, size=(out_dim,)).astype(np.float32)
        self.w_eop = rng.normal(scale=0.2, size=(in_dim, 1)) \
            .astype(np.float32)

    # torch-module face (reference calls model(cat_input))
    def __call__(self, x):
        if isinstance(x, torch.Tensor):
            xn = x.detach().cpu().numpy()
            y, e = self._fwd(xn)
            return (torch.from_numpy(y)[:, None, :],
                    torch.from_numpy(e)[:, None, :])
        raise TypeError(type(x))

    # flax-apply face (ours calls apply_fn(variables, x, train=False);
    # must stay traceable under the rollout's lax.scan)
    def apply(self, variables, x, train=False):
        import jax.numpy as jnp

        y = jnp.tanh(x.astype(jnp.float32) @ self.W + self.b)
        e = x.astype(jnp.float32) @ self.w_eop
        return y[:, None, :], e[:, None, :]

    def _fwd(self, x):
        x = x.astype(np.float32)
        y = np.tanh(x @ self.W + self.b)
        e = x @ self.w_eop
        return y.astype(np.float32), e.astype(np.float32)


@pytest.mark.parametrize("with_obj", [False, True])
def test_rollout_parity(with_obj):
    rng = np.random.default_rng(5)
    n_strokes, proto, H, D, steps, latent = 5, 7, 3, 6, 11, 16
    in_dim = proto + H * D + (latent if with_obj else 0)
    model = _LinearModel(rng, in_dim, D)
    sops = rng.normal(size=(n_strokes, proto)).astype(np.float32)
    obj = (rng.normal(size=(latent,)).astype(np.float32)
           if with_obj else None)

    cfg = DictConfig({"rollout_model":
                      DictConfig({"object_features": with_obj})})
    ref_paths, ref_eops = ref_training.sample_autoregressive_inference_sop(
        model, torch.from_numpy(sops), H, D, steps, cfg,
        object_features=(torch.from_numpy(obj) if with_obj else None),
        device="cpu")

    mp_paths, mp_eops = mp_rollout(
        model.apply, {}, sops, H, D, steps, object_features=obj)

    np.testing.assert_allclose(np.asarray(mp_paths),
                               ref_paths.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mp_eops),
                               ref_eops.numpy(), rtol=1e-5, atol=1e-6)
