"""SetAbstractionMsg parity vs the reference's PointNetSetAbstractionMsg.

The reference defines multi-scale grouping (models/pointnet2_utils.py:219-276)
but never instantiates it in a released path; this repo ports it for
completeness (VERDICT r3 item 9). Parity: identical inputs + weights copied
torch->flax, eval-mode BatchNorm (fresh running stats on both sides), FPS
start forced to 0 on the reference (tests/test_reference_parity_pointnet2.py
convention) — outputs must agree to float tolerance.
"""
import sys
from unittest import mock

import numpy as np
import pytest

sys.path.insert(0, "tests")
from ref_harness import REFERENCE, install_stubs  # noqa: E402

install_stubs()

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from maskplanner_tpu.models.pointnet2 import SetAbstractionMsg  # noqa: E402


def _import_ref_utils():
    sys.dont_write_bytecode = True
    added = REFERENCE not in sys.path
    if added:
        sys.path.insert(0, REFERENCE)
    try:
        from models import pointnet2_utils as ref_utils
    finally:
        if added and REFERENCE in sys.path:
            sys.path.remove(REFERENCE)
    return ref_utils


ref_utils = _import_ref_utils()

NPOINT, RADII, NSAMPLES = 32, (0.2, 0.4), (8, 16)
MLPS = ((16, 24), (16, 32))


def _zero_randint(*a, **k):
    size = a[2] if len(a) > 2 else a[1]
    return torch.zeros(size, dtype=torch.long)


@pytest.mark.parametrize("with_features", [False, True])
def test_msg_parity(with_features):
    rng = np.random.default_rng(5)
    cloud = rng.uniform(-1, 1, size=(2, 128, 3)).astype(np.float32)
    feats = (rng.normal(size=(2, 128, 5)).astype(np.float32)
             if with_features else None)
    in_channel = 5 if with_features else 0

    ref = ref_utils.PointNetSetAbstractionMsg(
        NPOINT, list(RADII), list(NSAMPLES), in_channel,
        [list(m) for m in MLPS])
    ref.eval()  # running stats (0 mean, 1 var): deterministic BN

    ours = SetAbstractionMsg(NPOINT, RADII, NSAMPLES, MLPS)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(cloud),
                          None if feats is None else jnp.asarray(feats),
                          train=False)

    # copy torch weights into the flax tree (Conv2d 1x1 -> Dense)
    params = jax.tree.map(np.array, variables["params"])
    for i in range(len(MLPS)):
        for j in range(len(MLPS[i])):
            conv = ref.conv_blocks[i][j]
            bn = ref.bn_blocks[i][j]
            dst = params[f"mlp_{i}"]
            w = conv.weight.detach().numpy()[:, :, 0, 0]   # (Cout, Cin)
            dst[f"Dense_{j}"]["kernel"] = w.T.copy()
            dst[f"Dense_{j}"]["bias"] = conv.bias.detach().numpy().copy()
            dst[f"BatchNorm_{j}"]["scale"] = bn.weight.detach().numpy().copy()
            dst[f"BatchNorm_{j}"]["bias"] = bn.bias.detach().numpy().copy()
    variables = {"params": params, "batch_stats": variables["batch_stats"]}

    with mock.patch.object(torch, "randint", _zero_randint), torch.no_grad():
        ref_xyz, ref_feat = ref(
            torch.from_numpy(cloud).permute(0, 2, 1),
            None if feats is None
            else torch.from_numpy(feats).permute(0, 2, 1))

    new_xyz, new_feat = ours.apply(
        variables, jnp.asarray(cloud),
        None if feats is None else jnp.asarray(feats), train=False)

    np.testing.assert_allclose(np.asarray(new_xyz),
                               ref_xyz.permute(0, 2, 1).numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_feat),
                               ref_feat.permute(0, 2, 1).numpy(),
                               atol=2e-5, rtol=1e-4)


def test_msg_trains():
    """Gradient flows through every scale's parameters (train mode,
    BatchNorm batch stats)."""
    rng = np.random.default_rng(6)
    cloud = jnp.asarray(rng.uniform(-1, 1, (2, 64, 3)).astype(np.float32))
    mod = SetAbstractionMsg(16, RADII, NSAMPLES, MLPS)
    variables = mod.init(jax.random.PRNGKey(0), cloud, None, train=False)

    def loss(p):
        (_, f), _ = mod.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            cloud, None, train=True, mutable=["batch_stats"])
        return jnp.sum(f ** 2)

    grads = jax.grad(loss)(variables["params"])
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
    total = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(grads))
    assert total > 0
