"""Adversarial loss path: discriminator update + generator loss."""
import numpy as np
import jax
import jax.numpy as jnp

from maskplanner_tpu.losses.gan import AdversarialLoss
from maskplanner_tpu.losses import LossHandler
from maskplanner_tpu.utils.args import load_args


def small_cfg(kind):
    return load_args(argv=["config=[maskplanner,cuboids_v2]",
                           f"loss=[{kind}]", "lambda_points=1",
                           "overlapping=0", "extra_data=[orientnorm]",
                           "knn_gcn=4", "traj_points=24"])


class TestAdversarial:
    def _roundtrip(self, kind):
        cfg = small_cfg(kind)
        adv = AdversarialLoss(cfg, kind=kind)
        rng = np.random.default_rng(0)
        y = jnp.asarray(rng.normal(size=(2, 4, 36)).astype(np.float32))
        y_pred = jnp.asarray(rng.normal(size=(2, 4, 36)).astype(np.float32))
        key = jax.random.PRNGKey(0)
        d_state = adv.init_state(key, y)
        new_state, d_loss = adv.discriminator_update(d_state, y_pred, y, key)
        assert np.isfinite(float(d_loss))
        # discriminator params changed
        p0 = jax.tree.leaves(d_state.params)[0]
        p1 = jax.tree.leaves(new_state.params)[0]
        assert not np.allclose(np.asarray(p0), np.asarray(p1))

        # generator loss differentiable wrt y_pred only
        g = jax.grad(lambda yp: adv.generator_loss(new_state, yp))(y_pred)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0
        return cfg, adv, new_state, y, y_pred

    def test_wgan_gp(self):
        self._roundtrip("wdiscriminator")

    def test_minimax(self):
        self._roundtrip("discriminator")

    def test_handler_dispatch(self):
        cfg, adv, d_state, y, y_pred = self._roundtrip("wdiscriminator")
        handler = LossHandler(["wdiscriminator"], cfg)
        weights = handler.init_weights()
        total, terms = handler.compute(
            weights, y_pred=y_pred, y=y, gan_module=adv, gan_state=d_state)
        assert np.isfinite(float(total))
