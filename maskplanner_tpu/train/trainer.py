"""Train/eval step construction.

The whole step — forward, chamfer matching, Hungarian mask assignment,
loss, backward, optimizer update — is one jitted XLA program; there is no
per-step host round-trip (the reference syncs to CPU every step for the
scipy LAP, loss_handler.py:863-875, SURVEY.md §3.1 hot loops).

Loss weights enter as a traced dict so the PSACD curriculum / delayed
activation (host-side, per-epoch) never trigger recompilation.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from ..losses import LossHandler
from ..models.maskplanner import MaskPlannerOutput
from .schedulers import lr_schedule


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def create_train_state(model, config, rng, sample_pc, steps_per_epoch=1):
    """Initialize parameters + Adam with the configured LR schedule."""
    variables = model.init(rng, sample_pc, train=False)
    tx = optax.adam(lr_schedule(config, steps_per_epoch))
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )


def build_loss_batch(out, batch, config) -> dict:
    """Map model outputs + data batch to the loss-handler kwargs."""
    lb = dict(
        y=batch["traj"],
        y_mask=batch["stroke_ids"] >= 0,
        traj_as_pc=batch["traj_as_pc"],
        pc_mask=batch["stroke_ids_as_pc"] >= 0,
        stroke_ids=batch["stroke_ids"],
    )
    f32 = lambda x: None if x is None else x.astype(jnp.float32)
    if isinstance(out, MaskPlannerOutput):
        lb.update(
            y_pred=f32(out.traj),
            pred_stroke_masks=f32(out.stroke_masks),
            mask_scores=f32(out.mask_scores),
            seg_logits=f32(out.seg_conf),
        )
    else:
        lb["y_pred"] = f32(out)
    return lb


def _train_step_impl(model, handler: LossHandler, config,
                     state: TrainState, batch, weights, rng):
    """One un-jitted training step (shared by the per-batch jit and the
    device-resident epoch scan — identical rng folding in both, so the
    two paths produce bit-identical updates for the same batches)."""
    dropout_rng, fps_rng, loss_rng = jax.random.split(
        jax.random.fold_in(rng, state.step), 3)

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        out, mutated = model.apply(
            variables,
            batch["point_cloud"],
            train=True,
            rngs={"dropout": dropout_rng, "fps": fps_rng},
            mutable=["batch_stats"],
        )
        lb = build_loss_batch(out, batch, config)
        total, terms = handler.compute(weights, rng=loss_rng, **lb)
        return total, (terms, mutated["batch_stats"])

    (loss, (terms, new_bs)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    state = state.apply_gradients(grads=grads)
    state = state.replace(batch_stats=new_bs)
    return state, loss, terms


def make_loss_and_grads(model, handler: LossHandler, config):
    """Returns jitted ``loss_and_grads(state, batch, weights, rng) ->
    (loss, grads)`` — the train step's forward+backward WITHOUT the
    optimizer update. Used by the multi-chip parity dryrun: comparing
    gradients at identical params is the sharding check that stays
    well-conditioned (post-Adam params are not — Adam turns ulp-level
    sign flips of near-zero gradients into full lr-sized parameter
    differences, so trajectories diverge chaotically regardless of
    sharding correctness)."""

    def loss_and_grads(state: TrainState, batch, weights, rng):
        dropout_rng, fps_rng, loss_rng = jax.random.split(
            jax.random.fold_in(rng, state.step), 3)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            out, _ = model.apply(
                variables, batch["point_cloud"], train=True,
                rngs={"dropout": dropout_rng, "fps": fps_rng},
                mutable=["batch_stats"])
            lb = build_loss_batch(out, batch, config)
            total, _ = handler.compute(weights, rng=loss_rng, **lb)
            return total

        return jax.value_and_grad(loss_fn)(state.params)

    return jax.jit(loss_and_grads)


def make_train_step(model, handler: LossHandler, config):
    """Returns jitted ``train_step(state, batch, weights, rng)``."""

    def train_step(state: TrainState, batch, weights, rng):
        return _train_step_impl(model, handler, config, state, batch,
                                weights, rng)

    return jax.jit(train_step, donate_argnums=(0,))


def make_scan_train_epoch(model, handler: LossHandler, config, mesh=None):
    """Epoch-as-one-dispatch: ``train_epoch(state, data, perm, weights,
    rng)`` runs ``perm.shape[0]`` steps inside a single jitted
    ``lax.scan``, gathering each step's batch from the device-resident
    dataset by index.

    Through a remote-execution tunnel (and at real scale, across the
    dispatch-per-step host overhead) the per-batch path spends 3-4x the
    device-step time on host work + RTT; with the whole (small — PaintNet
    categories are a few hundred meshes) dataset staged in HBM, the host
    syncs once per epoch. rng folding matches the per-batch path exactly
    (fold_in by ``state.step`` inside the shared step impl).

    With a multi-device ``mesh`` the staged split is replicated and each
    gathered batch is re-sharded onto the data axis (a local slice — the
    gather itself stays collective-free), so the scanned step runs the
    same DP layout as the per-batch path; XLA inserts the gradient
    all-reduce from the shardings alone.
    """
    data_spec = None
    if mesh is not None and mesh.size > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = mesh.axis_names[0]
        data_spec = NamedSharding(mesh, P(axis))

    pc_points = int(config["pc_points"])

    def train_epoch(state: TrainState, data, perm, weights, rng):
        def body(st, idx):
            batch = jax.tree_util.tree_map(
                lambda a: jnp.take(a, idx, axis=0), data)
            if batch["point_cloud"].shape[1] > pc_points:
                # on-device pc_online_subsampling: the staged clouds are
                # full-resolution; draw a fresh without-replacement subset
                # per sample per step (reference paintnet_ODv1.py:422-426;
                # the host loader's draw is unseeded, so the contract is
                # "fresh random subset each epoch", not a bit pattern)
                pc = batch["point_cloud"]
                keys = jax.random.split(
                    jax.random.fold_in(rng, st.step + (1 << 20)),
                    pc.shape[0])
                sub = jax.vmap(lambda k: jax.random.permutation(
                    k, pc.shape[1])[:pc_points])(keys)
                batch["point_cloud"] = jnp.take_along_axis(
                    pc, sub[:, :, None], axis=1)
            if data_spec is not None:
                batch = jax.tree_util.tree_map(
                    lambda a: jax.lax.with_sharding_constraint(a, data_spec),
                    batch)
            st, loss, terms = _train_step_impl(
                model, handler, config, st, batch, weights, rng)
            return st, (loss, terms)

        state, (losses, terms) = jax.lax.scan(body, state, perm)
        return state, losses, terms

    return jax.jit(train_epoch, donate_argnums=(0,))


def make_gan_train_step(model, handler: LossHandler, config, adv):
    """Train step with adversarial-loss state threading.

    The reference trains the discriminator *inside* the loss call every
    ``discr_train_freq`` steps (loss_handler.py:259-300). Here both updates
    share ONE forward pass: the generator gradient is taken against the
    current discriminator, and the discriminator then updates on the same
    (detached) prediction — simultaneous GAN updates with a one-step-stale
    critic, all inside a single jitted program.

    Returns ``train_step(state, d_state, batch, weights, rng) ->
    (state, d_state, loss, terms)``.
    """

    def train_step(state: TrainState, d_state, batch, weights, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        dropout_rng, fps_rng, d_rng, loss_rng = jax.random.split(step_rng, 4)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            out, mutated = model.apply(
                variables,
                batch["point_cloud"],
                train=True,
                rngs={"dropout": dropout_rng, "fps": fps_rng},
                mutable=["batch_stats"],
            )
            lb = build_loss_batch(out, batch, config)
            total, terms = handler.compute(
                weights, rng=loss_rng, gan_module=adv, gan_state=d_state,
                **lb)
            return total, (terms, mutated["batch_stats"], lb)

        pre_step = state.step  # apply_gradients increments step; gate on
        # the pre-update counter so the critic trains on the very first
        # batch like the reference (which updates D inside the loss call)
        (loss, (terms, new_bs, lb)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_bs)

        y_pred = jax.lax.stop_gradient(lb["y_pred"])
        y = lb["y"]

        def do_update(ds):
            return adv.discriminator_update(ds, y_pred, y, d_rng)

        def skip(ds):
            return ds, jnp.float32(0.0)

        d_state, d_loss = jax.lax.cond(
            pre_step % adv.train_freq == 0, do_update, skip, d_state)
        terms = dict(terms)
        terms["d_internal"] = d_loss
        return state, d_state, loss, terms

    return jax.jit(train_step, donate_argnums=(0, 1))


def make_eval_step(model, handler: LossHandler, config):
    """Returns jitted ``eval_step(state, batch, weights, rng)`` ->
    (loss, terms, outputs). Uses running BN statistics, no dropout."""

    def eval_step(state: TrainState, batch, weights, rng):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        out = model.apply(variables, batch["point_cloud"], train=False)
        lb = build_loss_batch(out, batch, config)
        total, terms = handler.compute(weights, rng=rng, **lb)
        return total, terms, out

    return jax.jit(eval_step)


def make_forward(model):
    """Jitted inference forward (for latency benchmarking / dumps)."""

    def forward(state: TrainState, point_cloud):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return model.apply(variables, point_cloud, train=False)

    return jax.jit(forward)
