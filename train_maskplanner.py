"""MaskPlanner training driver (TPU-native).

User contract identical to the reference ``train_maskplanner.py``:

    python train_maskplanner.py config=[maskplanner,cuboids_v2,longx_v2] seed=1

Orchestration mirrors the reference main() (train_maskplanner.py:72-383):
config -> seed -> run dir -> data -> model -> optimizer/scheduler ->
epoch loop with eval/checkpoint every ``eval_freq`` -> PSACD + delayed-loss
stepping -> final eval with .npy dumps. TPU-first differences: one jitted
train step (no host LAP sync), data-parallel mesh sharding, dynamic loss
weights (no recompile on curriculum steps), true resume support.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np
import jax

from maskplanner_tpu.utils import set_seed, get_run_name, create_dirs
from maskplanner_tpu.utils.args import load_args
from maskplanner_tpu.utils.config import load_config, save_config
from maskplanner_tpu.utils.logging import Run
from maskplanner_tpu.data.dataset import PaintDataset, DataLoader
from maskplanner_tpu.models import get_model
from maskplanner_tpu.losses import LossHandler
from maskplanner_tpu.metrics import MetricsHandler
from maskplanner_tpu.parallel import make_mesh, shard_batch, replicate
from maskplanner_tpu.train import (
    PSACDScheduler,
    apply_delayed_activations,
    checkpoints,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from maskplanner_tpu.train.trainer import make_forward
from maskplanner_tpu.train.loop import evaluate


def get_output_dir(config):
    """Priority: config.output_dir > $WORKDIR > ./runs
    (reference utils/disk.py:113-127)."""
    return config.get("output_dir") or os.environ.get("WORKDIR") or "runs"


def restore_frozen_config(config, run_dir):
    """Resume-time config restore: the run's frozen config.yaml wins,
    EXCEPT keys the user explicitly typed on this invocation (the merged
    config also contains default.yaml underlays, which must not shadow
    the frozen values). Carried overrides are persisted so the run
    record stays truthful for the test/render drivers."""
    frozen = load_config(os.path.join(run_dir, "config.yaml"))
    carried = [k for k in getattr(config, "cli_overrides", [])
               if k not in ("resume", "default")]
    for key in carried:
        frozen.set_dotted(key, config.select(key))
    if carried:
        save_config(frozen, run_dir)
    frozen["resume"] = True
    return frozen


def main(config=None):
    config = config or load_args()

    # resume=<run_dir> reuses an existing run directory (a bare
    # resume=true would land in a fresh timestamped dir and silently
    # restart from scratch — every invocation gets a new run name)
    resume_arg = config.get("resume")
    resume_dir = None
    if isinstance(resume_arg, str) and resume_arg.lower() not in (
            "true", "false", "1", "0"):
        cand = [resume_arg, os.path.join(get_output_dir(config), resume_arg)]
        resume_dir = next((c for c in cand if os.path.isdir(c)), None)
        if resume_dir is None:
            raise ValueError(f"resume={resume_arg!r}: no such run directory")
    if resume_dir is not None:
        run_dir = resume_dir
        config = restore_frozen_config(config, run_dir)
    else:
        run_name = get_run_name(config)
        run_dir = create_dirs(os.path.join(get_output_dir(config), run_name))
        save_config(config, run_dir)
    print(f"Run dir: {run_dir}")

    # seed AFTER the frozen-config restore: a resumed run must continue
    # with the run's own recorded seed, not the default
    rng = set_seed(config.get("seed"))

    wandb_mode = "disabled" if (config.get("debug") or
                                config.get("wandb") == "disabled") else config.get("wandb", "disabled")
    run = Run(run_dir, config=config.to_dict(),
              group=(config.get("group") or config.get("auto_wandb_group")),
              name=config.get("name"), mode=wandb_mode)

    # ---- data -------------------------------------------------------------
    tr_dataset = PaintDataset(config, split="train",
                              size=config.get("dataset_size"))
    te_dataset = PaintDataset(config, split="test",
                              size=config.get("test_dataset_size"))
    batch_size = int(config["batch_size"])
    tr_loader = DataLoader(tr_dataset, batch_size, shuffle=True,
                           seed=int(config.get("seed") or 0))
    te_loader = DataLoader(te_dataset, min(batch_size, len(te_dataset)),
                           shuffle=False, drop_last=False)
    if len(tr_loader) == 0:
        raise ValueError(
            f"training split ({len(tr_dataset)} samples) is smaller than "
            f"batch_size={batch_size} (drop_last loader yields no batches); "
            f"lower batch_size or raise dataset_size")
    steps_per_epoch = len(tr_loader)

    # ---- mesh + model -----------------------------------------------------
    mesh = make_mesh()
    model = get_model(config)
    sample = tr_dataset[0]
    sample_pc = np.asarray(sample["point_cloud"])[None]
    state = create_train_state(model, config, rng, sample_pc, steps_per_epoch)
    state = replicate(state, mesh)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"Model: {config['model']['backbone']} | params: {n_params/1e6:.2f}M "
          f"| devices: {len(jax.devices())}")

    # ---- loss / metrics / schedulers --------------------------------------
    loss_handler = LossHandler(config["loss"], config)
    weights = loss_handler.init_weights()
    metrics_handler = MetricsHandler(config, config.get("eval_metrics") or [])
    psacd = (PSACDScheduler(config["psacd_scheduler"])
             if config["psacd_scheduler"].get("active") else None)

    # adversarial losses carry explicit discriminator state (reference trains
    # an internal D inside the loss call, loss_handler.py:259-375)
    gan_kinds = [n for n in config["loss"]
                 if n in ("discriminator", "wdiscriminator")]
    adv, d_state = None, None
    if gan_kinds:
        from maskplanner_tpu.losses.gan import AdversarialLoss
        from maskplanner_tpu.train.trainer import make_gan_train_step

        adv = AdversarialLoss(config, kind=gan_kinds[0])
        d_state = adv.init_state(
            jax.random.fold_in(rng, 17), np.asarray(sample["traj"])[None])
        d_state = replicate(d_state, mesh)
        train_step = make_gan_train_step(model, loss_handler, config, adv)
    else:
        train_step = make_train_step(model, loss_handler, config)
    eval_step = make_eval_step(model, loss_handler, config)
    forward = make_forward(model)

    # ---- transfer-learning init (reference models/__init__.py:386-426) ----
    pretrained_custom = config["model"].get("pretrained_custom")
    if pretrained_custom:
        torch_ckpt = os.path.join(pretrained_custom, "last_checkpoint.pth")
        if checkpoints.checkpoint_exists(pretrained_custom, "last_checkpoint"):
            state = checkpoints.load_params_only(
                pretrained_custom, "last_checkpoint", state,
                filter_heads=not config["model"].get("load_strict"))
            print(f"Initialized from pretrained run {pretrained_custom}")
        elif os.path.isfile(torch_ckpt):
            # a *reference* run dir: convert its torch checkpoint
            # (reference init_from_pretrained_custom, models/__init__.py:406)
            from maskplanner_tpu.train.torch_convert import load_torch_pretrained

            state, loaded = load_torch_pretrained(
                torch_ckpt, state, mode="full",
                load_strict=bool(config["model"].get("load_strict")))
            print(f"Initialized from reference torch run {pretrained_custom} "
                  f"({len(loaded)} tensors)")
        else:
            print(f"WARNING: pretrained_custom {pretrained_custom} has no "
                  f"last_checkpoint; training from scratch")
    elif config["model"].get("pretrained"):
        # ShapeNet-pretrained encoder warm start (reference
        # init_from_pretrained, models/__init__.py:391-395). The reference
        # blob is stripped from its repo; when a pointnet2_cls_ssg.pth is
        # provided (model.pretrained_path or ./pretrained_models/), its
        # sa1..sa3 weights are converted into the Flax encoder.
        from maskplanner_tpu.train.torch_convert import load_torch_pretrained

        pth = config["model"].get("pretrained_path") or os.path.join(
            "pretrained_models", "pointnet2_cls_ssg.pth")
        enc_norm = config["model"].get("norm") or "batch"
        if os.path.isfile(pth) and enc_norm != "batch":
            # the reference blob is a BatchNorm encoder; its running
            # stats have no target under the hybrid/layer recipes
            print(f"WARNING: torch encoder warm start ({pth}) requires "
                  f"model.norm=batch (got {enc_norm!r}); skipping")
        elif os.path.isfile(pth):
            state, loaded = load_torch_pretrained(pth, state, mode="encoder")
            print(f"Encoder warm-started from {pth} ({len(loaded)} tensors)")
        else:
            print(f"WARNING: model.pretrained set but {pth} not found; "
                  f"encoder starts from random init")

    # ---- resume (new capability vs reference) ------------------------------
    start_epoch = 0
    if config.get("resume") and checkpoints.checkpoint_exists(run_dir,
                                                              "last_checkpoint"):
        state, start_epoch = checkpoints.load_checkpoint(run_dir,
                                                         "last_checkpoint", state)
        if d_state is not None:
            d_state = checkpoints.load_aux_state(run_dir, "last_checkpoint",
                                                 d_state)
        # fast-forward the loss-weight schedule: PSACD steps are
        # cumulative and delayed activations are epoch-gated, so the
        # weights at start_epoch must reflect every earlier epoch
        for _e in range(start_epoch):
            if psacd is not None and psacd.is_time_to_step(
                    _e, int(config["epochs"])):
                weights = psacd.step_loss_weights(weights)
            weights = apply_delayed_activations(config, weights, _e)
        print(f"Resumed from epoch {start_epoch}")

    epochs = int(config["epochs"])
    eval_freq = int(config["eval_freq"])
    best_eval_loss, best_epoch = float("inf"), -1
    eval_loss = float("nan")
    t_train0 = time.time()

    # graceful preemption: SIGTERM/SIGINT checkpoint before exit (failure
    # recovery the reference lacks, SURVEY.md §5); resume=true picks it up
    import signal

    preempted = {"flag": False}

    def _on_term(signum, frame):
        preempted["flag"] = True

    prev_handlers = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _on_term)
        except ValueError:
            pass

    from maskplanner_tpu.utils.profiling import profile_trace
    from maskplanner_tpu.data.prefetch import Prefetcher
    from maskplanner_tpu.data.device_dataset import (
        device_dataset_eligible, epoch_perm, stage_device_dataset)

    # epoch-as-one-dispatch: stage the (small) training split in HBM and
    # run every epoch as a single jitted lax.scan — identical batches
    # (same host-side seeded shuffle) and identical rng folding, one host
    # sync per epoch instead of per-step dispatch overhead
    device_data = None
    if (device_dataset_eligible(config, len(jax.devices()), batch_size)
            and len(tr_dataset) >= batch_size):
        device_data = stage_device_dataset(tr_dataset, mesh=mesh)
    if device_data is not None:
        from maskplanner_tpu.train.trainer import make_scan_train_epoch

        train_epoch_fn = make_scan_train_epoch(model, loss_handler, config,
                                               mesh=mesh)
        print("device-resident dataset: epoch-as-one-dispatch enabled"
              + (f" ({mesh.size}-device DP)" if mesh.size > 1 else ""))
    else:
        prefetcher = Prefetcher(tr_loader, mesh)

    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        epoch_loss, epoch_terms, n_batches = 0.0, {}, 0
        do_profile = bool(config.get("profile")) and epoch == start_epoch + 1
        # accumulate on device; a single host sync per epoch keeps the step
        # stream fully async (per-step float() would stall the pipeline)
        loss_acc, term_acc = [], []
        with profile_trace(run_dir, enabled=do_profile):
            if device_data is not None:
                perm = epoch_perm(len(tr_dataset), batch_size,
                                  int(config.get("seed") or 0), epoch)
                state, losses, terms_arr = train_epoch_fn(
                    state, device_data, perm, weights, rng)
                n_batches = perm.shape[0]
                loss_acc = [losses.sum()]
                term_acc = [{k: v.sum() for k, v in terms_arr.items()}]
            else:
                for device_batch in prefetcher.epoch(epoch):
                    if adv is not None:
                        state, d_state, loss, terms = train_step(
                            state, d_state, device_batch, weights, rng)
                    else:
                        state, loss, terms = train_step(state, device_batch,
                                                        weights, rng)
                    loss_acc.append(loss)
                    term_acc.append(terms)
                    n_batches += 1
        epoch_loss = float(sum(loss_acc)) / n_batches
        for terms in term_acc:
            for k, v in terms.items():
                epoch_terms[k] = epoch_terms.get(k, 0.0) + float(v)
        log = {"train_loss": epoch_loss, "epoch": epoch + 1,
               "epoch_seconds": time.time() - t0}
        log.update({f"{k}_train_loss": v / n_batches
                    for k, v in epoch_terms.items()})

        # ---- eval + checkpoint (reference :242-270) -----------------------
        if (epoch + 1) % eval_freq == 0 or (epoch + 1) == epochs:
            eval_loss, eval_terms, eval_metrics, _ = evaluate(
                state, te_loader, eval_step, weights, metrics_handler, rng,
                mesh=mesh if mesh.size > 1 else None)
            log.update({"eval_loss": eval_loss})
            log.update({f"{k}_eval_loss": v for k, v in eval_terms.items()})
            log.update(eval_metrics)
            # best-epoch stats are tracked regardless of no_save — the
            # reference only skips the final dumps / deletes checkpoints
            # under no_save (train_maskplanner.py:263-270,366-367), it
            # still reports the true best epoch
            is_best = eval_loss < best_eval_loss
            if is_best:
                best_eval_loss, best_epoch = eval_loss, epoch + 1
            if not config.get("no_save"):
                checkpoints.save_checkpoint(run_dir, "last_checkpoint", state,
                                            epoch + 1, epoch_loss)
                if d_state is not None:
                    checkpoints.save_aux_state(run_dir, "last_checkpoint",
                                               d_state)
                if is_best:
                    checkpoints.copy_checkpoint(run_dir, "last_checkpoint",
                                                "best_model")
                if (config.get("save_intermediate_models")
                        and (epoch + 1) % int(
                            config["save_intermediate_models_freq"]) == 0):
                    checkpoints.copy_checkpoint(
                        run_dir, "last_checkpoint",
                        f"intermediate_checkpoint_epoch{epoch + 1}")
            print(f"[{epoch + 1}/{epochs}] train {epoch_loss:.4f} "
                  f"| eval {eval_loss:.4f} | {log['epoch_seconds']:.2f}s")
        run.log(log, step=epoch + 1)

        # ---- curriculum (reference :287-306) ------------------------------
        if psacd is not None and psacd.is_time_to_step(epoch, epochs):
            weights = psacd.step_loss_weights(weights)
        weights = apply_delayed_activations(config, weights, epoch)

        if preempted["flag"]:
            if not config.get("no_save"):
                checkpoints.save_checkpoint(run_dir, "last_checkpoint", state,
                                            epoch + 1, epoch_loss)
                if d_state is not None:
                    checkpoints.save_aux_state(run_dir, "last_checkpoint",
                                               d_state)
                print(f"Preempted at epoch {epoch + 1}; checkpoint saved "
                      f"(resume with resume={run_dir})")
            break

    tot_train = time.time() - t_train0
    run.summary["best_epoch"] = best_epoch
    run.summary["best_eval_loss"] = best_eval_loss
    run.summary["last_eval_loss"] = eval_loss
    run.summary["tot_train_seconds"] = round(tot_train, 2)
    print(f"Training finished in {tot_train:.1f}s | best epoch {best_epoch} "
          f"({best_eval_loss:.4f})")

    # ---- final eval with dumps (reference :327-359) ------------------------
    eval_ckpt = config.get("eval_ckpt", "last")
    if not config.get("no_save"):
        name = "best_model" if (eval_ckpt == "best" and
                                checkpoints.checkpoint_exists(run_dir,
                                                              "best_model")) \
            else "last_checkpoint"
        if checkpoints.checkpoint_exists(run_dir, name):
            state, _ = checkpoints.load_checkpoint(run_dir, name, state)
        results_dir = create_dirs(os.path.join(run_dir, "results"))
        for split, loader in (("train", tr_loader), ("test", te_loader)):
            loss_v, terms_v, metrics_v, ms = evaluate(
                state, loader, eval_step, weights, metrics_handler, rng,
                save=True, save_dir=results_dir, split=split,
                eval_ckpt=eval_ckpt, forward=forward,
                mesh=mesh if mesh.size > 1 else None)
            run.summary[f"final_{split}_loss"] = loss_v
            for k, v in metrics_v.items():
                run.summary[f"final_{split}_{k}"] = v
            if ms is not None:
                run.summary[f"{split}_inference_ms"] = ms
        if not config.get("skip_rendering") and not config.get("debug"):
            # auto-render like the reference (train_maskplanner.py:380:
            # guarded by skip_rendering/debug/no_save, spawns
            # render_results at end of training); non-fatal
            import subprocess
            import sys as _sys

            print(f"Rendering results from {results_dir} ...")
            try:
                subprocess.run(
                    [_sys.executable,
                     os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "render_results.py"),
                     "--run", run_dir, "--max_samples", "4",
                     "--model", str(eval_ckpt)],
                    check=False, timeout=600)
            except Exception as e:  # rendering must never fail the run
                print(f"(rendering skipped: {e})")

    run.finish()
    return run_dir, state


if __name__ == "__main__":
    main()
