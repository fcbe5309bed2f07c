"""Training entry point.

Parity with reference train.py:44-285 (main/main_worker/train_one_epoch/
validate): epoch loop with per-epoch reseeded sampling, gradient-accumulated
sharded train steps, periodic validation + checkpointing, TensorBoard and
console observability, resume/pretrained loading, LR-curve dump. The DDP
process machinery is replaced by the device mesh (parallel/mesh.py).
"""

from __future__ import annotations

import contextlib
import os
import time

import numpy as np


def main(argv=None):
    import jax

    from sfa3d_tpu.config.train import parse_train_configs
    from sfa3d_tpu.data.loader import create_train_loader, create_val_loader
    from sfa3d_tpu.models import create_model, get_num_parameters
    from sfa3d_tpu.parallel import (
        create_train_state,
        make_eval_step,
        make_mesh,
        make_train_step,
        maybe_init_distributed,
        replicate,
        shard_batch,
    )

    configs = parse_train_configs(argv)
    if configs.runtime.platform:
        # before any backend init (the axon plugin ignores JAX_PLATFORMS)
        jax.config.update("jax_platforms", configs.runtime.platform)
    if configs.runtime.compilation_cache is not None:
        from sfa3d_tpu.runtime.export import enable_compilation_cache

        used = enable_compilation_cache(
            configs.runtime.compilation_cache or None
        )
        print(f"persistent XLA compilation cache: {used}")

    # multi-host glue (reference dist.init_process_group, train.py:82-83):
    # must run before any other jax call so every process sees the global
    # device set in jax.devices()
    distributed = maybe_init_distributed()
    from sfa3d_tpu.pipeline import init_detector
    from sfa3d_tpu.runtime.checkpoint import (
        latest_checkpoint,
        load_checkpoint,
        prune_checkpoints,
        save_checkpoint,
    )
    from sfa3d_tpu.runtime.logger import AverageMeter, Logger, ProgressMeter, create_tb_writer
    from sfa3d_tpu.runtime.schedules import create_lr_schedule, create_optimizer
    from sfa3d_tpu.models import load_variables

    os.makedirs(configs.checkpoints_dir, exist_ok=True)
    os.makedirs(configs.logs_dir, exist_ok=True)

    logger = Logger(configs.logs_dir, configs.runtime.saved_fn)
    # observability + checkpoints are process-0 duties in multi-host runs
    is_chief = jax.process_index() == 0
    tb_writer = create_tb_writer(configs.logs_dir) if is_chief else None

    mesh = make_mesh(configs.runtime.mesh_shape)
    if distributed:
        logger.info(
            f"multi-host: process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local / {jax.device_count()} global devices"
        )
    logger.info(f"mesh: {mesh} over devices {jax.devices()[:8]}")

    import jax.numpy as jnp

    dtype = jnp.bfloat16 if configs.model.compute_dtype == "bfloat16" else jnp.float32
    model = create_model(configs.model.arch, configs.model.head_conv, dtype=dtype)
    variables = init_detector(model, jax.random.PRNGKey(configs.runtime.seed))
    logger.info(f"model {configs.model.arch}: {get_num_parameters(variables['params']):,} params")

    if configs.model.imagenet_pretrained:
        from sfa3d_tpu.models.port import load_imagenet_backbone

        variables = load_imagenet_backbone(
            variables, configs.model.num_layers, configs.model.imagenet_weights
        )
        logger.info(
            f"initialized backbone from ImageNet resnet{configs.model.num_layers} weights"
        )

    if configs.runtime.pretrained_path:
        variables = load_variables(
            configs.runtime.pretrained_path, configs.model.arch, model
        )
        logger.info(f"loaded pretrained weights from {configs.runtime.pretrained_path}")

    # each process loads a disjoint 1/process_count slice of every batch
    # (DistributedSampler parity, kitti_dataloader.py:27-28)
    train_loader = create_train_loader(
        configs,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    steps_per_epoch = max(1, len(train_loader))
    logger.info(f"number of batches in training set: {steps_per_epoch}")

    tx = create_optimizer(configs.optim, configs.runtime.num_epochs, steps_per_epoch)
    lr_sched = create_lr_schedule(configs.optim, configs.runtime.num_epochs, steps_per_epoch)
    plot_lr_schedule(lr_sched, configs.runtime.num_epochs, steps_per_epoch,
                     configs.logs_dir, configs.optim.lr_type)

    use_ema = configs.optim.ema_decay > 0.0
    state = create_train_state(model, variables, tx, ema=use_ema)
    if use_ema:
        logger.info(
            f"parameter EMA on: decay {configs.optim.ema_decay} "
            f"tau {configs.optim.ema_tau} (EMA weights checkpointed; "
            f"--use_ema selects them at eval/serve time)"
        )
    start_epoch = configs.runtime.start_epoch
    resume_path = configs.runtime.resume_path
    if not resume_path and configs.runtime.auto_resume:
        # failure recovery = checkpoint + re-launch (SURVEY.md section 5),
        # with the re-launch's resume automated
        resume_path = latest_checkpoint(
            configs.checkpoints_dir, configs.runtime.saved_fn
        )
        if resume_path:
            logger.info(f"auto_resume found {resume_path}")
    if resume_path:
        state, epoch = load_checkpoint(resume_path, state)
        start_epoch = epoch + 1
        logger.info(f"resumed from {resume_path} at epoch {epoch}")
    state = replicate(mesh, state)

    train_step = make_train_step(
        model, tx, mesh,
        ema_decay=configs.optim.ema_decay, ema_tau=configs.optim.ema_tau,
    )
    eval_step = make_eval_step(model, mesh)

    if configs.runtime.evaluate:
        val_loss = validate(
            create_val_loader(configs, process_index=jax.process_index(),
                              process_count=jax.process_count()),
            state, eval_step, mesh,
        )
        logger.info(f"val_loss: {val_loss:.4e}")
        return

    # resume keeps the schedule position: the optimizer keys off state.step,
    # so logging/frequency counters must too
    global_step = int(np.asarray(state.step))
    # On this platform every host<->device fetch pays a tunnel round trip, so
    # the loop never blocks on the step it just dispatched. Loss scalars are
    # fetched with a lag of `max_inflight` steps — by then the value is
    # already computed, so the fetch costs only the RTT, which overlaps the
    # device's work on the following steps. max_inflight also bounds how many
    # dispatched-but-unexecuted steps (each pinning its input batch in HBM)
    # can pile up when the host produces batches faster than the chip trains.
    import contextlib
    from collections import deque

    # cap the lag below the epoch length: with steps_per_epoch <= lag the
    # within-epoch progress lines would always print a 0.0 loss (nothing
    # drained yet). steps_per_epoch == 1 -> lag 0 (synchronous fetch).
    max_inflight = max(0, min(8, steps_per_epoch - 1))
    profile = contextlib.ExitStack()  # jax.profiler trace around the loop
    if configs.runtime.profile_dir:
        profile.enter_context(jax.profiler.trace(configs.runtime.profile_dir))
    for epoch in range(start_epoch, configs.runtime.num_epochs + 1):
        logger.info(f">>> Epoch: [{epoch}/{configs.runtime.num_epochs}]")
        train_loader.set_epoch(epoch)
        batch_time = AverageMeter("Time", ":6.3f")
        data_time = AverageMeter("Data", ":6.3f")
        losses = AverageMeter("Loss", ":.4e")
        progress = ProgressMeter(
            steps_per_epoch, [batch_time, data_time, losses],
            prefix=f"Train - Epoch: [{epoch}/{configs.runtime.num_epochs}]",
        )
        inflight = deque()  # device-side total_loss scalars, oldest first
        start = time.time()
        for batch_idx, batch in enumerate(train_loader):
            data_time.update(time.time() - start)
            state, stats = train_step(state, shard_batch(mesh, batch, axis=1))
            global_step += 1
            inflight.append(stats["total_loss"])
            if len(inflight) > max_inflight:
                losses.update(float(inflight.popleft()), configs.runtime.batch_size)
            batch_time.update(time.time() - start)
            if tb_writer is not None and global_step % configs.runtime.tensorboard_freq == 0:
                tb_writer.add_scalars(
                    "Train",
                    {k: float(v) for k, v in stats.items()} | {"avg_loss": losses.avg},
                    global_step,
                )
                tb_writer.add_scalar("LR", float(lr_sched(global_step)), global_step)
            if global_step % configs.runtime.print_freq == 0:
                logger.info(progress.get_message(batch_idx))
            start = time.time()
        while inflight:  # drain the lag window at epoch end
            losses.update(float(inflight.popleft()), configs.runtime.batch_size)
        logger.info(progress.get_message(steps_per_epoch - 1))

        if (not configs.runtime.no_val) and epoch % configs.runtime.checkpoint_freq == 0:
            val_loss = validate(
                create_val_loader(configs, process_index=jax.process_index(),
                                  process_count=jax.process_count()),
                state, eval_step, mesh,
            )
            logger.info(f"val_loss: {val_loss:.4e}")
            if tb_writer is not None:
                tb_writer.add_scalar("Val_loss", val_loss, epoch)

        if epoch % configs.runtime.checkpoint_freq == 0:
            # EVERY process must enter the save: Orbax serialization of
            # replicated global jax.Arrays is a collective across hosts
            # (chief-only would deadlock a multi-host run). Orbax itself
            # writes once per shard; only the log line is chief-gated.
            path = save_checkpoint(
                configs.checkpoints_dir, configs.runtime.saved_fn, state, epoch
            )
            if is_chief:
                logger.info(f"save a checkpoint at {path}")
                if configs.runtime.val_ap:
                    maybe_val_ap(configs, path, epoch, logger, tb_writer)
                prune_checkpoints(
                    configs.checkpoints_dir, configs.runtime.saved_fn,
                    configs.runtime.keep_checkpoints,
                )

    profile.close()
    if tb_writer is not None:
        tb_writer.close()


def maybe_val_ap(configs, ckpt_path, epoch, logger, tb_writer):
    """Val-split detection AP at a checkpoint epoch (--val_ap): runs the
    eval CLI in-process against the just-saved checkpoint and logs
    mAP + per-class AP. The reference's validation is loss-only
    (train.py:251-285); AP is the signal that actually selects models
    (see GENERALIZE_CHECK.json best-val protocol). Chief-only: evaluation
    is single-process work, and TB/checkpoints are chief duties."""
    if configs.data.dataset != "kitti":
        logger.warning("--val_ap supports the KITTI layout only; skipping")
        return None
    from sfa3d_tpu.cli.eval import main as eval_main

    ap_args = [
        "--dataset_dir", configs.data.dataset_dir,
        "--split", "val",
        "--arch", configs.model.arch,
        "--pretrained_path", ckpt_path,
        "--K", str(configs.decode.K),
        "--peak_thresh", str(configs.decode.peak_thresh),
    ]
    if configs.runtime.val_ap_samples:
        ap_args += ["--num_samples", str(configs.runtime.val_ap_samples)]
    ema = configs.optim.ema_decay > 0.0
    if ema:
        # with EMA on, the EMA weights are the deliverable — select on them
        ap_args += ["--use_ema"]
    res = eval_main(ap_args)
    per_class = {k: v for k, v in res.items()
                 if k.startswith("AP_") and not isinstance(v, dict)}
    logger.info(
        f"val AP{' (EMA weights)' if ema else ''} (epoch {epoch}): mAP {res['mAP']:.4f} "
        f"mAOS {res.get('mAOS', 0.0):.4f} "
        + " ".join(f"{k} {v:.4f}" for k, v in sorted(per_class.items()))
    )
    if tb_writer is not None:
        tb_writer.add_scalar("Val_mAP", res["mAP"], epoch)
        if "mAOS" in res:
            tb_writer.add_scalar("Val_mAOS", res["mAOS"], epoch)
        tb_writer.add_scalars("Val_AP", per_class, epoch)
    return res


def validate(val_loader, state, eval_step, mesh) -> float:
    import jax

    from sfa3d_tpu.parallel import shard_batch

    total, n = 0.0, 0
    for batch in val_loader:
        flat = {
            "bev": batch["bev"].reshape((-1,) + batch["bev"].shape[2:]),
            "targets": {
                k: v.reshape((-1,) + v.shape[2:]) for k, v in batch["targets"].items()
            },
        }
        n_samples = flat["bev"].shape[0]
        n_dev = mesh.devices.size
        if n_samples % n_dev != 0:
            # batch axis must divide the mesh; trim the tail remainder
            # (documented loss of < n_dev samples once per validation)
            n_samples = (n_samples // n_dev) * n_dev
            if n_samples == 0:
                continue
            flat = jax.tree_util.tree_map(lambda t: t[:n_samples], flat)
        stats = eval_step(state, shard_batch(mesh, flat))
        # weight by sample count: the tail batch can be smaller
        total += float(stats["total_loss"]) * n_samples
        n += n_samples
    return total / max(1, n)


def plot_lr_schedule(lr_sched, num_epochs, steps_per_epoch, logs_dir, lr_type):
    """LR-curve PNG dump (train_utils.py:107-121)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    # One vmapped evaluation on the host CPU backend: optax schedules run
    # op-by-op, and on a tunneled TPU every eager op pays a device round
    # trip — a 300-epoch curve evaluated point-by-point costs minutes.
    import jax
    import jax.numpy as jnp

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        # jax_platforms can exclude cpu (e.g. --platform tpu); the curve is
        # cheap enough as ONE jitted call on whatever the default device is,
        # and a diagnostics PNG must never abort training
        cpu = None
    with jax.default_device(cpu) if cpu is not None else contextlib.nullcontext():
        steps = jnp.arange(num_epochs) * steps_per_epoch
        ys = np.asarray(jax.jit(jax.vmap(lr_sched))(steps), dtype=np.float64)
    plt.figure()
    plt.plot(ys, ".-", label="LR")
    plt.xlabel("epoch")
    plt.ylabel("LR")
    plt.grid()
    plt.tight_layout()
    plt.savefig(os.path.join(logs_dir, f"LR_{lr_type}.png"), dpi=200)
    plt.close()


if __name__ == "__main__":
    main()
