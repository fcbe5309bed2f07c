"""Training runtime: sharded train step, grad accumulation, schedules,
checkpoint/resume — exercised on the 8-device virtual CPU mesh."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sfa3d_tpu.config.train import OptimConfig
from sfa3d_tpu.models import create_model
from sfa3d_tpu.parallel import (
    create_train_state,
    make_eval_step,
    make_mesh,
    make_train_step,
    shard_batch,
    replicate,
)
from sfa3d_tpu.pipeline import init_detector
from sfa3d_tpu.runtime.schedules import create_lr_schedule, create_optimizer


def synthetic_batch(rng, s=1, b=8, hw=64, hm=16, k=50):
    """Tiny synthetic batch: S accumulation slices of B samples."""
    bev = rng.uniform(0, 1, (s, b, hw, hw, 3)).astype(np.float32)
    n_obj = 3
    obj_mask = np.zeros((s, b, k), np.float32)
    obj_mask[..., :n_obj] = 1
    inds = rng.integers(0, hm * hm, (s, b, k)).astype(np.int64)
    inds = (inds * obj_mask).astype(np.int64)
    hm_gt = np.zeros((s, b, hm, hm, 3), np.float32)
    for si in range(s):
        for bi in range(b):
            for j in range(n_obj):
                y, x = np.unravel_index(inds[si, bi, j], (hm, hm))
                hm_gt[si, bi, y, x, int(rng.integers(0, 3))] = 1.0
    targets = {
        "hm_cen": hm_gt,
        "cen_offset": (rng.uniform(0, 1, (s, b, k, 2)) * obj_mask[..., None]).astype(np.float32),
        "direction": (rng.uniform(-1, 1, (s, b, k, 2)) * obj_mask[..., None]).astype(np.float32),
        "z_coor": (rng.uniform(0, 4, (s, b, k, 1)) * obj_mask[..., None]).astype(np.float32),
        "dim": (rng.uniform(0.5, 4, (s, b, k, 3)) * obj_mask[..., None]).astype(np.float32),
        "indices_center": inds,
        "obj_mask": obj_mask,
    }
    return {"bev": bev, "targets": targets}


def _small_model_and_state(tx):
    model = create_model("fpn_resnet_18")
    variables = init_detector(model, jax.random.PRNGKey(0), input_size=(64, 64))
    return model, create_train_state(model, variables, tx)


def test_train_step_loss_decreases_on_mesh(rng):
    mesh = make_mesh(8)
    cfg = OptimConfig(optimizer_type="adam", lr=1e-3, lr_type="cosin")
    tx = create_optimizer(cfg, num_epochs=10, steps_per_epoch=5)
    model, state = _small_model_and_state(tx)
    state = replicate(mesh, state)
    step = make_train_step(model, tx, mesh)

    batch = shard_batch(mesh, synthetic_batch(rng), axis=1)
    losses = []
    for _ in range(8):
        state, stats = step(state, batch)
        losses.append(float(stats["total_loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8
    # params replicated identically across devices (no divergence)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_grad_accumulation_sums_micro_batches(rng):
    """One step on (S=2, B) must equal one step on the concatenated batch
    ONLY in the summed-gradient sense: verify against manual grad sums."""
    mesh = make_mesh(1)
    cfg = OptimConfig(optimizer_type="sgd", lr=1e-2, lr_type="multi_step", steps=(100, 200))
    tx = create_optimizer(cfg, num_epochs=300, steps_per_epoch=1)
    model, state = _small_model_and_state(tx)
    step = make_train_step(model, tx, mesh)

    batch = synthetic_batch(rng, s=2, b=2)
    # snapshot before the step: donate_argnums frees the state buffers
    params0 = jax.tree_util.tree_map(np.asarray, state.params)
    bstats0 = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    opt0 = jax.tree_util.tree_map(np.asarray, state.opt_state)
    new_state, _ = step(replicate(mesh, state), shard_batch(mesh, batch, axis=1))

    # manual: sum of per-slice grads
    from sfa3d_tpu.parallel.train_step import _loss_and_updates
    import optax

    def grad_of_slice(i, bstats):
        (_, (_, nb)), g = jax.value_and_grad(
            lambda p: _loss_and_updates(
                model, p, bstats, batch["bev"][i],
                jax.tree_util.tree_map(lambda t: t[i], batch["targets"]),
            ),
            has_aux=True,
        )(params0)
        return g, nb

    g0, bs1 = grad_of_slice(0, bstats0)
    g1, _ = grad_of_slice(1, bs1)
    gsum = jax.tree_util.tree_map(jnp.add, g0, g1)
    updates, _ = tx.update(gsum, opt0, params0)
    manual_params = optax.apply_updates(params0, updates)

    flat_a = jax.tree_util.tree_leaves(new_state.params)
    flat_b = jax.tree_util.tree_leaves(manual_params)
    for a, b in zip(flat_a, flat_b):
        # 1e-5: scan-fused vs. manually-chained grads compile to different
        # XLA programs with slightly different f32 reduction orders
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_eval_step(rng):
    mesh = make_mesh(8)
    cfg = OptimConfig()
    tx = create_optimizer(cfg, 10, 5)
    model, state = _small_model_and_state(tx)
    state = replicate(mesh, state)
    ev = make_eval_step(model, mesh)
    b = synthetic_batch(rng)
    batch = {"bev": b["bev"][0], "targets": jax.tree_util.tree_map(lambda t: t[0], b["targets"])}
    stats = ev(state, shard_batch(mesh, batch))
    assert np.isfinite(float(stats["total_loss"]))


@pytest.mark.parametrize("lr_type", ["cosin", "multi_step", "one_cycle"])
def test_lr_schedules_match_reference_formulas(lr_type):
    num_epochs, spe = 300, 10
    cfg = OptimConfig(lr=1e-3, lr_type=lr_type, steps=(150, 180))
    sched = create_lr_schedule(cfg, num_epochs, spe)

    phase = int(0.45 * num_epochs)
    for epoch in [0, 1, 50, 134, 135, 149, 150, 179, 180, 269, 270, 299]:
        got = float(sched(epoch * spe))
        if lr_type == "cosin":
            want = 1e-3 * ((((1 + math.cos(epoch * math.pi / num_epochs)) / 2)) * 0.9 + 0.1)
        elif lr_type == "multi_step":
            want = 1e-3 * (1.0 if epoch < 150 else 0.1 if epoch < 180 else 0.01)
        else:  # one_cycle: np.linspace semantics (lr_scheduler.py:277-282)
            lr = 1e-3
            up = np.linspace(lr * 0.1, lr, phase)
            down = np.linspace(lr, lr * 0.1, phase)
            tail = np.linspace(lr * 0.1, lr * 0.01, num_epochs - 2 * phase)
            want = float(np.hstack([up, down, tail])[epoch])
        assert got == pytest.approx(want, rel=1e-5), (lr_type, epoch)


def test_checkpoint_roundtrip(tmp_path, rng):
    from sfa3d_tpu.runtime.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint

    cfg = OptimConfig()
    tx = create_optimizer(cfg, 10, 5)
    model, state = _small_model_and_state(tx)
    step = make_train_step(model, tx)
    state, _ = step(state, synthetic_batch(rng, b=2))
    path = save_checkpoint(str(tmp_path), "t", state, epoch=3)

    _, fresh = _small_model_and_state(tx)
    restored, epoch = load_checkpoint(path, fresh)
    assert epoch == 3
    assert int(restored.step) == int(state.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert latest_checkpoint(str(tmp_path), "t") == path


def test_range_finder_schedule():
    from sfa3d_tpu.runtime.schedules import range_finder_schedule

    sched = range_finder_schedule(num_epochs=10, lr_min=1e-6, lr_max=1e-1, steps_per_epoch=1)
    assert float(sched(0)) == pytest.approx(1e-6, rel=1e-5)
    assert float(sched(9)) == pytest.approx(1e-1, rel=1e-5)
    vals = [float(sched(i)) for i in range(10)]
    ratios = [b / a for a, b in zip(vals, vals[1:])]
    # log-spaced: constant multiplicative step
    assert all(r == pytest.approx(ratios[0], rel=1e-4) for r in ratios)


def test_auto_resume_and_checkpoint_retention(tmp_path, rng):
    """--auto_resume resumes from the newest checkpoint in the directory;
    --keep_checkpoints prunes older epoch checkpoints after each save
    (driving a full 608^2 CLI run on the CPU mesh is minutes-slow, so this
    exercises the same latest/prune/load calls cli/train.py makes)."""
    import os

    from sfa3d_tpu.runtime.checkpoint import (
        latest_checkpoint,
        load_checkpoint,
        prune_checkpoints,
        save_checkpoint,
    )

    cfg = OptimConfig()
    tx = create_optimizer(cfg, 10, 5)
    model, state = _small_model_and_state(tx)
    step = make_train_step(model, tx)

    d = str(tmp_path / "ckpts")
    os.makedirs(d)
    assert latest_checkpoint(d, "ar") is None  # fresh run: nothing to resume
    for epoch in (1, 2, 3):
        state, _ = step(state, synthetic_batch(rng, b=2))
        save_checkpoint(d, "ar", state, epoch)
        prune_checkpoints(d, "ar", keep_last=2)
    assert latest_checkpoint(d, "ar").endswith("epoch_3")
    assert not os.path.exists(os.path.join(d, "Model_ar_epoch_1"))  # pruned
    assert os.path.exists(os.path.join(d, "Model_ar_epoch_2"))

    # the relaunch path: no resume_path given -> latest wins, epochs continue
    _, fresh = _small_model_and_state(tx)
    restored, epoch = load_checkpoint(latest_checkpoint(d, "ar"), fresh)
    assert epoch == 3 and int(restored.step) == int(state.step)
    # keep_last=0 keeps everything (reference behavior)
    prune_checkpoints(d, "ar", keep_last=0)
    assert os.path.exists(os.path.join(d, "Model_ar_epoch_2"))


def test_compilation_cache_flag_parses():
    """--compilation_cache: bare flag -> '' (default dir); explicit DIR
    passes through; absent -> None (off). The enable path itself is
    exercised by tests/conftest.py, which turns the cache on for the whole
    suite."""
    from sfa3d_tpu.config.train import parse_train_configs

    assert parse_train_configs([]).runtime.compilation_cache is None
    assert parse_train_configs(
        ["--compilation_cache"]).runtime.compilation_cache == ""
    assert parse_train_configs(
        ["--compilation_cache", "/tmp/x"]).runtime.compilation_cache == "/tmp/x"


def test_maybe_val_ap_runs_eval_on_checkpoint(tmp_path):
    """--val_ap: a just-saved FULL-SIZE checkpoint must round-trip into the
    eval CLI and produce a structured AP result (the in-training
    model-selection signal; reference validation is loss-only)."""
    import os

    from sfa3d_tpu.cli.train import maybe_val_ap
    from sfa3d_tpu.config.train import parse_train_configs
    from sfa3d_tpu.data.synthetic import write_mini_kitti
    from sfa3d_tpu.runtime.checkpoint import save_checkpoint
    from sfa3d_tpu.runtime.logger import Logger

    root = write_mini_kitti(str(tmp_path / "kitti"), n_frames=1, cameras=False)
    configs = parse_train_configs([
        "--dataset_dir", root, "--root-dir", str(tmp_path),
        "--saved_fn", "vap", "--val_ap", "--val_ap_samples", "1",
        "--peak_thresh", "0.0",
        # EMA on: maybe_val_ap must select the checkpointed EMA weights
        # (--use_ema flows through the eval CLI -> load_params_only)
        "--ema_decay", "0.999",
    ])
    assert configs.runtime.val_ap and configs.runtime.val_ap_samples == 1
    assert configs.optim.ema_decay == 0.999

    model = create_model(configs.model.arch)
    variables = init_detector(model, jax.random.PRNGKey(0))  # full 608^2
    tx = create_optimizer(configs.optim, 2, 2)
    state = replicate(make_mesh(1),
                      create_train_state(model, variables, tx, ema=True))
    os.makedirs(configs.checkpoints_dir, exist_ok=True)
    path = save_checkpoint(configs.checkpoints_dir, "vap", state, 1)

    logger = Logger(configs.logs_dir, "vap")
    res = maybe_val_ap(configs, path, 1, logger, None)
    assert res is not None and 0.0 <= res["mAP"] <= 1.0
    assert set(res["by_difficulty"]) == {"Easy", "Moderate", "Hard"}

    # non-KITTI layouts are skipped with a warning, never crash the loop
    argo = configs.replace(data=configs.data.__class__(dataset="argoverse"))
    assert maybe_val_ap(argo, path, 1, logger, None) is None


def test_resume_continues_schedule_and_optimizer_exactly(tmp_path):
    """A killed-and-resumed run must be indistinguishable from an
    uninterrupted one: after checkpoint restore, the optimizer moments, the
    schedule position (state.step drives the cosine LR), and the resulting
    params match the continuous run bit-for-bit over the same batch
    sequence (GENERALIZE_CHECK's resume leg relies on this)."""
    from sfa3d_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint

    cfg = OptimConfig(lr_type="cosin")
    tx = create_optimizer(cfg, num_epochs=2, steps_per_epoch=4)
    step = make_train_step(create_model("fpn_resnet_18"), tx)
    batches = [synthetic_batch(np.random.default_rng(100 + i), b=2)
               for i in range(8)]

    model, s_cont = _small_model_and_state(tx)
    for b in batches:
        s_cont, _ = step(s_cont, b)

    _, s_a = _small_model_and_state(tx)  # same PRNGKey(0) init
    for b in batches[:4]:
        s_a, _ = step(s_a, b)
    path = save_checkpoint(str(tmp_path), "rc", s_a, epoch=1)

    _, fresh = _small_model_and_state(tx)
    s_b, epoch = load_checkpoint(path, fresh)
    assert epoch == 1 and int(s_b.step) == 4
    for b in batches[4:]:
        s_b, _ = step(s_b, b)

    assert int(s_b.step) == int(s_cont.step) == 8
    for a, c in zip(jax.tree_util.tree_leaves(s_b.params),
                    jax.tree_util.tree_leaves(s_cont.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    for a, c in zip(jax.tree_util.tree_leaves(s_b.opt_state),
                    jax.tree_util.tree_leaves(s_cont.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def _np_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), tree)


def test_ema_tracks_ramped_recurrence(rng):
    """The in-jit EMA must equal the hand-computed recurrence
    e_{t} = e_{t-1} + (1 - d(t)) * (p_t - e_{t-1}) with the ramped decay
    d(t) = decay * (1 - exp(-t/tau)) (ultralytics ModelEMA schedule),
    seeded at the init params."""
    decay, tau = 0.95, 4.0
    cfg = OptimConfig(lr_type="cosin", ema_decay=decay, ema_tau=tau)
    tx = create_optimizer(cfg, num_epochs=2, steps_per_epoch=4)
    model = create_model("fpn_resnet_18")
    variables = init_detector(model, jax.random.PRNGKey(0), input_size=(64, 64))
    state = create_train_state(model, variables, tx, ema=True)
    step = make_train_step(model, tx, ema_decay=decay, ema_tau=tau)

    expect = _np_tree(state.params)  # EMA seed == init params
    batch = synthetic_batch(rng, b=2)
    for t in range(1, 4):
        state, _ = step(state, batch)
        d = decay * (1.0 - math.exp(-t / tau))
        params = _np_tree(state.params)
        expect = jax.tree_util.tree_map(
            lambda e, p: e + (1.0 - d) * (p - e), expect, params
        )
    got = _np_tree(state.ema_params)
    for e, g in zip(jax.tree_util.tree_leaves(expect),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(g, e, rtol=2e-5, atol=2e-6)
    # and the EMA genuinely lags the raw weights (it is not a copy)
    diffs = [np.abs(a - b).max() for a, b in
             zip(jax.tree_util.tree_leaves(got),
                 jax.tree_util.tree_leaves(_np_tree(state.params)))]
    assert max(diffs) > 1e-5


def test_ema_checkpoint_roundtrip_and_legacy_compat(tmp_path, rng):
    """EMA weights ride the composite checkpoint; restores are compatible
    both ways with pre-EMA checkpoints (seed-from-params / drop)."""
    from sfa3d_tpu.runtime.checkpoint import (
        load_checkpoint, load_params_only, save_checkpoint,
    )

    cfg = OptimConfig(lr_type="cosin", ema_decay=0.9, ema_tau=2.0)
    tx = create_optimizer(cfg, num_epochs=2, steps_per_epoch=4)
    model = create_model("fpn_resnet_18")
    variables = init_detector(model, jax.random.PRNGKey(0), input_size=(64, 64))
    state = create_train_state(model, variables, tx, ema=True)
    step = make_train_step(model, tx, ema_decay=0.9, ema_tau=2.0)
    batch = synthetic_batch(rng, b=2)
    for _ in range(3):
        state, _ = step(state, batch)
    ema_saved = _np_tree(state.ema_params)
    path = save_checkpoint(str(tmp_path / "a"), "ema", state, epoch=1)

    # roundtrip: EMA restored bit-exactly
    fresh = create_train_state(model, init_detector(
        model, jax.random.PRNGKey(1), input_size=(64, 64)), tx, ema=True)
    restored, epoch = load_checkpoint(path, fresh)
    assert epoch == 1
    for a, b in zip(jax.tree_util.tree_leaves(ema_saved),
                    jax.tree_util.tree_leaves(_np_tree(restored.ema_params))):
        np.testing.assert_array_equal(a, b)

    # inference-side selection: use_ema returns the EMA tree, not the raw
    got = load_params_only(path, use_ema=True)["params"]
    for a, b in zip(jax.tree_util.tree_leaves(ema_saved),
                    jax.tree_util.tree_leaves(_np_tree(got))):
        np.testing.assert_array_equal(a, b)

    # legacy checkpoint (no EMA) + EMA template -> seeded from raw params
    # (fresh init: the original `variables` buffers were donated by `step`)
    variables2 = init_detector(model, jax.random.PRNGKey(2), input_size=(64, 64))
    plain = create_train_state(model, variables2, tx, ema=False)
    plain, _ = step_no_ema(model, tx, plain, batch)
    ppath = save_checkpoint(str(tmp_path / "b"), "plain", plain, epoch=2)
    restored2, _ = load_checkpoint(ppath, fresh)
    for a, b in zip(jax.tree_util.tree_leaves(_np_tree(restored2.params)),
                    jax.tree_util.tree_leaves(_np_tree(restored2.ema_params))):
        np.testing.assert_array_equal(a, b)
    # the seeded EMA must be a real COPY: the donated train step would
    # otherwise donate aliased params/ema buffers twice (advisor r3-high)
    restored2, _ = step(restored2, batch)
    assert all(bool(np.isfinite(l).all())
               for l in jax.tree_util.tree_leaves(_np_tree(restored2.ema_params)))
    with pytest.raises(ValueError, match="no ema_params"):
        load_params_only(ppath, use_ema=True)

    # EMA checkpoint + non-EMA template -> EMA dropped
    variables3 = init_detector(model, jax.random.PRNGKey(3), input_size=(64, 64))
    restored3, _ = load_checkpoint(path, create_train_state(
        model, variables3, tx, ema=False))
    assert restored3.ema_params is None


def step_no_ema(model, tx, state, batch):
    return make_train_step(model, tx)(state, batch)
