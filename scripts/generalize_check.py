"""Generalization check: the training recipe must learn, not memorize.

Trains fpn_resnet_18 on ~512 DISTINCT synthetic scenes with the reference
recipe shape (cosine LR, batch 16 x subdivisions -> effective batch 64,
rotation/scaling augmentation ON — /root/reference/train.py:151-178 +
Technical_details.md:39-44), holds out a disjoint val split, KILLS the
training process mid-run and lets --auto_resume continue it, then evaluates
every retained checkpoint on the held-out frames to record the val mAP
curve. Proves: the recipe generalizes to unseen frames, and a killed run
resumes into the same trajectory (schedule + optimizer state restored;
bit-exactness of that restore is pinned by tests/test_train.py::
test_resume_continues_schedule_and_optimizer_exactly).

Run on the TPU (a few hours — the defaults ARE the validated
GENERALIZE_CHECK.json config):     python scripts/generalize_check.py
CPU smoke (plumbing only; --smoke reports the accuracy gates without
enforcing them — 2 epochs from random init can't pass them):
    python scripts/generalize_check.py --cpu --smoke \
    --frames_train 16 --frames_val 4 --epochs 2 --checkpoint_freq 1 \
    --batch_size 4 --effective_batch 4 --kill_after_epoch 0
"""

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import tempfile
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def train_cmd(args, root, tmp):
    cmd = [
        sys.executable, "-m", "sfa3d_tpu.cli", "train",
        "--dataset_dir", root,
        "--batch_size", str(args.batch_size),
        "--effective_batch", str(args.effective_batch),
        "--mesh_shape", "1",
        "--num_epochs", str(args.epochs),
        "--checkpoint_freq", str(args.checkpoint_freq),
        "--keep_checkpoints", "0",  # keep every epoch: the eval curve needs them
        "--auto_resume",
        "--print_freq", "8",
        "--num_workers", "4",
        "--lr", str(args.lr),
        "--lr_type", "cosin",
        "--root-dir", tmp,
        "--saved_fn", "gen",
        "--compute_dtype", args.dtype,
        # persistent XLA cache: the kill+auto-resume phase relaunches the
        # trainer, which would otherwise pay the multi-minute 608^2 compile
        # a second time
        "--compilation_cache",
        os.path.join(os.path.expanduser("~"), ".cache", "sfa3d_tpu", "xla_cache"),
        # augmentation ON: reference train-time aug (OneOf(rotation, scaling)
        # p=0.66 + BEV hflip) — the defaults
    ]
    if args.ema_decay:
        cmd += ["--ema_decay", str(args.ema_decay),
                "--ema_tau", str(args.ema_tau)]
    if args.cpu:
        cmd += ["--platform", "cpu"]
    return cmd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames_train", type=int, default=512)
    ap.add_argument("--frames_val", type=int, default=64)
    # defaults == the validated GENERALIZE_CHECK.json run (lr 2.5e-4: the
    # accumulation SUMS micro-batch grads for torch parity, so 1e-3 at 4
    # slices oscillates — docs/TECHNICAL.md "LR note")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--effective_batch", type=int, default=64)
    ap.add_argument("--checkpoint_freq", type=int, default=20)
    ap.add_argument("--lr", type=float, default=2.5e-4)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--ema_decay", type=float, default=0.0,
                    help="train with a parameter EMA and evaluate the EMA "
                         "weights (the modern-detector stabilizer; smooths "
                         "the val curve's epoch-to-epoch oscillation)")
    ap.add_argument("--ema_tau", type=float, default=2000.0,
                    help="EMA ramp time-constant in OPTIMIZER STEPS. The "
                         "ultralytics default 2000 suits runs of 10k+ "
                         "steps; at this harness's scale (8 steps/epoch -> "
                         "~3k steps) the ramp never completes and the EMA "
                         "degenerates to the raw weights — use ~200 here")
    ap.add_argument("--kill_after_epoch", type=int, default=None,
                    help="SIGKILL the trainer once this epoch's checkpoint "
                         "lands (default: epochs//3 rounded to a checkpoint; "
                         "0 disables the kill)")
    ap.add_argument("--min_final_easy", type=float, default=0.5)
    ap.add_argument("--range_falloff", type=float, default=0.0,
                    help="synthetic LiDAR 1/r^2 point-density falloff "
                         "(full density at this range, meters; 0 = uniform "
                         "density). >0 makes far objects genuinely sparser, "
                         "so the Easy/Moderate/Hard buckets discriminate")
    ap.add_argument("--data_seed", type=int, default=0,
                    help="seed for the synthetic scene population — a "
                         "different seed replicates the experiment on a "
                         "disjoint dataset")
    ap.add_argument("--smoke", action="store_true",
                    help="plumbing-only run: report the accuracy gates but "
                         "exit 0 even if they fail")
    ap.add_argument("--out", default=os.path.join(_ROOT, "GENERALIZE_CHECK.json"))
    ap.add_argument("--keep_tmp", action="store_true")
    ap.add_argument("--resume_tmp", default=None,
                    help="path of a previous run's tmp dir (generalize_*): "
                         "skip scene generation and the kill phase, relaunch "
                         "the trainer with --auto_resume on the surviving "
                         "checkpoints, and rebuild the full val curve. Use "
                         "after an infrastructure failure (e.g. a TPU-tunnel "
                         "wedge) killed the original invocation; pass the "
                         "SAME config flags as that invocation.")
    args = ap.parse_args()

    kill_epoch = args.kill_after_epoch
    if kill_epoch is None:
        kill_epoch = max(args.checkpoint_freq,
                         (args.epochs // 3) // args.checkpoint_freq
                         * args.checkpoint_freq)

    from sfa3d_tpu.data.synthetic import write_mini_kitti

    n = args.frames_train + args.frames_val
    if args.resume_tmp:
        tmp = args.resume_tmp
        root = os.path.join(tmp, "kitti")
        n_found = len(os.listdir(os.path.join(root, "training", "velodyne")))
        assert n_found == n, (
            f"--resume_tmp {tmp} holds {n_found} scenes but the flags say "
            f"{n}; pass the original run's --frames_train/--frames_val/"
            f"--data_seed"
        )
        kill_epoch = 0  # the infrastructure failure WAS the kill
        print(f"resuming previous run under {tmp} ({n_found} scenes)")
    else:
        tmp = tempfile.mkdtemp(prefix="generalize_")
        root = os.path.join(tmp, "kitti")
        print(f"writing {n} synthetic scenes ({args.frames_train} train / "
              f"{args.frames_val} HELD-OUT val) under {root}")
        write_mini_kitti(
            root, n_frames=n, seed=args.data_seed, cameras=False,
            range_falloff=args.range_falloff,
            splits={"train": range(args.frames_train),
                    "val": range(args.frames_train, n),
                    "test": range(args.frames_train, n)},
        )

    cmd = train_cmd(args, root, tmp)
    ckpt_dir = os.path.join(tmp, "checkpoints", "gen")
    # APPEND to PYTHONPATH: overwriting would drop the TPU plugin's path
    # (/root/.axon_site rides on PYTHONPATH in this environment)
    env = dict(os.environ)
    env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")

    killed_at = None
    if kill_epoch:
        # phase 1: launch, wait for the kill_epoch checkpoint, SIGKILL
        # mid-following-epoch (direct PID — never pattern-based)
        print(f"phase 1: {' '.join(cmd)}")
        proc = subprocess.Popen(cmd, cwd=_ROOT, env=env)
        target = os.path.join(ckpt_dir, f"Model_gen_epoch_{kill_epoch}")
        deadline = time.time() + 7200
        while time.time() < deadline and proc.poll() is None:
            if os.path.isdir(target) or os.path.exists(target):
                time.sleep(10)  # let the next epoch get underway
                break
            time.sleep(2)
        if proc.poll() is None:
            proc.kill()
            proc.wait()
            killed_at = kill_epoch
            print(f"killed trainer after epoch-{kill_epoch} checkpoint landed")
        else:
            print("trainer exited before the kill point "
                  f"(rc={proc.returncode}); continuing")

    # phase 2 (or the only phase): run to completion; --auto_resume picks up
    print("phase 2: relaunch to completion (auto_resume)")
    rc = subprocess.run(cmd, cwd=_ROOT, env=env).returncode
    assert rc == 0, f"training failed rc={rc}"

    # resume evidence from the log file (all of them: a --resume_tmp run has
    # the original kill+resume AND the post-wedge resume in one log)
    resume_history = []
    logf = glob.glob(os.path.join(tmp, "logs", "**", "logger_gen.txt"),
                     recursive=True)
    if logf:
        for line in open(logf[0]):
            m = re.search(r"resumed from .*epoch (\d+)", line)
            if m:
                resume_history.append(int(m.group(1)))
    # a relaunch (e.g. --resume_tmp) that finds training ALREADY COMPLETE
    # also logs "resumed from epoch <terminal>" — that is harness
    # bookkeeping, not a mid-run recovery; record it separately so the
    # artifact distinguishes one continuous run from a real kill+resume
    # (ADVICE r4: readers couldn't tell which the curve came from)
    relaunches_found_complete = [e for e in resume_history if e >= args.epochs]
    resume_history = [e for e in resume_history if e < args.epochs]
    resumed_from = resume_history[-1] if resume_history else None
    if killed_at is not None:
        assert resumed_from is not None and resumed_from >= killed_at, (
            f"expected auto-resume from >= epoch {killed_at}, log says {resumed_from}"
        )

    # post-hoc held-out eval of every retained checkpoint -> the mAP curve
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from sfa3d_tpu.runtime.export import enable_compilation_cache

    enable_compilation_cache()  # cold 608^2 compiles cost minutes on the tunnel
    from sfa3d_tpu.cli.eval import main as eval_main

    ckpts = sorted(
        glob.glob(os.path.join(ckpt_dir, "Model_gen_epoch_*")),
        key=lambda p: int(p.rsplit("_", 1)[-1]),
    )
    assert ckpts, f"no checkpoints under {ckpt_dir}"
    curve = []
    for ckpt in ckpts:
        epoch = int(ckpt.rsplit("_", 1)[-1])
        res = eval_main([
            "--dataset_dir", root,
            "--split", "val",
            "--num_samples", str(args.frames_val),
            "--pretrained_path", ckpt,
            "--peak_thresh", "0.2",
        ] + (["--use_ema"] if args.ema_decay else []))
        row = {
            "epoch": epoch,
            "val_mAP": round(res["mAP"], 4),
            # orientation quality (KITTI AOS): catches a direction-head
            # collapse that box-IoU AP alone can miss (docs/TECHNICAL.md
            # yaw-symmetry finding)
            "val_mAOS": round(res.get("mAOS", 0.0), 4),
            # per-bucket dicts carry AP_<cls> + "mAP"; keep the bucket mAPs
            "by_difficulty": {k: round(v["mAP"], 4)
                              for k, v in res.get("by_difficulty", {}).items()},
            "per_class": {k: round(v, 4) for k, v in res.items()
                          if k.startswith("AP_") and not isinstance(v, dict)},
        }
        curve.append(row)
        print(json.dumps(row))

    final = curve[-1]
    early = curve[0]
    # model selection on the held-out split (the universal protocol): the
    # deliverable checkpoint is the best-val one, not the last epoch
    best = max(curve, key=lambda r: r["val_mAP"])
    climbed = best["val_mAP"] > early["val_mAP"]
    failures = []
    if best["by_difficulty"].get("Easy", best["val_mAP"]) < args.min_final_easy:
        failures.append(f"best held-out Easy AP "
                        f"{best['by_difficulty'].get('Easy')} < {args.min_final_easy}")
    if not climbed:
        failures.append("val mAP did not climb across the curve")
    report = {
        # the exact invocation, so the artifact is reproducible as recorded
        "cmd": " ".join(["python", os.path.relpath(sys.argv[0], _ROOT)]
                        + sys.argv[1:]),
        "config": {
            "frames_train": args.frames_train,
            "frames_val": args.frames_val,
            "epochs": args.epochs,
            "batch_size": args.batch_size,
            "effective_batch": args.effective_batch,
            "lr": args.lr, "lr_type": "cosin",
            "ema_decay": args.ema_decay or None,
            "ema_tau": args.ema_tau if args.ema_decay else None,
            "range_falloff": args.range_falloff or None,
            "data_seed": args.data_seed,
            "augmentation": "ON (reference defaults: OneOf(rotation, scaling) p=0.66 + hflip)",
            "dtype": args.dtype,
        },
        "killed_after_epoch": killed_at,
        "auto_resumed_from_epoch": resumed_from,
        "resume_history": resume_history,
        # relaunches that found training already finished (no steps run);
        # non-empty here does NOT mean the curve was produced by a resume
        "relaunches_found_complete_at_epoch": relaunches_found_complete,
        "val_map_curve": curve,
        "best": best,
        "final": final,
        "climbed": climbed,
        "gate": {
            "min_best_easy": args.min_final_easy,
            "must_climb": True,
            "pass": not failures,
            "failures": failures,
        },
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.out}")

    if not args.keep_tmp:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)

    if failures and args.smoke:
        for f_ in failures:
            print(f"smoke mode: gate not enforced — {f_}")
        print("GENERALIZE SMOKE OK (plumbing only)")
    elif failures:
        for f_ in failures:
            print(f"FAIL: {f_}")
        sys.exit(1)
    else:
        print("GENERALIZE CHECK OK")


if __name__ == "__main__":
    main()
