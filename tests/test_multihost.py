"""Multi-host launch glue: the SFA3D_DIST gate, per-process batch split, and
sampler sharding semantics (reference train.py:58-86 + DistributedSampler).
True multi-process execution needs a coordinator; what one process can
verify is covered here, and the initialize() call itself is env-gated so
single-host runs never touch it."""

import numpy as np
import pytest

from sfa3d_tpu.config.train import TrainConfig
from sfa3d_tpu.data.loader import EpochSampler, create_train_loader
from sfa3d_tpu.parallel import maybe_init_distributed


def test_spatial_mesh_step_matches_unsharded_step():
    """dp x sp (make_mesh_2d) NUMERICAL correctness, not just liveness: one
    train step with the BEV rows sharded over 'spatial' (XLA SPMD conv halo
    exchange) and the batch over 'data' must produce the SAME loss and the
    same parameter update as the completely unsharded step on identical
    init + data (claim under test: parallel/train_step.py dp x sp branch,
    PARITY.md section 2.8).

    Runs scripts/spatial_parity_check.py in a SUBPROCESS: the proof needs
    float64 (in f32, sharded reduction reassociation flips ReLU kinks and
    chaos-amplifies to percent-level update differences that would mask a
    real bug), and x64 mode is process-global. The script is also the
    regression pin for the jax-0.9.0 Shardy partitioner bug (spatial-sharded
    stride-2 conv+BN backward double-counts kernel grads, EXACTLY 2x) that
    make_train_step works around by forcing classic GSPMD."""
    import json
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the script sets its own device count
    out = subprocess.run(
        [sys.executable, "scripts/spatial_parity_check.py"],
        cwd=root, env=env, capture_output=True, text=True, timeout=1700,
    )
    assert out.returncode == 0, f"stderr tail: {out.stderr[-2000:]}"
    report = json.loads(out.stdout.strip().splitlines()[-1])
    assert report["ok"] is True
    assert report["dpsp_worst_update_rel"] <= 1e-9
    assert report["dp_worst_update_rel"] <= 1e-9


def test_distributed_gate_off_by_default(monkeypatch):
    monkeypatch.delenv("SFA3D_DIST", raising=False)
    assert maybe_init_distributed() is False


def test_per_process_batch_split(tmp_path):
    from sfa3d_tpu.data.synthetic import write_mini_kitti

    root = write_mini_kitti(str(tmp_path / "kitti"), n_frames=4)
    cfg = TrainConfig().replace()
    cfg = cfg.replace(
        data=cfg.data.__class__(dataset_dir=root, num_samples=4),
        runtime=cfg.runtime.__class__(batch_size=4),
    )
    loader = create_train_loader(cfg, process_index=1, process_count=2)
    assert loader.batch_size == 2  # global 4 over 2 processes
    assert loader.sampler.process_index == 1
    assert loader.sampler.process_count == 2

    bad = cfg.replace(runtime=cfg.runtime.__class__(batch_size=3))
    with pytest.raises(AssertionError, match="divide evenly"):
        create_train_loader(bad, process_index=0, process_count=2)


def test_sampler_process_shards_are_disjoint_and_complete():
    n = 37
    shards = [
        list(EpochSampler(n, shuffle=True, seed=9, process_index=p, process_count=3))
        for p in range(3)
    ]
    flat = sorted(i for s in shards for i in s)
    assert flat == list(range(n))
    assert not (set(shards[0]) & set(shards[1]) & set(shards[2]))
    # same epoch -> same global permutation on every process
    again = list(EpochSampler(n, shuffle=True, seed=9, process_index=0, process_count=3))
    assert again == shards[0]


def test_true_two_process_run(tmp_path):
    """TWO real processes, one CPU device each, coordinated through
    jax.distributed: per-process local batch slices assemble into the global
    array, the sharded train step runs the same global program everywhere,
    and both processes report bit-identical losses (the DDP all-reduce
    semantics of reference train.py:58-86, for real)."""
    import json
    import socket
    import subprocess
    import sys

    # a free port for the coordinator
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    import os

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            SFA3D_DIST="1",
            SFA3D_COORDINATOR=f"127.0.0.1:{port}",
            SFA3D_NUM_PROCESSES="2",
            SFA3D_PROCESS_ID=str(pid),
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
        )
        procs.append(subprocess.Popen(
            [sys.executable, "scripts/multihost_smoke.py"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"rc={p.returncode}\nstdout={out}\nstderr={err[-2000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    by_pid = {o["process"]: o for o in outs}
    assert set(by_pid) == {0, 1}
    for o in outs:
        assert o["process_count"] == 2
        assert o["global_devices"] == 2
        assert o["local_devices"] == 1
        assert all(np.isfinite(o["losses"]))
    # the global program computes ONE loss — identical on every process
    assert by_pid[0]["losses"] == by_pid[1]["losses"]
