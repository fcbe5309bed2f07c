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
