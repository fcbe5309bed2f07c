"""The asynchronous input pipeline (num_workers > 0) must yield exactly the
same batch stream as the synchronous path — same sampler order, same
collation — and must propagate worker exceptions instead of hanging."""

import numpy as np
import pytest

import jax

from sfa3d_tpu.data.loader import KittiTrainLoader


class _Sample:
    def __init__(self, idx):
        rng = np.random.default_rng(idx)
        self.points = rng.uniform(-1, 1, (32, 4)).astype(np.float32)
        self.valid = np.ones((32,), bool)
        self.labels = np.zeros((4, 8), np.float32)
        self.n_labels = 1
        self.hflipped = False


class _Dataset:
    def __init__(self, n=13, fail_at=None):
        self.n = n
        self.fail_at = fail_at

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        if idx == self.fail_at:
            raise RuntimeError(f"boom at {idx}")
        return _Sample(idx)


def _prepare_stub(points, valid, labels, n_labels, hflip):
    # identity "device prep": batch of points becomes the 'bev', labels the
    # 'targets' — enough to verify ordering and collation shape handling
    return points, {"labels": labels}


def _make(num_workers, **kw):
    return KittiTrainLoader(
        _Dataset(**kw), batch_size=2, subdivisions=2, shuffle=True, seed=7,
        prepare_fn=_prepare_stub, num_workers=num_workers, prefetch=2,
    )


def test_async_stream_identical_to_sync():
    sync = _make(0)
    asyn = _make(3)
    for epoch in (0, 1):
        sync.set_epoch(epoch)
        asyn.set_epoch(epoch)
        got_s = list(sync)
        got_a = list(asyn)
        assert len(got_s) == len(got_a) == len(sync) == 3
        for bs, ba in zip(got_s, got_a):
            np.testing.assert_array_equal(np.asarray(bs["bev"]), np.asarray(ba["bev"]))
            np.testing.assert_array_equal(
                np.asarray(bs["targets"]["labels"]), np.asarray(ba["targets"]["labels"])
            )


def test_async_worker_error_propagates():
    loader = _make(2, n=13, fail_at=5)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_async_early_abandon_does_not_hang():
    loader = _make(2, n=13)
    it = iter(loader)
    next(it)
    it.close()  # consumer walks away mid-epoch; producer must retire


def test_tail_batch_async_matches_sync():
    kw = dict(batch_size=2, subdivisions=2, shuffle=False, drop_last=False,
              prepare_fn=_prepare_stub, prefetch=2)
    sync = KittiTrainLoader(_Dataset(n=7), num_workers=0, **kw)
    asyn = KittiTrainLoader(_Dataset(n=7), num_workers=2, **kw)
    got_s, got_a = list(sync), list(asyn)
    assert len(got_s) == len(got_a) == 2  # one full step + one tail
    assert got_s[-1]["bev"].shape == got_a[-1]["bev"].shape == (1, 3, 32, 4)
