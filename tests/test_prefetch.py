"""FramePrefetcher: ordering, readahead, error surfacing, early stop."""

import time

import numpy as np
import pytest

from monst3r_slam_tpu.data.prefetch import FramePrefetcher


class FakeDataset:
    def __init__(self, n, fail_at=None, delay=0.0):
        self.n = n
        self.fail_at = fail_at
        self.delay = delay

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.fail_at is not None and i == self.fail_at:
            raise IOError(f"bad frame {i}")
        if self.delay:
            time.sleep(self.delay)
        return float(i) / 30.0, np.full((4, 4, 3), i, np.uint8)


def test_order_and_payload():
    ds = FakeDataset(7)
    got = list(FramePrefetcher(ds, lambda img: int(img[0, 0, 0]), hi=5))
    assert [i for i, _, _ in got] == list(range(5))
    assert [v for _, _, v in got] == list(range(5))
    assert got[3][1] == pytest.approx(3 / 30.0)


def test_overlap_hides_load_latency():
    """With readahead, consumer wall time ~ max(load, compute), not the sum."""
    ds = FakeDataset(8, delay=0.02)
    t0 = time.perf_counter()
    for _ in FramePrefetcher(ds, lambda img: img):
        time.sleep(0.02)  # simulated device step
    overlapped = time.perf_counter() - t0
    # serial would be >= 8 * (0.02 + 0.02) = 0.32; overlapped ~ 0.18
    assert overlapped < 0.28


def test_error_surfaces_at_consumer():
    ds = FakeDataset(6, fail_at=3)
    it = iter(FramePrefetcher(ds, lambda img: img))
    assert next(it)[0] == 0
    with pytest.raises(RuntimeError, match="frame 3"):
        for _ in range(5):
            next(it)


def test_early_stop_join():
    ds = FakeDataset(1000, delay=0.001)
    pf = FramePrefetcher(ds, lambda img: img)
    for i, _, _ in pf:
        if i == 3:
            pf.stop()
            break
    pf._thread.join(timeout=2.0)
    assert not pf._thread.is_alive()
