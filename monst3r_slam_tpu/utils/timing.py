"""Device-synchronized timers (reference `tictoc.py:4-30` equivalent).

The reference uses paired torch.cuda.Events with forced sync; on TPU we
bracket with `jax.block_until_ready` on a sentinel and use host perf
counters. Also provides a `jax.profiler` trace helper for deep dives.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import jax

_stack: List[tuple] = []
stats: Dict[str, List[float]] = {}


def sync():
    """Drain all pending device work."""
    jax.block_until_ready(jax.device_put(0.0))


def tic(name: str = ""):
    sync()
    _stack.append((name, time.perf_counter()))


def toc(name: str = "", verbose: bool = True) -> float:
    sync()
    start_name, t0 = _stack.pop()
    dt = time.perf_counter() - t0
    label = name or start_name
    stats.setdefault(label, []).append(dt)
    if verbose:
        print(f"{label}: {dt * 1e3:.2f} ms")
    return dt


@contextlib.contextmanager
def timer(name: str, verbose: bool = False):
    tic(name)
    try:
        yield
    finally:
        toc(name, verbose=verbose)


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace (open with xprof/tensorboard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def summary() -> str:
    lines = []
    for k, v in stats.items():
        lines.append(
            f"{k}: n={len(v)} mean={sum(v) / len(v) * 1e3:.2f}ms "
            f"min={min(v) * 1e3:.2f}ms max={max(v) * 1e3:.2f}ms"
        )
    return "\n".join(lines)
