"""Honest TPU timing on the axon relay.

`jax.block_until_ready` returns early on this stack; the only reliable sync
is a host transfer (np.asarray). Measure by chaining n calls (feeding a
data dependence when available) and forcing ONE final transfer, mirroring
bench.py's methodology.
"""

import time

import numpy as np


def chain_time(fn, n=10, warmup=2):
    """fn(k) -> output array (or tuple; first element synced).

    Returns seconds/call measured over n chained calls + one final transfer.
    """
    def sync(o):
        np.asarray(o[0] if isinstance(o, tuple) else o)

    for k in range(warmup):
        out = fn(k)
    sync(out)
    t0 = time.perf_counter()
    for k in range(n):
        out = fn(k)
    sync(out)
    return (time.perf_counter() - t0) / n
