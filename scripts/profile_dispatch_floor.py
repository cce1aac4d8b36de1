"""Measure the relay's per-dispatch cost cleanly (no eager feed ops).

Each variant chains N jitted calls f(x) -> x (pure device-to-device
dependency, ZERO eager ops between calls) and syncs once:

  ident       - jitted y = x + 1.0 on a (1, 768, 1024) bf16 tensor
  scan24_noop - jitted scan of 24 adds on the same tensor
  scan24_mlp  - jitted scan of 24 x (x@W1)@W2 (the ViT MLP shape)
  five_chain  - five jitted ident programs back-to-back per step

If ident and scan24_noop measure the same, the cost is per-DISPATCH, not
per-scan-iteration; five_chain/ident gives the marginal per-program cost.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

N, D, F = 768, 1024, 4096
CALLS = int(os.environ.get("CALLS", "20"))


def timed(name, fn, x0):
    x = fn(x0)
    np.asarray(x[0, 0, :1].astype(jnp.float32))
    x = x0
    t0 = time.perf_counter()
    for _ in range(CALLS):
        x = fn(x)
    np.asarray(x[0, 0, :1].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / CALLS * 1e3
    print(f"{name}_ms: {dt:.2f}", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (1, N, D), jnp.bfloat16)
    W1 = 0.02 * jax.random.normal(key, (24, D, F), jnp.bfloat16)
    W2 = 0.02 * jax.random.normal(key, (24, F, D), jnp.bfloat16)

    @jax.jit
    def ident(x):
        return x + 1.0

    timed("ident", ident, x0)

    @jax.jit
    def scan24_noop(x):
        def body(c, _):
            return c + 1e-6, None

        y, _ = jax.lax.scan(body, x, jnp.arange(24))
        return y

    timed("scan24_noop", scan24_noop, x0)

    @jax.jit
    def scan24_mlp(x, w1, w2):
        def body(c, w):
            a, b = w
            return (c + (c @ a) @ b).astype(c.dtype), None

        y, _ = jax.lax.scan(body, x, (w1, w2))
        return y

    import functools

    timed("scan24_mlp", lambda x: scan24_mlp(x, W1, W2), x0)

    def five_chain(x):
        for _ in range(5):
            x = ident(x)
        return x

    timed("five_chain", five_chain, x0)


if __name__ == "__main__":
    main()
