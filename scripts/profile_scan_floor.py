"""Calibrate the per-program / per-scan-iteration floor on the relay TPU.

Round-4 finding: even an MLP-only 24-block scan measures ~11.5 ms where the
matmul roofline is ~1.6 ms. Is it the scan structure, the stacked-weight
slicing, or a harness floor? Programs:

  noop24        - scan of 24 trivial adds on the token tensor
  matmul24_scan - scan of 24 x (768x1024 @ 1024x4096 @ 4096x1024) bf16
  matmul24_unrl - same 24 blocks unrolled (python loop in trace)
  matmul24_wide - ONE call shaped as the batched equivalent (24 stacked)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tpu_timeit import chain_time

N, D, F = 768, 1024, 4096


def main():
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (1, N, D), jnp.bfloat16)
    W1 = 0.02 * jax.random.normal(key, (24, D, F), jnp.bfloat16)
    W2 = 0.02 * jax.random.normal(key, (24, F, D), jnp.bfloat16)

    def timed(name, fn):
        st = {"x": x0}
        fn(st["x"])  # compile

        def step(k):
            y = fn(st["x"])
            st["x"] = x0 + 1e-6 * y[..., :D]
            return y

        t = chain_time(step, n=10, warmup=2)
        print(f"{name}_ms: {t*1e3:.2f}", flush=True)

    @jax.jit
    def noop24(x):
        def body(c, _):
            return c + 1e-6, None

        y, _ = jax.lax.scan(body, x, jnp.arange(24))
        return y

    timed("noop24", noop24)

    @jax.jit
    def matmul24_scan(x):
        def body(c, w):
            w1, w2 = w
            return c + (c @ w1) @ w2, None

        y, _ = jax.lax.scan(body, x, (W1, W2))
        return y

    timed("matmul24_scan", matmul24_scan)

    @jax.jit
    def matmul24_unrl(x):
        c = x
        for i in range(24):
            c = c + (c @ W1[i]) @ W2[i]
        return c

    timed("matmul24_unrl", matmul24_unrl)

    # roofline calibration: all 24 as ONE batched einsum pair (no sequential
    # dependency — pure MXU throughput at the same total FLOPs)
    X24 = jnp.broadcast_to(x0, (24, N, D)).astype(jnp.bfloat16)

    @jax.jit
    def matmul24_wide(x):
        h = jnp.einsum("bnd,bdf->bnf", jnp.broadcast_to(x, (24, N, D)), W1)
        return jnp.einsum("bnf,bfd->bnd", h, W2)

    timed("matmul24_wide", matmul24_wide)


if __name__ == "__main__":
    main()
