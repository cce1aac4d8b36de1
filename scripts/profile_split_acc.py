#!/usr/bin/env python
"""Isolate hi/lo-split bf16 dot accuracy vs exact f32 on real ray geometry."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def split(x):
    # Bit-level truncation to bf16: immune to --xla_allow_excess_precision
    # (a plain f32->bf16->f32 round-trip is elided under that flag, making
    # lo == 0 and silently degrading the split to single-pass bf16).
    hi32 = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(x, jnp.uint32) & jnp.uint32(0xFFFF0000),
        jnp.float32)
    lo = (x - hi32).astype(jnp.bfloat16)
    return hi32.astype(jnp.bfloat16), lo


@jax.jit
def run(q, r):
    # q: (nq, 3) unit rays; r: (m, 3) unit rays
    s_exact = jax.lax.dot_general(
        q, r, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    qh, ql = split(q)
    rh, rl = split(r)

    def nt(a, b):
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)

    # packed 2-matmul: [hi|hi] x [hi|lo] + [lo|lo] x [hi|lo]
    qB = jnp.concatenate([qh, qh], -1)
    qC = jnp.concatenate([ql, ql], -1)
    p = jnp.concatenate([rh, rl], -1)
    s2 = nt(qB, p) + nt(qC, p)

    # 3-pass: hh + hl + lh
    s3 = nt(qh, rh) + nt(qh, rl) + nt(ql, rh)

    return s_exact, s2, s3


def main():
    h, w = 384, 512
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    X = jnp.stack([(xx - w / 2) / 100, (yy - h / 2) / 100,
                   3.0 + 0.1 * jnp.sin(xx / 37) * jnp.cos(yy / 53)], -1)
    rays = X / jnp.linalg.norm(X, axis=-1, keepdims=True)
    q = rays[100:101, 100:228].reshape(-1, 3)  # 128 queries
    r = rays[100:164, 100:164].reshape(-1, 3)  # 64x64 crop

    se, s2, s3 = run(q, r)
    se, s2, s3 = map(np.asarray, (se, s2, s3))
    s64 = np.asarray(q, np.float64) @ np.asarray(r, np.float64).T
    eh = np.abs(se - s64)
    print("HIGHEST-vs-f64: p50 %.1e p99 %.1e max %.1e" % (*np.percentile(eh, [50, 99]), eh.max()))
    se = s64.astype(np.float32)
    for name, s in [("packed2", s2), ("pass3", s3)]:
        err = np.abs(s - se)
        am = np.argmax(s, 1)
        ae = np.argmax(se, 1)
        mis = (am != ae).mean()
        du = np.abs(am % 64 - ae % 64) + np.abs(am // 64 - ae // 64)
        print("%s: dot err p50 %.1e p99 %.1e max %.1e | argmax mismatch %.3f, l1 px mean %.2f max %d"
              % (name, *np.percentile(err, [50, 99]), err.max(), mis, du.mean(), du.max()))
    # score flatness near peak
    row = se[0]
    srt = np.sort(row)[::-1]
    print("top score gaps:", srt[0] - srt[1:6])


if __name__ == "__main__":
    main()
