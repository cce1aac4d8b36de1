#!/usr/bin/env python
"""Check pallas-path validity/agreement vs the XLA path on a coherent scene."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from monst3r_slam_tpu.ops import matching, matching_tiled


def main():
    h, w = 384, 512
    hw = h * w
    key = jax.random.PRNGKey(0)
    k1, _, _ = jax.random.split(key, 3)

    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    X11 = jnp.stack([(xx - w / 2) / 100, (yy - h / 2) / 100,
                     3.0 + 0.1 * jnp.sin(xx / 37) * jnp.cos(yy / 53)], -1)[None]
    shift = 9
    X21 = jnp.roll(X11, shift, axis=2)
    D11 = jax.random.normal(k1, (1, h, w, 24))
    D11 = D11 / jnp.linalg.norm(D11, axis=-1, keepdims=True)
    D21 = jnp.roll(D11, shift, axis=2)
    idx0 = jnp.arange(hw, dtype=jnp.int32)[None]

    cfg = matching.MatchingConfig()
    tcfg = matching_tiled.TiledConfig()

    ip, vp = matching_tiled.match_tiled(X11, X21, D11, D21, idx0, cfg=cfg,
                                        tcfg=tcfg, use_init=True, use_pallas=True)
    ix, vx = matching_tiled.match_tiled(X11, X21, D11, D21, idx0, cfg=cfg,
                                        tcfg=tcfg, use_init=True, use_pallas=False)
    vp, vx = np.asarray(vp[0, :, 0]), np.asarray(vx[0, :, 0])
    ip, ix = np.asarray(ip[0]), np.asarray(ix[0])
    both = vp & vx
    print("valid_pallas %.4f valid_xla %.4f agree_on_both %.4f" % (
        vp.mean(), vx.mean(), (ip[both] == ix[both]).mean()))

    # ground-truth displacement check on the pallas matches
    pu, pv = ip % w, ip // w
    qu, qv = np.arange(hw) % w, np.arange(hw) // w
    err = np.abs(pu - (qu - shift + w) % w) + np.abs(pv - qv)
    interior = (qu >= shift + 8) & (qu < w - 8) & (qv >= 8) & (qv < h - 8) & vp
    print("pallas match l1 err on valid interior: med %.1f mean %.2f frac>2px %.4f" % (
        np.median(err[interior]), err[interior].mean(), (err[interior] > 2).mean()))


if __name__ == "__main__":
    main()
