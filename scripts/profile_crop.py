#!/usr/bin/env python
"""Crop-size ablation for the Pallas matcher: DMA volume scales with crop^2
(the dominant kernel phase), so smaller crops buy back most of the match
cost — if validity/agreement hold. Times + validates crop in {64, 48, 32}."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from monst3r_slam_tpu.ops import matching, matching_tiled


def scene(h, w, shift, key):
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    X11 = jnp.stack([(xx - w / 2) / 100, (yy - h / 2) / 100,
                     3.0 + 0.1 * jnp.sin(xx / 37) * jnp.cos(yy / 53)], -1)[None]
    X21 = jnp.roll(X11, shift, axis=2)
    D11 = jax.random.normal(key, (1, h, w, 24))
    D11 = D11 / jnp.linalg.norm(D11, axis=-1, keepdims=True)
    D21 = jnp.roll(D11, shift, axis=2)
    return X11, X21, D11, D21


def main():
    h, w = 384, 512
    hw = h * w
    key = jax.random.PRNGKey(0)
    cfg = matching.MatchingConfig()
    idx0 = jnp.arange(hw, dtype=jnp.int32)[None]

    for shift in (9, 21):
        X11, X21, D11, D21 = scene(h, w, shift, key)
        _, vx = matching_tiled.match_tiled(
            X11, X21, D11, D21, idx0, cfg=cfg,
            tcfg=matching_tiled.TiledConfig(), use_init=True, use_pallas=False)
        vx = float(np.asarray(vx).mean())
        for crop in (64, 48, 32):
            tcfg = matching_tiled.TiledConfig(crop=crop)

            def run():
                return matching_tiled.match_tiled(
                    X11, X21, D11, D21, idx0, cfg=cfg, tcfg=tcfg,
                    use_init=True, use_pallas=True)

            ip, vp = run()  # compile
            np.asarray(vp)
            t0 = time.perf_counter()
            n = 10
            for _ in range(n):
                ip, vp = run()
            np.asarray(vp)
            dt = (time.perf_counter() - t0) / n * 1e3
            vpm = float(np.asarray(vp).mean())
            ipn = np.asarray(ip[0])
            pu, pv = ipn % w, ipn // w
            qu, qv = np.arange(hw) % w, np.arange(hw) // w
            err = np.abs(pu - (qu - shift + w) % w) + np.abs(pv - qv)
            interior = ((qu >= shift + 8) & (qu < w - 8) & (qv >= 8)
                        & (qv < h - 8) & np.asarray(vp[0, :, 0]))
            print(
                f"shift={shift:2d} crop={crop:2d}  {dt:7.2f} ms  "
                f"valid={vpm:.4f} (xla {vx:.4f})  "
                f"l1 med={np.median(err[interior]):.1f} "
                f"frac>2px={float((err[interior] > 2).mean()):.4f}",
                flush=True,
            )


def ablate2():
    """tile/sub_q ablation at the good crop sizes."""
    h, w = 384, 512
    hw = h * w
    key = jax.random.PRNGKey(0)
    cfg = matching.MatchingConfig()
    idx0 = jnp.arange(hw, dtype=jnp.int32)[None]
    shift = 9
    X11, X21, D11, D21 = scene(h, w, shift, key)
    for tile, crop in ((16, 48), (32, 64), (32, 48), (16, 64)):
        tcfg = matching_tiled.TiledConfig(tile=tile, crop=crop)

        def run():
            return matching_tiled.match_tiled(
                X11, X21, D11, D21, idx0, cfg=cfg, tcfg=tcfg,
                use_init=True, use_pallas=True)

        try:
            ip, vp = run()
            np.asarray(vp)
        except Exception as e:
            print(f"tile={tile} crop={crop}  FAILED {type(e).__name__}: {e}")
            continue
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            ip, vp = run()
        np.asarray(vp)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"tile={tile} crop={crop}  {dt:7.2f} ms  valid={float(np.asarray(vp).mean()):.4f}",
              flush=True)


if __name__ == "__main__":
    ablate2() if "--t2" in sys.argv else main()
