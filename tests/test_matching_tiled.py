"""Tests for the tiled MXU matcher against synthetic scenes and the
reference-semantics LM matcher."""

import jax
import jax.numpy as jnp
import numpy as np

from monst3r_slam_tpu.ops import matching, matching_tiled
from tests.test_matching import make_smooth_pointmap


def distinctive_desc(key, h, w, f=16):
    D = jax.random.normal(key, (1, h, w, f))
    return D / jnp.linalg.norm(D, axis=-1, keepdims=True)


def test_tiled_identity_match():
    h, w = 32, 48
    X = make_smooth_pointmap(jax.random.PRNGKey(0), h, w)
    D = distinctive_desc(jax.random.PRNGKey(1), h, w)
    cfg = matching.MatchingConfig(radius=1, dilation_max=2)
    tcfg = matching_tiled.TiledConfig(tile=16, crop=32, chunk_tiles=8)
    idx, valid = matching_tiled.match(X, X, D, D, cfg=cfg, tcfg=tcfg)
    idx_np = np.asarray(idx[0]).reshape(h, w)
    expect = np.arange(h * w).reshape(h, w)
    agree = (idx_np == expect).mean()
    assert agree > 0.97, agree
    assert np.asarray(valid).mean() > 0.9


def test_tiled_shifted_match():
    """Global coarse search + local refinement recovers a large shift —
    beyond what a local window around identity could see."""
    h, w, s = 48, 64, 21
    X = make_smooth_pointmap(jax.random.PRNGKey(0), h, w)
    X21 = jnp.roll(X, shift=-s, axis=2)
    D = distinctive_desc(jax.random.PRNGKey(1), h, w)
    D21 = jnp.roll(D, shift=-s, axis=2)
    cfg = matching.MatchingConfig(radius=1, dilation_max=2)
    tcfg = matching_tiled.TiledConfig(tile=16, crop=32, chunk_tiles=8)
    idx, valid = matching_tiled.match(X, X21, D, D21, cfg=cfg, tcfg=tcfg)
    p = np.asarray(matching.lin_to_pixel(idx[0], w)).reshape(h, w, 2)
    # interior pixels away from the wrap seam
    errs = []
    for v in range(8, h - 8):
        for u in range(4, w - s - 8):
            errs.append(abs(p[v, u, 0] - (u + s)) + abs(p[v, u, 1] - v))
    assert np.median(errs) <= 1.0, np.median(errs)


def test_tiled_warm_start():
    h, w, s = 32, 48, 2
    X = make_smooth_pointmap(jax.random.PRNGKey(0), h, w)
    X21 = jnp.roll(X, shift=-s, axis=2)
    D = distinctive_desc(jax.random.PRNGKey(1), h, w)
    D21 = jnp.roll(D, shift=-s, axis=2)
    # warm start: identity index map
    init = jnp.broadcast_to(jnp.arange(h * w, dtype=jnp.int32)[None], (1, h * w))
    cfg = matching.MatchingConfig(radius=1, dilation_max=2)
    tcfg = matching_tiled.TiledConfig(tile=16, crop=32, chunk_tiles=8)
    idx, valid = matching_tiled.match(X, X21, D, D21, idx_1_to_2_init=init, cfg=cfg, tcfg=tcfg)
    p = np.asarray(matching.lin_to_pixel(idx[0], w)).reshape(h, w, 2)
    errs = []
    for v in range(8, h - 8):
        for u in range(4, w - s - 8):
            errs.append(abs(p[v, u, 0] - (u + s)) + abs(p[v, u, 1] - v))
    assert np.median(errs) <= 1.0


def test_tiled_agrees_with_lm_matcher():
    """On an easy smooth scene both matchers find the same correspondences."""
    h, w = 32, 48
    X = make_smooth_pointmap(jax.random.PRNGKey(0), h, w)
    X21 = jnp.roll(X, shift=-3, axis=2)
    D = distinctive_desc(jax.random.PRNGKey(1), h, w)
    D21 = jnp.roll(D, shift=-3, axis=2)
    cfg = matching.MatchingConfig(radius=1, dilation_max=2)
    idx_lm, _ = matching.match(X, X21, D, D21, cfg=cfg)
    tcfg = matching_tiled.TiledConfig(tile=16, crop=32, chunk_tiles=8)
    idx_t, _ = matching_tiled.match(X, X21, D, D21, cfg=cfg, tcfg=tcfg)
    interior = np.zeros((h, w), bool)
    interior[6:-6, 6:-9] = True
    a = np.asarray(idx_lm[0]).reshape(h, w)[interior]
    b = np.asarray(idx_t[0]).reshape(h, w)[interior]
    assert (a == b).mean() > 0.9, (a == b).mean()
