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


def test_tiled_stale_warm_start_reseeds():
    """VERDICT item 9: displacement far beyond crop/2 with a stale identity
    warm start must not silently lose matches — the per-tile coarse re-seed
    recovers them (the reference LM matcher converges unconditionally over
    arbitrary displacements, matching_kernels.cu:119-275)."""
    h, w, s = 48, 96, 40  # shift 40 >> crop/2 = 16
    X = make_smooth_pointmap(jax.random.PRNGKey(0), h, w)
    X21 = jnp.roll(X, shift=-s, axis=2)
    D = distinctive_desc(jax.random.PRNGKey(1), h, w)
    D21 = jnp.roll(D, shift=-s, axis=2)
    init = jnp.broadcast_to(jnp.arange(h * w, dtype=jnp.int32)[None], (1, h * w))
    cfg = matching.MatchingConfig(radius=1, dilation_max=2)
    tcfg = matching_tiled.TiledConfig(tile=16, crop=32, chunk_tiles=8)
    idx, valid = matching_tiled.match_tiled(
        X, X21, D, D21, init, cfg=cfg, tcfg=tcfg, use_init=True
    )
    p = np.asarray(matching.lin_to_pixel(idx[0], w)).reshape(h, w, 2)
    errs = []
    for v in range(8, h - 8):
        for u in range(4, w - s - 8):
            errs.append(abs(p[v, u, 0] - (u + s)) + abs(p[v, u, 1] - v))
    assert np.median(errs) <= 1.0, np.median(errs)
    # and the valid mask reflects recovered matches, not wholesale rejection
    interior = np.asarray(valid[0, :, 0]).reshape(h, w)[8:-8, 4 : w - s - 8]
    assert interior.mean() > 0.8, interior.mean()


def test_tiled_fresh_warm_start_not_reseeded():
    """A small-displacement warm start stays in control (no spurious reseed):
    accuracy matches the dedicated warm-start path."""
    h, w, s = 32, 48, 3
    X = make_smooth_pointmap(jax.random.PRNGKey(0), h, w)
    X21 = jnp.roll(X, shift=-s, axis=2)
    D = distinctive_desc(jax.random.PRNGKey(1), h, w)
    D21 = jnp.roll(D, shift=-s, axis=2)
    init = jnp.broadcast_to(jnp.arange(h * w, dtype=jnp.int32)[None], (1, h * w))
    cfg = matching.MatchingConfig(radius=1, dilation_max=2)
    tcfg = matching_tiled.TiledConfig(tile=16, crop=32, chunk_tiles=8)
    idx, _ = matching_tiled.match_tiled(
        X, X21, D, D21, init, cfg=cfg, tcfg=tcfg, use_init=True
    )
    p = np.asarray(matching.lin_to_pixel(idx[0], w)).reshape(h, w, 2)
    errs = []
    for v in range(8, h - 8):
        for u in range(4, w - s - 8):
            errs.append(abs(p[v, u, 0] - (u + s)) + abs(p[v, u, 1] - v))
    assert np.median(errs) <= 1.0


def test_tiled_occlusion_rejected():
    """Pixels whose true match is occluded (target region replaced by far
    geometry) must be gated invalid by the 3D-distance check, not matched
    to the impostor."""
    h, w = 32, 48
    X = make_smooth_pointmap(jax.random.PRNGKey(0), h, w)
    D = distinctive_desc(jax.random.PRNGKey(1), h, w)
    X11 = np.asarray(X).copy()
    # occlude a block in the TARGET: push it far away in depth
    X11[0, 8:24, 16:32, 2] += 50.0
    X11 = jnp.asarray(X11)
    cfg = matching.MatchingConfig(radius=1, dilation_max=2, dist_thresh=0.1)
    tcfg = matching_tiled.TiledConfig(tile=16, crop=32, chunk_tiles=8)
    idx, valid = matching_tiled.match(X11, X, D, D, cfg=cfg, tcfg=tcfg)
    vmask = np.asarray(valid[0, :, 0]).reshape(h, w)
    # occluded region: overwhelmingly invalid
    assert vmask[10:22, 18:30].mean() < 0.2, vmask[10:22, 18:30].mean()
    # clean region: overwhelmingly valid
    assert vmask[2:6, 2:14].mean() > 0.8


def test_pallas_path_matches_xla_path():
    """The Pallas kernel (interpret mode on CPU) must agree with the XLA
    tiled path on self-match and on a shifted scene — this wires the kernel
    into the production dispatch and keeps it exact."""
    h, w, s = 32, 48, 3
    X = make_smooth_pointmap(jax.random.PRNGKey(0), h, w)
    X21 = jnp.roll(X, shift=-s, axis=2)
    D = distinctive_desc(jax.random.PRNGKey(1), h, w, f=24)
    D21 = jnp.roll(D, shift=-s, axis=2)
    cfg = matching.MatchingConfig(radius=1, dilation_max=2)
    tcfg = matching_tiled.TiledConfig(tile=16, crop=32, chunk_tiles=8)

    idx_p, valid_p = matching_tiled.match(
        X, X21, D, D21, cfg=cfg, tcfg=tcfg, use_pallas=True
    )
    # self-match sanity through the pallas path
    idx_s, valid_s = matching_tiled.match(
        X, X, D, D, cfg=cfg, tcfg=tcfg, use_pallas=True
    )
    expect = np.arange(h * w)
    assert (np.asarray(idx_s[0]) == expect).mean() > 0.97
    # shifted-scene accuracy parity with the XLA path
    idx_x, _ = matching_tiled.match(X, X21, D, D21, cfg=cfg, tcfg=tcfg)
    p_p = np.asarray(matching.lin_to_pixel(idx_p[0], w)).reshape(h, w, 2)
    p_x = np.asarray(matching.lin_to_pixel(idx_x[0], w)).reshape(h, w, 2)
    errs_p, errs_x = [], []
    for v in range(8, h - 8):
        for u in range(4, w - s - 8):
            errs_p.append(abs(p_p[v, u, 0] - (u + s)) + abs(p_p[v, u, 1] - v))
            errs_x.append(abs(p_x[v, u, 0] - (u + s)) + abs(p_x[v, u, 1] - v))
    assert np.median(errs_p) <= 1.0, np.median(errs_p)
    assert np.median(errs_p) <= np.median(errs_x) + 0.5


def test_pipeline_pallas_matcher_dispatch():
    from monst3r_slam_tpu.app.pipeline import make_matcher

    fn = make_matcher({"matching": {"mode": "pallas", "radius": 1, "dilation_max": 2}})
    h, w = 32, 48
    X = make_smooth_pointmap(jax.random.PRNGKey(0), h, w)
    D = distinctive_desc(jax.random.PRNGKey(1), h, w, f=24)
    idx, valid = fn(X, X, D, D)
    assert idx.shape == (1, h * w)
    assert (np.asarray(idx[0]) == np.arange(h * w)).mean() > 0.9
