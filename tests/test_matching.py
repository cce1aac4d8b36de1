"""Tests for the iterative-projection matcher and descriptor refinement."""

import jax
import jax.numpy as jnp
import numpy as np

from monst3r_slam_tpu.ops import matching


def make_smooth_pointmap(key, h, w, fov=0.8):
    """Synthetic pointmap: smooth positive depth over a pinhole ray grid."""
    u = jnp.linspace(-fov, fov, w)
    v = jnp.linspace(-fov * h / w, fov * h / w, h)
    uu, vv = jnp.meshgrid(u, v)
    z = 2.0 + 0.5 * jnp.sin(2 * uu) * jnp.cos(3 * vv)
    X = jnp.stack([uu * z, vv * z, z], axis=-1)
    return X[None]  # (1, h, w, 3)


def test_iter_proj_identity():
    """Matching a pointmap against itself with identity init stays put."""
    X = make_smooth_pointmap(jax.random.PRNGKey(0), 24, 32)
    cfg = matching.MatchingConfig()
    rays, pts, p_init = matching.prep_for_iter_proj(X, X, None)
    p, conv = matching.iter_proj(rays, pts, p_init, cfg)
    p_int = jnp.round(p).astype(jnp.int32)
    expect = p_init.astype(jnp.int32)
    # Interior pixels should match exactly (border clamped to [1, w-2])
    inner = (
        (expect[..., 0] > 0) & (expect[..., 0] < 31)
        & (expect[..., 1] > 0) & (expect[..., 1] < 23)
    )
    frac = jnp.mean((jnp.all(p_int == expect, axis=-1) | ~inner).astype(jnp.float32))
    assert float(frac) > 0.99
    # Border pixels are clamped to [1, w-2] and cannot converge (same as the
    # reference kernel); interior fraction here is (h-2)(w-2)/(h w) ~ 0.86.
    conv_inner = jnp.where(inner.reshape(1, -1), conv, True)
    assert float(jnp.mean(conv_inner.astype(jnp.float32))) > 0.99


def test_iter_proj_shifted():
    """Query rays from a shifted crop should converge to the shifted pixel."""
    h, w, s = 24, 32, 3
    X = make_smooth_pointmap(jax.random.PRNGKey(0), h, w)
    # X21[v, u] = X11[v, u + s]: query points live s pixels to the right
    X21 = jnp.roll(X, shift=-s, axis=2)
    cfg = matching.MatchingConfig()
    rays, pts, p_init = matching.prep_for_iter_proj(X, X21, None)
    p, conv = matching.iter_proj(rays, pts, p_init, cfg)
    p_np = np.asarray(p).reshape(h, w, 2)
    # Check interior: matched u should be original u + s
    errs = []
    for v in range(5, h - 5):
        for u in range(5, w - s - 5):
            errs.append(abs(p_np[v, u, 0] - (u + s)) + abs(p_np[v, u, 1] - v))
    assert np.median(errs) < 0.5


def test_refine_matches_oracle():
    """Dilated-window argmax refinement equals a brute-force numpy oracle."""
    rng = np.random.default_rng(0)
    h, w, f, n = 16, 20, 8, 12
    D11 = rng.standard_normal((1, h, w, f)).astype(np.float32)
    D21 = rng.standard_normal((1, n, f)).astype(np.float32)
    p0 = np.stack(
        [rng.integers(0, w, size=n), rng.integers(0, h, size=n)], axis=-1
    ).astype(np.int32)[None]

    cfg = matching.MatchingConfig(radius=2, dilation_max=3)
    p_ref = np.array(p0[0])
    for d in range(cfg.dilation_max, 0, -1):
        rd = cfg.radius * d
        new_p = p_ref.copy()
        for i in range(n):
            u0, v0 = p_ref[i]
            best, bu, bv = -np.inf, u0, v0
            for du in range(-rd, rd + 1, d):
                for dv in range(-rd, rd + 1, d):
                    u, v = u0 + du, v0 + dv
                    if 0 <= u < w and 0 <= v < h:
                        s = float(D11[0, v, u] @ D21[0, i])
                        if s > best:
                            best, bu, bv = s, u, v
            new_p[i] = (bu, bv)
        p_ref = new_p

    p_jax = matching.refine_matches(
        jnp.asarray(D11), jnp.asarray(D21), jnp.asarray(p0), cfg
    )
    np.testing.assert_array_equal(np.asarray(p_jax[0]), p_ref)


def test_match_end_to_end_self():
    """match() on identical pointmaps with distinctive descriptors returns the
    identity correspondence on interior pixels."""
    h, w = 24, 32
    X = make_smooth_pointmap(jax.random.PRNGKey(0), h, w)
    # Descriptors: unique one-hot-ish patterns per pixel
    key = jax.random.PRNGKey(1)
    D = jax.random.normal(key, (1, h, w, 16))
    D = D / jnp.linalg.norm(D, axis=-1, keepdims=True)
    cfg = matching.MatchingConfig(radius=1, dilation_max=2)
    idx, valid = matching.match(X, X, D, D, cfg=cfg)
    idx_np = np.asarray(idx[0]).reshape(h, w)
    expect = np.arange(h * w).reshape(h, w)
    interior = np.zeros((h, w), bool)
    interior[2:-2, 2:-2] = True
    agree = (idx_np == expect)[interior].mean()
    assert agree > 0.95
    valid_np = np.asarray(valid[0, :, 0]).reshape(h, w)
    assert valid_np[interior].mean() > 0.95
