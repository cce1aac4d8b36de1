"""Device-side geometry oracle: exact multi-view-consistent pointmaps.

A jnp port of the synthetic height-field scene from
tests/test_ate_regression.py (surface z = f(x, y), Newton ray-surface
intersection, random-Fourier world descriptors), jittable so a benchmark can
render coherent frames ON DEVICE from just an (8,) Sim3 pose — no per-frame
host uploads.

Purpose (VERDICT r3 item 8): the driver bench must time the REAL model
compute while the tracking loop follows a coherent scene (0 sanitizer
resets, organic keyframe cadence). The bench dispatches the real decode,
then overwrites its outputs with oracle values PLUS a tiny multiple of the
real outputs — the data dependency keeps the full decode in the device
chain (XLA cannot dead-code it), while the tracker sees consistent geometry.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from monst3r_slam_tpu.core import lie


def surface_z(x, y):
    return (
        3.0
        + 0.25 * jnp.sin(0.9 * x)
        + 0.25 * jnp.cos(0.7 * y)
        + 0.1 * jnp.sin(1.7 * (x + y))
    )


def _surface_g_and_dg(t, tau, m):
    xw = t[0] + tau * m[:, 0]
    yw = t[1] + tau * m[:, 1]
    zw = t[2] + tau * m[:, 2]
    g = zw - surface_z(xw, yw)
    dg = (
        m[:, 2]
        - 0.25 * 0.9 * jnp.cos(0.9 * xw) * m[:, 0]
        + 0.25 * 0.7 * jnp.sin(0.7 * yw) * m[:, 1]
        - 0.1 * 1.7 * jnp.cos(1.7 * (xw + yw)) * (m[:, 0] + m[:, 1])
    )
    return g, dg


def pixel_rays(h: int, w: int, fx: float, fy: float):
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    return jnp.stack(
        [(u - w / 2) / fx, (v - h / 2) / fy, jnp.ones_like(u)], -1
    ).reshape(-1, 3)


@partial(jax.jit, static_argnames=("h", "w", "fx", "fy", "newton_iters"))
def render_frame(T_WC, h: int, w: int, fx: float, fy: float,
                 newton_iters: int = 25):
    """Exact pointmaps for a GT camera pose. Returns (X_cam (hw, 3),
    X_world (hw, 3)). All math f32 on device."""
    M = lie.sim3_matrix(T_WC)
    sR = M[:3, :3]
    t = M[:3, 3]
    r = pixel_rays(h, w, fx, fy)
    m = r @ sR.T

    tau0 = (3.0 - t[2]) / m[:, 2]

    def body(_, tau):
        g, dg = _surface_g_and_dg(t, tau, m)
        return tau - g / dg

    tau = jax.lax.fori_loop(0, newton_iters, body, tau0)
    X_world = t[None] + tau[:, None] * m
    X_cam = tau[:, None] * r
    return X_cam, X_world


def make_rff(key, desc_dim: int, scale: float = 1.5):
    """Random-Fourier-feature descriptor params (world-point keyed, so
    descriptors are multi-view consistent). `scale` sets the descriptor
    texture frequency: at 384x512 the pixel footprint is ~5x smaller than
    the 64x80 test scenes, so high-res benches need scale ~12 for locally
    discriminative descriptors (unique-match fraction 0.17 -> 0.62 measured,
    NOTES_r4)."""
    kw, kb = jax.random.split(key)
    return {
        "W": scale * jax.random.normal(kw, (3, desc_dim)),
        "b": jax.random.uniform(kb, (desc_dim,), maxval=2.0 * jnp.pi),
    }


def world_desc(rff, X_world):
    d = jnp.sin(X_world @ rff["W"] + rff["b"])
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


@partial(jax.jit, static_argnames=("h", "w", "fx", "fy"))
def render_pair(T_WCi, T_WCj, rff, h: int, w: int, fx: float, fy: float):
    """Oracle decode outputs for a frame pair, view-j points expressed in
    view-i's camera frame (the decoder's convention, dust3r pts3d):
    (X1 (hw, 3), D1 (hw, F), X2 (hw, 3), D2 (hw, F))."""
    Xi_cam, Xi_w = render_frame(T_WCi, h, w, fx, fy)
    Xj_cam, Xj_w = render_frame(T_WCj, h, w, fx, fy)
    T_ij = lie.sim3_rel(T_WCi, T_WCj)
    Xj_in_i = lie.sim3_act(T_ij, Xj_cam)
    return Xi_cam, world_desc(rff, Xi_w), Xj_in_i, world_desc(rff, Xj_w)


@partial(jax.jit, static_argnames=("h", "w", "fx", "fy"))
def render_image(T_WC, h: int, w: int, fx: float, fy: float):
    """A photometric rendering of the scene for the encoder input: smooth
    functions of the world intersection point, normalized to ImgNorm range.
    Gives the REAL encoder/decoder spatially-structured pixels instead of
    noise (their cost is content-independent, but keeping the input coherent
    makes debug dumps interpretable)."""
    _, Xw = render_frame(T_WC, h, w, fx, fy)
    img = jnp.stack(
        [
            jnp.sin(2.1 * Xw[:, 0]) * jnp.cos(1.3 * Xw[:, 1]),
            jnp.sin(1.7 * Xw[:, 1] + 0.5),
            jnp.cos(2.9 * Xw[:, 0] + 1.1 * Xw[:, 2]),
        ],
        -1,
    )
    return img.reshape(1, h, w, 3)


def gt_trajectory(n: int, step: float = 0.06):
    """Smooth forward+lateral camera path with mild yaw (host-side, tiny)."""
    import numpy as np

    poses = []
    for i in range(n):
        xi = np.zeros(7, np.float32)
        xi[0] = step * i           # x translation
        xi[1] = 0.3 * step * np.sin(0.2 * i)
        xi[4] = 0.02 * np.sin(0.15 * i)  # small pitch/yaw wobble
        poses.append(np.asarray(lie.sim3_exp(jnp.asarray(xi))))
    return poses
