"""Tracking residuals, projections, and their analytic Jacobians in pure JAX.

Semantics mirror the reference `mast3r_slam/geometry.py` (point_to_ray_dist:17,
act_Sim3:45, project_calib:63, backproject:107, constrain_points_to_ray:37,
get_pixel_coords:118) so the Gauss-Newton solvers built on top behave
identically; the implementation is batched jnp with no data-dependent shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from monst3r_slam_tpu.core import lie


def point_to_dist(X: jax.Array) -> jax.Array:
    return jnp.linalg.norm(X, axis=-1, keepdims=True)


def point_to_ray_dist(X: jax.Array, jacobian: bool = False):
    """4-dim residual features [unit ray (3), distance (1)] of points X.

    With ``jacobian=True`` also returns the 4x3 Jacobian d[r,d]/dX
    (geometry.py:17-34).
    """
    d = point_to_dist(X)
    d_inv = 1.0 / d
    r = d_inv * X
    rd = jnp.concatenate([r, d], axis=-1)
    if not jacobian:
        return rd
    d_inv_2 = d_inv * d_inv
    eye = jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), X.shape[:-1] + (3, 3))
    outer = X[..., :, None] * X[..., None, :]
    dr_dX = d_inv[..., None] * (eye - d_inv_2[..., None] * outer)
    dd_dX = r[..., None, :]
    drd_dX = jnp.concatenate([dr_dX, dd_dX], axis=-2)
    return rd, drd_dX


def act_Sim3(T: jax.Array, X: jax.Array, jacobian: bool = False):
    """Apply Sim(3) T to points X; optionally the 3x7 Jacobian wrt a left
    perturbation of T, in tangent order [tau, phi, sigma] (geometry.py:45-52):

        d(exp(eps) T X)/d eps = [I | -skew(T X) | T X]
    """
    Y = lie.sim3_act(T, X)
    if not jacobian:
        return Y
    eye = jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), Y.shape[:-1] + (3, 3))
    dY_dR = -lie.skew(Y)
    dY_ds = Y[..., :, None]
    return Y, jnp.concatenate([eye, dY_dR, dY_ds], axis=-1)


def decompose_K(K: jax.Array):
    return K[..., 0, 0], K[..., 1, 1], K[..., 0, 2], K[..., 1, 2]


def project_calib(
    P: jax.Array,
    K: jax.Array,
    img_size,
    jacobian: bool = False,
    border: float = 0.0,
    z_eps: float = 0.0,
):
    """Pinhole projection -> [u, v, log z] plus validity (geometry.py:63-104).

    Returns (pz, valid) or (pz, dpz_dP, valid). `img_size` is (h, w) static.
    """
    h, w = img_size
    fx, fy, cx, cy = decompose_K(K)
    x, y, z = P[..., 0], P[..., 1], P[..., 2]

    valid_z = z > z_eps
    z_safe = jnp.where(valid_z, z, 1.0)
    z_inv = 1.0 / z_safe

    u = fx * x * z_inv + cx
    v = fy * y * z_inv + cy

    valid_u = (u > border) & (u < w - 1 - border)
    valid_v = (v > border) & (v < h - 1 - border)
    valid = (valid_u & valid_v & valid_z)[..., None]

    logz = jnp.where(valid_z, jnp.log(z_safe), 0.0)
    pz = jnp.stack([u, v, logz], axis=-1)
    if not jacobian:
        return pz, valid

    zero = jnp.zeros_like(z_inv)
    row0 = jnp.stack([fx * z_inv, zero, -fx * x * z_inv * z_inv], axis=-1)
    row1 = jnp.stack([zero, fy * z_inv, -fy * y * z_inv * z_inv], axis=-1)
    row2 = jnp.stack([zero, zero, z_inv], axis=-1)
    dpz_dP = jnp.stack([row0, row1, row2], axis=-2)
    return pz, dpz_dP, valid


def backproject(p: jax.Array, z: jax.Array, K: jax.Array) -> jax.Array:
    """Pixels p (..,2) + depth z (..,1) -> 3D points (geometry.py:107-115)."""
    x = (p[..., 0] - K[0, 2]) / K[0, 0]
    y = (p[..., 1] - K[1, 2]) / K[1, 1]
    ray = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return z * ray


def get_pixel_coords(b: int, img_size, dtype=jnp.float32) -> jax.Array:
    """(b, h, w, 2) grid of (u, v) pixel coordinates (geometry.py:118-123)."""
    h, w = img_size
    u = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    v = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    uv = jnp.stack([u, v], axis=-1).astype(dtype)
    return jnp.broadcast_to(uv, (b, h, w, 2))


def constrain_points_to_ray(img_size, Xs: jax.Array, K: jax.Array) -> jax.Array:
    """Snap points onto their pixel rays, keeping z (geometry.py:37-42).

    Xs: (b, h*w, 3) -> same shape.
    """
    b = Xs.shape[0]
    uv = get_pixel_coords(b, img_size, dtype=Xs.dtype).reshape(*Xs.shape[:-1], 2)
    return backproject(uv, Xs[..., 2:3], K)
