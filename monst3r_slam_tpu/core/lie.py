"""Pure-JAX Lie groups: SO(3), SE(3), Sim(3).

Replaces the reference's `lietorch` dependency and the CUDA device math in
`mast3r_slam/backend/src/gn_kernels.cu:161-413` (quat_comp/actSO3/actSim3/
relSim3/expSO3/expSim3/retrSim3/apply_Sim3_adj_inv) with batched, jit-able
functions on plain arrays.

Conventions (identical to the reference so that solver semantics carry over):
  * Quaternions are stored as (x, y, z, w).
  * A Sim(3) element is an 8-vector ``[t(3), q(4), s(1)]`` acting on points as
    ``Y = s * R(q) @ X + t``  (gn_kernels.cu:207-218).
  * The tangent vector is a 7-vector ``[tau(3), phi(3), sigma(1)]``
    (translation, rotation, log-scale), matching lietorch's Sim3 ordering.
  * Retraction is **left** composition: ``retr(T, xi) = exp(xi) ∘ T``
    (gn_kernels.cu:392-413).

An SE(3) element is a 7-vector ``[t(3), q(4)]``; it is used only for
trajectory export (`lietorch_utils.py:6-13` drops the scale).

All functions broadcast over arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-6

# ---------------------------------------------------------------------------
# Quaternion primitives (xyzw)
# ---------------------------------------------------------------------------


def quat_mul(qi: jax.Array, qj: jax.Array) -> jax.Array:
    """Hamilton product qi * qj, xyzw layout (gn_kernels.cu:178-186)."""
    xi, yi, zi, wi = jnp.split(qi, 4, axis=-1)
    xj, yj, zj, wj = jnp.split(qj, 4, axis=-1)
    return jnp.concatenate(
        [
            wi * xj + xi * wj + yi * zj - zi * yj,
            wi * yj - xi * zj + yi * wj + zi * xj,
            wi * zj + xi * yj - yi * xj + zi * wj,
            wi * wj - xi * xj - yi * yj - zi * zj,
        ],
        axis=-1,
    )


def quat_inv(q: jax.Array) -> jax.Array:
    """Conjugate of a unit quaternion (gn_kernels.cu:189-193)."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v by unit quaternions q (gn_kernels.cu:195-205)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    uv = 2.0 * jnp.cross(qv, v)
    return v + qw * uv + jnp.cross(qv, uv)


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------


def so3_exp(phi: jax.Array) -> jax.Array:
    """Rotation-vector -> unit quaternion (gn_kernels.cu:299-320).

    Uses the same 4th-order Taylor switch at theta^2 < 1e-6.
    """
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta_sq < _EPS
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))  # safe sqrt
    theta_p4 = theta_sq * theta_sq
    imag_small = 0.5 - (1.0 / 48.0) * theta_sq + (1.0 / 3840.0) * theta_p4
    real_small = 1.0 - (1.0 / 8.0) * theta_sq + (1.0 / 384.0) * theta_p4
    imag_big = jnp.sin(0.5 * theta) / theta
    real_big = jnp.cos(0.5 * theta)
    imag = jnp.where(small, imag_small, imag_big)
    real = jnp.where(small, real_small, real_big)
    return jnp.concatenate([imag * phi, real], axis=-1)


def so3_log(q: jax.Array) -> jax.Array:
    """Unit quaternion -> rotation vector (inverse of so3_exp)."""
    # Make w >= 0 so the angle is in [0, pi].
    q = q * jnp.sign(jnp.where(q[..., 3:4] == 0.0, 1.0, q[..., 3:4]))
    qv = q[..., :3]
    w = jnp.clip(q[..., 3:4], -1.0, 1.0)
    n_sq = jnp.sum(qv * qv, axis=-1, keepdims=True)
    small = n_sq < _EPS * _EPS
    n = jnp.sqrt(jnp.where(small, 1.0, n_sq))
    theta = 2.0 * jnp.arctan2(n, w)
    # Small-angle: theta/n -> 2/w * (1 + n^2/(3 w^2) ...)
    k_small = 2.0 / jnp.maximum(w, 0.5) * (1.0 + n_sq / (3.0 * jnp.maximum(w, 0.5) ** 2))
    k_big = theta / n
    k = jnp.where(small, k_small, k_big)
    return k * qv


def so3_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion -> 3x3 rotation matrix."""
    x, y, z, w = jnp.split(q, 4, axis=-1)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = jnp.concatenate([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1)
    row1 = jnp.concatenate([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1)
    row2 = jnp.concatenate([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def skew(v: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of v (geometry.py:5-9 in the reference)."""
    x, y, z = jnp.split(v, 3, axis=-1)
    o = jnp.zeros_like(x)
    rows = jnp.concatenate([o, -z, y, z, o, -x, -y, x, o], axis=-1)
    return rows.reshape(v.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# Sim(3): [t(3), q(4), s(1)]
# ---------------------------------------------------------------------------


def sim3_identity(batch_shape=(), dtype=jnp.float32) -> jax.Array:
    ident = jnp.asarray([0, 0, 0, 0, 0, 0, 1, 1], dtype=dtype)
    return jnp.broadcast_to(ident, tuple(batch_shape) + (8,))


def sim3_act(T: jax.Array, X: jax.Array) -> jax.Array:
    """Y = s * R X + t, broadcasting T over X's point dimensions."""
    t, q, s = T[..., 0:3], T[..., 3:7], T[..., 7:8]
    return s * quat_rotate(q, X) + t


def sim3_mul(Ti: jax.Array, Tj: jax.Array) -> jax.Array:
    """Composition Ti ∘ Tj (apply Tj first)."""
    ti, qi, si = Ti[..., 0:3], Ti[..., 3:7], Ti[..., 7:8]
    tj, qj, sj = Tj[..., 0:3], Tj[..., 3:7], Tj[..., 7:8]
    q = quat_mul(qi, qj)
    s = si * sj
    t = si * quat_rotate(qi, tj) + ti
    return jnp.concatenate([t, q, s], axis=-1)


def sim3_inv(T: jax.Array) -> jax.Array:
    t, q, s = T[..., 0:3], T[..., 3:7], T[..., 7:8]
    q_inv = quat_inv(q)
    s_inv = 1.0 / s
    t_inv = -s_inv * quat_rotate(q_inv, t)
    return jnp.concatenate([t_inv, q_inv, s_inv], axis=-1)


def sim3_rel(Ti: jax.Array, Tj: jax.Array) -> jax.Array:
    """Relative transform Ti^-1 ∘ Tj (gn_kernels.cu:252-274)."""
    return sim3_mul(sim3_inv(Ti), Tj)


def _sim3_W_coeffs(theta_sq: jax.Array, sigma: jax.Array):
    """Coefficients (A, B, C) of W = C I + A Phi + B Phi^2.

    Mirrors the rxso3 W-coefficient computation in gn_kernels.cu:344-390
    (itself the Sophus/lietorch formula), with the same EPS switches.
    Inputs/outputs have a trailing singleton axis.
    """
    small_theta = theta_sq < _EPS
    small_sigma = jnp.abs(sigma) < _EPS
    theta = jnp.sqrt(jnp.where(small_theta, 1.0, theta_sq))
    scale = jnp.exp(sigma)
    sigma_safe = jnp.where(small_sigma, 1.0, sigma)
    sigma_sq = sigma_safe * sigma_safe

    # Case 1: sigma small, theta small
    A11 = jnp.full_like(sigma, 0.5)
    B11 = jnp.full_like(sigma, 1.0 / 6.0)
    # Case 2: sigma small, theta large
    A12 = (1.0 - jnp.cos(theta)) / jnp.where(small_theta, 1.0, theta_sq)
    B12 = (theta - jnp.sin(theta)) / jnp.where(small_theta, 1.0, theta_sq * theta)
    C1 = jnp.ones_like(sigma)
    # Case 3: sigma large, theta small
    A21 = ((sigma_safe - 1.0) * scale + 1.0) / sigma_sq
    B21 = (scale * 0.5 * sigma_sq + scale - 1.0 - sigma_safe * scale) / (sigma_sq * sigma_safe)
    # Case 4: sigma large, theta large
    a = scale * jnp.sin(theta)
    b = scale * jnp.cos(theta)
    c = theta_sq + sigma_safe * sigma_safe
    A22 = (a * sigma_safe + (1.0 - b) * theta) / jnp.where(small_theta, 1.0, theta * c)
    C2 = (scale - 1.0) / sigma_safe
    B22 = (C2 - ((b - 1.0) * sigma_safe + a * theta) / c) / jnp.where(small_theta, 1.0, theta_sq)

    A = jnp.where(
        small_sigma,
        jnp.where(small_theta, A11, A12),
        jnp.where(small_theta, A21, A22),
    )
    B = jnp.where(
        small_sigma,
        jnp.where(small_theta, B11, B12),
        jnp.where(small_theta, B21, B22),
    )
    C = jnp.where(small_sigma, C1, C2)
    return A, B, C


def sim3_exp(xi: jax.Array) -> jax.Array:
    """Tangent 7-vector -> Sim(3) 8-vector (gn_kernels.cu:323-413)."""
    tau = xi[..., 0:3]
    phi = xi[..., 3:6]
    sigma = xi[..., 6:7]

    q = so3_exp(phi)
    s = jnp.exp(sigma)

    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    A, B, C = _sim3_W_coeffs(theta_sq, sigma)

    # t = W tau = C tau + A (phi x tau) + B (phi x (phi x tau))
    phi_x_tau = jnp.cross(phi, tau)
    phi_x_phi_x_tau = jnp.cross(phi, phi_x_tau)
    t = C * tau + A * phi_x_tau + B * phi_x_phi_x_tau
    return jnp.concatenate([t, q, s], axis=-1)


def sim3_log(T: jax.Array) -> jax.Array:
    """Sim(3) 8-vector -> tangent 7-vector (inverse of sim3_exp).

    Solves t = W tau for tau with a closed-form 3x3 solve on
    W = C I + A Phi + B Phi^2.
    """
    t, q, s = T[..., 0:3], T[..., 3:7], T[..., 7:8]
    phi = so3_log(q)
    sigma = jnp.log(s)

    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    A, B, C = _sim3_W_coeffs(theta_sq, sigma)
    # W = C I + A Phi + B Phi^2 = (C - B th2) I + A Phi + B phi phi^T
    # (using Phi^2 = phi phi^T - th2 I). Writing W = a I + b Phi + c phi phi^T,
    # W acts as (a + c th2) on span(phi) and as a + b*th*J (J = 90-degree
    # rotation) on the orthogonal plane, giving the closed-form inverse
    #   W^{-1} = p I + q Phi + r phi phi^T,
    #   p = a/(a^2+b^2 th2), q = -b/(a^2+b^2 th2), r = (1/(a+c th2) - p)/th2.
    # Elementwise only — avoids batched LU and MXU rounding.
    a = C - B * theta_sq
    b = A
    c = B
    denom_perp = a * a + b * b * theta_sq
    p = a / denom_perp
    qc = -b / denom_perp
    # On the phi axis: W phi = (a + c th2) phi  =>  inverse eigenvalue:
    ax = a + c * theta_sq
    r = (1.0 / ax - p) / jnp.where(theta_sq < _EPS, 1.0, theta_sq)
    r = jnp.where(theta_sq < _EPS, 0.0, r)
    # W^{-1} t = p t + q (phi x t) + r (phi . t) phi
    phi_dot_t = jnp.sum(phi * t, axis=-1, keepdims=True)
    tau = p * t + qc * jnp.cross(phi, t) + r * phi_dot_t * phi
    return jnp.concatenate([tau, phi, sigma], axis=-1)


def sim3_retr(T: jax.Array, xi: jax.Array) -> jax.Array:
    """Left retraction: exp(xi) ∘ T (gn_kernels.cu:392-413)."""
    return sim3_mul(sim3_exp(xi), T)


def sim3_matrix(T: jax.Array) -> jax.Array:
    """4x4 homogeneous matrix with sR in the top-left block."""
    t, q, s = T[..., 0:3], T[..., 3:7], T[..., 7:8]
    R = so3_matrix(q) * s[..., None]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), T.shape[:-1] + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def sim3_adj_inv_T_apply(T: jax.Array, X: jax.Array) -> jax.Array:
    """Y = Adj(T)^{-T} X for tangent row-vectors X (7-dim, [tau, phi, sigma]).

    Semantics identical to `apply_Sim3_adj_inv` (gn_kernels.cu:276-297): used
    to turn the Jacobian wrt the relative pose T_ij = T_i^-1 T_j into the
    Jacobian wrt the absolute pose T_j under left retraction.
        Y[0:3] = (1/s) R a
        Y[3:6] = (1/s) [t]x R a + R b
        Y[6]   = (1/s) t . (R a) + c
    with (t, q, s) of T_i and X = [a, b, c].
    """
    t, q, s = T[..., 0:3], T[..., 3:7], T[..., 7:8]
    a, b, c = X[..., 0:3], X[..., 3:6], X[..., 6:7]
    s_inv = 1.0 / s
    Ra = quat_rotate(q, a)
    y0 = s_inv * Ra
    y1 = quat_rotate(q, b) + s_inv * jnp.cross(t, Ra)
    y2 = c + s_inv * jnp.sum(t * Ra, axis=-1, keepdims=True)
    return jnp.concatenate([y0, y1, y2], axis=-1)


# ---------------------------------------------------------------------------
# SE(3): [t(3), q(4)] — trajectory export only
# ---------------------------------------------------------------------------


def sim3_to_se3(T: jax.Array) -> jax.Array:
    """Drop the scale (reference `lietorch_utils.py:6-13` as_SE3)."""
    return T[..., 0:7]


def se3_identity(batch_shape=(), dtype=jnp.float32) -> jax.Array:
    ident = jnp.asarray([0, 0, 0, 0, 0, 0, 1], dtype=dtype)
    return jnp.broadcast_to(ident, tuple(batch_shape) + (7,))


def se3_mul(Ti: jax.Array, Tj: jax.Array) -> jax.Array:
    ti, qi = Ti[..., 0:3], Ti[..., 3:7]
    tj, qj = Tj[..., 0:3], Tj[..., 3:7]
    return jnp.concatenate([quat_rotate(qi, tj) + ti, quat_mul(qi, qj)], axis=-1)


def se3_inv(T: jax.Array) -> jax.Array:
    t, q = T[..., 0:3], T[..., 3:7]
    q_inv = quat_inv(q)
    return jnp.concatenate([-quat_rotate(q_inv, t), q_inv], axis=-1)


def se3_act(T: jax.Array, X: jax.Array) -> jax.Array:
    return quat_rotate(T[..., 3:7], X) + T[..., 0:3]
