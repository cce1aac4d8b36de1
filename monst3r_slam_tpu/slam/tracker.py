"""Frontend tracker: per-frame Sim(3) pose Gauss-Newton vs the last keyframe.

Reimplements `mast3r_slam/tracker.py:15-266` (and the shared GN core of
tracker2/tracker3) as a single jit-compiled, fixed-shape function:

  * model pair inference + dense matching happen outside (ops/matching.py,
    models/mast3r.py); this module takes the matched points.
  * the <=50-iteration GN loop (`tracker.py:173-265`) is a `lax.while_loop`
    with the reference's convergence test; the dense 7x7 normal equations are
    built with one einsum (MXU) and solved in closed form via Cholesky.
  * Cholesky failure (reference catches the exception and triggers RELOC,
    `tracker.py:91-93`) is detected as non-finite updates and reported in the
    result flags — no host exception needed.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from monst3r_slam_tpu.core import geometry, lie, robust


class TrackingConfig(NamedTuple):
    """Static tracking parameters (config/base.yaml:23-40)."""

    min_match_frac: float = 0.05
    max_iters: int = 50
    C_conf: float = 0.0
    Q_conf: float = 1.5
    rel_error: float = 1e-3
    delta_norm: float = 1e-3
    huber: float = 1.345
    match_frac_thresh: float = 0.333
    sigma_ray: float = 0.003
    sigma_dist: float = 10.0
    sigma_pixel: float = 1.0
    sigma_depth: float = 10.0
    pixel_border: float = -10.0
    depth_eps: float = 1e-6
    filtering_mode: str = "weighted_pointmap"
    filtering_score: str = "median"


class TrackResult(NamedTuple):
    T_WCf: jax.Array  # (8,) updated frame pose
    T_CkCf: jax.Array  # (8,) relative pose keyframe<-frame
    new_kf: jax.Array  # () bool — keyframe decision
    low_match: jax.Array  # () bool — match_frac below min => skip + reloc
    solver_failed: jax.Array  # () bool — non-finite GN step
    match_frac: jax.Array  # () float
    iters: jax.Array  # () int


def _solve_7x7(sqrt_info: jax.Array, r: jax.Array, J: jax.Array, huber_k: float):
    """Whitened robust normal equations + Cholesky solve (tracker.py:156-171).

    sqrt_info, r: (n, m); J: (n, m, 7). Returns (tau (7,), cost, ok).
    """
    whitened_r = sqrt_info * r
    w = sqrt_info * jnp.sqrt(robust.huber(whitened_r, huber_k))
    A = w[..., None] * J  # (n, m, 7)
    b = w * r  # (n, m)
    # One augmented Gram reduction instead of three passes over A:
    # M = [A | b] -> M^T M holds H (7x7), A^T b (= -g), and b^T b (= 2*cost).
    M = jnp.concatenate([A, b[..., None]], axis=-1).reshape(-1, 8)
    G = M.T @ M
    H = G[:7, :7]
    g = -G[:7, 7]
    cost = 0.5 * G[7, 7]

    L, lower = jax.scipy.linalg.cho_factor(H, lower=True)
    tau = jax.scipy.linalg.cho_solve((L, lower), g)
    ok = jnp.all(jnp.isfinite(tau))
    tau = jnp.where(ok, tau, jnp.zeros_like(tau))
    return tau, cost, ok


def _gn_loop(cfg: TrackingConfig, residual_fn, T_init: jax.Array):
    """Shared GN driver with the reference's convergence criteria."""

    def cond(state):
        T, old_cost, it, done, ok = state
        return (~done) & ok & (it < cfg.max_iters)

    def body(state):
        T, old_cost, it, done, ok_prev = state
        r, J, sqrt_info = residual_fn(T)
        tau, new_cost, ok = _solve_7x7(sqrt_info, r, J, cfg.huber)
        T_new = lie.sim3_retr(T, tau)
        T_new = jnp.where(ok, T_new, T)
        done = robust.converged(cfg.rel_error, cfg.delta_norm, old_cost, new_cost, tau)
        return T_new, new_cost, it + 1, done, ok

    init = (T_init, jnp.inf, jnp.zeros((), jnp.int32), jnp.zeros((), bool), jnp.ones((), bool))
    T, cost, iters, done, ok = jax.lax.while_loop(cond, body, init)
    return T, iters, ok


def opt_pose_ray_dist_sim3(Xf, Xk, T_CkCf_init, Qk, valid, cfg: TrackingConfig):
    """Uncalibrated frame-to-keyframe alignment (tracker.py:173-214).

    Xf: (n, 3) frame points (already gathered via idx_f2k), Xk: (n, 3),
    Qk: (n, 1), valid: (n, 1) bool.

    Structure-of-arrays GN body: every per-pixel quantity is an (n,) array
    (full VPU lane occupancy) and the normal equations use the closed-form
    Jacobian rows — the generic tensor form keeps (n, 4, 7) trailing dims
    (~3% lane utilization) plus an (8, 4n)x(4n, 8) Gram matmul. With
    Y = T o Xf, d = |Y|, ry = Y/d and drd_dX = [(I - ry ry^T)/d ; ry^T]:

        drd_dX @ [I | -skew(Y) | Y]  =  [ (I-ry ry^T)/d | -skew(Y)/d | 0 ]
                                        [      ry^T     |     0      | d ]

    ((I-ry ry^T) Y = 0 kills the ray rows' scale column; ry^T skew(Y) = 0
    kills the dist row's rotation block), and J is the negative of that.
    Semantics (weights, cost, convergence, failure handling) are identical
    to the generic `_gn_loop` path — asserted by
    tests/test_tracker.py::test_soa_ray_path_matches_generic.
    """
    sqrtQ = jnp.sqrt(jnp.maximum(Qk[:, 0], 0.0))
    vf = valid[:, 0]
    info_ray = jnp.where(vf, (1.0 / cfg.sigma_ray) * sqrtQ, 0.0)  # (n,)
    info_dist = jnp.where(vf, (1.0 / cfg.sigma_dist) * sqrtQ, 0.0)

    rd_k = geometry.point_to_ray_dist(Xk)  # (n, 4)
    rk = (rd_k[:, 0], rd_k[:, 1], rd_k[:, 2], rd_k[:, 3])
    xf = (Xf[:, 0], Xf[:, 1], Xf[:, 2])
    iu, ju = jnp.triu_indices(7)

    def system(T):
        """Accumulate H (7,7), g_solver (7,), cost — SoA over n."""
        t = T[0:3]
        qx, qy, qz, qw = T[3], T[4], T[5], T[6]
        s = T[7]
        # rotation matrix entries (scalars)
        xx, yy, zz = qx * qx, qy * qy, qz * qz
        xy, xz, yz = qx * qy, qx * qz, qy * qz
        wx, wy, wz = qw * qx, qw * qy, qw * qz
        R = (
            (1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)),
            (2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)),
            (2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)),
        )
        y = tuple(
            s * (R[k][0] * xf[0] + R[k][1] * xf[1] + R[k][2] * xf[2]) + t[k]
            for k in range(3)
        )
        d = jnp.sqrt(y[0] * y[0] + y[1] * y[1] + y[2] * y[2])
        dinv = 1.0 / d
        ry = (y[0] * dinv, y[1] * dinv, y[2] * dinv)

        # residual r = rd_k - rd_f
        e = (rk[0] - ry[0], rk[1] - ry[1], rk[2] - ry[2], rk[3] - d)

        # J rows (7 entries each), J = -(drd_dX @ dX_dT):
        #   ray row p:  -[ (delta_pk - ry_p ry_k)/d | -skew(Y)_p/d | 0 ]
        #   dist row:   -[ ry^T | 0 | d ]
        sk = (  # skew(Y) rows
            (jnp.zeros_like(d), -y[2], y[1]),
            (y[2], jnp.zeros_like(d), -y[0]),
            (-y[1], y[0], jnp.zeros_like(d)),
        )
        J = []
        for p in range(3):
            J.append((
                -(jnp.where(p == 0, 1.0, 0.0) - ry[p] * ry[0]) * dinv,
                -(jnp.where(p == 1, 1.0, 0.0) - ry[p] * ry[1]) * dinv,
                -(jnp.where(p == 2, 1.0, 0.0) - ry[p] * ry[2]) * dinv,
                sk[p][0] * dinv, sk[p][1] * dinv, sk[p][2] * dinv,
                jnp.zeros_like(d),
            ))
        J.append((
            -ry[0], -ry[1], -ry[2],
            jnp.zeros_like(d), jnp.zeros_like(d), jnp.zeros_like(d),
            -d,
        ))

        # robust weights: omega = info^2 * huber(info * e)
        info = (info_ray, info_ray, info_ray, info_dist)
        w = []
        cost = 0.0
        for r_ in range(4):
            wr = info[r_] * info[r_] * robust.huber(info[r_] * e[r_], cfg.huber)
            w.append(wr)
            cost = cost + jnp.sum(wr * e[r_] * e[r_])
        cost = 0.5 * cost

        wJ = [[w[r_] * J[r_][p] for p in range(7)] for r_ in range(4)]
        ups = []
        for p in range(7):
            for q in range(p, 7):
                acc = wJ[0][p] * J[0][q]
                for r_ in range(1, 4):
                    acc = acc + wJ[r_][p] * J[r_][q]
                ups.append(jnp.sum(acc))
        H = jnp.zeros((7, 7))
        A28 = jnp.stack(ups)
        H = H.at[iu, ju].set(A28).at[ju, iu].set(A28)
        gs = []
        for p in range(7):
            acc = wJ[0][p] * e[0]
            for r_ in range(1, 4):
                acc = acc + wJ[r_][p] * e[r_]
            gs.append(jnp.sum(acc))
        g = -jnp.stack(gs)  # matches _solve_7x7's g = -A^T b
        return H, g, cost

    def cond(state):
        T, old_cost, it, done, ok = state
        return (~done) & ok & (it < cfg.max_iters)

    def body(state):
        T, old_cost, it, done, ok_prev = state
        H, g, new_cost = system(T)
        L, lower = jax.scipy.linalg.cho_factor(H, lower=True)
        tau = jax.scipy.linalg.cho_solve((L, lower), g)
        ok = jnp.all(jnp.isfinite(tau))
        tau = jnp.where(ok, tau, jnp.zeros_like(tau))
        T_new = lie.sim3_retr(T, tau)
        T_new = jnp.where(ok, T_new, T)
        done = robust.converged(cfg.rel_error, cfg.delta_norm, old_cost, new_cost, tau)
        return T_new, new_cost, it + 1, done, ok

    init = (
        T_CkCf_init, jnp.inf, jnp.zeros((), jnp.int32),
        jnp.zeros((), bool), jnp.ones((), bool),
    )
    T, cost, iters, done, ok = jax.lax.while_loop(cond, body, init)
    return T, iters, ok


def opt_pose_calib_sim3(
    Xf, Xk, T_CkCf_init, Qk, valid, meas_k, valid_meas_k, K, img_size, cfg: TrackingConfig
):
    """Calibrated variant (tracker.py:216-266): residual is
    [pixel (2), log-depth (1)] against the keyframe's pixel grid."""
    sqrtQ = jnp.sqrt(jnp.maximum(Qk, 0.0))
    info_pix = (1.0 / cfg.sigma_pixel) * valid * sqrtQ
    info_depth = (1.0 / cfg.sigma_depth) * valid * sqrtQ
    sqrt_info = jnp.concatenate([jnp.repeat(info_pix, 2, axis=-1), info_depth], axis=-1)

    def residual(T):
        Xf_Ck, dX_dT = geometry.act_Sim3(T, Xf, jacobian=True)
        pz, dpz_dX, valid_proj = geometry.project_calib(
            Xf_Ck, K, img_size, jacobian=True,
            border=cfg.pixel_border, z_eps=cfg.depth_eps,
        )
        valid2 = valid_proj & valid_meas_k
        r = meas_k - pz
        J = -jnp.einsum("nij,njk->nik", dpz_dX, dX_dT)
        return r, J, sqrt_info * valid2

    return _gn_loop(cfg, residual, T_CkCf_init)


def unique_fraction(idx: jax.Array, valid: jax.Array, n_total: int) -> jax.Array:
    """|unique(idx[valid])| / n_total via an occupancy scatter
    (replaces torch.unique at tracker.py:104-108; fixed-shape)."""
    occupancy = jnp.zeros((n_total,), jnp.int32)
    occupancy = occupancy.at[idx].max(valid.astype(jnp.int32))
    return jnp.sum(occupancy) / n_total


@partial(jax.jit, static_argnames=("cfg", "img_size", "use_calib"))
def track_pose(
    cfg: TrackingConfig,
    img_size,
    use_calib: bool,
    idx_f2k: jax.Array,  # (hw,) int32: keyframe pixel -> frame pixel
    valid_match_k: jax.Array,  # (hw, 1) bool
    Qff: jax.Array,  # (hw, 1) frame desc-conf
    Qkf: jax.Array,  # (hw, 1) keyframe desc-conf (in frame's decode)
    Xf_canon: jax.Array,  # (hw, 3) frame canonical points (post-fusion)
    Cf_avg: jax.Array,  # (hw, 1)
    Xk_canon: jax.Array,  # (hw, 3) keyframe canonical points
    Ck_avg: jax.Array,  # (hw, 1)
    T_WCf: jax.Array,  # (8,) current frame pose estimate
    T_WCk: jax.Array,  # (8,) keyframe pose
    K: jax.Array | None = None,
) -> TrackResult:
    """Core of FrameTracker.track (tracker.py:28-127) after pair inference.

    Fusion of the frame/keyframe pointmaps happens outside (slam/frame.py);
    this function computes validity gates, runs GN, and makes the keyframe
    decision. Everything is fixed-shape: hw = h*w.
    """
    hw = idx_f2k.shape[0]
    Qk = jnp.sqrt(Qff[idx_f2k] * Qkf)  # (hw, 1)

    Xf = Xf_canon[idx_f2k]
    Cf = Cf_avg[idx_f2k]
    Xk = Xk_canon
    Ck = Ck_avg

    valid_Cf = Cf > cfg.C_conf
    valid_Ck = Ck > cfg.C_conf
    valid_Q = Qk > cfg.Q_conf
    valid_opt = valid_match_k & valid_Cf & valid_Ck & valid_Q
    valid_kf = valid_match_k & valid_Q

    match_frac = jnp.mean(valid_opt.astype(jnp.float32))
    low_match = match_frac < cfg.min_match_frac

    T_CkCf_init = lie.sim3_rel(T_WCk, T_WCf)

    if use_calib:
        Xf_c = geometry.constrain_points_to_ray(img_size, Xf[None], K)[0]
        Xk_c = geometry.constrain_points_to_ray(img_size, Xk[None], K)[0]
        uv_k = geometry.get_pixel_coords(1, img_size).reshape(-1, 2)
        valid_meas_k = Xk_c[..., 2:3] > cfg.depth_eps
        logz = jnp.where(valid_meas_k, jnp.log(jnp.maximum(Xk_c[..., 2:3], 1e-30)), 0.0)
        meas_k = jnp.concatenate([uv_k, logz], axis=-1)
        meas_k = jnp.where(valid_meas_k, meas_k, 0.0)
        T_CkCf, iters, ok = opt_pose_calib_sim3(
            Xf_c, Xk_c, T_CkCf_init, Qk, valid_opt, meas_k, valid_meas_k, K, img_size, cfg
        )
    else:
        T_CkCf, iters, ok = opt_pose_ray_dist_sim3(
            Xf, Xk, T_CkCf_init, Qk, valid_opt, cfg
        )

    T_WCf_new = lie.sim3_mul(T_WCk, T_CkCf)

    # Keyframe decision (tracker.py:100-110)
    match_frac_k = jnp.mean(valid_kf.astype(jnp.float32))
    unique_frac_f = unique_fraction(idx_f2k, valid_match_k[:, 0], hw)
    new_kf = jnp.minimum(match_frac_k, unique_frac_f) < cfg.match_frac_thresh

    # On failure/low-match, keep the old pose (caller handles RELOC)
    keep = low_match | ~ok
    T_WCf_out = jnp.where(keep, T_WCf, T_WCf_new)

    return TrackResult(
        T_WCf=T_WCf_out,
        T_CkCf=T_CkCf,
        new_kf=new_kf & ~keep,
        low_match=low_match,
        solver_failed=~ok,
        match_frac=match_frac,
        iters=iters,
    )
