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
    """
    sqrtQ = jnp.sqrt(jnp.maximum(Qk, 0.0))
    info_ray = (1.0 / cfg.sigma_ray) * valid * sqrtQ
    info_dist = (1.0 / cfg.sigma_dist) * valid * sqrtQ
    sqrt_info = jnp.concatenate([jnp.repeat(info_ray, 3, axis=-1), info_dist], axis=-1)

    rd_k = geometry.point_to_ray_dist(Xk)

    def residual(T):
        Xf_Ck, dX_dT = geometry.act_Sim3(T, Xf, jacobian=True)
        rd_f, drd_dX = geometry.point_to_ray_dist(Xf_Ck, jacobian=True)
        r = rd_k - rd_f
        J = -jnp.einsum("nij,njk->nik", drd_dX, dX_dT)
        return r, J, sqrt_info

    return _gn_loop(cfg, residual, T_CkCf_init)


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
