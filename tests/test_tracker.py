"""Convergence tests for the frontend Sim(3) Gauss-Newton tracker."""

import jax
import jax.numpy as jnp
import numpy as np

from monst3r_slam_tpu.core import lie
from monst3r_slam_tpu.slam import tracker
from monst3r_slam_tpu.slam.frame import fuse_pointmap


def synth_points(key, n=2000):
    X = jax.random.normal(key, (n, 3)) * jnp.asarray([1.0, 1.0, 0.3])
    return X + jnp.asarray([0.0, 0.0, 4.0])


def test_opt_pose_ray_dist_recovers_pose():
    cfg = tracker.TrackingConfig(max_iters=50)
    key = jax.random.PRNGKey(0)
    Xk = synth_points(key)
    xi_true = jnp.asarray([0.05, -0.03, 0.08, 0.02, -0.04, 0.03, 0.05])
    T_true = lie.sim3_exp(xi_true)
    # Residual is rd(Xk) - rd(T act Xf): zero when T_true act Xf == Xk
    Xf = lie.sim3_act(lie.sim3_inv(T_true), Xk)
    Q = jnp.full((Xk.shape[0], 1), 4.0)
    valid = jnp.ones((Xk.shape[0], 1), bool)

    T_est, iters, ok = tracker.opt_pose_ray_dist_sim3(
        Xf, Xk, lie.sim3_identity(), Q, valid, cfg
    )
    assert bool(ok)
    err = lie.sim3_log(lie.sim3_mul(lie.sim3_inv(T_est), T_true))
    assert float(jnp.linalg.norm(err)) < 1e-3


def test_opt_pose_calib_recovers_pose():
    cfg = tracker.TrackingConfig(max_iters=50)
    h, w = 48, 64
    K = jnp.asarray([[60.0, 0, 32.0], [0, 60.0, 24.0], [0, 0, 1.0]])
    from monst3r_slam_tpu.core import geometry

    uv = geometry.get_pixel_coords(1, (h, w)).reshape(-1, 2)
    z = 2.0 + 0.3 * jnp.sin(uv[:, 0:1] * 0.2) * jnp.cos(uv[:, 1:2] * 0.3)
    Xk = geometry.backproject(uv, z, K)
    xi_true = jnp.asarray([0.03, -0.02, 0.05, 0.01, -0.02, 0.015, 0.03])
    T_true = lie.sim3_exp(xi_true)
    Xf = lie.sim3_act(lie.sim3_inv(T_true), Xk)
    Q = jnp.full((Xk.shape[0], 1), 4.0)
    valid = jnp.ones((Xk.shape[0], 1), bool)
    valid_meas = jnp.ones((Xk.shape[0], 1), bool)
    meas_k = jnp.concatenate([uv, jnp.log(z)], axis=-1)

    T_est, iters, ok = tracker.opt_pose_calib_sim3(
        Xf, Xk, lie.sim3_identity(), Q, valid, meas_k, valid_meas, K, (h, w), cfg
    )
    assert bool(ok)
    err = lie.sim3_log(lie.sim3_mul(lie.sim3_inv(T_est), T_true))
    assert float(jnp.linalg.norm(err)) < 1e-3


def test_gn_robust_to_outliers():
    cfg = tracker.TrackingConfig(max_iters=50)
    key = jax.random.PRNGKey(1)
    Xk = synth_points(key, n=3000)
    xi_true = jnp.asarray([0.04, 0.02, -0.05, -0.01, 0.03, 0.02, -0.04])
    T_true = lie.sim3_exp(xi_true)
    Xf = lie.sim3_act(lie.sim3_inv(T_true), Xk)
    # 10% gross outliers
    n_out = 300
    Xf = Xf.at[:n_out].add(jax.random.normal(jax.random.PRNGKey(2), (n_out, 3)))
    Q = jnp.full((Xk.shape[0], 1), 4.0)
    valid = jnp.ones((Xk.shape[0], 1), bool)
    T_est, iters, ok = tracker.opt_pose_ray_dist_sim3(
        Xf, Xk, lie.sim3_identity(), Q, valid, cfg
    )
    err = lie.sim3_log(lie.sim3_mul(lie.sim3_inv(T_est), T_true))
    assert float(jnp.linalg.norm(err)) < 2e-2


def test_unique_fraction():
    idx = jnp.asarray([0, 1, 1, 2, 5])
    valid = jnp.asarray([True, True, True, False, True])
    # unique valid indices {0, 1, 5} of 10
    frac = tracker.unique_fraction(idx, valid, 10)
    np.testing.assert_allclose(frac, 0.3)


def test_fuse_pointmap_weighted():
    X1 = jnp.ones((4, 3))
    C1 = jnp.full((4, 1), 2.0)
    X2 = jnp.zeros((4, 3))
    C2 = jnp.full((4, 1), 1.0)
    # First obs: replaces
    X, C, N, _ = fuse_pointmap(X2, C2, jnp.zeros((), jnp.int32), X1, C1)
    np.testing.assert_allclose(X, X1)
    np.testing.assert_allclose(C, C1)
    assert int(N) == 1
    # Second obs: confidence-weighted mean
    X, C, N, _ = fuse_pointmap(X1, C1, jnp.ones((), jnp.int32), X2, C2)
    np.testing.assert_allclose(X, jnp.full((4, 3), 2.0 / 3.0))
    np.testing.assert_allclose(C, jnp.full((4, 1), 3.0))
    assert int(N) == 2


def test_fuse_pointmap_best_score():
    """best_score mode keeps the pointmap with the higher confidence score
    (reference frame.py:68-86, filtering_score median/mean)."""
    X_hi = jnp.ones((4, 3))
    C_hi = jnp.full((4, 1), 3.0)
    X_lo = jnp.zeros((4, 3))
    C_lo = jnp.full((4, 1), 1.0)
    zero = jnp.zeros((), jnp.int32)
    one = jnp.ones((), jnp.int32)

    # First obs always replaces and records its score
    X, C, N, S = fuse_pointmap(X_lo, C_lo, zero, X_hi, C_hi, "best_score",
                               jnp.zeros(()), "median")
    np.testing.assert_allclose(X, X_hi)
    assert float(S) == 3.0 and int(N) == 1
    # A worse observation is rejected
    X, C, N, S = fuse_pointmap(X, C, N, X_lo, C_lo, "best_score", S, "median")
    np.testing.assert_allclose(X, X_hi)
    np.testing.assert_allclose(C, C_hi)
    assert float(S) == 3.0
    # A better one replaces
    C_best = jnp.full((4, 1), 5.0)
    X, C, N, S = fuse_pointmap(X, C, N, X_lo, C_best, "best_score", S, "median")
    np.testing.assert_allclose(X, X_lo)
    assert float(S) == 5.0 and int(N) == 1
    # mean scoring variant
    _, _, _, S = fuse_pointmap(X_lo, C_lo, zero, X_hi, C_hi, "best_score",
                               jnp.zeros(()), "mean")
    assert float(S) == 3.0


def test_track_pose_smoke():
    """Full track_pose on synthetic data: pose recovered + sensible flags."""
    cfg = tracker.TrackingConfig()
    h, w = 16, 24
    hw = h * w
    key = jax.random.PRNGKey(3)
    Xk = synth_points(key, n=hw)
    xi_true = jnp.asarray([0.02, -0.01, 0.03, 0.01, -0.015, 0.01, 0.02])
    T_true = lie.sim3_exp(xi_true)
    Xf = lie.sim3_act(lie.sim3_inv(T_true), Xk)

    idx = jnp.arange(hw, dtype=jnp.int32)
    valid = jnp.ones((hw, 1), bool)
    Q = jnp.full((hw, 1), 4.0)
    C = jnp.full((hw, 1), 10.0)
    T_WCk = lie.sim3_identity()
    T_WCf = lie.sim3_identity()

    res = tracker.track_pose(
        cfg, (h, w), False, idx, valid, Q, Q, Xf, C, Xk, C, T_WCf, T_WCk
    )
    assert not bool(res.low_match)
    assert not bool(res.solver_failed)
    err = lie.sim3_log(lie.sim3_mul(lie.sim3_inv(res.T_CkCf), T_true))
    assert float(jnp.linalg.norm(err)) < 1e-3
    # identity correspondence, all valid => unique_frac = 1 > 0.333 => no new kf
    assert not bool(res.new_kf)

def test_soa_ray_path_matches_generic():
    """The SoA closed-form ray GN (production path) must follow the exact
    trajectory of the generic tensor-form implementation (`_gn_loop` +
    einsum Jacobians) it replaced — same weights, cost, convergence."""
    from monst3r_slam_tpu.core import geometry

    rng = np.random.default_rng(3)
    n = 700
    Xk = jnp.asarray(
        rng.normal(size=(n, 3)).astype(np.float32) * 0.5 + np.asarray([0, 0, 3.0], np.float32)
    )
    tau_true = jnp.asarray([0.04, -0.02, 0.03, 0.02, -0.03, 0.01, 0.02], jnp.float32)
    T_true = lie.sim3_exp(tau_true)
    # frame points: keyframe points moved into the frame (with noise + outliers)
    Xf = lie.sim3_act(lie.sim3_inv(T_true), Xk)
    Xf = Xf + jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)) * 0.002
    out_mask = rng.random(n) < 0.05
    Xf = jnp.where(jnp.asarray(out_mask)[:, None], Xf * 1.7, Xf)
    Qk = jnp.asarray(rng.uniform(0.5, 3.0, (n, 1)).astype(np.float32))
    valid = jnp.asarray(rng.random((n, 1)) > 0.1)
    cfg = tracker.TrackingConfig()
    T0 = lie.sim3_identity()

    def generic(Xf, Xk, T_init, Qk, valid, cfg):
        sqrtQ = jnp.sqrt(jnp.maximum(Qk, 0.0))
        info_ray = (1.0 / cfg.sigma_ray) * valid * sqrtQ
        info_dist = (1.0 / cfg.sigma_dist) * valid * sqrtQ
        sqrt_info = jnp.concatenate(
            [jnp.repeat(info_ray, 3, axis=-1), info_dist], axis=-1
        )
        rd_k = geometry.point_to_ray_dist(Xk)

        def residual(T):
            Xf_Ck, dX_dT = geometry.act_Sim3(T, Xf, jacobian=True)
            rd_f, drd_dX = geometry.point_to_ray_dist(Xf_Ck, jacobian=True)
            r = rd_k - rd_f
            J = -jnp.einsum("nij,njk->nik", drd_dX, dX_dT)
            return r, J, sqrt_info

        return tracker._gn_loop(cfg, residual, T_init)

    T_gen, it_gen, ok_gen = generic(Xf, Xk, T0, Qk, valid, cfg)
    T_soa, it_soa, ok_soa = tracker.opt_pose_ray_dist_sim3(Xf, Xk, T0, Qk, valid, cfg)
    assert bool(ok_gen) and bool(ok_soa)
    assert int(it_gen) == int(it_soa), (int(it_gen), int(it_soa))
    # f32 reduction-order noise amplifies through the iterations: ~1e-4
    np.testing.assert_allclose(np.asarray(T_soa), np.asarray(T_gen), atol=3e-4)
    # and it actually recovers the pose
    err = np.asarray(
        lie.sim3_log(lie.sim3_mul(lie.sim3_inv(T_soa), T_true))
    )
    # rotation+translation recover tightly; scale is weakly constrained
    # (sigma_dist=10) under the injected scale outliers — allow drift there
    assert np.linalg.norm(err[:6]) < 0.02, err
    assert abs(err[6]) < 0.1, err
