"""Tests for the native C++ host solver and its backend integration."""

import numpy as np
import pytest

from monst3r_slam_tpu.native.build import solve_spd


def test_native_solve_spd_accuracy():
    rng = np.random.default_rng(0)
    n = 70
    L = np.tril(rng.standard_normal((n, n))) + n * np.eye(n)
    A = L @ L.T
    x_true = rng.standard_normal(n)
    x = solve_spd(A, A @ x_true)
    np.testing.assert_allclose(x, x_true, atol=1e-10)


def test_native_solve_spd_jitter_recovery():
    # Semi-definite system: plain Cholesky fails, jitter path recovers
    A = np.diag([1.0, 1.0, 0.0])
    b = np.asarray([1.0, 2.0, 0.0])
    x = solve_spd(A, b, jitter=1e-8)
    np.testing.assert_allclose(x[:2], [1.0, 2.0], atol=1e-4)


def test_backend_host_solve_matches_device():
    import jax

    from monst3r_slam_tpu.slam import backend
    from tests.test_backend import build_graph, pose_errors

    cfg = backend.BackendConfig(max_iters=10, chunk=512)
    T_true, T_init, Xs, Cs, ii, jj, idx, valid, Q, ev = build_graph(
        jax.random.PRNGKey(3)
    )
    T_dev, _ = backend.gauss_newton(
        T_init, Xs, Cs, ii, jj, idx, valid, Q, ev, cfg, n_poses=4
    )
    T_host = backend.gauss_newton_host_solve(
        T_init, Xs, Cs, ii, jj, idx, valid, Q, ev, cfg, n_poses=4
    )
    err_dev = pose_errors(T_dev, T_true)
    err_host = pose_errors(T_host, T_true)
    assert float(np.max(np.asarray(err_host)[1:])) < 1e-3
    # Both converge to the same optimum
    np.testing.assert_allclose(np.asarray(T_dev), np.asarray(T_host), atol=1e-3)
