"""Unit tests for the Sim(3)/SO(3)/SE(3) core (finite differences + axioms)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monst3r_slam_tpu.core import lie


def random_sim3(key, batch=()):
    k1, k2, k3 = jax.random.split(key, 3)
    xi = jnp.concatenate(
        [
            0.5 * jax.random.normal(k1, batch + (3,)),
            0.8 * jax.random.normal(k2, batch + (3,)),
            0.3 * jax.random.normal(k3, batch + (1,)),
        ],
        axis=-1,
    )
    return lie.sim3_exp(xi)


def test_quat_mul_identity():
    q = lie.so3_exp(jnp.asarray([0.3, -0.2, 0.5]))
    ident = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(lie.quat_mul(q, ident), q, atol=1e-6)
    np.testing.assert_allclose(lie.quat_mul(ident, q), q, atol=1e-6)


def test_quat_rotate_matches_matrix():
    key = jax.random.PRNGKey(0)
    q = lie.so3_exp(jax.random.normal(key, (5, 3)))
    v = jax.random.normal(jax.random.PRNGKey(1), (5, 3))
    R = lie.so3_matrix(q)
    np.testing.assert_allclose(
        lie.quat_rotate(q, v), jnp.einsum("bij,bj->bi", R, v), atol=1e-5
    )


def test_so3_exp_log_roundtrip():
    key = jax.random.PRNGKey(2)
    phi = jax.random.normal(key, (100, 3))
    # so3_log returns the principal rotation vector (|phi| <= pi)
    norm = jnp.linalg.norm(phi, axis=-1, keepdims=True)
    phi = phi * jnp.minimum(norm, 3.0) / norm
    np.testing.assert_allclose(lie.so3_log(lie.so3_exp(phi)), phi, atol=1e-4)


def test_so3_exp_log_small_angle():
    phi = jnp.asarray([[1e-8, -2e-8, 3e-9], [0.0, 0.0, 0.0]])
    np.testing.assert_allclose(lie.so3_log(lie.so3_exp(phi)), phi, atol=1e-12)


def test_sim3_exp_log_roundtrip():
    key = jax.random.PRNGKey(3)
    xi = jnp.concatenate(
        [
            jax.random.normal(key, (50, 3)),
            0.9 * jax.random.normal(jax.random.PRNGKey(4), (50, 3)),
            0.5 * jax.random.normal(jax.random.PRNGKey(5), (50, 1)),
        ],
        axis=-1,
    )
    np.testing.assert_allclose(lie.sim3_log(lie.sim3_exp(xi)), xi, atol=2e-4, rtol=1e-4)


def test_sim3_exp_zero_is_identity():
    T = lie.sim3_exp(jnp.zeros(7))
    np.testing.assert_allclose(T, lie.sim3_identity(), atol=1e-7)


def test_sim3_mul_inverse():
    T = random_sim3(jax.random.PRNGKey(6), (10,))
    ident = lie.sim3_mul(T, lie.sim3_inv(T))
    np.testing.assert_allclose(ident, lie.sim3_identity((10,)), atol=1e-5)


def test_sim3_act_matches_matrix():
    T = random_sim3(jax.random.PRNGKey(7), (4,))
    X = jax.random.normal(jax.random.PRNGKey(8), (4, 3))
    M = lie.sim3_matrix(T)
    Xh = jnp.concatenate([X, jnp.ones((4, 1))], axis=-1)
    np.testing.assert_allclose(
        lie.sim3_act(T, X), jnp.einsum("bij,bj->bi", M, Xh)[..., :3], atol=1e-5
    )


def test_sim3_act_composition():
    Ta = random_sim3(jax.random.PRNGKey(9))
    Tb = random_sim3(jax.random.PRNGKey(10))
    X = jax.random.normal(jax.random.PRNGKey(11), (7, 3))
    np.testing.assert_allclose(
        lie.sim3_act(lie.sim3_mul(Ta, Tb), X),
        lie.sim3_act(Ta, lie.sim3_act(Tb, X)),
        atol=1e-5,
    )


def test_sim3_retr_left_composition():
    T = random_sim3(jax.random.PRNGKey(12))
    xi = 0.1 * jax.random.normal(jax.random.PRNGKey(13), (7,))
    np.testing.assert_allclose(
        lie.sim3_retr(T, xi), lie.sim3_mul(lie.sim3_exp(xi), T), atol=1e-6
    )


def test_sim3_adj_inv_T_apply():
    """Check Adj^{-T} against its definition via exp/log.

    For row-vector J (gradient wrt left-perturbation of T_ij = Ti^-1 Tj),
    J_abs = Adj^{-T}(Ti) applied as in the CUDA kernel must satisfy:
    for any tangent e, J . log-perturbation matches chain rule through
    d/de [ Ti^-1 exp(e) Tj ] = Adj(Ti^-1) e  acting on the left of T_ij.
    Equivalently  Y = Adj(Ti)^{-T} X  where Adj is the 7x7 adjoint in
    [tau, phi, sigma] coordinates. We verify against a numerically built
    adjoint matrix.
    """
    Ti = random_sim3(jax.random.PRNGKey(14))
    # Build Adj(Ti^-1) numerically column by column (central differences):
    # Adj(Ti^-1) e = log(Ti^-1 exp(e) Ti)
    eps = 1e-2
    cols = []
    Ti_inv = lie.sim3_inv(Ti)
    for k in range(7):
        e = jnp.zeros(7).at[k].set(eps)
        plus = lie.sim3_log(lie.sim3_mul(Ti_inv, lie.sim3_mul(lie.sim3_exp(e), Ti)))
        minus = lie.sim3_log(lie.sim3_mul(Ti_inv, lie.sim3_mul(lie.sim3_exp(-e), Ti)))
        cols.append((plus - minus) / (2 * eps))
    adj_inv = jnp.stack(cols, axis=-1)  # 7x7 Adj(Ti^-1)

    X = jax.random.normal(jax.random.PRNGKey(15), (7,))
    expected = adj_inv.T @ X  # row-vector times Adj(Ti^-1)  == Adj(Ti)^{-T} X
    got = lie.sim3_adj_inv_T_apply(Ti, X)
    np.testing.assert_allclose(got, expected, atol=1e-2, rtol=1e-3)


def test_se3_roundtrip():
    T = random_sim3(jax.random.PRNGKey(16))
    T_se3 = lie.sim3_to_se3(T)
    ident = lie.se3_mul(T_se3, lie.se3_inv(T_se3))
    np.testing.assert_allclose(ident, lie.se3_identity(), atol=1e-6)


@pytest.mark.parametrize("sigma", [0.0, 1e-8, 0.5])
@pytest.mark.parametrize("theta", [0.0, 1e-8, 1.2])
def test_sim3_exp_numerical_vs_expm(sigma, theta):
    """Cross-check sim3_exp translation against the matrix exponential."""
    import scipy.linalg

    axis = np.array([0.3, -0.5, 0.81])
    axis /= np.linalg.norm(axis)
    phi = theta * axis
    tau = np.array([0.4, -0.2, 0.9])
    xi = jnp.asarray(np.concatenate([tau, phi, [sigma]]), dtype=jnp.float32)
    T = lie.sim3_exp(xi)

    # Matrix exponential of the sim3 generator
    G = np.zeros((4, 4))
    G[:3, :3] = np.array(
        [[sigma, -phi[2], phi[1]], [phi[2], sigma, -phi[0]], [-phi[1], phi[0], sigma]]
    )
    G[:3, 3] = tau
    M = scipy.linalg.expm(G)
    np.testing.assert_allclose(np.asarray(lie.sim3_matrix(T)), M, atol=1e-5)
