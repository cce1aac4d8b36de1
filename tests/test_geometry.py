"""Finite-difference checks for geometry residuals and Jacobians."""

import jax
import jax.numpy as jnp
import numpy as np

from monst3r_slam_tpu.core import geometry, lie, robust


def test_point_to_ray_dist_values():
    X = jnp.asarray([[3.0, 0.0, 4.0]])
    rd = geometry.point_to_ray_dist(X)
    np.testing.assert_allclose(rd, [[0.6, 0.0, 0.8, 5.0]], atol=1e-6)


def test_point_to_ray_dist_jacobian_fd():
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (20, 3)) + jnp.asarray([0.0, 0.0, 3.0])
    _, J = geometry.point_to_ray_dist(X, jacobian=True)
    J_auto = jax.vmap(jax.jacfwd(lambda x: geometry.point_to_ray_dist(x)))(X)
    np.testing.assert_allclose(J, J_auto, atol=1e-4, rtol=1e-4)


def test_act_sim3_jacobian_fd():
    xi = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (7,))
    T = lie.sim3_exp(xi)
    X = jax.random.normal(jax.random.PRNGKey(2), (15, 3))
    _, J = geometry.act_Sim3(T, X, jacobian=True)

    def act_perturbed(eps, x):
        return lie.sim3_act(lie.sim3_retr(T, eps), x)

    J_auto = jax.vmap(lambda x: jax.jacfwd(act_perturbed)(jnp.zeros(7), x))(X)
    np.testing.assert_allclose(J, J_auto, atol=1e-4, rtol=1e-4)


def test_project_calib_jacobian_fd():
    K = jnp.asarray([[300.0, 0.0, 128.0], [0.0, 300.0, 96.0], [0.0, 0.0, 1.0]])
    P = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (10, 3))) + jnp.asarray(
        [0.0, 0.0, 1.0]
    )
    _, J, valid = geometry.project_calib(P, K, (192, 256), jacobian=True)

    def proj(p):
        pz, _ = geometry.project_calib(p, K, (192, 256))
        return pz

    J_auto = jax.vmap(jax.jacfwd(proj))(P)
    np.testing.assert_allclose(J, J_auto, atol=1e-3, rtol=1e-4)


def test_backproject_project_roundtrip():
    K = jnp.asarray([[300.0, 0.0, 128.0], [0.0, 300.0, 96.0], [0.0, 0.0, 1.0]])
    uv = jnp.asarray([[10.0, 20.0], [100.0, 50.0]])
    z = jnp.asarray([[2.0], [3.5]])
    P = geometry.backproject(uv, z, K)
    pz, valid = geometry.project_calib(P, K, (192, 256))
    np.testing.assert_allclose(pz[..., :2], uv, atol=1e-4)
    np.testing.assert_allclose(pz[..., 2], jnp.log(z[..., 0]), atol=1e-6)
    assert bool(valid.all())


def test_constrain_points_to_ray_preserves_z():
    K = jnp.asarray([[300.0, 0.0, 128.0], [0.0, 300.0, 96.0], [0.0, 0.0, 1.0]])
    Xs = jax.random.normal(jax.random.PRNGKey(4), (1, 192 * 256, 3)) + jnp.asarray(
        [0.0, 0.0, 5.0]
    )
    Xc = geometry.constrain_points_to_ray((192, 256), Xs, K)
    np.testing.assert_allclose(Xc[..., 2], Xs[..., 2], atol=1e-6)
    # And the constrained points project exactly onto the pixel grid
    pz, _ = geometry.project_calib(Xc[0], K, (192, 256))
    uv = geometry.get_pixel_coords(1, (192, 256)).reshape(-1, 2)
    np.testing.assert_allclose(pz[:, :2], uv, atol=1e-2)


def test_huber_weights():
    r = jnp.asarray([0.0, 1.0, 2.0, -5.0])
    w = robust.huber(r, k=1.345)
    np.testing.assert_allclose(w, [1.0, 1.0, 1.345 / 2.0, 1.345 / 5.0], atol=1e-6)


def test_tukey_weights():
    w = robust.tukey(jnp.asarray([0.0, 10.0]), t=4.6851)
    np.testing.assert_allclose(w, [1.0, 0.0], atol=1e-6)


def test_pixel_coords_layout():
    uv = geometry.get_pixel_coords(2, (3, 4))
    assert uv.shape == (2, 3, 4, 2)
    np.testing.assert_allclose(uv[0, 1, 2], [2.0, 1.0])


def test_img_gradient_matches_reference_kernel():
    from monst3r_slam_tpu.core.image import img_gradient

    img = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 9, 3))
    gx, gy = img_gradient(img)
    assert gx.shape == img.shape and gy.shape == img.shape
    # Hand-computed at an interior pixel for channel 0
    p = np.pad(np.asarray(img[0, :, :, 0]), 1, mode="reflect")
    i, j = 4, 5
    win = p[i : i + 3, j : j + 3]
    kx = np.array([[-3, 0, 3], [-10, 0, 10], [-3, 0, 3]]) / 32.0
    ky = kx.T
    np.testing.assert_allclose(gx[0, i, j, 0], (win * kx).sum(), atol=1e-3)
    np.testing.assert_allclose(gy[0, i, j, 0], (win * ky).sum(), atol=1e-3)
