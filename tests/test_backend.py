"""Convergence tests for the backend pose-graph Gauss-Newton solver."""

import jax
import jax.numpy as jnp
import numpy as np

from monst3r_slam_tpu.core import lie
from monst3r_slam_tpu.slam import backend


def build_graph(key, P=4, hw=512, noise=0.05, calib=None):
    """P keyframes all viewing one world cloud; identity correspondences.

    For the calibrated case the measured pixel of a correspondence is its
    index's grid position, which is only consistent when every camera sees
    the cloud at the same pixel grid — so there ground truth is all-identity
    poses (each init perturbation must be pulled back to identity).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    if calib is not None:
        K, h, w = calib
        from monst3r_slam_tpu.core import geometry

        uv = geometry.get_pixel_coords(1, (h, w)).reshape(-1, 2)
        z = 3.0 + jnp.sin(uv[:, 0:1] * 0.3) * jnp.cos(uv[:, 1:2] * 0.2)
        W = geometry.backproject(uv, z, K)
        xi = jnp.zeros((P, 7))
    else:
        W = jax.random.normal(k1, (hw, 3)) * jnp.asarray([1.0, 1.0, 0.4]) + jnp.asarray(
            [0.0, 0.0, 4.0]
        )
        # Ground-truth poses: small perturbations from identity
        xi = 0.1 * jax.random.normal(k2, (P, 7))
        xi = xi.at[0].set(0.0)
    T_true = lie.sim3_exp(xi)  # T_WC per keyframe

    Xs = jax.vmap(lambda T: lie.sim3_act(lie.sim3_inv(T), W))(T_true)
    Cs = jnp.full((P, hw, 1), 10.0)

    # Two-way consecutive edges
    ii = jnp.asarray([p for p in range(P - 1)] + [p + 1 for p in range(P - 1)])
    jj = jnp.asarray([p + 1 for p in range(P - 1)] + [p for p in range(P - 1)])
    E = ii.shape[0]
    idx = jnp.broadcast_to(jnp.arange(hw)[None], (E, hw))
    valid = jnp.ones((E, hw), bool)
    Q = jnp.full((E, hw), 4.0)
    edge_valid = jnp.ones((E,), bool)

    # Perturb all but the pinned pose
    pert = 0.03 * jax.random.normal(k3, (P, 7))
    pert = pert.at[0].set(0.0)
    T_init = lie.sim3_retr(T_true, pert)
    return T_true, T_init, Xs, Cs, ii, jj, idx, valid, Q, edge_valid


def pose_errors(T_est, T_true):
    rel = jax.vmap(lambda a, b: lie.sim3_log(lie.sim3_mul(lie.sim3_inv(a), b)))(
        T_est, T_true
    )
    return jnp.linalg.norm(rel, axis=-1)


def test_gauss_newton_rays_converges():
    cfg = backend.BackendConfig(max_iters=10, chunk=512)
    T_true, T_init, Xs, Cs, ii, jj, idx, valid, Q, ev = build_graph(
        jax.random.PRNGKey(0)
    )
    T_out, iters = backend.gauss_newton(
        T_init, Xs, Cs, ii, jj, idx, valid, Q, ev, cfg, n_poses=4
    )
    err0 = pose_errors(T_init, T_true)
    err1 = pose_errors(T_out, T_true)
    assert float(err1[0]) < 1e-6  # pinned pose untouched
    assert float(jnp.max(err1[1:])) < 1e-3, (err0, err1)


def test_gauss_newton_calib_converges():
    h, w = 24, 32
    K = jnp.asarray([[30.0, 0, 16.0], [0, 30.0, 12.0], [0, 0, 1.0]])
    cfg = backend.BackendConfig(max_iters=10, chunk=512)
    T_true, T_init, Xs, Cs, ii, jj, idx, valid, Q, ev = build_graph(
        jax.random.PRNGKey(1), hw=h * w, calib=(K, h, w)
    )
    T_out, iters = backend.gauss_newton(
        T_init, Xs, Cs, ii, jj, idx, valid, Q, ev, cfg,
        n_poses=4, use_calib=True, K=K, img_size=(h, w),
    )
    err1 = pose_errors(T_out, T_true)
    err0 = pose_errors(T_init, T_true)
    assert float(err1[0]) < 1e-6
    assert float(jnp.max(err1[1:])) < 2e-3, (err0, err1)


def test_gauss_newton_padded_edges_ignored():
    """Invalid (padded) edges must not affect the solution."""
    cfg = backend.BackendConfig(max_iters=10, chunk=512)
    T_true, T_init, Xs, Cs, ii, jj, idx, valid, Q, ev = build_graph(
        jax.random.PRNGKey(2)
    )
    # Append garbage padded edges
    E_pad = 4
    ii_p = jnp.concatenate([ii, jnp.zeros((E_pad,), ii.dtype)])
    jj_p = jnp.concatenate([jj, jnp.zeros((E_pad,), jj.dtype)])
    idx_p = jnp.concatenate([idx, jnp.zeros((E_pad, idx.shape[1]), idx.dtype)])
    valid_p = jnp.concatenate([valid, jnp.ones((E_pad, valid.shape[1]), bool)])
    Q_p = jnp.concatenate([Q, jnp.full((E_pad, Q.shape[1]), 100.0)])
    ev_p = jnp.concatenate([ev, jnp.zeros((E_pad,), bool)])

    T_a, _ = backend.gauss_newton(
        T_init, Xs, Cs, ii, jj, idx, valid, Q, ev, cfg, n_poses=4
    )
    T_b, _ = backend.gauss_newton(
        T_init, Xs, Cs, ii_p, jj_p, idx_p, valid_p, Q_p, ev_p, cfg, n_poses=4
    )
    np.testing.assert_allclose(np.asarray(T_a), np.asarray(T_b), atol=1e-5)


def test_gauss_newton_points_converges():
    """N5 point-alignment residual (exposed by the reference, unused by its
    mains) recovers poses on the synthetic graph."""
    import jax

    cfg = backend.BackendConfig(max_iters=10, chunk=512)
    T_true, T_init, Xs, Cs, ii, jj, idx, valid, Q, ev = build_graph(
        jax.random.PRNGKey(7)
    )
    T_out, iters = backend.gauss_newton(
        T_init, Xs, Cs, ii, jj, idx, valid, Q, ev, cfg, n_poses=4,
        residual_kind="point",
    )
    err1 = pose_errors(T_out, T_true)
    assert float(err1[0]) < 1e-6
    assert float(jnp.max(err1[1:])) < 1e-3


def test_gauss_newton_sharded_matches_single_device():
    """VERDICT item 8: edges sharded over the dp mesh axis; result must match
    the single-device solver (same math, one psum per iteration)."""
    from monst3r_slam_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    ndp = mesh.shape["dp"]
    cfg = backend.BackendConfig(max_iters=10, chunk=512)
    # P=5 gives E = 2*(P-1) = 8 edges -> divisible by dp sizes 1/2/4/8
    T_true, T_init, Xs, Cs, ii, jj, idx, valid, Q, ev = build_graph(
        jax.random.PRNGKey(4), P=5
    )
    assert ii.shape[0] % ndp == 0
    T_single, _ = backend.gauss_newton(
        T_init, Xs, Cs, ii, jj, idx, valid, Q, ev, cfg, n_poses=5
    )
    T_shard, iters = backend.gauss_newton_sharded(
        mesh, T_init, Xs, Cs, ii, jj, idx, valid, Q, ev, cfg, n_poses=5
    )
    err = pose_errors(T_shard, T_true)
    assert float(jnp.max(err[1:])) < 1e-3
    np.testing.assert_allclose(
        np.asarray(T_shard), np.asarray(T_single), atol=1e-4
    )

def test_soa_terms_match_generic_path():
    """The SoA ray accumulation (`_edge_terms_ray_soa`, the production hot
    path) must reproduce the generic tensor-form system exactly: A/b vs the
    14x14 blocks H = [[A,-A],[-A,A]], g = [-b, b], under partial validity,
    confidence gates, and invalid edges."""
    rng = np.random.default_rng(0)
    P, E, hw = 6, 6, 800
    cfg = backend.BackendConfig(Q_conf=1.2, C_conf=1.1, chunk=256)
    taus = rng.normal(size=(P, 7)) * 0.1
    Twc = jnp.stack([lie.sim3_exp(jnp.asarray(t, jnp.float32)) for t in taus])
    Xs = jax.random.normal(jax.random.PRNGKey(1), (P, hw, 3)) * 0.5 + jnp.asarray(
        [0.0, 0.0, 3.0]
    )
    Cs = jnp.asarray(rng.uniform(0.5, 3.0, (P, hw, 1)).astype(np.float32))
    ii = jnp.asarray(rng.integers(0, P, (E,)).astype(np.int32))
    jj = jnp.asarray(((np.asarray(ii) + 1) % P).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, hw, (E, hw)).astype(np.int32))
    vm = jnp.asarray(rng.random((E, hw)) > 0.1)
    Q = jnp.asarray(rng.uniform(0.5, 3.0, (E, hw)).astype(np.float32))
    ev = jnp.asarray(np.arange(E) < E - 1)

    gat = backend._gather_edges(Xs, Cs, ii, jj, idx, vm, Q, ev, cfg)
    H, g = backend._edge_terms_gathered(Twc, ii, jj, gat, cfg)
    A, b = backend._edge_terms_ray_soa(Twc, ii, jj, gat, cfg)

    scale = float(jnp.max(jnp.abs(H)))
    np.testing.assert_allclose(np.asarray(A), np.asarray(H[:, 7:, 7:]),
                               atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(-A), np.asarray(H[:, 0:7, 7:14]),
                               atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(A), np.asarray(H[:, 0:7, 0:7]),
                               atol=2e-5 * scale)
    gscale = float(jnp.max(jnp.abs(g)))
    np.testing.assert_allclose(np.asarray(b), np.asarray(g[:, 7:]),
                               atol=2e-5 * gscale)
    np.testing.assert_allclose(np.asarray(-b), np.asarray(g[:, 0:7]),
                               atol=2e-5 * gscale)

    # the assembled dense systems agree too
    Hd_a, gd_a = backend._assemble_dense(H, g, ii, jj, ev, P, cfg)
    Hd_b, gd_b = backend._assemble_dense_A(A, b, ii, jj, ev, P, cfg)
    np.testing.assert_allclose(np.asarray(Hd_b), np.asarray(Hd_a),
                               atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(gd_b), np.asarray(gd_a),
                               atol=2e-5 * gscale)


def test_pixel_subsample_converges_same():
    """pixel_subsample S>1 solves the strided-residual system; on the
    consistent synthetic graph the recovered poses match the S=1 solution."""
    T_true, T_init, Xs, Cs, ii, jj, idx, valid, Q, ev = build_graph(
        jax.random.PRNGKey(3)
    )
    outs = {}
    for S in (1, 4):
        cfg = backend.BackendConfig(max_iters=10, chunk=256, pixel_subsample=S)
        T_out, _ = backend.gauss_newton(
            T_init, Xs, Cs, ii, jj, idx, valid, Q, ev, cfg, n_poses=4
        )
        err = pose_errors(T_out, T_true)
        assert float(jnp.max(err[1:])) < 1e-3, (S, err)
        outs[S] = np.asarray(T_out)
    np.testing.assert_allclose(outs[4], outs[1], atol=1e-4)
