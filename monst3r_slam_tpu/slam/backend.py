"""Backend pose-graph Gauss-Newton over dense pointmap correspondences.

TPU-native replacement for the reference CUDA kernels `gauss_newton_rays`
(`backend/src/gn_kernels.cu:813-1228`) and `gauss_newton_calib` (:1231-1637)
plus the host Eigen `SparseBlock` solver (:57-159):

  * Per-edge 14x14 Hessians / 2x7 gradients are accumulated with chunked
    einsum contractions over pixels (`lax.scan` over fixed-size pixel chunks —
    the MXU-friendly analogue of the reference's one-block-per-edge register
    accumulation).
  * The (P-pin)*7 square system is assembled with masked scatter-adds into a
    dense matrix (pose graphs here are <= a few hundred keyframes) and solved
    with a device Cholesky; invalid/padded edges scatter into a trash block.
  * The whole `max_iters` loop with the |dx| < delta early stop
    (gn_kernels.cu:1183-1222) is a single jit program with NO host round trip
    per iteration (the reference syncs GPU->CPU->GPU every iteration).

All shapes are static: (P, hw) pointmaps, (E,) edge arrays padded to capacity
with `edge_valid` masks; the app layer buckets capacities to avoid recompiles.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from monst3r_slam_tpu.core import lie, robust


class BackendConfig(NamedTuple):
    """Static backend parameters (config/base.yaml:42-58 `local_opt`)."""

    pin: int = 1
    C_conf: float = 0.0
    Q_conf: float = 1.5
    max_iters: int = 10
    sigma_ray: float = 0.003
    sigma_dist: float = 10.0
    sigma_pixel: float = 1.0
    sigma_depth: float = 10.0
    sigma_point: float = 0.05
    delta_norm: float = 1e-8
    pixel_border: float = -10.0
    depth_eps: float = 1e-6
    chunk: int = 8192  # pixels per accumulation step
    # Keep every S-th pixel slot in the residual set. The global solve is a
    # 7-DoF-per-pose problem over ~200k residuals PER EDGE; S<=8 stays far
    # above the information floor (tests/test_ate_regression.py asserts the
    # solve still reduces ATE) while cutting solve time ~Sx. S=1 keeps the
    # reference's exact every-pixel semantics (gn_kernels.cu accumulates all
    # valid pixels).
    pixel_subsample: int = 1
    # Pad-bucket FLOORS for the solve's (P poses, E edges) shapes. Every
    # distinct padded shape compiles (and, on a relay-backed TPU, uploads) a
    # fresh solve program; raising the floors pins short runs to ONE shape so
    # no bucket crossing lands mid-run. Padding slots are masked out of the
    # normal equations, so results are unchanged — only padded-slot compute
    # is wasted. Defaults preserve the historical {8, 16, 32, ...} buckets.
    pose_pad_lo: int = 8
    edge_pad_lo: int = 8
    # Extra ridge on the per-keyframe SCALE coordinate of the Jacobi-scaled
    # system (unit-diagonal space). The sigma_dist-whitened normal equations
    # leave each keyframe's scale gauge weakly determined; in an f32
    # factorization the roundoff amplifies along exactly that direction
    # (NOTES_r4 solver ladder). A small prior pulls the scale COMPONENT of
    # dx toward 0 without touching rotation/translation. 0 = off.
    scale_gauge: float = 0.0


def _point_jac_local(P: jax.Array) -> jax.Array:
    """B = [I | -skew(P) | P] (..., 3, 7): d(exp(eps) P)/d eps."""
    eye = jnp.broadcast_to(jnp.eye(3, dtype=P.dtype), P.shape[:-1] + (3, 3))
    return jnp.concatenate([eye, -lie.skew(P), P[..., :, None]], axis=-1)


def _ray_residual(Xi, Xj_Ci):
    """Residual + local Jacobian of the uncalibrated ray/dist alignment
    (gn_kernels.cu:926-985). Returns (err (...,4), J_local (...,4,7), extra_valid)."""
    from monst3r_slam_tpu.core import geometry

    rd_i = geometry.point_to_ray_dist(Xi)
    rd_j, drd_dP = geometry.point_to_ray_dist(Xj_Ci, jacobian=True)
    err = rd_j - rd_i
    J_local = drd_dP @ _point_jac_local(Xj_Ci)
    valid = jnp.ones(err.shape[:-1] + (1,), bool)
    return err, J_local, valid


def _calib_residual(Xi, Xj_Ci, ind_Xi, K, height, width, border, z_eps):
    """Residual + local Jacobian of the calibrated reprojection alignment
    (gn_kernels.cu:1352-1430). Measured pixel is ind_Xi's grid position."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    u_t = (ind_Xi % width).astype(Xi.dtype)
    v_t = (ind_Xi // width).astype(Xi.dtype)

    zj = Xj_Ci[..., 2]
    valid_z = (zj > z_eps) & (Xi[..., 2] > z_eps)
    zj_safe = jnp.where(valid_z, zj, 1.0)
    zj_inv = 1.0 / zj_safe
    x_div_z = Xj_Ci[..., 0] * zj_inv
    y_div_z = Xj_Ci[..., 1] * zj_inv
    u = fx * x_div_z + cx
    v = fy * y_div_z + cy
    valid_uv = (
        (u > border) & (u < width - 1 - border)
        & (v > border) & (v < height - 1 - border)
    )
    err = jnp.stack(
        [
            u - u_t,
            v - v_t,
            jnp.where(valid_z, jnp.log(zj_safe) - jnp.log(jnp.maximum(Xi[..., 2], 1e-30)), 0.0),
        ],
        axis=-1,
    )
    zero = jnp.zeros_like(zj_inv)
    dP = jnp.stack(
        [
            jnp.stack([fx * zj_inv, zero, -fx * x_div_z * zj_inv], axis=-1),
            jnp.stack([zero, fy * zj_inv, -fy * y_div_z * zj_inv], axis=-1),
            jnp.stack([zero, zero, zj_inv], axis=-1),
        ],
        axis=-2,
    )
    J_local = dP @ _point_jac_local(Xj_Ci)
    return err, J_local, (valid_z & valid_uv)[..., None]


def _point_residual(Xi, Xj_Ci):
    """Residual + local Jacobian of 3D point alignment
    (gn_kernels.cu:455-811 point_align_kernel; exposed by the reference but
    unused by its mains). Residual = Xj_Ci - Xi, J = [I | -skew | P]."""
    err = Xj_Ci - Xi
    J_local = _point_jac_local(Xj_Ci)
    valid = jnp.ones(err.shape[:-1] + (1,), bool)
    return err, J_local, valid


class _Gathered(NamedTuple):
    """Pose-independent per-pixel solve inputs, chunked (n_chunks, E, chunk, …)."""

    Xi: jax.Array  # (n_chunks, E, chunk, 3) matched points of frame i
    Xj: jax.Array  # (n_chunks, E, chunk, 3) dense-grid points of frame j
    wq: jax.Array  # (n_chunks, E, chunk) sqrt(max(Q, 0))
    valid: jax.Array  # (n_chunks, E, chunk) bool — every pose-independent gate
    ind: jax.Array  # (n_chunks, E, chunk) int32 matched pixel index (calib u/v)


def _gather_edges(
    Xs, Cs, ii, jj, idx_ii2jj, valid_match, Q, edge_valid, cfg: BackendConfig
) -> _Gathered:
    """Gather + gate everything that does not depend on the poses, ONCE.

    The random-access gathers (Xs[ii, idx] at (E, hw) scale) dominate the
    solve's HBM time on TPU; hoisting them out of the GN iteration loop
    converts the per-iteration cost to sequential streaming of this struct.
    `cfg.pixel_subsample` S keeps every S-th pixel slot (see BackendConfig).
    """
    E, hw = idx_ii2jj.shape
    S = max(1, cfg.pixel_subsample)
    if S > 1:
        idx_ii2jj = idx_ii2jj[:, ::S]
        valid_match = valid_match[:, ::S]
        Q = Q[:, ::S]
    hw_s = idx_ii2jj.shape[1]
    chunk = min(cfg.chunk, hw_s)
    n_chunks = -(-hw_s // chunk)
    pad = n_chunks * chunk - hw_s

    def pad_c(x, fill=0):
        return jnp.pad(x, ((0, 0), (0, pad)), constant_values=fill) if pad else x

    idx_p = pad_c(idx_ii2jj)
    vm_p = pad_c(valid_match, False)
    Q_p = pad_c(Q)

    # Frame-i side: ONE random-access gather of a PACKED (P, hw, 4) [X | C]
    # table — TPU gathers move per-index blocks, so one 16-byte gather beats
    # two/four narrow ones (the gather, not the GN math, dominated the solve).
    XC = jnp.concatenate([Xs, Cs], axis=-1)  # (P, hw, 4)
    ind_Xi = jnp.where(vm_p, idx_p, 0)
    XCi = jnp.take_along_axis(XC[ii], ind_Xi[..., None], axis=1)  # (E, hw_pad, 4)
    Xi, Ci = XCi[..., 0:3], XCi[..., 3]

    # Frame-j side: its own dense pixel grid — a row-take plus a regular
    # strided slice, never an elementwise gather.
    XCj = XC[jj][:, ::S] if S > 1 else XC[jj]  # (E, hw_s, 4)
    if pad:
        XCj = jnp.pad(XCj, ((0, 0), (0, pad), (0, 0)))
    Xj, Cj = XCj[..., 0:3], XCj[..., 3]

    in_range = jnp.arange(n_chunks * chunk) < hw_s  # padded slots -> invalid
    valid = (
        vm_p
        & (Q_p > cfg.Q_conf)
        & (Ci > cfg.C_conf)
        & (Cj > cfg.C_conf)
        & in_range[None, :]
        & edge_valid[:, None]
    )
    wq = jnp.sqrt(jnp.maximum(Q_p, 0.0))

    def resh(x):
        return x.reshape(E, n_chunks, chunk, *x.shape[2:]).swapaxes(0, 1)

    return _Gathered(resh(Xi), resh(Xj), resh(wq), resh(valid), resh(ind_Xi))


def _sig_inv(cfg: BackendConfig, calib, residual_kind: str):
    if calib is not None:
        sig_a, sig_b, rep_a = cfg.sigma_pixel, cfg.sigma_depth, 2
    elif residual_kind == "point":
        sig_a, sig_b, rep_a = cfg.sigma_point, cfg.sigma_point, 2
    else:
        sig_a, sig_b, rep_a = cfg.sigma_ray, cfg.sigma_dist, 3
    return jnp.asarray([1.0 / sig_a] * rep_a + [1.0 / sig_b], jnp.float32)


def _edge_terms_gathered(
    Twc, ii, jj, gat: _Gathered, cfg: BackendConfig,
    calib=None,
    residual_kind: str = "ray",
):
    """Accumulate per-edge Hessian blocks and gradients from gathered pixels.

    Pose-dependent work only: Sim3 transform, residual + local Jacobian,
    adjoint transfer, weighted accumulation. Returns H (E, 14, 14), g (E, 14).
    """
    Ti = Twc[ii]  # (E, 8)
    Tj = Twc[jj]
    Tij = lie.sim3_rel(Ti, Tj)
    sig_inv = _sig_inv(cfg, calib, residual_kind)

    def body(carry, args):
        H_acc, g_acc = carry
        Xi, Xj, wq_c, valid_c, ind_c = args  # (E, chunk, …)

        Xj_Ci = lie.sim3_act(Tij[:, None, :], Xj)

        if calib is not None:
            K, height, width = calib
            err, J_local, extra_valid = _calib_residual(
                Xi, Xj_Ci, ind_c, K, height, width, cfg.pixel_border, cfg.depth_eps
            )
        elif residual_kind == "point":
            err, J_local, extra_valid = _point_residual(Xi, Xj_Ci)
        else:
            err, J_local, extra_valid = _ray_residual(Xi, Xj_Ci)

        valid = valid_c & extra_valid[..., 0]
        sqrt_w = jnp.where(valid[..., None], sig_inv * wq_c[..., None], 0.0)
        w = robust.huber(sqrt_w * err) * sqrt_w * sqrt_w  # (E, chunk, m)

        # Transfer local Jacobian to absolute poses: Jj = Adj(Ti)^-T J_local,
        # Ji = -Jj (gn_kernels.cu:988-1000)
        Jj = lie.sim3_adj_inv_T_apply(Ti[:, None, None, :], J_local)
        Jx = jnp.concatenate([-Jj, Jj], axis=-1)  # (E, chunk, m, 14)

        H_acc = H_acc + jnp.einsum("ecrm,ecr,ecrn->emn", Jx, w, Jx)
        g_acc = g_acc + jnp.einsum("ecrm,ecr,ecr->em", Jx, w, err)
        return (H_acc, g_acc), None

    E = ii.shape[0]
    init = (jnp.zeros((E, 14, 14)), jnp.zeros((E, 14)))
    (H, g), _ = jax.lax.scan(body, init, gat)
    return H, g


def _edge_terms(
    Twc, Xs, Cs, ii, jj, idx_ii2jj, valid_match, Q, edge_valid, cfg: BackendConfig,
    calib=None,
    residual_kind: str = "ray",
):
    """Gather + accumulate in one call (single-linearization entry point).

    Twc (P, 8); Xs (P, hw, 3); Cs (P, hw, 1); ii/jj (E,); idx_ii2jj (E, hw);
    valid_match (E, hw); Q (E, hw); edge_valid (E,).
    Returns H (E, 14, 14), g (E, 14).
    """
    gat = _gather_edges(Xs, Cs, ii, jj, idx_ii2jj, valid_match, Q, edge_valid, cfg)
    return _edge_terms_gathered(Twc, ii, jj, gat, cfg, calib, residual_kind)


def _quat_to_mat(qx, qy, qz, qw):
    """Rotation-matrix entries R[k][p] as 9 broadcastable scalars."""
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    return [
        [1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
        [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
        [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)],
    ]


def _edge_terms_ray_soa(Twc, ii, jj, gat: _Gathered, cfg: BackendConfig):
    """Structure-of-arrays accumulation of the ray/dist system (hot path).

    The generic `_edge_terms_gathered` keeps per-pixel (4, 7) Jacobian
    tensors in the two TRAILING axes, so the VPU sees 4x7 tiles of its
    (8, 128) lanes (~3% utilization) and tiny-output einsums; at churn
    shapes that costs ~0.9 s per GN iteration on one v5e. Here every
    per-pixel quantity is an (E, chunk) array — full lane occupancy, no
    matmuls — the same math layout the reference's CUDA kernel uses
    per-thread (gn_kernels.cu:926-1000), vectorized over the chunk axis.

    Exploits Ji = -Jj: only A = Jj^T W Jj (E, 7, 7) and b = Jj^T W err
    (E, 7) are accumulated; the full system is H = [[A, -A], [-A, A]],
    g = [-b, b] (`_assemble_dense_A`). Closed forms used (verified against
    the generic path to f32 round-off):

      Y = Tij o Xj, d = |Y|, ry = Y/d, u = R_i ry
      J_local rows:   p<=3: [ (I - ry ry^T)/d | -skew(Y)/d | 0 ]
                      p=4:  [ ry^T | 0 | d ]
      (M Y = 0 kills the ray rows' scale column; ry^T skew(Y) = 0 kills the
      dist row's rotation block.)
      Adjoint transfer per row [a, b, c] with (t, q, s) = T_i:
        R a_p = (R[:, p] - ry_p u)/d   (p<=3),   R a_4 = u
        R b_p = -(R[:, p] x u)         (p<=3),   R b_4 = 0
      so ONE quaternion rotation (u) per pixel serves all four rows.
    """
    Ti = Twc[ii]
    Tij = lie.sim3_rel(Ti, Twc[jj])

    tx, ty, tz = (Tij[:, k, None] for k in range(3))
    Rr = _quat_to_mat(*(Tij[:, 3 + k, None] for k in range(4)))
    sc = Tij[:, 7, None]

    at = [Ti[:, k, None] for k in range(3)]
    Ra = _quat_to_mat(*(Ti[:, 3 + k, None] for k in range(4)))
    s_inv = 1.0 / Ti[:, 7, None]

    sig = (1.0 / cfg.sigma_ray,) * 3 + (1.0 / cfg.sigma_dist,)

    def rot(R, v1, v2, v3):
        return (
            R[0][0] * v1 + R[0][1] * v2 + R[0][2] * v3,
            R[1][0] * v1 + R[1][1] * v2 + R[1][2] * v3,
            R[2][0] * v1 + R[2][1] * v2 + R[2][2] * v3,
        )

    def cross(a, b):
        return (
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        )

    def body(carry, args):
        A_acc, b_acc = carry
        Xi, Xj, wq_c, valid_c, _ind = args

        xi = (Xi[..., 0], Xi[..., 1], Xi[..., 2])
        rxj = rot(Rr, Xj[..., 0], Xj[..., 1], Xj[..., 2])
        y = (sc * rxj[0] + tx, sc * rxj[1] + ty, sc * rxj[2] + tz)
        d = jnp.sqrt(y[0] * y[0] + y[1] * y[1] + y[2] * y[2])
        dinv = 1.0 / d
        ry = (y[0] * dinv, y[1] * dinv, y[2] * dinv)

        di = jnp.sqrt(xi[0] ** 2 + xi[1] ** 2 + xi[2] ** 2)
        di_inv = 1.0 / di
        e = (
            ry[0] - xi[0] * di_inv,
            ry[1] - xi[1] * di_inv,
            ry[2] - xi[2] * di_inv,
            d - di,
        )

        u = rot(Ra, *ry)
        tu = cross(at, u)
        tdotu = at[0] * u[0] + at[1] * u[1] + at[2] * u[2]

        J = []
        for p in range(3):
            Rcol = (Ra[0][p], Ra[1][p], Ra[2][p])
            Rap = (
                (Rcol[0] - ry[p] * u[0]) * dinv,
                (Rcol[1] - ry[p] * u[1]) * dinv,
                (Rcol[2] - ry[p] * u[2]) * dinv,
            )
            Rbp = cross(Rcol, u)
            tRa = cross(at, Rap)
            J.append((
                s_inv * Rap[0], s_inv * Rap[1], s_inv * Rap[2],
                -Rbp[0] + s_inv * tRa[0],
                -Rbp[1] + s_inv * tRa[1],
                -Rbp[2] + s_inv * tRa[2],
                s_inv * (at[0] * Rap[0] + at[1] * Rap[1] + at[2] * Rap[2]),
            ))
        J.append((
            s_inv * u[0], s_inv * u[1], s_inv * u[2],
            s_inv * tu[0], s_inv * tu[1], s_inv * tu[2],
            d + s_inv * tdotu,
        ))

        w = []
        for r in range(4):
            sw = jnp.where(valid_c, sig[r] * wq_c, 0.0)
            w.append(robust.huber(sw * e[r]) * sw * sw)

        wJ = [[w[r] * J[r][p] for p in range(7)] for r in range(4)]
        ups = []
        for p in range(7):
            for q in range(p, 7):
                acc = wJ[0][p] * J[0][q]
                for r in range(1, 4):
                    acc = acc + wJ[r][p] * J[r][q]
                ups.append(jnp.sum(acc, axis=-1))
        bs = []
        for p in range(7):
            acc = wJ[0][p] * e[0]
            for r in range(1, 4):
                acc = acc + wJ[r][p] * e[r]
            bs.append(jnp.sum(acc, axis=-1))
        return (A_acc + jnp.stack(ups, -1), b_acc + jnp.stack(bs, -1)), None

    E = ii.shape[0]
    init = (jnp.zeros((E, 28)), jnp.zeros((E, 7)))
    (A28, b), _ = jax.lax.scan(body, init, gat)

    iu, ju = jnp.triu_indices(7)
    A = jnp.zeros((E, 7, 7)).at[:, iu, ju].set(A28).at[:, ju, iu].set(A28)
    return A, b


def _assemble_dense_A(A, b, ii, jj, edge_valid, n_poses: int, cfg: BackendConfig):
    """Scatter the Ji=-Jj block structure H = [[A,-A],[-A,A]], g = [-b, b]
    into the dense reduced system (same output as `_assemble_dense` on the
    full 14x14 blocks)."""
    P = n_poses
    pin = cfg.pin
    n_opt = P - pin
    dim = n_opt * 7

    def opt_idx(a):
        oi = a - pin
        return jnp.where((oi < 0) | (~edge_valid), n_opt, oi)

    oi = opt_idx(ii)
    oj = opt_idx(jj)

    Hd = jnp.zeros((dim + 7, dim + 7))
    gd = jnp.zeros((dim + 7,))
    r7 = jnp.arange(7)
    for a, bb, blk in (
        (oi, oi, A), (oi, oj, -A), (oj, oi, -A), (oj, oj, A)
    ):
        rows = a[:, None, None] * 7 + r7[None, :, None]
        cols = bb[:, None, None] * 7 + r7[None, None, :]
        Hd = Hd.at[rows, cols].add(blk)
    for a, vec in ((oi, -b), (oj, b)):
        rows = a[:, None] * 7 + r7[None, :]
        gd = gd.at[rows].add(vec)
    return Hd[:dim, :dim], gd[:dim]


def _assemble_dense(H, g, ii, jj, edge_valid, n_poses: int, cfg: BackendConfig):
    """Scatter edge blocks into the dense reduced (dim, dim) system.

    Returns (H_opt (dim, dim) undamped, g_opt (dim,)), dim = (P - pin) * 7.
    """
    P = n_poses
    pin = cfg.pin
    n_opt = P - pin
    dim = n_opt * 7

    def opt_idx(a):
        # Map pose index -> optimized index; pinned/invalid -> trash slot n_opt
        oi = a - pin
        return jnp.where((oi < 0) | (~edge_valid), n_opt, oi)

    oi = opt_idx(ii)
    oj = opt_idx(jj)

    Hd = jnp.zeros((dim + 7, dim + 7))
    gd = jnp.zeros((dim + 7,))

    r7 = jnp.arange(7)
    blocks = [
        (oi, oi, H[:, 0:7, 0:7]),
        (oi, oj, H[:, 0:7, 7:14]),
        (oj, oi, H[:, 7:14, 0:7]),
        (oj, oj, H[:, 7:14, 7:14]),
    ]
    for a, b, blk in blocks:
        rows = a[:, None, None] * 7 + r7[None, :, None]
        cols = b[:, None, None] * 7 + r7[None, None, :]
        Hd = Hd.at[rows, cols].add(blk)
    for a, vec in ((oi, g[:, 0:7]), (oj, g[:, 7:14])):
        rows = a[:, None] * 7 + r7[None, :]
        gd = gd.at[rows].add(vec)

    return Hd[:dim, :dim], gd[:dim]


def _solve_dense(H_opt, g_opt, n_poses: int, cfg: BackendConfig):
    """Damped Cholesky solve of the reduced system -> dx (P, 7), pinned rows
    zeroed.

    Jacobi (diagonal) preconditioning before the factorization: the normal
    equations mix translation/rotation/scale blocks whose diagonal magnitudes
    differ by ~sigma_ray^-2 vs sigma_dist^-2 (1e5x), which costs real
    accuracy in an f32 factorization (the reference sidesteps this by
    solving in f64 on the host, gn_kernels.cu:57-159). Scaling to unit
    diagonal D^-1/2 H D^-1/2 recovers most of the f64 solver's ATE on the
    noisy synthetic harness: device-f32 0.147 -> 0.116 host-f64; with this
    preconditioner the f32 gap closes (scripts/ablate_accuracy.py,
    NOTES_r4)."""
    pin = cfg.pin
    n_opt = n_poses - pin
    dim = n_opt * 7
    diag = jnp.diagonal(H_opt)
    # Tikhonov floor keeps padded (all-zero) pose blocks factorizable
    damp = 1e-6 * jnp.maximum(jnp.max(jnp.abs(diag)), 1.0)
    s = jax.lax.rsqrt(jnp.maximum(diag, damp))  # D^-1/2
    Hs = H_opt * s[:, None] * s[None, :]
    # 1e-6 keeps the f32 factorization positive definite (1e-7 produced
    # negative pivots -> NaN on the noisy harness). Measured solver ladder
    # on the adversarial synthetic harness (scripts/ablate_accuracy.py,
    # 50-frame loop, 3 seeds): device-f32+Jacobi 0.142-0.156, host-f64
    # 0.116 +/- 0.003 — the residual gap is conditioning beyond diagonal
    # scaling (weak per-keyframe scale gauge under sigma_dist whitening).
    # Pure-f32 iterative refinement does NOT close it (the residual
    # computation itself cancels, measured 0.166); accuracy-critical runs
    # should set `local_opt.solver: host` (native f64, the reference's own
    # GPU-kernel + CPU-Eigen split).
    Hs = Hs + 1e-6 * jnp.eye(dim)
    if cfg.scale_gauge > 0.0:
        # Prior on the scale coordinate (index 6 of each 7-block) in the
        # unit-diagonal space — see BackendConfig.scale_gauge.
        sg = jnp.zeros((dim,)).at[6::7].set(cfg.scale_gauge)
        Hs = Hs + jnp.diag(sg)
    L, lower = jax.scipy.linalg.cho_factor(Hs, lower=True)
    dx = s * jax.scipy.linalg.cho_solve((L, lower), s * g_opt)
    dx = -dx  # NOTE sign (gn_kernels.cu:1192)
    dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
    dx = dx.reshape(n_opt, 7)
    return jnp.concatenate([jnp.zeros((pin, 7)), dx], axis=0)


def _assemble_and_solve(H, g, ii, jj, edge_valid, n_poses: int, cfg: BackendConfig):
    H_opt, g_opt = _assemble_dense(H, g, ii, jj, edge_valid, n_poses, cfg)
    return _solve_dense(H_opt, g_opt, n_poses, cfg)


@partial(jax.jit, static_argnames=("cfg", "n_poses", "use_calib", "img_size", "residual_kind"))
def gauss_newton(
    Twc: jax.Array,  # (P, 8) — P static (bucketed)
    Xs: jax.Array,  # (P, hw, 3)
    Cs: jax.Array,  # (P, hw, 1)
    ii: jax.Array,  # (E,) int32 two-way edge list
    jj: jax.Array,
    idx_ii2jj: jax.Array,  # (E, hw)
    valid_match: jax.Array,  # (E, hw) bool
    Q: jax.Array,  # (E, hw)
    edge_valid: jax.Array,  # (E,) bool
    cfg: BackendConfig,
    n_poses: int,
    use_calib: bool = False,
    K: jax.Array | None = None,
    img_size=None,
    residual_kind: str = "ray",
):
    """Full GN loop (driver of gn_kernels.cu:1140-1228). Returns new Twc.

    residual_kind: 'ray' (gauss_newton_rays), 'point' (gauss_newton_points);
    use_calib=True selects the calibrated reprojection residual.
    """
    calib = (K, img_size[0], img_size[1]) if use_calib else None
    # Gathers + gates are pose-independent: run them ONCE, not per iteration
    # (they dominated the solve at churn shapes — 1.6 s/iter at P=32, E=64).
    gat = _gather_edges(Xs, Cs, ii, jj, idx_ii2jj, valid_match, Q, edge_valid, cfg)
    use_soa = calib is None and residual_kind == "ray"

    def cond(state):
        Twc, it, delta = state
        return (it < cfg.max_iters) & (delta >= cfg.delta_norm)

    def body(state):
        Twc, it, _ = state
        if use_soa:
            A, b = _edge_terms_ray_soa(Twc, ii, jj, gat, cfg)
            H_opt, g_opt = _assemble_dense_A(A, b, ii, jj, edge_valid, n_poses, cfg)
            dx = _solve_dense(H_opt, g_opt, n_poses, cfg)
        else:
            H, g = _edge_terms_gathered(Twc, ii, jj, gat, cfg, calib, residual_kind)
            dx = _assemble_and_solve(H, g, ii, jj, edge_valid, n_poses, cfg)
        Twc_new = lie.sim3_retr(Twc, dx)
        # Keep pinned poses exactly (dx rows are zero but retr(0) is exact id)
        delta = jnp.linalg.norm(dx)
        return Twc_new, it + 1, delta

    state = (Twc, jnp.zeros((), jnp.int32), jnp.asarray(jnp.inf))
    Twc_out, iters, delta = jax.lax.while_loop(cond, body, state)
    return Twc_out, iters


@partial(jax.jit, static_argnames=("cfg", "n_poses", "use_calib", "img_size"))
def _edge_system(
    Twc, Xs, Cs, ii, jj, idx_ii2jj, valid_match, Q, edge_valid, cfg: BackendConfig,
    n_poses: int, use_calib: bool = False, K=None, img_size=None,
):
    """One GN linearization: assembled dense (H, g) for the host solver."""
    calib = (K, img_size[0], img_size[1]) if use_calib else None
    gat = _gather_edges(Xs, Cs, ii, jj, idx_ii2jj, valid_match, Q, edge_valid, cfg)
    if calib is None:
        A, b = _edge_terms_ray_soa(Twc, ii, jj, gat, cfg)
        return _assemble_dense_A(A, b, ii, jj, edge_valid, n_poses, cfg)
    H, g = _edge_terms_gathered(Twc, ii, jj, gat, cfg, calib)
    return _assemble_dense(H, g, ii, jj, edge_valid, n_poses, cfg)


def gauss_newton_sharded(
    mesh,
    Twc: jax.Array,  # (P, 8) replicated
    Xs: jax.Array,  # (P, hw, 3) replicated
    Cs: jax.Array,  # (P, hw, 1) replicated
    ii: jax.Array,  # (E,) — E must divide by mesh dp size
    jj: jax.Array,
    idx_ii2jj: jax.Array,  # (E, hw)
    valid_match: jax.Array,
    Q: jax.Array,
    edge_valid: jax.Array,
    cfg: BackendConfig,
    n_poses: int,
    use_calib: bool = False,
    K: jax.Array | None = None,
    img_size=None,
    residual_kind: str = "ray",
    axis: str = "dp",
):
    """Multi-chip global GN: edges sharded over the mesh's `axis`.

    The per-edge Hessian/gradient accumulation (`_edge_terms`) is
    embarrassingly parallel over E; each device assembles its local dense
    (dim, dim) contribution and ONE `psum` over ICI reduces the system —
    collective volume is O(P^2) per iteration, independent of hw and E.
    The tiny replicated Cholesky + retraction runs redundantly per device
    (cheaper than gathering). Whole loop is one jit: no host sync per
    iteration, matching the single-chip `gauss_newton`.
    """
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as PS

    calib = (K, img_size[0], img_size[1]) if use_calib else None
    n_dev = mesh.shape[axis]
    E = ii.shape[0]
    assert E % n_dev == 0, f"edge count {E} must divide dp size {n_dev} (pad edges)"

    edge_specs = PS(axis)
    rep = PS()

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(rep, rep, rep, edge_specs, edge_specs, edge_specs,
                  edge_specs, edge_specs, edge_specs),
        out_specs=(rep, rep),
        check_vma=False,
    )
    def loop_sharded(Twc_r, Xs_r, Cs_r, ii_s, jj_s, idx_s, vm_s, Q_s, ev_s):
        # Local-edge gathers run ONCE per solve (pose-independent), then the
        # whole GN loop iterates on the gathered shard; ONE psum of the dense
        # (dim, dim) system per iteration rides ICI. The tiny replicated
        # Cholesky + retraction runs redundantly per device (cheaper than
        # gathering), so every device follows the identical pose trajectory
        # and the while_loop predicate agrees across the mesh.
        gat = _gather_edges(Xs_r, Cs_r, ii_s, jj_s, idx_s, vm_s, Q_s, ev_s, cfg)
        use_soa = calib is None and residual_kind == "ray"

        def cond(state):
            _, it, delta = state
            return (it < cfg.max_iters) & (delta >= cfg.delta_norm)

        def body(state):
            Twc, it, _ = state
            if use_soa:
                A, b = _edge_terms_ray_soa(Twc, ii_s, jj_s, gat, cfg)
                H_opt, g_opt = _assemble_dense_A(
                    A, b, ii_s, jj_s, ev_s, n_poses, cfg
                )
            else:
                H, g = _edge_terms_gathered(
                    Twc, ii_s, jj_s, gat, cfg, calib, residual_kind
                )
                H_opt, g_opt = _assemble_dense(H, g, ii_s, jj_s, ev_s, n_poses, cfg)
            H_opt = jax.lax.psum(H_opt, axis)
            g_opt = jax.lax.psum(g_opt, axis)
            dx = _solve_dense(H_opt, g_opt, n_poses, cfg)
            return lie.sim3_retr(Twc, dx), it + 1, jnp.linalg.norm(dx)

        state = (Twc_r, jnp.zeros((), jnp.int32), jnp.asarray(jnp.inf))
        Twc_out, iters, _ = jax.lax.while_loop(cond, body, state)
        return Twc_out, iters

    run = jax.jit(loop_sharded)

    # Place edge arrays on the mesh so XLA shards instead of replicating
    shard = NamedSharding(mesh, edge_specs)
    repl = NamedSharding(mesh, rep)
    args = (
        jax.device_put(Twc, repl), jax.device_put(Xs, repl),
        jax.device_put(Cs, repl),
        jax.device_put(ii, NamedSharding(mesh, PS(axis))),
        jax.device_put(jj, NamedSharding(mesh, PS(axis))),
        jax.device_put(idx_ii2jj, shard), jax.device_put(valid_match, shard),
        jax.device_put(Q, shard), jax.device_put(edge_valid, NamedSharding(mesh, PS(axis))),
    )
    return run(*args)


def gauss_newton_host_solve(
    Twc, Xs, Cs, ii, jj, idx_ii2jj, valid_match, Q, edge_valid,
    cfg: BackendConfig, n_poses: int, use_calib: bool = False, K=None, img_size=None,
):
    """GN loop with the float64 NATIVE host solver (monst3r_slam_tpu.native).

    Same device linearization as `gauss_newton`, but each iteration ships the
    assembled (H, g) to the host and solves in f64 — the reference's exact
    GPU-kernel + CPU-Eigen split (gn_kernels.cu:1183-1222), one device<->host
    round trip per iteration. Use when f32 conditioning is a concern.
    """
    import numpy as np

    from monst3r_slam_tpu.native.build import solve_spd

    pin = cfg.pin
    for _ in range(cfg.max_iters):
        H, g = _edge_system(
            Twc, Xs, Cs, ii, jj, idx_ii2jj, valid_match, Q, edge_valid, cfg,
            n_poses=n_poses, use_calib=use_calib, K=K, img_size=img_size,
        )
        H_np = np.asarray(H, np.float64)
        g_np = np.asarray(g, np.float64)
        try:
            dx = -solve_spd(H_np, g_np, jitter=1e-12)
        except Exception:
            break
        dx = dx.reshape(n_poses - pin, 7)
        dx_full = jnp.concatenate(
            [jnp.zeros((pin, 7)), jnp.asarray(dx, jnp.float32)], axis=0
        )
        Twc = lie.sim3_retr(Twc, dx_full)
        if float(np.linalg.norm(dx)) < cfg.delta_norm:
            break
    return Twc
