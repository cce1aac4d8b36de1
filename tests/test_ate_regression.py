"""End-to-end ATE regression harness (VERDICT item 10).

Runs the FULL SLAM pipeline (matching, fusion, GN tracking, keyframing,
factor-graph backend) on a synthetic scene with a KNOWN ground-truth Sim(3)
trajectory — but with the neural model replaced by a geometry oracle that
renders exact multi-view-consistent pointmaps and descriptors. This catches
accuracy regressions in every non-model component before real datasets /
checkpoints exist (the reference's equivalent gate is `evo_ape` on TUM,
scripts/eval_tum.sh:46-63).

Scene: a bumpy height-field surface z = f(x, y); per-frame pointmaps come
from Newton ray-surface intersection along each pixel ray of the GT camera.
Descriptors are random Fourier features of the WORLD surface point, so they
are multi-view consistent and dense matching is well-posed.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monst3r_slam_tpu.app.config import load_config
from monst3r_slam_tpu.app.evaluate import ate_rmse
from monst3r_slam_tpu.app.pipeline import SLAMSystem
from monst3r_slam_tpu.core import lie
from monst3r_slam_tpu.models import mast3r as model_api
from monst3r_slam_tpu.models.config import TINY

H, W = 64, 80
FX = FY = 70.0
DESC_F = 16


def surface_z(x, y):
    return 3.0 + 0.25 * np.sin(0.9 * x) + 0.25 * np.cos(0.7 * y) + 0.1 * np.sin(1.7 * (x + y))


def pixel_rays():
    u, v = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    r = np.stack([(u - W / 2) / FX, (v - H / 2) / FY, np.ones_like(u)], -1)
    return r  # (H, W, 3), z=1 parameterization


def render_frame(T_WC: np.ndarray):
    """Exact pointmap (H*W, 3) in camera frame + world points (H*W, 3)."""
    M = np.asarray(lie.sim3_matrix(jnp.asarray(T_WC)), np.float64)  # (4,4)
    sR = M[:3, :3]
    t = M[:3, 3]
    r = pixel_rays().reshape(-1, 3)
    m = r @ sR.T  # world direction (scaled)
    tau = (3.0 - t[2]) / m[:, 2]  # init: flat-plane intersection
    for _ in range(25):
        xw = t[0] + tau * m[:, 0]
        yw = t[1] + tau * m[:, 1]
        zw = t[2] + tau * m[:, 2]
        g = zw - surface_z(xw, yw)
        dg = (
            m[:, 2]
            - 0.25 * 0.9 * np.cos(0.9 * xw) * m[:, 0]
            + 0.25 * 0.7 * np.sin(0.7 * yw) * m[:, 1]
            - 0.1 * 1.7 * np.cos(1.7 * (xw + yw)) * (m[:, 0] + m[:, 1])
        )
        tau = tau - g / dg
    X_world = t[None] + tau[:, None] * m
    X_cam = tau[:, None] * r  # camera-frame points (z = tau)
    return X_cam.astype(np.float32), X_world.astype(np.float32)


_rff = np.random.default_rng(42)
_RFF_W = _rff.normal(size=(3, DESC_F)) * 1.5
_RFF_B = _rff.uniform(0, 2 * np.pi, DESC_F)


def world_desc(X_world):
    d = np.sin(X_world @ _RFF_W + _RFF_B)
    return (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)


def gt_trajectory(n):
    """Smooth Sim(3) path: lateral translation + gentle yaw."""
    poses = []
    for i in range(n):
        rot = jnp.asarray([0.0, 0.018 * i, 0.0])  # yaw per frame
        tau = jnp.concatenate(
            [jnp.asarray([0.06 * i, 0.015 * i, 0.01 * np.sin(0.5 * i)]), rot,
             jnp.zeros(1)]
        )
        poses.append(np.asarray(lie.sim3_exp(tau), np.float32))
    return poses


class OracleSLAM(SLAMSystem):
    """SLAMSystem with the neural model replaced by the geometry oracle.

    `encode` tags each frame's features with an id; `_decode_pair` renders
    exact pointmaps for the tagged frames from the GT trajectory. Everything
    downstream (matcher, tracker, fusion, factor graph, backend GN) is the
    real production code.
    """

    def __post_init__(self):
        super().__post_init__()
        self._oracle_frames = {}  # id -> (X_cam, X_world, T_WC_gt)
        self._next_id = 0

    def register_frame(self, T_WC_gt):
        fid = self._next_id
        self._next_id += 1
        X_cam, X_world = render_frame(T_WC_gt)
        self._oracle_frames[fid] = (X_cam, X_world, np.asarray(T_WC_gt))
        self._pending_id = fid
        return fid

    def encode(self, img_nhwc):
        b = img_nhwc.shape[0]
        n = self.hw // self.model_cfg.patch_size**2
        feat = np.zeros((b, n, self.model_cfg.enc_dim), np.float32)
        feat[:, 0, 0] = self._pending_id
        pos = np.zeros((b, n, 2), np.int32)
        return jnp.asarray(feat), jnp.asarray(pos)

    def _decode_pair(self, feat_i, pos_i, feat_j, pos_j):
        b = feat_i.shape[0]
        X1s, X2s, D1s, D2s = [], [], [], []
        for k in range(b):
            fi = int(np.asarray(feat_i[k, 0, 0]))
            fj = int(np.asarray(feat_j[k, 0, 0]))
            Xi_cam, Xi_w, Ti = self._oracle_frames[fi]
            Xj_cam, Xj_w, Tj = self._oracle_frames[fj]
            # view-2 (j) points expressed in view-1 (i)'s frame
            T_ij = lie.sim3_rel(jnp.asarray(Ti), jnp.asarray(Tj))
            Xj_in_i = np.asarray(lie.sim3_act(T_ij, jnp.asarray(Xj_cam)))
            X1s.append(Xi_cam)
            X2s.append(Xj_in_i)
            D1s.append(world_desc(Xi_w))
            D2s.append(world_desc(Xj_w))
        conf = jnp.full((b, H, W), 2.0)
        return model_api.PairOutput(
            X1=jnp.asarray(np.stack(X1s)).reshape(b, H, W, 3),
            C1=conf,
            D1=jnp.asarray(np.stack(D1s)).reshape(b, H, W, DESC_F),
            Q1=conf,
            X2=jnp.asarray(np.stack(X2s)).reshape(b, H, W, 3),
            C2=conf,
            D2=jnp.asarray(np.stack(D2s)).reshape(b, H, W, DESC_F),
            Q2=conf,
        )


@pytest.mark.parametrize("single_thread", [True, False])
def test_end_to_end_ate_on_synthetic_trajectory(single_thread):
    n_frames = 10
    cfg = load_config("config/base.yaml")
    cfg["tracking"]["Q_conf"] = 0.5
    cfg["tracking"]["C_conf"] = 0.5
    cfg["local_opt"]["Q_conf"] = 0.5
    # force keyframes often enough to exercise the backend
    cfg["tracking"]["match_frac_thresh"] = 0.925
    cfg["single_thread"] = single_thread
    # oracle harness: skip the 8-virtual-device sharded path (5x slower on
    # CPU; covered by test_mesh_pipeline_matches_single_device + the dryrun)
    cfg["parallel"] = {"mesh": "off"}

    slam = OracleSLAM(
        params={},
        model_cfg=TINY,
        cfg=cfg,
        img_size=(H, W),
        kf_capacity=16,
    )
    worker_threads = set()
    if not single_thread:
        import threading

        orig_body = slam._backend_job_body

        def tracking_body(*a):
            worker_threads.add(threading.current_thread().name)
            return orig_body(*a)

        slam._backend_job_body = tracking_body

    gt = gt_trajectory(n_frames)
    img = np.zeros((H, W, 3), np.float32)
    for i, T in enumerate(gt):
        slam.register_frame(T)
        slam.process_frame(i, float(i) / 30.0, img)
    slam.finalize()

    assert int(slam.mem.count) >= 2, "keyframing never triggered"
    if not single_thread:
        # backend work really ran off the main thread and produced solves
        assert worker_threads == {"slam-backend"}, worker_threads
        assert slam.graph.n_edges > 0
    frame_ids, T_all = slam.full_trajectory()
    est_xyz = np.stack([np.asarray(lie.sim3_to_se3(T))[:3] for T in T_all])
    gt_xyz = np.stack([T[:3] for T in gt])
    t = np.arange(n_frames, dtype=np.float64)
    rmse, n = ate_rmse(t, est_xyz, t, gt_xyz)
    assert n == n_frames
    # exact geometry, sub-pixel matcher, full GN: trajectory must be tight.
    # GT motion spans ~0.6 units; 0.01 = ~1.6% of trajectory extent.
    # The async default defers host decisions by 2 frames
    # (defer_tracking_sync=2, hides relay dispatch bubbles): on this
    # keyframe-DENSE toy (a keyframe every ~2 frames, large inter-frame
    # motion) frames track against a one-frame-stale keyframe, measured
    # +0.005 ATE; at production keyframe cadence the effect vanishes
    # (scripts/ablate_accuracy.py defer rows).
    bound = 0.01 if single_thread else 0.02
    assert rmse < bound, f"ATE regression ({single_thread=}): rmse={rmse:.4f}"


def test_oracle_renders_consistent_geometry():
    """Sanity of the harness itself: cross-view rendering is consistent —
    frame j's points mapped into frame i equal direct ray intersection."""
    gt = gt_trajectory(3)
    Xi_cam, Xi_w = render_frame(gt[0])
    Xj_cam, Xj_w = render_frame(gt[2])
    # world points from both frames lie on the surface
    for Xw in (Xi_w, Xj_w):
        np.testing.assert_allclose(
            Xw[:, 2], surface_z(Xw[:, 0], Xw[:, 1]), atol=1e-4
        )
    # camera->world->camera round trip
    X_back = np.asarray(
        lie.sim3_act(lie.sim3_inv(jnp.asarray(gt[2])), jnp.asarray(Xj_w))
    )
    np.testing.assert_allclose(X_back, Xj_cam, atol=1e-4)


# ---------------------------------------------------------------------------
# Adversarial harness (VERDICT r2 item 5): noise + outliers + a revisit loop
# that exercises retrieval / loop closure, and a forced tracking break that
# exercises RELOC — asserting the backend measurably reduces ATE.
# ---------------------------------------------------------------------------


class NoisyOracleSLAM(OracleSLAM):
    """Oracle SLAM with adversarial observations:

    * depth noise on every pointmap (multiplicative, ~1%)
    * 6% gross outlier pixels (depth scaled 0.5-2x) at NORMAL confidence —
      only the Huber weights can reject them
    * confidence drawn U(1, 3) instead of constant (stresses the C/Q gates)
    * descriptor noise + renormalization
    * pose-dependent encoder features (random Fourier features of the GT
      camera pose), so ASMK retrieval is driven by real similarity instead
      of exact descriptors
    * optional per-frame geometry corruption (`break_frames`) to force a
      tracking loss -> RELOC.
    """

    def __post_init__(self):
        super().__post_init__()
        self._noise = np.random.default_rng(7)
        self.break_frames = set()
        rng = np.random.default_rng(5)
        self._feat_W = rng.normal(size=(8, self.model_cfg.enc_dim)) * 2.0
        self._feat_B = rng.uniform(0, 2 * np.pi, self.model_cfg.enc_dim)

    def encode(self, img_nhwc):
        feat, pos = super().encode(img_nhwc)
        fid = self._pending_id
        T = self._oracle_frames[fid][2]
        # smooth pose embedding: translation + quaternion through an RFF
        z = np.concatenate([T[:3] * 3.0, T[3:7], T[7:8]])
        f = np.sin(z @ self._feat_W + self._feat_B).astype(np.float32)
        n = feat.shape[1]
        toks = np.tile(f, (n, 1))
        # token diversity so ASMK sees >1 visual word
        toks += 0.3 * np.sin(
            np.arange(n, dtype=np.float32)[:, None] * 0.7
            + np.arange(self.model_cfg.enc_dim)[None] * 0.13
        )
        feat = jnp.asarray(toks[None]).at[:, 0, 0].set(float(fid))
        return feat, pos

    def _decode_pair(self, feat_i, pos_i, feat_j, pos_j):
        fi = int(np.asarray(feat_i[0, 0, 0]))
        out = super()._decode_pair(feat_i, pos_i, feat_j, pos_j)
        rng = self._noise
        b = out.X1.shape[0]

        def corrupt_X(X):
            X = np.asarray(X)
            depth_noise = 1.0 + 0.01 * rng.standard_normal(X.shape[:-1])
            X = X * depth_noise[..., None]
            outl = rng.random(X.shape[:-1]) < 0.06
            scale = rng.uniform(0.5, 2.0, X.shape[:-1])
            X = np.where(outl[..., None], X * scale[..., None], X)
            return jnp.asarray(X.astype(np.float32))

        def corrupt_D(D):
            D = np.asarray(D) + 0.05 * rng.standard_normal(np.asarray(D).shape)
            D = D / np.linalg.norm(D, axis=-1, keepdims=True)
            return jnp.asarray(D.astype(np.float32))

        def conf(shape):
            return jnp.asarray(rng.uniform(1.0, 3.0, shape).astype(np.float32))

        X1 = corrupt_X(out.X1)
        if fi in self.break_frames:  # garbage geometry: tracking must fail
            X1 = jnp.asarray(
                rng.uniform(-5, 5, np.asarray(out.X1).shape).astype(np.float32)
            )
        return model_api.PairOutput(
            X1=X1, C1=conf(out.C1.shape),
            D1=corrupt_D(out.D1), Q1=conf(out.Q1.shape),
            X2=corrupt_X(out.X2), C2=conf(out.C2.shape),
            D2=corrupt_D(out.D2), Q2=conf(out.Q2.shape),
        )


def _loop_trajectory(n):
    """Out-and-back path: the camera returns to (near) its start pose, so the
    final frames genuinely revisit the first keyframes' viewpoint."""
    poses = []
    for i in range(n):
        s = np.sin(np.pi * i / (n - 1))
        tau = jnp.asarray(
            [0.55 * s, 0.1 * s, 0.0, 0.0, 0.12 * s, 0.0, 0.0], jnp.float32
        )
        poses.append(np.asarray(lie.sim3_exp(tau), np.float32))
    return poses


def _run_noisy(n_frames, with_backend, break_frames=(), retrieval=True,
               defer=False):
    from monst3r_slam_tpu.slam import retrieval as retrieval_mod

    cfg = load_config("config/base.yaml")
    cfg["tracking"]["Q_conf"] = 1.2
    cfg["tracking"]["C_conf"] = 1.2
    cfg["local_opt"]["Q_conf"] = 1.2
    cfg["tracking"]["match_frac_thresh"] = 0.925
    cfg["single_thread"] = True
    cfg["parallel"] = {"mesh": "off"}
    cfg["defer_tracking_sync"] = defer
    cfg["retrieval"] = {"k": 3, "min_thresh": 1e-4}

    kwargs = {}
    if retrieval:
        kwargs["retrieval_params"] = retrieval_mod.init_retrieval_params(
            jax.random.PRNGKey(1), TINY.enc_dim, hdims=(32,)
        )
        kwargs["retrieval_db"] = retrieval_mod.ASMKDatabase(None, n_words=64)
    slam = NoisyOracleSLAM(
        params={}, model_cfg=TINY, cfg=cfg, img_size=(H, W), kf_capacity=32,
        **kwargs,
    )
    slam.break_frames = set(break_frames)
    if not with_backend:
        slam.solve_backend = lambda: None  # tracking-only ablation

    gt = _loop_trajectory(n_frames)
    img = np.zeros((H, W, 3), np.float32)
    modes = []
    slam.reloc_attempts_by_frame = []  # n_reloc_attempts after each frame
    for i, T in enumerate(gt):
        slam.register_frame(T)
        slam.process_frame(i, float(i) / 30.0, img)
        modes.append(slam.mode)
        slam.reloc_attempts_by_frame.append(slam.n_reloc_attempts)
    slam.finalize()

    frame_ids, T_all = slam.full_trajectory()
    est_xyz = np.stack([np.asarray(lie.sim3_to_se3(T))[:3] for T in T_all])
    gt_xyz = np.stack([T[:3] for T in gt])
    t = np.arange(n_frames, dtype=np.float64)
    rmse, _ = ate_rmse(t, est_xyz, t, gt_xyz)
    return rmse, slam, modes


def test_adversarial_ate_backend_reduces_error():
    """Noise + outliers + a revisit loop: the global backend (with retrieval
    loop-closure edges) must measurably beat tracking-only ATE, and the
    revisit must have produced at least one non-consecutive graph edge."""
    n = 14
    rmse_track, slam_t, _ = _run_noisy(n, with_backend=False)
    rmse_full, slam_f, _ = _run_noisy(n, with_backend=True)

    assert int(slam_f.mem.count) >= 3, "keyframing never triggered"
    ii = np.asarray(slam_f.graph.ii[: slam_f.graph.n_edges])
    jj = np.asarray(slam_f.graph.jj[: slam_f.graph.n_edges])
    assert slam_f.graph.n_edges > 0
    assert (np.abs(ii - jj) >= 2).any(), (
        f"no loop-closure edge from the revisit (edges: {list(zip(ii, jj))})"
    )
    # the solver must survive outliers at normal confidence (Huber) and
    # improve on dead-reckoning tracking
    assert np.isfinite(rmse_full)
    assert rmse_full < rmse_track, (rmse_full, rmse_track)
    assert rmse_full < 0.05, f"adversarial ATE too high: {rmse_full:.4f}"


def test_reloc_recovers_from_tracking_break():
    """A frame of garbage geometry forces low_match -> RELOC; retrieval then
    relocalizes against the keyframe memory and tracking resumes (reference
    main.py:29-78 semantics)."""
    from monst3r_slam_tpu.slam.frame import Mode

    n = 12
    rmse, slam, modes = _run_noisy(n, with_backend=True, break_frames={5})
    assert Mode.RELOC in modes, "tracking break never triggered RELOC"
    i_reloc = modes.index(Mode.RELOC)
    assert modes[-1] == Mode.TRACKING, "never relocalized back to TRACKING"
    assert any(m == Mode.TRACKING for m in modes[i_reloc + 1 :])
    assert np.isfinite(rmse)


def test_reloc_recovers_in_deferred_mode():
    """The deferred-sync path (cross-frame encode overlap) must handle the
    full break -> RELOC -> retrieval -> recovery cycle and produce the SAME
    trajectory as the synchronous path — RELOC entry is observed one
    process_frame later, but every recorded pose is identical."""
    from monst3r_slam_tpu.slam.frame import Mode

    n = 12
    rmse_s, slam_s, modes_s = _run_noisy(n, with_backend=True, break_frames={5})
    rmse_d, slam_d, modes_d = _run_noisy(
        n, with_backend=True, break_frames={5}, defer=True
    )
    assert Mode.RELOC in modes_d, "deferred mode never entered RELOC"
    assert modes_d[-1] == Mode.TRACKING, "deferred mode never recovered"
    assert len(slam_d.frame_poses) == len(slam_s.frame_poses)
    np.testing.assert_allclose(
        np.stack(slam_d.frame_poses), np.stack(slam_s.frame_poses), atol=1e-5
    )
    np.testing.assert_allclose(rmse_d, rmse_s, atol=1e-6)

def test_reloc_recovers_at_defer_depth_2():
    """defer_tracking_sync=2 (the async-mode default: two frames in flight,
    hiding relay dispatch bubbles) must still complete the break -> RELOC ->
    recovery cycle. Decisions land up to two frames late, so the trajectory
    is NOT required to be bit-identical to the synchronous one — but it must
    recover to TRACKING and its ATE must stay comparable."""
    from monst3r_slam_tpu.slam.frame import Mode

    n = 12
    rmse_s, _, _ = _run_noisy(n, with_backend=True, break_frames={5})
    rmse_d, slam_d, modes_d = _run_noisy(
        n, with_backend=True, break_frames={5}, defer=2
    )
    assert slam_d.defer_depth == 2
    # At depth 2 the break resolution + relocalization can complete WITHIN
    # one process_frame (the RELOC drain), so the per-frame mode log may
    # never show RELOC; the attempt counter is the reliable signal.
    assert slam_d.n_reloc_attempts >= 1 or Mode.RELOC in modes_d, (
        "depth-2 mode never attempted relocalization"
    )
    # Latency pin (VERDICT r4 #9): the break lands at frame 5 and decisions
    # defer by at most d=2 frames, so relocalization must have been
    # ATTEMPTED by the end of frame 5 + 2 + 1 (the drain can add one frame).
    first_attempt = next(
        (f for f, n_att in enumerate(slam_d.reloc_attempts_by_frame) if n_att > 0),
        None,
    )
    assert first_attempt is not None and first_attempt <= 5 + slam_d.defer_depth + 1, (
        f"relocalization fired late: frame {first_attempt} for a break at 5 "
        f"(defer depth {slam_d.defer_depth})"
    )
    assert modes_d[-1] == Mode.TRACKING, "depth-2 mode never recovered"
    assert len(slam_d.frame_poses) == n
    assert np.isfinite(np.stack(slam_d.frame_poses)).all()
    assert np.isfinite(rmse_d)
    assert rmse_d < 3 * max(rmse_s, 0.02), (rmse_d, rmse_s)


def test_force_kf_overrides_device_decision():
    """process_frame(force_kf=...) pins keyframe creation host-side without
    touching the compiled tracker (bench/tools cadence control)."""
    cfg = load_config("config/base.yaml")
    cfg["tracking"]["Q_conf"] = 1.2
    cfg["tracking"]["C_conf"] = 1.2
    # natural gate would fire constantly (impossible threshold)...
    cfg["tracking"]["match_frac_thresh"] = 2.0
    cfg["single_thread"] = True
    cfg["parallel"] = {"mesh": "off"}
    slam = OracleSLAM(
        params={}, model_cfg=TINY, cfg=cfg, img_size=(H, W), kf_capacity=16
    )
    gt = gt_trajectory(6)
    img = np.zeros((H, W, 3), np.float32)
    for i, T in enumerate(gt):
        slam.register_frame(T)
        # ...but force_kf=False suppresses every keyframe after init
        slam.process_frame(i, i / 30.0, img, force_kf=False)
    slam.finalize()
    assert slam.n_kf == 1, slam.n_kf

    cfg2 = load_config("config/base.yaml")
    cfg2["tracking"]["Q_conf"] = 1.2
    cfg2["tracking"]["C_conf"] = 1.2
    # natural gate would never fire...
    cfg2["tracking"]["match_frac_thresh"] = -1.0
    cfg2["single_thread"] = True
    cfg2["parallel"] = {"mesh": "off"}
    slam2 = OracleSLAM(
        params={}, model_cfg=TINY, cfg=cfg2, img_size=(H, W), kf_capacity=16
    )
    for i, T in enumerate(gt_trajectory(6)):
        slam2.register_frame(T)
        # ...but force_kf=True creates one every frame
        slam2.process_frame(i, i / 30.0, img, force_kf=True)
    slam2.finalize()
    assert slam2.n_kf == 6, slam2.n_kf
