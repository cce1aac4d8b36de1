"""Chunked (burst) tracking: C frames per device program (app/chunked.py).

The contract under test: chunked processing makes EXACTLY the decisions of
the per-frame path with `defer_tracking_sync: 0` — same keyframes at the
same frames, same poses (to program-refactoring float tolerance), same
RELOC behavior — while syncing with the host once per event-free chunk.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monst3r_slam_tpu.app.config import load_config
from monst3r_slam_tpu.app.pipeline import SLAMSystem
from monst3r_slam_tpu.models.config import TINY
from monst3r_slam_tpu.models.init import init_params
from monst3r_slam_tpu.slam.frame import Mode

from tests.test_pipeline import H, W, synth_video


def _cfg(**over):
    cfg = load_config("config/base.yaml")
    cfg["single_thread"] = True  # deterministic backend for comparison
    cfg["tracking"]["Q_conf"] = -1e9
    cfg["tracking"]["C_conf"] = -1e9
    cfg["tracking"]["min_match_frac"] = 0.0
    cfg["local_opt"]["Q_conf"] = -1e9
    cfg["local_opt"]["min_match_frac"] = 0.0
    for k, v in over.items():
        if isinstance(v, dict):
            cfg.setdefault(k, {}).update(v)
        else:
            cfg[k] = v
    return cfg


def _make_slam(cfg):
    params = init_params(jax.random.PRNGKey(0), TINY)
    return SLAMSystem(
        params=params, model_cfg=TINY, cfg=cfg, img_size=(H, W),
        kf_capacity=16,
    )


def _run_perframe(frames, cfg):
    s = _make_slam(cfg)
    for i, img in enumerate(frames):
        s.process_frame(i, float(i) / 30.0, img)
    s.finalize()
    return s


def _run_chunked(frames, cfg, chunk):
    s = _make_slam(cfg)
    n = len(frames)
    for c0 in range(0, n, chunk):
        sl = frames[c0 : c0 + chunk]
        ids = list(range(c0, c0 + len(sl)))
        tss = [float(i) / 30.0 for i in ids]
        s.process_chunk(ids, tss, jnp.asarray(np.stack(sl)))
    s.finalize()
    return s


def _assert_equivalent(ref, got, atol=1e-5):
    assert len(got.frame_poses) == len(ref.frame_poses)
    assert int(got.mem.count) == int(ref.mem.count)
    # same frames became keyframes
    n_kf = int(ref.mem.count)
    np.testing.assert_array_equal(
        np.asarray(got.mem.frame_id[:n_kf]), np.asarray(ref.mem.frame_id[:n_kf])
    )
    np.testing.assert_allclose(
        np.stack(got.frame_poses), np.stack(ref.frame_poses), atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(got.mem.T_WC[:n_kf]), np.asarray(ref.mem.T_WC[:n_kf]),
        atol=atol,
    )


def test_chunked_matches_perframe_no_events():
    """Event-free chunks: one dispatch + one sync each, decisions equal."""
    cfg = _cfg()
    # keyframe gate never fires (thresh 0 => min(match, unique) < 0 is False)
    cfg["tracking"]["match_frac_thresh"] = 0.0
    frames = synth_video(8)
    ref = _run_perframe(frames, cfg)
    got = _run_chunked(frames, cfg, chunk=4)
    assert int(got.mem.count) == 1  # the INIT keyframe only
    _assert_equivalent(ref, got)


def test_chunked_matches_perframe_with_keyframes():
    """In-chunk keyframe events: the done-flag freeze + masked re-dispatch
    must reproduce the sequential decisions exactly (every frame tracks
    against the keyframe it would see per-frame)."""
    cfg = _cfg()
    cfg["tracking"]["match_frac_thresh"] = 0.9  # kf storm: events mid-chunk
    frames = synth_video(10)
    ref = _run_perframe(frames, cfg)
    got = _run_chunked(frames, cfg, chunk=4)
    assert int(ref.mem.count) >= 3  # the scenario exercises events
    _assert_equivalent(ref, got)


def test_chunked_short_tail_chunk():
    """len(frames) % chunk != 0: the short final chunk is processed too."""
    cfg = _cfg()
    cfg["tracking"]["match_frac_thresh"] = 0.9
    frames = synth_video(7)
    ref = _run_perframe(frames, cfg)
    got = _run_chunked(frames, cfg, chunk=4)  # chunks of 4 and 3
    _assert_equivalent(ref, got)


def test_chunked_uint8_input_tracks():
    """uint8 chunks (the production upload format) normalize on device with
    the exact host arithmetic and track successfully."""
    cfg = _cfg()
    cfg["tracking"]["match_frac_thresh"] = 0.0
    frames = synth_video(6)
    u8 = [
        np.clip((f * 0.5 + 0.5) * 255.0, 0, 255).astype(np.uint8)
        for f in frames
    ]
    s = _make_slam(cfg)
    for c0 in range(0, 6, 3):
        sl = u8[c0 : c0 + 3]
        ids = list(range(c0, c0 + len(sl)))
        s.process_chunk(
            ids, [i / 30.0 for i in ids], jnp.asarray(np.stack(sl)),
            uimgs=sl,
        )
    s.finalize()
    assert s.mode == Mode.TRACKING
    assert len(s.frame_poses) == 6
    assert np.isfinite(np.stack(s.frame_poses)).all()
    # device normalization of the uint8 batch is bit-identical to the host
    # formula resize_img uses (data/preprocess.py:53)
    from monst3r_slam_tpu.app.chunked import _norm_slice

    dev = np.asarray(_norm_slice(jnp.asarray(np.stack(u8)), 2))[0]
    host = (u8[2].astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_array_equal(dev, host)


def test_chunked_reloc_falls_back_per_frame():
    """A lost-tracking frame inside a chunk flips to RELOC at that frame and
    the remaining frames run the per-frame relocalization path."""
    cfg = _cfg()
    cfg["tracking"]["match_frac_thresh"] = 0.0
    cfg["tracking"]["min_match_frac"] = 0.55  # trips on the scene cut
    cfg["reloc"] = {"min_match_frac": 0.0, "strict": False}
    base = synth_video(8)
    cut = synth_video(8, seed=9)
    frames = base[:4] + cut[4:]  # hard content cut at frame 4
    ref = _run_perframe(frames, cfg)
    got = _run_chunked(frames, cfg, chunk=4)
    # both paths lost tracking at the same frame and recorded 8 poses
    assert len(got.frame_poses) == len(ref.frame_poses) == 8
    assert got.n_reloc_attempts == ref.n_reloc_attempts
    assert int(got.mem.count) == int(ref.mem.count)


def test_supports_chunking_gate():
    cfg = _cfg()
    cfg["matching"] = dict(cfg.get("matching", {}), mode="lm")
    s = _make_slam(cfg)
    assert not s.supports_chunking
    with pytest.raises(RuntimeError, match="chunked tracking requires"):
        s.process_chunk([0], [0.0], jnp.zeros((1, H, W, 3)))
