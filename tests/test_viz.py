"""Tests for headless visualization exports."""

import numpy as np

from monst3r_slam_tpu.viz import headless


def test_depth2rgb():
    d = np.linspace(0, 5, 12).reshape(3, 4)
    rgb = headless.depth2rgb(d)
    assert rgb.shape == (3, 4, 3) and rgb.dtype == np.uint8


def test_overlay_mask():
    img = np.full((4, 4, 3), 100, np.uint8)
    mask = np.zeros((4, 4), bool)
    mask[1, 1] = True
    out = headless.overlay_mask(img, mask, color=(255, 0, 0), alpha=0.5)
    assert out[1, 1, 0] > 150 and out[0, 0, 0] == 100


def test_plot_trajectory(tmp_path):
    T = np.zeros((10, 8))
    T[:, 0] = np.linspace(0, 1, 10)
    T[:, 2] = np.linspace(0, 2, 10)
    headless.plot_trajectory(tmp_path / "traj.png", T)
    assert (tmp_path / "traj.png").stat().st_size > 0


def test_export_scene_html(tmp_path):
    pts = np.random.default_rng(0).standard_normal((100, 3))
    cols = np.random.default_rng(1).uniform(0, 1, (100, 3))
    headless.export_scene_html(tmp_path / "scene.html", pts, cols)
    html = (tmp_path / "scene.html").read_text()
    assert "Float32Array" in html and len(html) > 1000


def test_live_viewer_roundtrip():
    """LiveViewer serves the page and a parseable binary snapshot."""
    import struct
    import urllib.request

    from monst3r_slam_tpu.viz.live import LiveViewer

    v = LiveViewer()
    port = v.start(port=18089)
    assert port is not None
    try:
        rng = np.random.default_rng(0)
        pts = rng.standard_normal((500, 3)).astype(np.float32)
        cols = rng.uniform(0, 1, (500, 3))
        traj = rng.standard_normal((7, 3)).astype(np.float32)
        kfs = rng.standard_normal((3, 3)).astype(np.float32)
        segs = v.frustum_segments(
            np.concatenate(
                [kfs, np.tile([0, 0, 0, 1, 1.0], (3, 1))], axis=1
            ).astype(np.float32)
        )
        assert segs.shape == (24, 2, 3)
        v.update(pts, cols, traj=traj, kf_centers=kfs, kf_segments=segs)

        page = urllib.request.urlopen(f"http://127.0.0.1:{port}/").read().decode()
        assert "state.bin" in page

        blob = urllib.request.urlopen(f"http://127.0.0.1:{port}/state.bin").read()
        seq, n_p, n_t, n_k, n_s, has_surfel, gh, gw = struct.unpack_from(
            "<8I", blob
        )
        assert (seq, n_t, n_k, n_s, has_surfel, gh, gw) == (1, 7, 3, 24, 0, 0, 0)
        assert n_p == 500  # all finite
        off = 32
        got = np.frombuffer(blob, "<f4", n_p * 3, off).reshape(-1, 3)
        np.testing.assert_allclose(got, pts, rtol=1e-6)
        off += n_p * 12 + n_p * 3
        off += (4 - off % 4) % 4
        got_t = np.frombuffer(blob, "<f4", n_t * 3, off).reshape(-1, 3)
        np.testing.assert_allclose(got_t, traj, rtol=1e-6)

        # NaN points are dropped
        pts2 = pts.copy()
        pts2[:10] = np.nan
        v.update(pts2, cols)
        blob2 = urllib.request.urlopen(f"http://127.0.0.1:{port}/state.bin").read()
        assert struct.unpack_from("<8I", blob2)[1] == 490

        # grid (mesh) mode: NaN holes are KEPT (grid order preserved for the
        # trianglemap.glsl-parity mesh renderer) and dims ride in the header
        v.update(pts2, cols, grid=(25, 20))
        blobg = urllib.request.urlopen(f"http://127.0.0.1:{port}/state.bin").read()
        hg = struct.unpack_from("<8I", blobg)
        assert hg[1] == 500 and (hg[6], hg[7]) == (25, 20)
        gotg = np.frombuffer(blobg, "<f4", 500 * 3, 32).reshape(-1, 3)
        np.testing.assert_allclose(gotg, pts2, rtol=1e-6, equal_nan=True)

        # surfel snapshot: normals + radii ride at the tail, flag set
        nrm = rng.standard_normal((500, 3)).astype(np.float32)
        rad = rng.uniform(0.01, 0.1, 500).astype(np.float32)
        v.update(pts, cols, normals=nrm, radii=rad)
        blob3 = urllib.request.urlopen(f"http://127.0.0.1:{port}/state.bin").read()
        h3 = struct.unpack_from("<8I", blob3)
        assert h3[1] == 500 and h3[5] == 1
        got_r = np.frombuffer(blob3, "<f4", 500, len(blob3) - 500 * 4)
        np.testing.assert_allclose(got_r, rad, rtol=1e-6)
        got_n = np.frombuffer(
            blob3, "<f4", 1500, len(blob3) - 500 * 4 - 500 * 12
        ).reshape(-1, 3)
        np.testing.assert_allclose(got_n, nrm, rtol=1e-6)
    finally:
        v.stop()


def test_live_viewer_control_channel_http():
    """POST /control feeds poll_control; /frame.bin serves the mask overlay
    (reference WindowMsg feedback path, visualization.py:33-39,355-361)."""
    import json
    import struct
    import urllib.request

    import numpy as np

    from monst3r_slam_tpu.viz.live import LiveViewer

    v = LiveViewer()
    port = v.start(port=18089)
    assert port is not None
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/control",
            data=json.dumps(
                {"pause": True, "C_conf": 2.5, "step": True, "reloc": True}
            ).encode(),
            method="POST",
        )
        assert urllib.request.urlopen(req, timeout=5).status == 200
        msg = v.poll_control()
        assert msg["pause"] is True and msg["C_conf"] == 2.5
        assert msg["step"] is True and msg["reloc"] is True
        # one-shots clear on read; persistent state stays
        msg2 = v.poll_control()
        assert msg2["step"] is False and msg2["reloc"] is False
        assert msg2["pause"] is True

        img = np.zeros((32, 40, 3), np.uint8)
        mask = np.zeros((32, 40), bool)
        mask[8:16, 8:16] = True
        v.update_frame(img, mask)
        blob = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/frame.bin", timeout=5
        ).read()
        w, h = struct.unpack_from("<2I", blob)
        assert (w, h) == (40, 32)
        rgb = np.frombuffer(blob[8:], np.uint8).reshape(h, w, 3)
        assert rgb[10, 10, 0] > 100 and rgb[10, 10, 2] == 0  # red tint
        assert rgb[0, 0].sum() == 0  # untinted background
    finally:
        v.stop()


def test_pipeline_consumes_viewer_control():
    """reloc / C_conf / terminate controls act on the SLAM loop between
    frames (reference main.py WindowMsg handling)."""
    import jax
    import numpy as np

    from monst3r_slam_tpu.app.config import load_config
    from monst3r_slam_tpu.app.pipeline import SLAMSystem
    from monst3r_slam_tpu.models.config import TINY
    from monst3r_slam_tpu.models.init import init_params
    from monst3r_slam_tpu.slam.frame import Mode
    from monst3r_slam_tpu.viz.live import LiveViewer
    from tests.test_pipeline import H, W, synth_video

    cfg = load_config("config/base.yaml")
    cfg["tracking"]["Q_conf"] = -1e9
    cfg["tracking"]["C_conf"] = -1e9
    cfg["tracking"]["min_match_frac"] = 0.0
    s = SLAMSystem(
        params=init_params(jax.random.PRNGKey(0), TINY),
        model_cfg=TINY, cfg=cfg, img_size=(H, W), kf_capacity=8,
    )
    v = LiveViewer()  # not started; control state works without the server
    s.viewer = v
    frames = synth_video(2)
    s.process_frame(0, 0.0, frames[0])  # INIT -> TRACKING

    # reloc + C_conf consumed between frames
    s.mode = Mode.TRACKING
    v.push_control({"C_conf": 3.25, "reloc": True})
    s._consume_viewer_control()
    assert s.viz_C_conf == 3.25
    assert s.mode == Mode.RELOC  # viewer-requested relocalization
    assert s.idx_f2k is None

    # pause + queued step: returns without blocking (single-step semantics)
    v.push_control({"pause": True, "step": True})
    s._consume_viewer_control()
    assert not s.terminate_requested

    # terminate unblocks a paused loop
    import threading
    import time as time_mod

    def unpause():
        time_mod.sleep(0.2)
        v.push_control({"terminate": True})

    threading.Thread(target=unpause).start()
    s._consume_viewer_control()  # paused (no step queued) until terminate lands
    assert s.terminate_requested

    n_before = len(s.frame_poses)
    s.process_frame(1, 1 / 30.0, frames[1])
    assert len(s.frame_poses) == n_before  # frame not processed after terminate


def test_update_frame_downscales_wide_frames():
    """A 512-wide frame must be strided to <= max_w (ceil division): floor
    division left 512 > 320 frames full-size, tripling viewer bandwidth."""
    import struct

    from monst3r_slam_tpu.viz.live import LiveViewer

    v = LiveViewer()
    img = np.zeros((384, 512, 3), np.uint8)
    v.update_frame(img, max_w=320)
    w, h = struct.unpack_from("<2I", v._frame_blob)
    assert w <= 320 and w == 256 and h == 192
    # narrow frames pass through untouched
    v.update_frame(np.zeros((60, 80, 3), np.uint8), max_w=320)
    w, h = struct.unpack_from("<2I", v._frame_blob)
    assert (w, h) == (80, 60)
