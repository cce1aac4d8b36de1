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
        seq, n_p, n_t, n_k, n_s = struct.unpack_from("<5I", blob)
        assert (seq, n_t, n_k, n_s) == (1, 7, 3, 24)
        assert n_p == 500  # all finite
        off = 20
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
        assert struct.unpack_from("<5I", blob2)[1] == 490
    finally:
        v.stop()
