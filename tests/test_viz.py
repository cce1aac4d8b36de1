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
