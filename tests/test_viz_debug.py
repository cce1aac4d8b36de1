"""Debug-dump parity utilities (viz/debug.py <- monst3r_utils.py:789-1009)."""

import numpy as np

from monst3r_slam_tpu.viz import debug as dbg


def _scene(h=24, w=32):
    rng = np.random.default_rng(0)
    X = rng.standard_normal((h, w, 3)).astype(np.float32) + [0, 0, 3]
    C = rng.uniform(0.5, 3.0, (h, w)).astype(np.float32)
    mask = np.zeros((h, w), bool)
    mask[8:16, 10:20] = True
    Xm = X.copy()
    Cm = C.copy()
    Cm[mask] = 0.0
    img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    return X, C, Xm, Cm, mask, img


def test_save_mask_overlay(tmp_path):
    *_, mask, img = _scene()
    p = tmp_path / "ov.png"
    dbg.save_mask_overlay(p, img, mask)
    assert p.stat().st_size > 0
    import cv2

    out = cv2.imread(str(p))
    h, w = mask.shape
    assert out.shape == (h, w, 3)
    # masked region pushed toward red (BGR: channel 2)
    assert out[12, 15, 2] > out[12, 15, 0]


def test_save_pointmap_visualization(tmp_path):
    X, C, Xm, Cm, *_ = _scene()
    p1, p2 = dbg.save_pointmap_visualization(X, C, Xm, Cm, 7, tmp_path)
    assert p1.stat().st_size > 0 and p2.stat().st_size > 0
    assert "000007" in p1.name


def test_save_confidence_overlay(tmp_path):
    _, C, _, _, mask, img = _scene()
    p = dbg.save_confidence_overlay(C, mask, img, 3, tmp_path)
    assert p.stat().st_size > 0


def test_save_3d_pointcloud_comparison(tmp_path):
    X, C, Xm, Cm, *_ = _scene()
    p = dbg.save_3d_pointcloud_comparison(X, C, Xm, Cm, 5, tmp_path, max_points=100)
    assert p.stat().st_size > 0
