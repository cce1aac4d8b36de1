"""Dataset loader tests on synthetic on-disk datasets."""

import numpy as np
import pytest

from monst3r_slam_tpu.app.config import load_config, config
from monst3r_slam_tpu.data import datasets
from monst3r_slam_tpu.data.preprocess import resize_img


@pytest.fixture(autouse=True)
def base_cfg():
    load_config("config/base.yaml")


def _write_img(path, h=48, w=64, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    cv2.imwrite(str(path), img)
    return img


def make_tum(tmp_path, n=3):
    d = tmp_path / "tum" / "rgbd_dataset_freiburg1_test"
    (d / "rgb").mkdir(parents=True)
    lines = []
    for i in range(n):
        ts = 1305031790.0 + i * 0.033
        _write_img(d / "rgb" / f"{ts:.6f}.png", seed=i)
        lines.append(f"{ts:.6f} rgb/{ts:.6f}.png")
    (d / "rgb.txt").write_text("\n".join(lines) + "\n")
    return d


def test_tum_dataset(tmp_path):
    d = make_tum(tmp_path)
    ds = datasets.load_dataset(str(d))
    assert isinstance(ds, datasets.TUMDataset)
    assert len(ds) == 3
    ts, img = ds[0]
    assert float(ts) > 1e9
    assert img.shape == (48, 64, 3) and img.dtype == np.float32
    assert img.max() <= 1.0
    # subsample
    ds.subsample(2)
    assert len(ds) == 2


def test_tum_calibration_when_enabled(tmp_path):
    d = make_tum(tmp_path)
    config["use_calib"] = True
    ds = datasets.TUMDataset(str(d))
    assert ds.camera_intrinsics is not None
    K = ds.camera_intrinsics.K_frame
    assert K.shape == (3, 3) and K[0, 0] > 0
    config["use_calib"] = False


def test_rgb_files_dataset(tmp_path):
    d = tmp_path / "mydir"
    d.mkdir()
    for i in [2, 10, 1]:  # natural sort check
        _write_img(d / f"frame{i}.png", seed=i)
    ds = datasets.load_dataset(str(d))
    assert isinstance(ds, datasets.RGBFiles)
    names = [p.name for p in ds.rgb_files]
    assert names == ["frame1.png", "frame2.png", "frame10.png"]


def test_resize_img_semantics():
    img = np.random.default_rng(0).uniform(0, 1, (480, 640, 3)).astype(np.float32)
    out = resize_img(img, 512)
    h, w = out["img"].shape[1:3]
    assert w == 512 and h % 16 == 0 and h == 384
    # Normalization: (x - 0.5) / 0.5 range
    assert out["img"].min() >= -1.0 and out["img"].max() <= 1.0
    assert out["unnormalized_img"].dtype == np.uint8
    np.testing.assert_array_equal(out["true_shape"], [[384, 512]])

    # Transformation info maps original intrinsics to frame intrinsics
    out2, (sw, sh, cw, ch) = resize_img(img, 512, return_transformation=True)
    assert abs(sw - 640 / 512) < 1e-6


def test_matcher_mode_dispatch():
    from monst3r_slam_tpu.app.pipeline import make_matcher

    cfg = {"matching": {"mode": "lm"}}
    fn_lm = make_matcher(cfg)
    cfg = {"matching": {}}
    fn_tiled = make_matcher(cfg)

    import jax, jax.numpy as jnp
    from tests.test_matching import make_smooth_pointmap

    X = make_smooth_pointmap(jax.random.PRNGKey(0), 32, 48)
    D = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 48, 8))
    D = D / jnp.linalg.norm(D, axis=-1, keepdims=True)
    for fn in (fn_lm, fn_tiled):
        idx, valid = fn(X, X, D, D)
        assert idx.shape == (1, 32 * 48)
        assert valid.shape == (1, 32 * 48, 1)


def test_convert_groundtruth_euroc_and_7scenes(tmp_path):
    """scripts/convert_groundtruth.py derives the TUM-format files the
    reference vendors under groundtruths/ from the raw dataset layouts."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "convert_groundtruth",
        pathlib.Path(__file__).parent.parent / "scripts" / "convert_groundtruth.py",
    )
    cg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cg)

    # EuRoC: data.csv with ns timestamps and wxyz quaternions
    seq = tmp_path / "MH_01_easy"
    gtd = seq / "mav0" / "state_groundtruth_estimate0"
    gtd.mkdir(parents=True)
    (gtd / "data.csv").write_text(
        "#ts,px,py,pz,qw,qx,qy,qz,...\n"
        "1403636579758555392,4.68,-1.78,0.78,0.53,-0.15,-0.83,-0.08\n"
        "1403636579763555328,4.69,-1.77,0.79,0.53,-0.15,-0.83,-0.08\n"
    )
    out = cg.convert_euroc(seq)
    assert out.shape == (2, 8)
    np.testing.assert_allclose(out[0, 0], 1403636579.758555392, rtol=1e-12)
    np.testing.assert_allclose(out[0, 1:4], [4.68, -1.78, 0.78])
    np.testing.assert_allclose(out[0, 4:8], [-0.15, -0.83, -0.08, 0.53])

    # 7-Scenes: 4x4 camera-to-world pose files, frame-index timestamps
    scene = tmp_path / "chess"
    (scene / "seq-01").mkdir(parents=True)
    R = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    M = np.eye(4)
    M[:3, :3] = R
    M[:3, 3] = [1.0, 2.0, 3.0]
    np.savetxt(scene / "seq-01" / "frame-000000.pose.txt", M)
    np.savetxt(scene / "seq-01" / "frame-000001.pose.txt", np.eye(4))
    out = cg.convert_7scenes(scene)
    assert out.shape == (2, 8)
    assert out[0, 0] == 0 and out[1, 0] == 1
    np.testing.assert_allclose(out[0, 1:4], [1.0, 2.0, 3.0])
    # 90-degree z rotation -> q = (0, 0, sin(45), cos(45))
    np.testing.assert_allclose(
        out[0, 4:8], [0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4)], atol=1e-12
    )
    # quaternion round-trips through the repo's own Lie core
    from monst3r_slam_tpu.core import lie
    import jax.numpy as jnp

    T = jnp.concatenate([jnp.asarray(out[0, 1:4]), jnp.asarray(out[0, 4:8]),
                         jnp.ones((1,))])
    R_rt = np.asarray(lie.sim3_matrix(T))[:3, :3]
    np.testing.assert_allclose(R_rt, R, atol=1e-7)
