"""Tests for the dynamic-object masking pipeline."""

import jax.numpy as jnp
import numpy as np

from monst3r_slam_tpu.core import lie
from monst3r_slam_tpu.dynamic import mask as dyn


def test_ego_motion_flow_static_camera_is_zero():
    h, w = 24, 32
    K = jnp.asarray([[30.0, 0, 16.0], [0, 30.0, 12.0], [0, 0, 1.0]])
    depth = jnp.full((h, w), 2.0)
    T = lie.sim3_identity()
    flow = dyn.ego_motion_flow(T, T, depth, K)
    np.testing.assert_allclose(np.asarray(flow), 0.0, atol=1e-4)


def test_ego_motion_flow_translation_direction():
    """Camera translating +x: image content appears to move -x (flow < 0)."""
    h, w = 24, 32
    K = jnp.asarray([[30.0, 0, 16.0], [0, 30.0, 12.0], [0, 0, 1.0]])
    depth = jnp.full((h, w), 2.0)
    T_i = lie.sim3_identity()
    T_j = jnp.asarray([0.1, 0, 0, 0, 0, 0, 1, 1.0])  # camera j 0.1m to the +x
    flow = dyn.ego_motion_flow(T_i, T_j, depth, K)
    assert float(jnp.mean(flow[..., 0])) < -0.5
    np.testing.assert_allclose(np.asarray(flow[..., 1]), 0.0, atol=1e-3)
    # Magnitude: fx * tx / z = 30 * 0.1 / 2 = 1.5 px
    np.testing.assert_allclose(np.asarray(flow[..., 0]), -1.5, atol=1e-3)


def test_flow_error_mask_isolates_moving_region():
    h, w = 24, 32
    ego = jnp.zeros((h, w, 2))
    flow = jnp.zeros((h, w, 2))
    flow = flow.at[8:14, 10:18, 0].set(5.0)  # moving object
    m = dyn.flow_error_mask(flow, ego, threshold=0.35)
    m = np.asarray(m)
    assert m[10, 12]
    assert not m[0, 0]
    assert m.sum() == 6 * 8


def test_connected_components_centroids():
    m = np.zeros((30, 40), bool)
    m[2:8, 3:10] = True  # area 42
    m[20:22, 30:32] = True  # area 4 < min_area
    pts = dyn.connected_component_centroids(m, min_area=20)
    assert len(pts) == 1
    x, y = pts[0]
    assert 5 <= x <= 7 and 4 <= y <= 5


def test_apply_dynamic_mask():
    hw = 10
    X = jnp.ones((hw, 3))
    C = jnp.full((hw, 1), 2.0)
    D = jnp.ones((hw, 4))
    Q = jnp.full((hw, 1), 3.0)
    mask = jnp.zeros((hw,), bool).at[3].set(True)
    X2, C2, D2, Q2 = dyn.apply_dynamic_mask_to_pointmaps(X, C, D, Q, mask)
    np.testing.assert_allclose(X2, X)
    assert float(C2[3, 0]) == 0.0 and float(C2[0, 0]) == 2.0
    assert float(Q2[3, 0]) == 0.0
    assert float(D2[3, 0]) == 0.0 and float(D2[0, 0]) == 1.0


def test_compute_flow_shift():
    """DIS flow recovers a synthetic integer shift (approximately)."""
    rng = np.random.default_rng(0)
    base = (rng.uniform(0, 255, (64, 96)) ).astype(np.float32)
    import cv2

    base = cv2.GaussianBlur(base, (0, 0), 2.0)
    img_i = np.stack([base] * 3, axis=-1).astype(np.uint8)
    img_j = np.roll(img_i, shift=3, axis=1)  # content moves +x by 3
    flow = dyn.compute_flow(img_i, img_j)
    inner = flow[16:-16, 16:-16, 0]
    assert abs(np.median(inner) - 3.0) < 1.0
