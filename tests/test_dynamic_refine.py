"""Native SAM2-equivalent mask refinement: hysteresis + GrabCut.

The acceptance criterion (VERDICT item 3): the refined mask must measurably
improve IoU over raw thresholding on a synthetic dynamic scene.
"""

import numpy as np

from monst3r_slam_tpu.dynamic import refine


def _synthetic_scene(seed=0, h=120, w=160):
    """Textured background + a distinctly-colored moving square, with a
    flow-error map that only partially exceeds the hard threshold (the
    realistic failure of raw thresholding: object interiors with moderate
    error dip below it)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            120 + 40 * np.sin(0.2 * xx),
            120 + 40 * np.cos(0.15 * yy),
            120 + 20 * np.sin(0.1 * (xx + yy)),
        ],
        axis=-1,
    ).astype(np.uint8)
    gt = np.zeros((h, w), bool)
    gt[40:90, 60:120] = True
    img[gt] = [220, 40, 40]

    err = rng.uniform(0.0, 0.08, (h, w)).astype(np.float32)
    # object: moderate error everywhere, strong error on a random half
    err[gt] = rng.uniform(0.18, 0.30, gt.sum())
    strong = gt & (rng.uniform(size=(h, w)) < 0.5)
    err[strong] = rng.uniform(0.4, 0.9, strong.sum())
    # spurious background specks above threshold (below min_area)
    for _ in range(4):
        y0, x0 = rng.integers(0, h - 3), rng.integers(0, w - 3)
        err[y0 : y0 + 2, x0 : x0 + 2] = 0.6
    return img, err, gt


def _iou(a, b):
    return (a & b).sum() / max((a | b).sum(), 1)


def test_hysteresis_grows_seeds_into_support():
    err = np.zeros((20, 20), np.float32)
    err[5:10, 5:15] = 0.2  # support band
    err[7, 7] = 0.8  # one seed inside it
    err[15:18, 2:5] = 0.2  # support with NO seed -> must stay off
    m = refine.hysteresis_mask(err, high=0.35, low=0.15)
    assert m[5:10, 5:15].all()
    assert not m[15:18, 2:5].any()


def test_hysteresis_empty_when_no_seed():
    err = np.full((8, 8), 0.2, np.float32)
    assert not refine.hysteresis_mask(err, 0.35, 0.15).any()


def test_grabcut_degenerate_inputs_pass_through():
    img = np.zeros((16, 16, 3), np.uint8)
    empty = np.zeros((16, 16), bool)
    full = np.ones((16, 16), bool)
    assert not refine.grabcut_refine(img, empty).any()
    assert refine.grabcut_refine(img, full).all()


def test_refinement_improves_iou_over_raw_threshold():
    img, err, gt = _synthetic_scene()
    raw = err > 0.35
    iou_raw = _iou(raw, gt)
    refined = refine.refine_dynamic_mask(img, err, raw, threshold=0.35)
    iou_ref = _iou(refined, gt)
    # raw thresholding sees ~half the object; refinement must recover it
    assert iou_raw < 0.7
    assert iou_ref > iou_raw + 0.15
    assert iou_ref > 0.85


def test_refinement_culls_small_specks():
    img, err, gt = _synthetic_scene(seed=1)
    raw = err > 0.35
    refined = refine.refine_dynamic_mask(img, err, raw, threshold=0.35, min_area=20)
    # all spurious 2x2 speck regions (area 4 < 20) removed
    from scipy import ndimage

    labeled, n = ndimage.label(refined & ~gt)
    for idx in range(1, n + 1):
        region = labeled == idx
        # any surviving false-positive region must border the object
        # (GrabCut boundary slack), not be an isolated speck
        dil = ndimage.binary_dilation(gt, iterations=3)
        assert (region & dil).any(), "isolated speck survived refinement"


def test_get_dynamic_mask_refine_gate_runs_native_refiner():
    """refine=True with no external refiner installed must run the native
    hysteresis+GrabCut path (the refine_dynamic_mask_with_sam2 gate)."""
    import jax.numpy as jnp

    from monst3r_slam_tpu.core import lie
    from monst3r_slam_tpu.dynamic import mask as dyn

    img, err, gt = _synthetic_scene()
    h, w = gt.shape

    # flow estimator returning (measured - ego) = err along x so the internal
    # min-max normalized error map reproduces `err` up to scaling
    dyn.set_flow_estimator(lambda a, b: np.stack([err, np.zeros_like(err)], -1))
    try:
        K = jnp.asarray([[100.0, 0, w / 2], [0, 100.0, h / 2], [0, 0, 1]])
        T = lie.sim3_identity()
        depth = jnp.ones((h, w))
        m_raw = dyn.get_dynamic_mask(img, img, T, T, depth, K, refine=False)
        m_ref = dyn.get_dynamic_mask(img, img, T, T, depth, K, refine=True)
    finally:
        dyn.set_flow_estimator(None)
    assert _iou(m_ref, gt) > _iou(m_raw, gt)


def test_temporal_propagation_stabilizes_flicker():
    """A moving object whose flow error intermittently dips below threshold:
    per-frame refinement loses it on weak frames (IoU -> 0); the temporal
    propagator (flow-warp carry, reference SAM2-video semantics
    monst3r_utils.py:640-703) keeps IoU high on every frame."""
    from monst3r_slam_tpu.dynamic.refine import (
        TemporalMaskPropagator,
        refine_dynamic_mask,
    )

    h, w = 60, 80
    thr = 0.35

    def gt_mask(k):
        m = np.zeros((h, w), bool)
        x0 = 5 + 3 * k
        m[20:36, x0 : x0 + 16] = True
        return m

    def err_map(k, weak):
        e = np.full((h, w), 0.05, np.float32)
        e[gt_mask(k)] = 0.25 if weak else 0.8  # weak: below thr, above carry bar
        return e

    def flow_fn(a, b):  # object moves +3 px/frame in x
        return np.broadcast_to(
            np.asarray([3.0, 0.0], np.float32), (h, w, 2)
        ).copy()

    img = np.zeros((h, w, 3), np.uint8)
    prop = TemporalMaskPropagator()
    ious_per, ious_tmp = [], []
    for k in range(12):
        weak = k % 3 == 2
        e = err_map(k, weak)
        raw = e > thr
        per = refine_dynamic_mask(img, e, raw, threshold=thr, use_grabcut=False)
        tmp = prop(img, e, raw, thr, 20, flow_fn=flow_fn, use_grabcut=False)
        gt = gt_mask(k)

        def iou(m):
            return (m & gt).sum() / max((m | gt).sum(), 1)

        ious_per.append(iou(per))
        ious_tmp.append(iou(tmp))

    assert min(ious_per) == 0.0  # per-frame refinement flickers out
    assert min(ious_tmp) > 0.6  # temporal carry holds the object every frame
    assert max(ious_tmp) > 0.9


def test_temporal_propagation_drops_stopped_objects():
    """An object that stops producing flow-error evidence is dropped after
    max_coast frames (SAM2-equivalent per-frame re-scoring)."""
    from monst3r_slam_tpu.dynamic.refine import TemporalMaskPropagator

    h, w = 40, 50
    thr = 0.35
    gt = np.zeros((h, w), bool)
    gt[10:26, 10:26] = True
    img = np.zeros((h, w, 3), np.uint8)

    def flow_fn(a, b):
        return np.zeros((h, w, 2), np.float32)

    prop = TemporalMaskPropagator(max_coast=2)
    e_hot = np.where(gt, 0.8, 0.05).astype(np.float32)
    e_cold = np.full((h, w), 0.2, np.float32)  # above carry bar, no fresh seeds
    m = prop(img, e_hot, e_hot > thr, thr, 20, flow_fn=flow_fn, use_grabcut=False)
    assert m.any()
    coast = []
    for _ in range(4):
        m = prop(img, e_cold, e_cold > thr, thr, 20, flow_fn=flow_fn, use_grabcut=False)
        coast.append(m.any())
    assert coast[0] and coast[1]  # coasts through max_coast frames
    assert not coast[2] and not coast[3]  # then returns to static


def test_get_dynamic_mask_overlap_cb_exactly_once():
    """`overlap_cb` must run exactly once per get_dynamic_mask call in every
    backend path (the dual pipeline dispatches its MASt3R decode from it and
    reads the result unconditionally afterwards, app/pipeline.py)."""
    import jax.numpy as jnp

    from monst3r_slam_tpu.core import lie
    from monst3r_slam_tpu.dynamic import mask as dyn

    img, err, _ = _synthetic_scene()
    h, w = err.shape
    K = jnp.asarray([[100.0, 0, w / 2], [0, 100.0, h / 2], [0, 0, 1]])
    T = lie.sim3_identity()
    depth = jnp.ones((h, w))
    calls = []

    def run():
        calls.clear()
        m = dyn.get_dynamic_mask(
            img, img, T, T, depth, K, refine=True,
            overlap_cb=lambda: calls.append(1),
        )
        assert len(calls) == 1
        return m

    # path 1: host-flow fallback (no program installed)
    dyn.set_flow_estimator(
        lambda a, b: np.stack([err, np.zeros_like(err)], -1)
    )
    try:
        m_fallback = run()
    finally:
        dyn.set_flow_estimator(None)

    # path 2: installed fused program WITHOUT overlap_cb support
    dyn.set_flow_error_program(lambda ii, jj, Ti, Tj, d, Km: err)
    try:
        m_legacy = run()
    finally:
        dyn.set_flow_error_program(None)

    # path 3: installed fused program WITH overlap_cb support must receive
    # and invoke the callback itself (mid-call, after dispatch)
    def prog_with_cb(ii, jj, Ti, Tj, d, Km, overlap_cb=None):
        assert overlap_cb is not None
        overlap_cb()
        return err

    dyn.set_flow_error_program(prog_with_cb)
    try:
        m_cb = run()
    finally:
        dyn.set_flow_error_program(None)

    # identical error maps -> identical masks across paths
    np.testing.assert_array_equal(m_legacy, m_cb)

    # path 4: K=None early-out still runs the callback
    calls.clear()
    m_nok = dyn.get_dynamic_mask(
        img, img, T, T, depth, None, refine=True,
        overlap_cb=lambda: calls.append(1),
    )
    assert len(calls) == 1 and not m_nok.any()
