"""Native dynamic-mask refinement (the SAM2-equivalent stage).

The reference refines its raw flow-error mask with a SAM2 video predictor
seeded by connected-component centroids (`monst3r_utils.py:640-703`, gated by
`refine_dynamic_mask_with_sam2`, on by default in `config/base.yaml:5`). SAM2
weights are ~900 MB of torch checkpoints that cannot be assumed present, so
this module provides a native two-stage refiner with the same role — turn a
noisy per-pixel threshold mask into coherent object masks:

  1. **Hysteresis growth on the flow-error map**: pixels above the high
     threshold seed regions that expand into any connected pixel above a lower
     threshold (classic Canny-style hysteresis). Recovers object interiors
     whose flow error dips below the hard threshold.
  2. **GrabCut color refinement** (host, OpenCV): the grown mask initializes a
     GrabCut trimap (eroded core = certain-foreground, dilated ring =
     probable, far field = certain-background); GMM color models then snap the
     mask to object boundaries in the image — the same role SAM2's image
     encoder plays in the reference.

Both stages run on the host on one frame's small (h, w) arrays; device compute
is untouched. Real SAM2 can still be plugged in through
`dynamic.mask.set_mask_refiner` — this is the default implementation behind
the same config gate.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def hysteresis_mask(
    err_norm: np.ndarray,
    high: float = 0.35,
    low: float = 0.15,
) -> np.ndarray:
    """Grow seeds (err > high) into connected support (err > low).

    err_norm: (h, w) min-max-normalized flow error (mask.flow_error_mask's
    pre-threshold map). Returns bool (h, w).
    """
    from scipy import ndimage

    seeds = err_norm > high
    support = err_norm > low
    if not seeds.any():
        return seeds
    labeled, n = ndimage.label(support)
    keep = np.unique(labeled[seeds])
    keep = keep[keep > 0]
    return np.isin(labeled, keep)


def grabcut_refine(
    img_u8: np.ndarray,
    mask: np.ndarray,
    iters: int = 3,
    margin: int = 7,
    scale: int = 3,
) -> np.ndarray:
    """Snap a coarse object mask to image boundaries with GrabCut GMMs.

    Trimap: eroded mask = GC_FGD, mask = GC_PR_FGD, dilated ring = GC_PR_BGD,
    rest = GC_BGD. Returns bool (h, w); falls back to the input mask when
    GrabCut cannot run (degenerate trimaps, tiny masks).

    `scale` > 1 runs the GMM fit/cut at (h/scale, w/scale) and upsamples the
    resulting mask: GrabCut cost is linear in pixel count and the color
    models it fits are resolution-independent; only the final boundary snap
    loses sub-`scale`-px precision. Measured at 384x512 (10 synthetic
    scenes): scale=2 -> 0.983 IoU / 46 ms, scale=3 -> 0.968 / 25 ms,
    scale=4 -> 0.951 / 16 ms. Default 3 balances the dynamic-mask noise
    floor against the monster pipeline's frame budget.
    """
    import cv2

    mask = np.asarray(mask, bool)
    if not mask.any() or mask.all():
        return mask
    if scale > 1:
        h, w = mask.shape
        hs, ws = max(h // scale, 8), max(w // scale, 8)
        img_s = cv2.resize(
            np.ascontiguousarray(img_u8[..., :3]), (ws, hs),
            interpolation=cv2.INTER_AREA,
        )
        mask_s = cv2.resize(
            mask.astype(np.uint8), (ws, hs), interpolation=cv2.INTER_NEAREST
        ).astype(bool)
        if not mask_s.any() or mask_s.all():
            # thin masks can vanish under nearest-neighbor decimation; keep
            # the documented input-mask fallback instead of returning empty
            return mask
        out_s = grabcut_refine(
            img_s, mask_s, iters=iters, margin=max(margin // scale, 2), scale=1
        )
        return cv2.resize(
            out_s.astype(np.uint8), (w, h), interpolation=cv2.INTER_NEAREST
        ).astype(bool)
    kernel = np.ones((3, 3), np.uint8)
    m8 = mask.astype(np.uint8)
    core = cv2.erode(m8, kernel, iterations=2).astype(bool)
    ring = cv2.dilate(m8, kernel, iterations=margin).astype(bool)

    gc = np.full(mask.shape, cv2.GC_BGD, np.uint8)
    gc[ring] = cv2.GC_PR_BGD
    gc[mask] = cv2.GC_PR_FGD
    gc[core] = cv2.GC_FGD
    # GrabCut needs both FG and BG evidence to fit its GMMs
    if not (gc == cv2.GC_BGD).any() or not (core.any() or mask.any()):
        return mask
    bgd = np.zeros((1, 65), np.float64)
    fgd = np.zeros((1, 65), np.float64)
    try:
        cv2.grabCut(
            np.ascontiguousarray(img_u8[..., :3]), gc, None, bgd, fgd,
            iters, cv2.GC_INIT_WITH_MASK,
        )
    except cv2.error:
        return mask
    return (gc == cv2.GC_FGD) | (gc == cv2.GC_PR_FGD)


def refine_dynamic_mask(
    img_u8: np.ndarray,
    err_norm: np.ndarray,
    raw_mask: np.ndarray,
    threshold: float = 0.35,
    low_ratio: float = 0.45,
    min_area: int = 20,
    use_grabcut: bool = True,
) -> np.ndarray:
    """Full refinement: hysteresis growth -> small-region cull -> GrabCut.

    Mirrors the reference's SAM2 stage contract (monst3r_utils.py:640-703):
    takes the raw thresholded mask, returns a refined mask covering whole
    moving objects. `raw_mask` pixels are always kept as seeds even if the
    normalized error map was re-derived.
    """
    from scipy import ndimage

    grown = hysteresis_mask(err_norm, threshold, threshold * low_ratio)
    grown |= np.asarray(raw_mask, bool)

    # Cull specks below min_area (reference skips CCs < 20 px, :651-661)
    labeled, n = ndimage.label(grown)
    if n:
        sizes = np.bincount(labeled.ravel())
        small = sizes < min_area
        small[0] = False
        grown[small[labeled]] = False

    if use_grabcut and grown.any():
        grown = grabcut_refine(img_u8, grown)
    return grown


def make_native_refiner(use_grabcut: bool = True, low_ratio: float = 0.45):
    """Build a refiner for dynamic.mask.set_mask_refiner with signature
    fn(img_u8, err_norm, raw_mask, threshold, min_area) -> bool mask."""

    def refiner(img_u8, err_norm, raw_mask, threshold, min_area):
        return refine_dynamic_mask(
            img_u8, err_norm, raw_mask,
            threshold=threshold, low_ratio=low_ratio,
            min_area=min_area, use_grabcut=use_grabcut,
        )

    return refiner


# ---------------------------------------------------------------------------
# Temporal mask propagation (the SAM2 *video* predictor's actual trick)
# ---------------------------------------------------------------------------


def forward_warp_mask(mask: np.ndarray, flow: np.ndarray) -> np.ndarray:
    """Splat a bool mask (h, w) forward along flow (h, w, 2) into the next
    frame; morphological closing fills splat holes. Host-side, tiny arrays."""
    from scipy import ndimage

    h, w = mask.shape
    ys, xs = np.nonzero(mask)
    if ys.size == 0:
        return np.zeros_like(mask)
    u = flow[ys, xs, 0]
    v = flow[ys, xs, 1]
    xn = np.clip(np.rint(xs + u).astype(np.int64), 0, w - 1)
    yn = np.clip(np.rint(ys + v).astype(np.int64), 0, h - 1)
    out = np.zeros((h, w), bool)
    out[yn, xn] = True
    return ndimage.binary_closing(out, structure=np.ones((3, 3), bool))


class TemporalMaskPropagator:
    """Carry each frame's refined dynamic mask into the next frame.

    The reference seeds a SAM2 *video* predictor and propagates object masks
    through time (`monst3r_utils.py:640-703`, `build_sam2_video_predictor`
    :785); per-frame thresholding alone flickers whenever an object's flow
    error momentarily dips below threshold. This native equivalent:

      1. flow-warps the previous refined mask into the current frame
         (`forward_warp_mask`),
      2. lowers the evidence bar on carried pixels: a warped-mask pixel stays
         dynamic if its current flow error clears `carry_ratio * threshold`
         (temporal hysteresis), and
      3. feeds the union (fresh raw mask | carried support) through the
         per-frame refiner (hysteresis growth + GrabCut).

    A mask that finds no fresh above-threshold evidence at all for
    `max_coast` consecutive frames is dropped — objects that stop moving
    return to the static set, as with SAM2's per-frame re-scoring.
    """

    def __init__(self, carry_ratio: float = 0.5, max_coast: int = 2):
        self.carry_ratio = carry_ratio
        self.max_coast = max_coast
        self.prev_mask: Optional[np.ndarray] = None
        self.prev_img: Optional[np.ndarray] = None
        self._coast = 0

    def reset(self):
        self.prev_mask = None
        self.prev_img = None
        self._coast = 0

    def __call__(
        self,
        img_u8: np.ndarray,
        err_norm: np.ndarray,
        raw_mask: np.ndarray,
        threshold: float,
        min_area: int,
        flow_fn=None,
        use_grabcut: bool = True,
    ) -> np.ndarray:
        carried = None
        if self.prev_mask is not None and self.prev_mask.any():
            if flow_fn is None:
                from monst3r_slam_tpu.dynamic.mask import compute_flow as flow_fn
            flow = np.asarray(flow_fn(self.prev_img, img_u8), np.float32)
            warped = forward_warp_mask(self.prev_mask, flow)
            carried = warped & (err_norm > self.carry_ratio * threshold)

        seeds = np.asarray(raw_mask, bool)
        if carried is not None:
            seeds = seeds | carried
        # Per-frame refinement of the seeded mask: the globally-installed
        # refiner when one exists (e.g. the SAM2 port, dynamic/sam2.py —
        # matching the reference where SAM2 *is* the video propagator,
        # monst3r_utils.py:640-703), else the native hysteresis+GrabCut.
        from monst3r_slam_tpu.dynamic import mask as _mask_mod

        base = _mask_mod._mask_refiner
        # never call back into ourselves: the installed refiner may be this
        # propagator itself OR its as_refiner() closure (tagged below)
        if (
            base is not None
            and base is not self
            and getattr(base, "_temporal_propagator", None) is not self
        ):
            refined = np.asarray(
                base(img_u8, err_norm, seeds, threshold, min_area), bool
            )
        else:
            refined = refine_dynamic_mask(
                img_u8, err_norm, seeds,
                threshold=threshold, min_area=min_area, use_grabcut=use_grabcut,
            )
        if carried is not None and refined.any():
            refined |= carried  # carried support survives even if GrabCut trims it

        # Coast bookkeeping: no fresh evidence for max_coast frames -> drop
        if np.asarray(raw_mask, bool).any():
            self._coast = 0
        else:
            self._coast += 1
            if self._coast > self.max_coast:
                refined = np.zeros_like(refined)
        self.prev_mask = refined.copy()
        self.prev_img = np.asarray(img_u8).copy()
        return refined

    def as_refiner(self, flow_fn=None, use_grabcut: bool = True):
        """Adapter for dynamic.mask.set_mask_refiner / get_dynamic_mask."""

        def refiner(img_u8, err_norm, raw_mask, threshold, min_area):
            return self(
                img_u8, err_norm, raw_mask, threshold, min_area,
                flow_fn=flow_fn, use_grabcut=use_grabcut,
            )

        # tag so __call__ can recognize its own adapter if it is installed
        # globally via set_mask_refiner (would otherwise recurse forever)
        refiner._temporal_propagator = self
        return refiner
