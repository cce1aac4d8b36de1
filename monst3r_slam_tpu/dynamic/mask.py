"""Dynamic-object masking: optical flow vs ego-motion flow.

Reimplements the reference `get_dynamic_mask` (`monst3r_utils.py:512-704`):
compare dense optical flow between consecutive frames against the flow
induced purely by camera ego-motion (MonST3R mono depth + relative Sim(3)
pose through the pinhole model — the `DepthBasedWarping` equivalent), min-max
normalize the error map, threshold at `dynamic_mask_threshold` (0.35), and
optionally refine with per-region prompts.

Flow backend: the reference uses RAFT with the
`Tartan-C-T-TSKH-spring540x960-M.pth` checkpoint (`tracker2.py:35-38`), whose
weights and vendored code are absent from this snapshot (the thirdparty
submodule is empty, SURVEY.md §0). `compute_flow` therefore dispatches to a
pluggable estimator; the default is OpenCV DIS optical flow on the host
(dense, real-time) with the same downstream mask math. A JAX RAFT port can be
slotted in via `set_flow_estimator`.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from monst3r_slam_tpu.core import lie


def ego_motion_flow(
    T_WCi: jax.Array,
    T_WCj: jax.Array,
    depth_i: jax.Array,  # (h, w)
    K: jax.Array,  # (3, 3)
) -> jax.Array:
    """Flow (h, w, 2) from frame i to j induced by camera motion alone.

    p_j = K (R_ji (d * K^-1 p_i) + t_ji);  flow = p_j - p_i
    (DepthBasedWarping semantics at monst3r_utils.py:605-610, with the Sim3
    relative pose reduced to its 4x4 matrix action).
    """
    h, w = depth_i.shape
    T_ji = lie.sim3_rel(T_WCj, T_WCi)  # j <- i
    M = lie.sim3_matrix(T_ji)  # (4, 4); rotation block includes scale
    R = M[:3, :3]
    t = M[:3, 3]

    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    x = (u - cx) / fx
    y = (v - cy) / fy
    rays = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)  # (h, w, 3)
    P_i = depth_i[..., None] * rays
    P_j = P_i @ R.T + t
    z = jnp.maximum(P_j[..., 2], 1e-6)
    u_j = fx * P_j[..., 0] / z + cx
    v_j = fy * P_j[..., 1] / z + cy
    return jnp.stack([u_j - u, v_j - v], axis=-1)


def flow_error_map(flow: jax.Array, ego_flow: jax.Array) -> jax.Array:
    """Min-max-normalized flow-error map (monst3r_utils.py:627-632)."""
    err = jnp.linalg.norm(flow - ego_flow, axis=-1)
    lo = jnp.min(err)
    hi = jnp.max(err)
    return jnp.where(hi > lo, (err - lo) / (hi - lo), jnp.zeros_like(err))


def flow_error_mask(
    flow: jax.Array,  # (h, w, 2) measured optical flow
    ego_flow: jax.Array,  # (h, w, 2)
    threshold: float = 0.35,
) -> jax.Array:
    """Normalized flow-error map thresholded to a boolean mask
    (monst3r_utils.py:627-637)."""
    return flow_error_map(flow, ego_flow) > threshold


# ---------------------------------------------------------------------------
# Flow estimation backend (host)
# ---------------------------------------------------------------------------

_flow_estimator: Optional[Callable] = None


def set_flow_estimator(fn: Callable[[np.ndarray, np.ndarray], np.ndarray]):
    """Install a custom flow backend: fn(img_i, img_j) -> (h, w, 2) float32.
    Images are HWC uint8 RGB."""
    global _flow_estimator
    _flow_estimator = fn


def compute_flow(img_i: np.ndarray, img_j: np.ndarray) -> np.ndarray:
    """Dense optical flow i -> j. Defaults to OpenCV DIS (see module doc)."""
    if _flow_estimator is not None:
        return np.asarray(_flow_estimator(img_i, img_j), np.float32)
    import cv2

    g_i = cv2.cvtColor(img_i, cv2.COLOR_RGB2GRAY)
    g_j = cv2.cvtColor(img_j, cv2.COLOR_RGB2GRAY)
    dis = cv2.DISOpticalFlow_create(cv2.DISOPTICAL_FLOW_PRESET_MEDIUM)
    return np.asarray(dis.calc(g_i, g_j, None), np.float32)


# (fn, takes_overlap_cb) as ONE tuple so a reader racing a program swap
# always sees a consistent pair (never passes overlap_cb= to a program
# that does not accept it).
_flow_error_program: Tuple[Optional[Callable], bool] = (None, False)


def set_flow_error_program(fn: Optional[Callable], takes_overlap_cb=None):
    """Install a FUSED device program for the flow-error map with signature
    fn(img_i_u8, img_j_u8, T_WCi, T_WCj, depth_i, K) -> err_norm (h, w) np.

    The split path (compute_flow -> ego_motion_flow -> flow_error_map) costs
    one device dispatch + host transfer per stage (~120 ms of pure dispatch
    latency on a remote-relay TPU); one jitted program that takes both images
    and returns only the error map pays one dispatch and moves one (h, w)
    array. raft.make_fused_flow_error_program builds the RAFT-backed one.

    Programs may additionally accept an `overlap_cb` keyword: a zero-arg
    callable they must invoke AFTER dispatching the flow program but BEFORE
    blocking on its result, so the caller can enqueue independent device work
    (the dual pipeline's MASt3R decode) that executes while the host consumes
    the error map. Support is auto-detected from the signature (an explicit
    `overlap_cb` parameter OR a **kwargs catch-all counts — wrappers that
    forward kwargs keep the overlap); pass `takes_overlap_cb` explicitly to
    override detection for callables whose signature cannot be inspected.
    """
    global _flow_error_program
    takes_cb = bool(takes_overlap_cb)
    if fn is not None and takes_overlap_cb is None:
        import inspect

        try:
            params = inspect.signature(fn).parameters
            takes_cb = "overlap_cb" in params or any(
                p.kind is inspect.Parameter.VAR_KEYWORD
                for p in params.values()
            )
        except (TypeError, ValueError):
            takes_cb = False
    _flow_error_program = (fn, takes_cb)


# ---------------------------------------------------------------------------
# Region prompts / refinement hooks
# ---------------------------------------------------------------------------


def connected_component_centroids(
    mask: np.ndarray, min_area: int = 20
) -> List[Tuple[int, int]]:
    """(x, y) centroids of connected regions >= min_area px
    (monst3r_utils.py:651-661, skimage -> scipy.ndimage)."""
    from scipy import ndimage

    labeled, n = ndimage.label(np.asarray(mask, bool))
    out = []
    for idx in range(1, n + 1):
        ys, xs = np.nonzero(labeled == idx)
        if ys.size >= min_area:
            out.append((int(xs.mean()), int(ys.mean())))
    return out


_mask_refiner: Optional[Callable] = None


def set_mask_refiner(fn: Callable):
    """Install a segmentation-based refiner with signature
    fn(img_u8, err_norm, raw_mask, threshold, min_area) -> bool mask (h, w).

    The reference uses a SAM2 video predictor here (monst3r_utils.py:640-703,
    gated by `refine_dynamic_mask_with_sam2`, on by default). When refinement
    is requested and no refiner was installed, the native
    hysteresis+GrabCut refiner (dynamic/refine.py) is used."""
    global _mask_refiner
    _mask_refiner = fn


def get_dynamic_mask(
    img_i_u8: np.ndarray,
    img_j_u8: np.ndarray,
    T_WCi,
    T_WCj,
    depth_i,
    K,
    threshold: float = 0.35,
    refine: bool = False,
    min_area: int = 20,
    refiner: Optional[Callable] = None,
    img_i_flow=None,
    overlap_cb: Optional[Callable] = None,
) -> np.ndarray:
    """Full dynamic-mask pipeline for a frame pair. Returns bool (h, w).

    Requires calibration K (the reference returns an empty mask without it,
    monst3r_utils.py:538-541). `refiner` overrides the installed/default
    refinement stage — e.g. a `TemporalMaskPropagator.as_refiner()` that
    carries masks across frames (then it must also be called on mask-empty
    frames, so the temporal state keeps advancing).

    `img_i_flow` optionally supplies frame i's image for the FLOW stage as a
    device-resident tensor (u8 or ImgNorm-normalized float — the tensor the
    encoder already consumed), skipping one host->device upload per frame;
    `img_i_u8` still feeds the host-side refiner (color models) either way.

    `overlap_cb` (zero-arg) dispatches independent device work so it runs
    while the host does hysteresis + refinement: it is invoked right after
    the flow-error program is enqueued (before blocking on its result) when
    the installed program supports mid-call callbacks, else up front.
    Exactly-once: call sites may rely on it having run by return time.
    """
    h, w = img_i_u8.shape[:2]
    if K is None:
        if overlap_cb is not None:
            overlap_cb()
        return np.zeros((h, w), bool)
    program, program_takes_cb = _flow_error_program
    if program is not None:
        kw = {}
        if overlap_cb is not None:
            if program_takes_cb:
                kw["overlap_cb"] = overlap_cb
            else:
                overlap_cb()
        err_norm = np.asarray(
            program(
                img_i_u8 if img_i_flow is None else img_i_flow,
                img_j_u8, T_WCi, T_WCj, depth_i, K, **kw,
            )
        )
    else:
        # host-side flow: the device is idle during it, enqueue first
        if overlap_cb is not None:
            overlap_cb()
        flow = compute_flow(img_i_u8, img_j_u8)
        ego = np.asarray(ego_motion_flow(T_WCi, T_WCj, depth_i, K))
        err_norm = np.asarray(flow_error_map(jnp.asarray(flow), jnp.asarray(ego)))
    mask = err_norm > threshold
    if refine and (mask.any() or refiner is not None):
        if refiner is None:
            refiner = _mask_refiner
        if refiner is None:
            from monst3r_slam_tpu.dynamic.refine import make_native_refiner

            refiner = make_native_refiner()
        refined = refiner(img_i_u8, err_norm, mask, threshold, min_area)
        if refined is not None and refined.shape == mask.shape:
            mask = np.asarray(refined, bool)
    return mask


def apply_dynamic_mask_to_pointmaps(X, C, D, Q, mask_flat):
    """Zero confidences/descriptors on dynamic pixels
    (monst3r_utils.py:300-344): C -> 0, Q -> 0, D -> 0; X unchanged."""
    keep = ~mask_flat
    C = C * keep[..., None]
    if Q is not None:
        Q = Q * keep[..., None]
    if D is not None:
        D = D * keep[..., None]
    return X, C, D, Q


@jax.jit
def apply_dynamic_mask_native(C, D, Q, mask_hw):
    """Same zeroing, ONE program, decoder-native shapes: C/Q (B, H, W),
    D (B, H, W, F), mask (H, W) bool. The live pipeline's eager
    reshape-flat/apply/reshape-back sequence was ~11 relay dispatches per
    masked side per frame."""
    keep = (~mask_hw)[None].astype(C.dtype)
    return C * keep, D * keep[..., None], Q * keep
