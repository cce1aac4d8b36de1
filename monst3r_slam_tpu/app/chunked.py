"""Chunked (burst) tracking: C frames per device program.

Why this exists. The per-frame pipeline dispatches 2-3 programs per frame
and reads one 12-float decision vector back per frame. On locally-attached
TPU that host round trip is sub-millisecond; on a relay-backed chip it is
~25 ms per readback and ~30 MB/s for uploads (scripts/profile_device_true.py
and NOTES_r5 "Encoder attribution"), which floors the per-frame loop at
~40 ms/frame no matter how fast the kernels are (true device time of the
whole model chain is ~12 ms). The reference has the same structure — one
CUDA graph launch + one sync per frame (`main.py:247-260`) — it just runs
on a local PCIe GPU where launches are cheap.

Chunked mode amortizes the host boundary over C frames, the TPU-native way:

  * ONE upload per chunk: a (C, H, W, 3) uint8 batch (video frames are
    natively 8-bit; normalization happens on device with bit-identical
    arithmetic to data/preprocess.py:53).
  * ONE program per chunk: `lax.scan` over frames — encode -> decode vs the
    current keyframe -> tiled/Pallas match -> pointmap fusion -> GN pose ->
    keyframe fusion, the exact per-frame semantics of
    `pipeline._match_track_and_update` (the scan body calls the same
    `_track_update_body`).
  * ONE readback per chunk: the (C, 12) decision matrix.

Sequential decision semantics are preserved EXACTLY, not approximated: the
scan carries a `done` flag that freezes all state updates at the first
frame whose decision the host must act on (new keyframe, lost tracking, or
solver failure). The host reads the chunk's decisions, performs the event
(keyframe append + backend step, or relocalization), and re-dispatches the
SAME compiled program with the processed prefix masked out (`k0`); masked
steps take a `lax.cond` branch that skips all compute. So every frame is
tracked against exactly the keyframe (and keyframe state) it would see in
the per-frame path with `defer_tracking_sync: 0` — chunking changes WHEN
the host learns a decision, never WHAT is decided.

Async backend interplay: global-solve pose write-backs apply at chunk
boundaries (the per-frame path applies them between frames); keyframe
events inside a chunk still hand the backend work to the async worker.

Reference parity anchor: this replaces the reference's offline evaluation
loop (`main.py:229-260`, eval_tum.sh) — the mode used for every headline
ATE/FPS number the reference publishes.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from monst3r_slam_tpu.core import lie
from monst3r_slam_tpu.models import mast3r as model_api
from monst3r_slam_tpu.ops import matching_tiled
from monst3r_slam_tpu.slam.frame import Frame, Mode


# Decision-matrix columns (matches pipeline._track_update_body's summary,
# plus the chunk-only `active` column).
COL_T = slice(0, 8)
COL_LOW_MATCH = 8
COL_SOLVER_FAILED = 9
COL_NEW_KF = 10
COL_ACTIVE = 11


@partial(
    jax.jit,
    static_argnames=(
        "model_cfg", "track_cfg", "img_size", "use_calib", "fmode",
        "fscore", "mcfg", "tcfg", "use_pallas", "decode_hook",
    ),
    donate_argnums=(1, 2, 3, 4),
)
def chunk_track(
    params,
    mem_X, mem_C, mem_N, mem_S,  # donated keyframe memory (updated in place)
    kf_idx,       # () int32 — slot of the tracking keyframe
    kf_feat,      # (1, n, enc_dim) keyframe encoder features
    kf_pos,       # (1, n, 2)
    kf_T_WC,      # (8,)
    imgs,         # (C, h, w, 3) uint8 (device-normalized) or normalized f32
    T0,           # (8,) pose init (last resolved frame pose)
    idx0,         # (hw,) matcher warm start
    warm0,        # () bool — idx0 is a real warm start
    k0,           # () int32 — frames < k0 are already processed (masked)
    K,            # (3, 3)
    hook_xs,      # per-frame pytree for decode_hook (leading dim C), or 0
    *,
    model_cfg,
    track_cfg,
    img_size,
    use_calib: bool,
    fmode: str,
    fscore: str,
    mcfg,
    tcfg,
    use_pallas: bool,
    decode_hook=None,
):
    """Scan C frames through the full tracking chain in ONE program.

    Returns (mem_X, mem_C, mem_N, mem_S, T_last, idx_last, summaries(C,12),
    ys_T(C,8), ys_feat(C,n,enc_dim), ys_fX(C,hw,3), ys_fC(C,hw,1),
    ys_fN(C,), ys_fS(C,)).

    `decode_hook(out: PairOutput, hook_x) -> PairOutput` (static) lets the
    bench oracle overwrite decode outputs per frame inside the program.
    """
    from monst3r_slam_tpu.app.pipeline import _track_update_body

    h, w = img_size
    hw = h * w
    n_frames = imgs.shape[0]
    if imgs.dtype == jnp.uint8:
        # bit-identical to the host path (data/preprocess.py:53)
        imgs_f = (imgs.astype(jnp.float32) / 255.0 - 0.5) / 0.5
    else:
        imgs_f = imgs

    idx0 = idx0.reshape(hw)  # accepts (hw,) or the per-frame path's (1, hw)
    kfX0 = mem_X[kf_idx]
    kfC0 = mem_C[kf_idx]
    kfN0 = mem_N[kf_idx]
    kfS0 = mem_S[kf_idx]
    zero_i = jnp.zeros((), jnp.int32)
    # frame canonical-state proto (pipeline.make_frame's _frame_proto)
    fX0 = jnp.zeros((hw, 3), jnp.float32)
    fC0 = jnp.zeros((hw, 1), jnp.float32)
    fN0 = jnp.zeros((), jnp.int32)
    fS0 = jnp.zeros((), jnp.float32)
    n_patches = hw // model_cfg.patch_size**2

    def heavy(carry, img, hook_x):
        kfX, kfC, kfN, kfS, T, idx, warm, done = carry
        feat, pos = model_api.encode(params, model_cfg, img[None])
        out = model_api.decode(
            params, model_cfg, feat, pos, kf_feat, kf_pos, img_size
        )
        if decode_hook is not None:
            out = decode_hook(out, hook_x)
        idx_new, valid = matching_tiled.match_tiled(
            out.X1.reshape(1, h, w, 3), out.X2.reshape(1, h, w, 3),
            out.D1.reshape(1, h, w, -1), out.D2.reshape(1, h, w, -1),
            idx.reshape(1, hw), cfg=mcfg, tcfg=tcfg,
            use_init=True, use_pallas=use_pallas, warm_valid=warm,
        )
        (mX, mC, mN, mS, fX, fC, fN, fS, res, summary) = _track_update_body(
            kfX[None], kfC[None], kfN[None], kfS[None], zero_i,
            idx_new[0], valid[0],
            out.X1.reshape(hw, 3), out.C1.reshape(hw, 1),
            out.Q1.reshape(hw, 1),
            out.X2.reshape(hw, 3), out.C2.reshape(hw, 1),
            out.Q2.reshape(hw, 1),
            fX0, fC0, fN0, fS0,
            T, kf_T_WC, K,
            track_cfg, img_size, use_calib, fmode, fscore,
        )
        event = res.new_kf | res.low_match | res.solver_failed
        carry = (
            mX[0], mC[0], mN[0], mS[0], res.T_WCf, idx_new[0],
            jnp.ones((), bool), done | event,
        )
        ys = (
            jnp.concatenate([summary, jnp.ones((1,), jnp.float32)]),
            res.T_WCf, feat[0], fX, fC, fN, fS,
        )
        return carry, ys

    def skip(carry, img, hook_x):
        ys = (
            jnp.zeros((12,), jnp.float32),
            jnp.zeros((8,), jnp.float32),
            jnp.zeros((n_patches, model_cfg.enc_dim), jnp.float32),
            jnp.zeros((hw, 3), jnp.float32),
            jnp.zeros((hw, 1), jnp.float32),
            jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.float32),
        )
        return carry, ys

    def step(carry, xs):
        i, img, hook_x = xs
        done = carry[-1]
        act = (i >= k0) & ~done
        # real branch: masked frames execute NO model compute (cheap
        # re-dispatch after an in-chunk keyframe event)
        return jax.lax.cond(act, heavy, skip, carry, img, hook_x)

    carry0 = (kfX0, kfC0, kfN0, kfS0, T0, idx0, warm0, jnp.zeros((), bool))
    carry, ys = jax.lax.scan(
        step, carry0, (jnp.arange(n_frames), imgs_f, hook_xs)
    )
    kfX, kfC, kfN, kfS, T_last, idx_last, _, _ = carry
    mem_X = mem_X.at[kf_idx].set(kfX)
    mem_C = mem_C.at[kf_idx].set(kfC)
    mem_N = mem_N.at[kf_idx].set(kfN)
    mem_S = mem_S.at[kf_idx].set(kfS)
    summaries, ys_T, ys_feat, ys_fX, ys_fC, ys_fN, ys_fS = ys
    return (
        mem_X, mem_C, mem_N, mem_S, T_last, idx_last,
        summaries, ys_T, ys_feat, ys_fX, ys_fC, ys_fN, ys_fS,
    )


@jax.jit
def _gather_chunk_frame(ys_T, ys_feat, ys_fX, ys_fC, ys_fN, ys_fS, i):
    """Slice frame i's state out of the chunk outputs in ONE dispatch."""
    def take(a):
        return jax.lax.dynamic_index_in_dim(a, i, axis=0, keepdims=False)

    return (
        take(ys_T), take(ys_feat)[None], take(ys_fX), take(ys_fC),
        take(ys_fN), take(ys_fS),
    )


@jax.jit
def _norm_slice(imgs, i):
    """Frame i of a chunk as a (1, h, w, 3) normalized f32 image (for the
    per-frame fallback path: INIT / RELOC frames)."""
    img = jax.lax.dynamic_index_in_dim(imgs, i, axis=0, keepdims=False)
    if imgs.dtype == jnp.uint8:
        img = (img.astype(jnp.float32) / 255.0 - 0.5) / 0.5
    return img[None]


def process_chunk(
    slam,
    frame_ids: List[int],
    timestamps: List,
    imgs_dev: jax.Array,       # (C, h, w, 3) uint8 or normalized f32
    uimgs: Optional[List[Optional[np.ndarray]]] = None,
    hook_xs=None,
    decode_hook=None,
) -> bool:
    """Process C frames through `chunk_track`, resolving decisions at event
    boundaries. Returns False when the viewer requested termination.

    Per-frame semantics match `SLAMSystem.process_frame` with
    `defer_tracking_sync: 0` and `force_kf=None`; INIT/RELOC frames fall
    back to the per-frame path (they need mono inference / retrieval).
    Restricted to the plain MASt3R pipeline (no dual/easi3r masks, no lm
    matcher) — `SLAMSystem.supports_chunking` checks this.
    """
    C = int(imgs_dev.shape[0])
    prof = slam.prof
    slam._consume_viewer_control()
    if slam.terminate_requested:
        return False
    slam._resolve_pending()  # per-frame fallback may have left deferred work
    k0 = 0
    while k0 < C:
        if slam.mode != Mode.TRACKING:
            # INIT / RELOC: per-frame path, immediate resolution
            uimg = uimgs[k0] if uimgs is not None else None
            slam.process_frame(
                frame_ids[k0], timestamps[k0], _norm_slice(imgs_dev, k0),
                uimg=uimg,
            )
            slam._resolve_pending()
            k0 += 1
            continue

        t0 = time.perf_counter()
        slam._apply_backend_results()
        kf_idx = slam.n_kf - 1
        kf_feat, kf_pos, kf_T_WC, _ = slam._kf_view(kf_idx)
        warm = slam.idx_f2k is not None
        idx0 = slam.idx_f2k if warm else slam._idx_zero
        outs = chunk_track(
            slam.params,
            slam.mem.X_canon, slam.mem.C, slam.mem.N, slam.mem.score,
            jnp.asarray(kf_idx, jnp.int32), kf_feat, kf_pos, kf_T_WC,
            imgs_dev, slam._last_T_WC_dev, idx0,
            jnp.asarray(warm), jnp.asarray(k0, jnp.int32),
            slam.K if slam.K is not None else jnp.eye(3),
            jnp.zeros((C,), jnp.float32) if hook_xs is None else hook_xs,
            model_cfg=slam.model_cfg, track_cfg=slam.track_cfg,
            img_size=slam.img_size, use_calib=slam.use_calib,
            fmode=slam.filtering_mode, fscore=slam.track_cfg.filtering_score,
            mcfg=slam.match_cfg, tcfg=slam.match_tcfg,
            use_pallas=slam.match_mode == "pallas",
            decode_hook=decode_hook,
        )
        (mem_X, mem_C, mem_N, mem_S, T_last, idx_last,
         summaries, ys_T, ys_feat, ys_fX, ys_fC, ys_fN, ys_fS) = outs
        slam.mem = dataclasses.replace(
            slam.mem, X_canon=mem_X, C=mem_C, N=mem_N, score=mem_S
        )
        prof.setdefault("chunk_dispatch", []).append(
            (time.perf_counter() - t0) * 1e3
        )
        t1 = time.perf_counter()
        sv = np.asarray(summaries)  # THE one host sync per chunk
        prof.setdefault("chunk_sync", []).append(
            (time.perf_counter() - t1) * 1e3
        )

        event = None
        for i in range(k0, C):
            if sv[i, COL_ACTIVE] < 0.5:
                break  # frozen by an earlier event (already handled)
            fid, ts = frame_ids[i], timestamps[i]
            slam.timestamps.append(ts)
            slam.last_summary = sv[i]
            if sv[i, COL_LOW_MATCH] > 0.5 or sv[i, COL_SOLVER_FAILED] > 0.5:
                slam.mode = Mode.RELOC
                slam.idx_f2k = None
                if slam._mask_propagator is not None:
                    slam._mask_propagator.reset()
                slam._record_pose(fid, slam.last_T_WC)
                # earlier frames in this chunk moved the pose; refresh the
                # device mirror from the host one (same f32 values)
                slam._last_T_WC_dev = jnp.asarray(slam.last_T_WC)
                k0, event = i + 1, "reloc"
                break
            slam.last_T_WC = sv[i, COL_T]
            slam._record_pose(fid, slam.last_T_WC)
            if sv[i, COL_NEW_KF] > 0.5:
                tk = time.perf_counter()
                T_i, feat_i, fX_i, fC_i, fN_i, fS_i = _gather_chunk_frame(
                    ys_T, ys_feat, ys_fX, ys_fC, ys_fN, ys_fS,
                    jnp.asarray(i, jnp.int32),
                )
                frame = Frame(
                    frame_id=jnp.asarray(fid, jnp.int32),
                    img=jnp.zeros((0,)),
                    T_WC=T_i, X_canon=fX_i, C=fC_i, N=fN_i,
                    N_updates=jnp.zeros((), jnp.int32),
                    feat=feat_i, pos=kf_pos, score=fS_i,
                )
                slam.idx_f2k = None
                new_idx = slam._append_keyframe(frame)
                slam._set_kf_uimg(
                    new_idx, uimgs[i] if uimgs is not None else None
                )
                slam.backend_step(new_idx, frame)
                slam._last_T_WC_dev = T_i
                prof.setdefault("kf_event", []).append(
                    (time.perf_counter() - tk) * 1e3
                )
                k0, event = i + 1, "kf"
                break
        if event is None:
            k0 = C
            slam.idx_f2k = idx_last
            slam._last_T_WC_dev = T_last
    slam._maybe_push_viewer()
    return not slam.terminate_requested


class ChunkPrefetcher:
    """Batch dataset frames into uint8 chunks and upload them ahead of the
    consumer (the chunked analogue of data.prefetch.FramePrefetcher).

    Yields (frame_ids, timestamps, imgs_dev (C,h,w,3) uint8, uimgs). The
    final chunk is short if len(dataset) % C != 0 — `process_chunk` accepts
    any leading dim, at the cost of one extra program shape.

    Uploads are dispatched from the worker thread (JAX transfers are
    thread-safe), so chunk t+1's host->device copy rides under chunk t's
    compute.
    """

    _SENTINEL = object()

    def __init__(self, dataset, preprocess, chunk: int, lo: int = 0,
                 hi: Optional[int] = None, depth: int = 2):
        self.dataset = dataset
        self.preprocess = preprocess
        self.chunk = int(chunk)
        self.lo = lo
        self.hi = len(dataset) if hi is None else hi
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._work, name="chunk-prefetch", daemon=True
        )

    def _work(self):
        try:
            for c0 in range(self.lo, self.hi, self.chunk):
                ids, tss, imgs, uimgs = [], [], [], []
                for i in range(c0, min(c0 + self.chunk, self.hi)):
                    if self._stop.is_set():
                        return
                    try:
                        timestamp, img = self.dataset[i]
                        out = self.preprocess(img)
                    except BaseException as e:
                        self._put((i, None, e, None))
                        return
                    ids.append(i)
                    tss.append(timestamp)
                    # resize_img already produces the uint8 image the f32
                    # normalization is derived from — upload THAT (4x less
                    # link traffic than f32; normalize on device)
                    imgs.append(out["unnormalized_img"])
                    uimgs.append(out["unnormalized_img"])
                if not ids:
                    continue
                if self._stop.is_set():
                    return
                imgs_dev = jnp.asarray(np.stack(imgs))
                self._put((ids, tss, imgs_dev, uimgs))
        finally:
            self._put(self._SENTINEL)

    def _put(self, item):
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.2)
                return
            except queue.Full:
                continue
        if item is self._SENTINEL:
            while True:
                try:
                    self._q.put_nowait(item)
                    return
                except queue.Full:
                    try:
                        self._q.get_nowait()
                    except queue.Empty:
                        pass

    def __iter__(self):
        self._thread.start()
        while True:
            item = self._q.get()
            if item is self._SENTINEL:
                return
            if len(item) == 4 and isinstance(item[2], BaseException):
                raise RuntimeError(
                    f"chunk prefetch failed at frame {item[0]}"
                ) from item[2]
            yield item

    def stop(self):
        self._stop.set()
        while True:
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
