"""SLAM state: per-frame data and the fixed-capacity keyframe memory.

TPU-first redesign of `mast3r_slam/frame.py`:

  * The reference keeps a 512-slot ring of shared CUDA tensors mutated by
    three processes under an RLock (`frame.py:243-380`). Here keyframe memory
    is a **functional pytree of fixed-shape device arrays** plus an int count;
    all updates go through `dynamic_update_slice`-style `.at[idx].set`, so the
    whole SLAM loop stays inside jit with zero host sync and no locks.
  * Pointmap fusion (`frame.py:60-124`, 6 modes) becomes a pure function on
    (X, C, N) triples.

Poses are Sim(3) 8-vectors (core.lie).
"""

from __future__ import annotations

import dataclasses
from enum import IntEnum
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from monst3r_slam_tpu.core import lie


class Mode(IntEnum):
    INIT = 0
    TRACKING = 1
    RELOC = 2
    TERMINATED = 3


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Frame:
    """One video frame's SLAM state (reference Frame, frame.py:17-127).

    Arrays (fixed shapes; hw = h*w, n = num patches):
      img:     (h, w, 3) normalized image
      T_WC:    (8,) Sim3 world-from-camera
      X_canon: (hw, 3) canonical pointmap
      C:       (hw, 1) accumulated confidence
      N:       () int32 fusion count
      feat:    (n, enc_dim) cached encoder features — the live pipeline
               keeps them batched (1, n, enc_dim) to feed the decoder without
               per-frame reslicing; kf_set canonicalizes on write
      pos:     (n, 2) patch positions
      score:   () best-score fusion statistic (frame.py:75-86; only
               meaningful under filtering_mode == "best_score")
    """

    frame_id: jax.Array
    img: jax.Array
    T_WC: jax.Array
    X_canon: jax.Array
    C: jax.Array
    N: jax.Array
    N_updates: jax.Array
    feat: jax.Array
    pos: jax.Array
    score: jax.Array

    def get_average_conf(self) -> jax.Array:
        return self.C / jnp.maximum(self.N.astype(self.C.dtype), 1.0)


def make_empty_frame(h: int, w: int, enc_dim: int, patch: int) -> Frame:
    hw = h * w
    n = hw // patch**2
    return Frame(
        frame_id=jnp.zeros((), jnp.int32),
        img=jnp.zeros((h, w, 3), jnp.float32),
        T_WC=lie.sim3_identity(),
        X_canon=jnp.zeros((hw, 3), jnp.float32),
        C=jnp.zeros((hw, 1), jnp.float32),
        N=jnp.zeros((), jnp.int32),
        N_updates=jnp.zeros((), jnp.int32),
        feat=jnp.zeros((n, enc_dim), jnp.float32),
        pos=jnp.zeros((n, 2), jnp.int32),
        score=jnp.zeros((), jnp.float32),
    )


# ---------------------------------------------------------------------------
# Pointmap fusion (reference update_pointmap, frame.py:60-124)
# ---------------------------------------------------------------------------


def conf_score(C: jax.Array, filtering_score: str = "median") -> jax.Array:
    """Scalar pointmap-quality score (reference get_score, frame.py:47-54)."""
    if filtering_score == "median":
        return jnp.median(C)
    if filtering_score == "mean":
        return jnp.mean(C)
    raise ValueError(f"unknown filtering_score {filtering_score}")


def fuse_pointmap(
    X_old: jax.Array,
    C_old: jax.Array,
    N_old: jax.Array,
    X_new: jax.Array,
    C_new: jax.Array,
    mode: str = "weighted_pointmap",
    score_old: jax.Array | None = None,
    filtering_score: str = "median",
):
    """Fuse a new pointmap observation into the canonical one.

    Returns (X, C, N, score). First observation (N_old == 0) always replaces.
    All modes are branch-free `where`s on the N_old==0 predicate so the
    function stays jittable. `score` is only maintained by the "best_score"
    mode (reference frame.py:68-86); other modes pass `score_old` through.
    """
    first = N_old == 0
    one = jnp.ones_like(N_old)
    if score_old is None:
        score_old = jnp.zeros((), jnp.float32)
    score = score_old

    if mode == "first":
        X = jnp.where(first, X_new, X_old)
        C = jnp.where(first, C_new, C_old)
        N = jnp.where(first, one, N_old)
    elif mode == "recent":
        X, C, N = X_new, C_new, one
    elif mode == "best_score":
        new_score = conf_score(C_new, filtering_score)
        better = first | (new_score > score_old)
        X = jnp.where(better, X_new, X_old)
        C = jnp.where(better, C_new, C_old)
        N = jnp.where(better, one, N_old)
        score = jnp.where(better, new_score, score_old)
    elif mode == "indep_conf":
        better = C_new > C_old
        X = jnp.where(better, X_new, X_old)
        C = jnp.where(better, C_new, C_old)
        X = jnp.where(first, X_new, X)
        C = jnp.where(first, C_new, C)
        N = one
    elif mode == "weighted_pointmap":
        X_f = (C_old * X_old + C_new * X_new) / (C_old + C_new)
        X = jnp.where(first, X_new, X_f)
        C = jnp.where(first, C_new, C_old + C_new)
        N = jnp.where(first, one, N_old + 1)
    elif mode == "weighted_spherical":

        def to_sph(P):
            r = jnp.linalg.norm(P, axis=-1, keepdims=True)
            x, y, z = jnp.split(P, 3, axis=-1)
            phi = jnp.arctan2(y, x)
            theta = jnp.arccos(jnp.clip(z / jnp.maximum(r, 1e-12), -1.0, 1.0))
            return jnp.concatenate([r, phi, theta], axis=-1)

        def to_cart(s):
            r, phi, theta = jnp.split(s, 3, axis=-1)
            st = jnp.sin(theta)
            return jnp.concatenate(
                [r * st * jnp.cos(phi), r * st * jnp.sin(phi), r * jnp.cos(theta)],
                axis=-1,
            )

        sph = (C_old * to_sph(X_old) + C_new * to_sph(X_new)) / (C_old + C_new)
        X = jnp.where(first, X_new, to_cart(sph))
        C = jnp.where(first, C_new, C_old + C_new)
        N = jnp.where(first, one, N_old + 1)
    else:
        raise ValueError(f"unknown filtering_mode {mode}")
    return X, C, N, score


# ---------------------------------------------------------------------------
# Keyframe memory
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KeyframeMemory:
    """Fixed-capacity keyframe store (reference SharedKeyframes, frame.py:243).

    All arrays are (capacity, ...); `count` is the live size. Device-resident;
    updated functionally.
    """

    frame_id: jax.Array  # (cap,) int32
    T_WC: jax.Array  # (cap, 8)
    X_canon: jax.Array  # (cap, hw, 3)
    C: jax.Array  # (cap, hw, 1)
    N: jax.Array  # (cap,) int32
    N_updates: jax.Array  # (cap,) int32
    feat: jax.Array  # (cap, n, enc_dim)
    pos: jax.Array  # (cap, n, 2)
    score: jax.Array  # (cap,) best-score fusion statistic
    count: jax.Array  # () int32

    @property
    def capacity(self) -> int:
        return self.frame_id.shape[0]


def make_keyframe_memory(
    capacity: int, h: int, w: int, enc_dim: int, patch: int
) -> KeyframeMemory:
    hw = h * w
    n = hw // patch**2
    return KeyframeMemory(
        frame_id=jnp.zeros((capacity,), jnp.int32),
        T_WC=jnp.broadcast_to(lie.sim3_identity(), (capacity, 8)).copy(),
        X_canon=jnp.zeros((capacity, hw, 3), jnp.float32),
        C=jnp.zeros((capacity, hw, 1), jnp.float32),
        N=jnp.zeros((capacity,), jnp.int32),
        N_updates=jnp.zeros((capacity,), jnp.int32),
        feat=jnp.zeros((capacity, n, enc_dim), jnp.float32),
        pos=jnp.zeros((capacity, n, 2), jnp.int32),
        score=jnp.zeros((capacity,), jnp.float32),
        count=jnp.zeros((), jnp.int32),
    )


def _kf_set_body(mem: KeyframeMemory, idx, frame: Frame) -> KeyframeMemory:
    return KeyframeMemory(
        frame_id=mem.frame_id.at[idx].set(frame.frame_id),
        T_WC=mem.T_WC.at[idx].set(frame.T_WC),
        X_canon=mem.X_canon.at[idx].set(frame.X_canon),
        C=mem.C.at[idx].set(frame.C),
        N=mem.N.at[idx].set(frame.N),
        N_updates=mem.N_updates.at[idx].set(frame.N_updates),
        feat=mem.feat.at[idx].set(frame.feat.reshape(mem.feat.shape[1:])),
        pos=mem.pos.at[idx].set(frame.pos.reshape(mem.pos.shape[1:])),
        score=mem.score.at[idx].set(frame.score),
        count=jnp.maximum(mem.count, idx + 1),
    )


_kf_set_jit = jax.jit(_kf_set_body)


def kf_set(mem: KeyframeMemory, idx: jax.Array, frame: Frame) -> KeyframeMemory:
    """Write `frame` into slot idx; bumps count to max(count, idx+1).

    ONE fused program instead of ~10 eager `.at[].set` dispatches.
    Deliberately NOT donated: the async backend worker slices live
    `mem.feat[ii]` / `mem.pos[ii]` when assembling factor-graph edges
    (app/pipeline.py add_factors) — only the solve inputs are snapshotted
    (`_snap_slice`) — so an in-place keyframe append could invalidate a
    buffer with worker reads in flight. The copies cost ~6 ms of device
    time per KEYFRAME EVENT only (kf_append also passes `mem.count` as
    `idx`, which donation would reject as a duplicate donated buffer)."""
    return _kf_set_jit(mem, idx, frame)


def kf_append(mem: KeyframeMemory, frame: Frame) -> KeyframeMemory:
    return kf_set(mem, mem.count, frame)


def kf_get(mem: KeyframeMemory, idx: jax.Array, img_placeholder=None) -> Frame:
    """Read slot idx back into a Frame (img not stored device-side)."""
    return Frame(
        frame_id=mem.frame_id[idx],
        img=jnp.zeros((0,)) if img_placeholder is None else img_placeholder,
        T_WC=mem.T_WC[idx],
        X_canon=mem.X_canon[idx],
        C=mem.C[idx],
        N=mem.N[idx],
        N_updates=mem.N_updates[idx],
        feat=mem.feat[idx],
        pos=mem.pos[idx],
        score=mem.score[idx],
    )


def kf_update_pointmap(
    mem: KeyframeMemory, idx: jax.Array, X: jax.Array, C: jax.Array, mode: str,
    filtering_score: str = "median",
) -> KeyframeMemory:
    X_f, C_f, N_f, S_f = fuse_pointmap(
        mem.X_canon[idx], mem.C[idx], mem.N[idx], X, C, mode,
        score_old=mem.score[idx], filtering_score=filtering_score,
    )
    return dataclasses.replace(
        mem,
        X_canon=mem.X_canon.at[idx].set(X_f),
        C=mem.C.at[idx].set(C_f),
        N=mem.N.at[idx].set(N_f),
        N_updates=mem.N_updates.at[idx].set(mem.N_updates[idx] + 1),
        score=mem.score.at[idx].set(S_f),
    )


def kf_update_poses(mem: KeyframeMemory, T_WCs: jax.Array, idx: jax.Array) -> KeyframeMemory:
    return dataclasses.replace(mem, T_WC=mem.T_WC.at[idx].set(T_WCs))
