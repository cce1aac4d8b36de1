"""Dense pointmap matching: iterative projective association + descriptor
refinement.

TPU-native equivalents of the reference CUDA kernels
(`backend/src/matching_kernels.cu`): `iter_proj` (:119-316) — a per-pixel 2x2
Levenberg-Marquardt solve locating, for every query ray of frame j, the pixel
in frame i's normalized-ray image whose bilinearly-interpolated ray matches —
and `refine_matches` (:25-116) — coarse-to-fine dilated-window descriptor
argmax. Both are fixed-iteration, branch-free `lax` programs over dense
(b, n) point sets; the accept/reject LM update becomes a `jnp.where`.

The wrapper `match()` mirrors `mast3r_slam/matching.py:8-90` including the
3D-distance occlusion gate.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class MatchingConfig(NamedTuple):
    """Static matcher parameters (config/base.yaml:15-21)."""

    max_iter: int = 10
    lambda_init: float = 1e-8
    convergence_thresh: float = 1e-6
    dist_thresh: float = 0.1
    radius: int = 3
    dilation_max: int = 5


def pixel_to_lin(p: jax.Array, w: int) -> jax.Array:
    return p[..., 0] + w * p[..., 1]


def lin_to_pixel(idx: jax.Array, w: int) -> jax.Array:
    return jnp.stack([idx % w, idx // w], axis=-1)


def _bilinear(img_flat: jax.Array, u: jax.Array, v: jax.Array, w: int):
    """Sample (n, c) values from img_flat (h*w, c) at float pixel (u, v).

    Matches the CUDA kernel's corner/weight pairing
    (matching_kernels.cu:155-175): weight du*dv on pixel (v0+1, u0+1), etc.
    Callers guarantee u in [1, w-2], v in [1, h-2] so all 4 taps are in-bounds.
    """
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0
    u0 = u0.astype(jnp.int32)
    v0 = v0.astype(jnp.int32)
    base = u0 + w * v0
    s00 = img_flat[base]  # (v0, u0), weight (1-du)(1-dv)
    s01 = img_flat[base + 1]
    s10 = img_flat[base + w]
    s11 = img_flat[base + w + 1]
    w00 = ((1 - du) * (1 - dv))[..., None]
    w01 = (du * (1 - dv))[..., None]
    w10 = ((1 - du) * dv)[..., None]
    w11 = (du * dv)[..., None]
    return w00 * s00 + w01 * s01 + w10 * s10 + w11 * s11


def _normalize(r: jax.Array) -> jax.Array:
    return r / jnp.linalg.norm(r, axis=-1, keepdims=True)


def _iter_proj_single(rays_img, pts3d_norm, p_init, h, w, cfg: MatchingConfig):
    """One batch element: rays_img (h, w, 9), pts3d_norm (n, 3), p_init (n, 2)."""
    img_flat = rays_img.reshape(h * w, 9)
    u = jnp.clip(p_init[:, 0], 1.0, w - 2.0)
    v = jnp.clip(p_init[:, 1], 1.0, h - 2.0)
    lam = jnp.full_like(u, cfg.lambda_init)
    conv = jnp.zeros(u.shape, jnp.bool_)

    def ray_cost(u_, v_):
        r = _normalize(_bilinear(img_flat[:, 0:3], u_, v_, w))
        err = r - pts3d_norm
        return err, jnp.sum(err * err, axis=-1)

    def body(_, state):
        u, v, lam, conv = state
        samp = _bilinear(img_flat, u, v, w)  # (n, 9)
        r = _normalize(samp[:, 0:3])
        gx = samp[:, 3:6]
        gy = samp[:, 6:9]
        err = r - pts3d_norm
        cost = jnp.sum(err * err, axis=-1)

        a00 = jnp.sum(gx * gx, axis=-1) + lam
        a01 = jnp.sum(gx * gy, axis=-1)
        a11 = jnp.sum(gy * gy, axis=-1) + lam
        b0 = -jnp.sum(err * gx, axis=-1)
        b1 = -jnp.sum(err * gy, axis=-1)
        det_inv = 1.0 / (a00 * a11 - a01 * a01)
        du = det_inv * (a11 * b0 - a01 * b1)
        dv = det_inv * (-a01 * b0 + a00 * b1)

        u_new = jnp.clip(u + du, 1.0, w - 2.0)
        v_new = jnp.clip(v + dv, 1.0, h - 2.0)
        _, new_cost = ray_cost(u_new, v_new)

        accept = new_cost < cost
        u = jnp.where(accept, u_new, u)
        v = jnp.where(accept, v_new, v)
        lam = jnp.where(accept, lam * 0.1, lam * 10.0)
        conv = jnp.where(accept, new_cost, cost) < cfg.convergence_thresh
        return u, v, lam, conv

    u, v, lam, conv = jax.lax.fori_loop(0, cfg.max_iter, body, (u, v, lam, conv))
    return jnp.stack([u, v], axis=-1), conv


@partial(jax.jit, static_argnames=("cfg",))
def iter_proj(rays_with_grad_img, pts3d_norm, p_init, cfg: MatchingConfig):
    """Batched LM projective association.

    rays_with_grad_img: (b, h, w, 9); pts3d_norm: (b, n, 3); p_init: (b, n, 2)
    Returns (p (b, n, 2) float, converged (b, n) bool).
    """
    b, h, w, _ = rays_with_grad_img.shape
    fn = partial(_iter_proj_single, h=h, w=w, cfg=cfg)
    return jax.vmap(fn)(rays_with_grad_img, pts3d_norm, p_init)


def _refine_single(D11, D21, p, h, w, cfg: MatchingConfig):
    """D11 (h, w, f), D21 (n, f), p (n, 2) int32 -> refined p (n, 2).

    Coarse-to-fine window argmax (matching_kernels.cu:49-77): python loop over
    the static dilation levels, one batched gather+einsum per level. Ties keep
    the earliest offset in (du-major, dv-minor) order like the CUDA loops.
    """
    f = D11.shape[-1]
    D11_flat = D11.reshape(h * w, f)
    u = p[:, 0]
    v = p[:, 1]
    r = cfg.radius
    side = 2 * r + 1
    for d in range(cfg.dilation_max, 0, -1):
        offs = (jnp.arange(side) - r) * d
        du = jnp.repeat(offs, side)  # u-major ordering
        dv = jnp.tile(offs, side)
        cu = u[:, None] + du[None, :]  # (n, k)
        cv = v[:, None] + dv[None, :]
        inside = (cu >= 0) & (cu < w) & (cv >= 0) & (cv < h)
        lin = jnp.clip(cu, 0, w - 1) + w * jnp.clip(cv, 0, h - 1)
        cand = D11_flat[lin]  # (n, k, f)
        scores = jnp.einsum("nkf,nf->nk", cand, D21)
        scores = jnp.where(inside, scores, -jnp.inf)
        best = jnp.argmax(scores, axis=-1)
        u = jnp.take_along_axis(cu, best[:, None], axis=1)[:, 0]
        v = jnp.take_along_axis(cv, best[:, None], axis=1)[:, 0]
    return jnp.stack([u, v], axis=-1)


@partial(jax.jit, static_argnames=("cfg",))
def refine_matches(D11, D21, p, cfg: MatchingConfig):
    """Batched descriptor refinement. D11: (b, h, w, f); D21: (b, n, f);
    p: (b, n, 2) int32."""
    b, h, w, _ = D11.shape
    fn = partial(_refine_single, h=h, w=w, cfg=cfg)
    return jax.vmap(fn)(D11, D21, p)


def prep_for_iter_proj(X11, X21, idx_1_to_2_init):
    """Build the 9-channel ray image + initial pixel guesses
    (`matching.py:25-49`). X11/X21: (b, h, w, 3)."""
    from monst3r_slam_tpu.core.image import img_gradient

    b, h, w, _ = X11.shape
    rays = _normalize(X11)
    gx, gy = img_gradient(rays)
    rays_with_grad = jnp.concatenate([rays, gx, gy], axis=-1)

    pts3d_norm = _normalize(X21.reshape(b, h * w, 3))

    if idx_1_to_2_init is None:
        idx_1_to_2_init = jnp.broadcast_to(jnp.arange(h * w)[None], (b, h * w))
    p_init = lin_to_pixel(idx_1_to_2_init, w).astype(jnp.float32)
    return rays_with_grad, pts3d_norm, p_init


def match(X11, X21, D11, D21, idx_1_to_2_init=None, cfg: MatchingConfig = MatchingConfig()):
    """Full match pipeline (`matching.py:52-90`).

    X11/X21: (b, h, w, 3) pointmaps; D11/D21: (b, h, w, f) descriptors.
    Returns (idx_1_to_2 (b, h*w) int32, valid (b, h*w, 1) bool).
    """
    b, h, w, _ = X11.shape
    rays_img, pts3d_norm, p_init = prep_for_iter_proj(X11, X21, idx_1_to_2_init)
    p, valid_proj = iter_proj(rays_img, pts3d_norm, p_init, cfg)
    p = p.astype(jnp.int32)

    # Occlusion gate: matched 3D points must be within dist_thresh
    # (matching.py:71-76)
    lin = pixel_to_lin(p, w)
    X11_flat = X11.reshape(b, h * w, 3)
    gathered = jnp.take_along_axis(X11_flat, lin[..., None], axis=1)
    dists = jnp.linalg.norm(gathered - X21.reshape(b, h * w, 3), axis=-1)
    valid = valid_proj & (dists < cfg.dist_thresh)

    if cfg.radius > 0:
        p = refine_matches(D11, D21.reshape(b, h * w, -1), p, cfg)

    idx_1_to_2 = pixel_to_lin(p, w)
    return idx_1_to_2, valid[..., None]
