"""Host-side image preprocessing: 512-long-side resize + crop + normalize.

Byte-for-byte port of the reference preprocessing semantics
(`mast3r_utils.py:248-282` resize_img and dust3r ImgNorm): long side resized
to 512 (LANCZOS when shrinking, BICUBIC when growing), center-cropped so both
dims are multiples of 16, then normalized (x/255 - 0.5)/0.5. Returns HWC
float32 (TPU NHWC layout) rather than CHW.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from PIL import Image


def _resize_long_edge(img: Image.Image, long_edge: int) -> Image.Image:
    S = max(img.size)
    interp = Image.LANCZOS if S > long_edge else Image.BICUBIC
    new_size = tuple(int(round(x * long_edge / S)) for x in img.size)
    return img.resize(new_size, interp)


def resize_img(
    img: np.ndarray, size: int = 512, square_ok: bool = False, return_transformation: bool = False
):
    """img: HWC float in [0,1] (or uint8) -> dict with
    'img' (1, H, W, 3) normalized, 'true_shape' (1, 2) int32 [H, W],
    'unnormalized_img' (H, W, 3) uint8.
    """
    assert size in (224, 512)
    if img.dtype != np.uint8:
        img = np.uint8(np.clip(img, 0.0, 1.0) * 255)
    pil = Image.fromarray(img)
    W1, H1 = pil.size
    if size == 224:
        pil = _resize_long_edge(pil, round(size * max(W1 / H1, H1 / W1)))
    else:
        pil = _resize_long_edge(pil, size)
    W, H = pil.size
    cx, cy = W // 2, H // 2
    if size == 224:
        half = min(cx, cy)
        pil = pil.crop((cx - half, cy - half, cx + half, cy + half))
    else:
        halfw, halfh = ((2 * cx) // 16) * 8, ((2 * cy) // 16) * 8
        if not square_ok and W == H:
            halfh = int(3 * halfw / 4)
        pil = pil.crop((cx - halfw, cy - halfh, cx + halfw, cy + halfh))

    arr = np.asarray(pil)
    normalized = (arr.astype(np.float32) / 255.0 - 0.5) / 0.5
    res = dict(
        img=normalized[None],  # (1, H, W, 3) NHWC
        true_shape=np.int32([pil.size[::-1]]),
        unnormalized_img=arr,
    )
    if return_transformation:
        scale_w = W1 / W
        scale_h = H1 / H
        half_crop_w = (W - pil.size[0]) / 2
        half_crop_h = (H - pil.size[1]) / 2
        return res, (scale_w, scale_h, half_crop_w, half_crop_h)
    return res
