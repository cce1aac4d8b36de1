"""Image gradients for the iterative-projection matcher.

Same 3x3 Scharr-like kernels (1/32 * [±3, ±10]) with reflect padding as the
reference `mast3r_slam/image.py:5-38`, implemented with
`lax.conv_general_dilated` in NHWC layout (TPU-native).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_GX = (1.0 / 32.0) * jnp.asarray(
    [[-3.0, 0.0, 3.0], [-10.0, 0.0, 10.0], [-3.0, 0.0, 3.0]], dtype=jnp.float32
)
_GY = (1.0 / 32.0) * jnp.asarray(
    [[-3.0, -10.0, -3.0], [0.0, 0.0, 0.0], [3.0, 10.0, 3.0]], dtype=jnp.float32
)


def img_gradient(img: jax.Array):
    """img: (b, h, w, c) -> (gx, gy), each (b, h, w, c), depthwise filtered."""
    b, h, w, c = img.shape
    x = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")

    def conv(kernel):
        # Depthwise conv: feature_group_count = c, kernel (kh, kw, 1, c)
        k = jnp.broadcast_to(kernel[:, :, None, None], (3, 3, 1, c)).astype(img.dtype)
        return jax.lax.conv_general_dilated(
            x,
            k,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    return conv(_GX), conv(_GY)
