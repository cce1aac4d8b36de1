"""Tests for the native Easi3R attention-reweighting implementation."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from monst3r_slam_tpu.dynamic import easi3r
from monst3r_slam_tpu.models import croco, mast3r as model_api
from monst3r_slam_tpu.models.config import TINY
from monst3r_slam_tpu.models.init import init_params

CFG = dataclasses.replace(TINY, desc_dim=None, two_confs=False)
H, W = 64, 80


def _setup():
    params = init_params(jax.random.PRNGKey(0), CFG)
    img1 = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, 3)) * 0.5
    img2 = jax.random.normal(jax.random.PRNGKey(2), (1, H, W, 3)) * 0.5
    f1, p1 = croco.encode_image(params, CFG, img1, jnp.float32)
    f2, p2 = croco.encode_image(params, CFG, img2, jnp.float32)
    return params, f1, p1, f2, p2


def test_attention_colsums_normalized():
    params, f1, p1, f2, p2 = _setup()
    _, _, attn1, attn2 = easi3r._decode_pair_attn(
        params, CFG, f1, p1, f2, p2, dtype=jnp.float32
    )
    # Each layer's attention rows sum to 1 => normalized mean mass ~ 1.0
    np.testing.assert_allclose(float(jnp.mean(attn1)), 1.0, atol=1e-3)
    np.testing.assert_allclose(float(jnp.mean(attn2)), 1.0, atol=1e-3)


def test_unbiased_matches_plain_decode():
    params, f1, p1, f2, p2 = _setup()
    dec1, dec2, _, _ = easi3r._decode_pair_attn(
        params, CFG, f1, p1, f2, p2, dtype=jnp.float32
    )
    ref1, ref2 = croco.decode_pair(params, CFG, f1, p1, f2, p2, jnp.float32)
    for a, b in zip(dec1, ref1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)


def test_dynamic_mask_flags_low_attention():
    attn = jnp.ones((1, 100)).at[0, 10:13].set(0.1)
    mask = easi3r.attention_dynamic_mask(attn, k_mad=2.0)
    assert bool(mask[0, 10]) and bool(mask[0, 11])
    assert int(mask.sum()) == 3


def test_double_inference_shapes():
    params, f1, p1, f2, p2 = _setup()
    out = easi3r.easi3r_double_inference_pair(
        params, CFG, f1, p1, f2, p2, (H, W)
    )
    assert out.X1.shape == (1, H, W, 3)
    assert out.dyn_mask1.shape == (1, H, W)
    assert bool(jnp.isfinite(out.X1).all())
    assert bool(jnp.isfinite(out.C1).all())
