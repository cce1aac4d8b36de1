"""Parity test: Pallas fused attention (interpret mode on CPU) vs XLA."""

import jax
import jax.numpy as jnp
import numpy as np

from monst3r_slam_tpu.ops import attention


def test_fused_attention_matches_xla():
    key = jax.random.PRNGKey(0)
    b, h, n, d = 2, 4, 128, 64
    q = jax.random.normal(key, (b, h, n, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, n, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, n, d), jnp.float32)
    ref = attention.sdpa(q, k, v, use_pallas=False)
    out = attention.fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_fused_attention_cross_shapes():
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (1, 2, 64, 32), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(4), (1, 2, 256, 32), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 256, 32), jnp.float32)
    ref = attention.sdpa(q, k, v, use_pallas=False)
    out = attention.fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_fits_heuristic():
    assert attention.attention_fits_fused(768, 768, 64)
    assert not attention.attention_fits_fused(16384, 16384, 64)
