"""Robust weights and GN convergence checks.

Mirrors `mast3r_slam/nonlinear_optimizer.py` (check_convergence:5, huber:28,
tukey:36) as jit-friendly functions returning arrays, not Python bools.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def huber(r: jax.Array, k: float = 1.345) -> jax.Array:
    r_abs = jnp.abs(r)
    return jnp.where(r_abs < k, 1.0, k / jnp.maximum(r_abs, 1e-30))


def tukey(r: jax.Array, t: float = 4.6851) -> jax.Array:
    r_abs = jnp.abs(r)
    tmp = 1.0 - jnp.square(r_abs / t)
    return jnp.where(r_abs < t, tmp * tmp, 0.0)


def converged(
    rel_error_threshold: float,
    delta_norm_threshold: float,
    old_cost: jax.Array,
    new_cost: jax.Array,
    delta: jax.Array,
) -> jax.Array:
    """Boolean array version of nonlinear_optimizer.py:5-25."""
    rel_dec = jnp.abs((old_cost - new_cost) / old_cost)
    delta_norm = jnp.linalg.norm(delta)
    return (rel_dec < rel_error_threshold) | (delta_norm < delta_norm_threshold)
