"""TPU-native (JAX/XLA/Pallas) MonST3R/MASt3R-SLAM framework.

A brand-new implementation of the capabilities of tanguy8001/Monst3R-SLAM
(real-time monocular dense SLAM with pointmap foundation models), designed
TPU-first: fixed shapes, functional state, `lax` control flow, Pallas kernels
on the hot paths, and `jax.sharding` meshes for multi-chip scaling.
"""

__version__ = "0.1.0"
