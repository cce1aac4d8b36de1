"""Device mesh construction and parameter/activation sharding rules.

The reference scales by running three CPU processes against one GPU
(SURVEY.md §2.4); the TPU-native scaling story is a `jax.sharding.Mesh` with
named axes and GSPMD-inserted collectives:

  * `dp` — data parallel over frames/pairs/edges (batch dims).
  * `tp` — tensor parallel over the ViT hidden dims (Megatron-style:
    column-parallel qkv/fc1, row-parallel proj/fc2 — XLA inserts the
    all-reduces on the row-parallel outputs).

`sharding_rules` maps the model parameter pytree (models/init.py layout) to
PartitionSpecs; `shard_params` applies them on a mesh.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axes: Sequence[str] = ("dp", "tp")) -> Mesh:
    """Factorize devices into a (dp, tp) mesh; tp gets the largest power-of-2
    factor <= sqrt(n) so attention heads divide evenly."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    tp = 1
    while tp * 2 <= int(math.isqrt(n)) and n % (tp * 2) == 0:
        tp *= 2
    dp = n // tp
    mesh_devs = np.asarray(devs).reshape(dp, tp)
    return Mesh(mesh_devs, axes)


def param_spec(path: tuple, leaf) -> P:
    """PartitionSpec for one model parameter (stacked blocks have a leading
    depth axis, which stays replicated)."""
    keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
    keys = [k for k in keys if k is not None]
    name = "/".join(str(k) for k in keys)
    nd = leaf.ndim

    def spec_last(axis_name):  # shard last dim
        return P(*([None] * (nd - 1) + [axis_name]))

    def spec_second_last(axis_name):  # shard second-to-last dim
        if nd < 2:
            return P()
        return P(*([None] * (nd - 2) + [axis_name, None]))

    # Column-parallel: qkv, cross q/k/v, fc1 -> shard output dim
    if any(f"{n}/w" in name for n in ("qkv", "fc1")) or any(
        name.endswith(f"cross/{n}/w") for n in ("q", "k", "v")
    ):
        return spec_last("tp")
    if any(f"{n}/b" in name for n in ("qkv", "fc1")) or any(
        name.endswith(f"cross/{n}/b") for n in ("q", "k", "v")
    ):
        return spec_last("tp")
    # Row-parallel: proj, fc2 -> shard input dim; bias replicated
    if "proj/w" in name and ("attn" in name or "cross" in name):
        return spec_second_last("tp")
    if "fc2/w" in name:
        return spec_second_last("tp")
    return P()


def shard_params(params, mesh: Mesh):
    """Place the parameter pytree on the mesh under the Megatron rules."""

    def place(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, param_spec(path, leaf)))

    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(params, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf)), params
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over dp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
