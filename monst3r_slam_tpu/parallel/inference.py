"""Sharded inference fan-out.

Two inference stages dominate multi-chip headroom beyond the backend solve
(which gauss_newton_sharded already dp-shards):

  * The factor-graph edge decode: `add_factors` batches 2E pair decodes into
    one program (app/pipeline.py) — embarrassingly parallel over edges.  The
    reference pays 4 *serial* decoder passes per edge on one GPU
    (mast3r_utils.py:87-120); here the batch dim shards over the mesh's `dp`
    axis and XLA partitions the whole decoder+heads program (attention is
    per-image, so no cross-device collectives are needed except where
    parameters are tensor-parallel).
  * The dynamic pipeline's dual decode: MonST3R (X/C) and MASt3R (D/Q) run
    on the SAME encoder features but with independent weights
    (dynamic/inference.py) — two independent programs that can execute
    concurrently on two devices, with the descriptor outputs transferred
    back over ICI for matching.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from monst3r_slam_tpu.models import mast3r as model_api
from monst3r_slam_tpu.models.config import ModelConfig
from monst3r_slam_tpu.parallel.mesh import batch_sharding, replicated


def _pad_rows(x: jax.Array, n_to: int) -> jax.Array:
    """Pad the leading (batch) dim with zeros up to n_to rows."""
    pad = n_to - x.shape[0]
    if pad == 0:
        return x
    return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)


def place_replicated(params, mesh: Mesh):
    """Replicate a parameter pytree across every device of the mesh (one
    jitted identity so the transfer is a single dispatch, not per-leaf)."""
    sh = replicated(mesh)
    return jax.jit(lambda p: p, out_shardings=sh)(params)


def sharded_edge_decode(
    mesh: Mesh,
    params,
    cfg: ModelConfig,
    feat1: jax.Array,
    pos1: jax.Array,
    feat2: jax.Array,
    pos2: jax.Array,
    shape,
) -> model_api.PairOutput:
    """`model_api.decode` with the edge-batch dim sharded over `dp`.

    Pads the batch to a multiple of the dp axis size (decode cost is per-row,
    so pad rows only waste the remainder), runs the ordinary jitted decode —
    GSPMD propagates the input sharding through the whole decoder+heads
    program — and strips the pad rows.  `params` must already live on the
    mesh (place_replicated or mesh.shard_params).
    """
    dp = mesh.shape["dp"]
    B = feat1.shape[0]
    Bp = ((B + dp - 1) // dp) * dp
    bsh = batch_sharding(mesh)
    a = [
        jax.device_put(_pad_rows(jnp.asarray(x), Bp), bsh)
        for x in (feat1, pos1, feat2, pos2)
    ]
    out = model_api.decode(params, cfg, a[0], a[1], a[2], a[3], shape)
    if Bp == B:
        return out
    return model_api.PairOutput(*(None if t is None else t[:B] for t in out))


def dual_device_pair(mesh_or_devices) -> Optional[Sequence[jax.Device]]:
    """Pick two distinct devices for the dual decoder, or None if single."""
    if isinstance(mesh_or_devices, Mesh):
        devs = list(mesh_or_devices.devices.flat)
    else:
        devs = list(mesh_or_devices)
    if len(devs) < 2:
        return None
    return devs[0], devs[1]


def dual_decode_two_device(
    dual,  # dynamic.inference.DualParams with params pre-placed per device
    dev_a: jax.Device,
    dev_b: jax.Device,
    feat_i,
    pos_i,
    feat_j,
    pos_j,
    shape,
) -> model_api.PairOutput:
    """The dynamic pipeline's dual decode with MonST3R on dev_a and MASt3R
    on dev_b, dispatched back-to-back so the two programs overlap; D/Q come
    home to dev_a for the matcher.

    Mirrors monst3r_asymmetric_inference (dynamic/inference.py:27-41): X/C
    from MonST3R, D/Q from MASt3R, both decoders reading the SAME MonST3R
    encoder features (reference monst3r_utils.py:256-298).
    """
    ins_a = [jax.device_put(x, dev_a) for x in (feat_i, pos_i, feat_j, pos_j)]
    ins_b = [jax.device_put(x, dev_b) for x in (feat_i, pos_i, feat_j, pos_j)]
    # Async dispatch: both decodes are in flight before either result is used.
    out_m = model_api.decode(dual.monst3r, dual.monst3r_cfg, *ins_a, shape)
    out_a = model_api.decode(dual.mast3r, dual.mast3r_cfg, *ins_b, shape)
    home = lambda t: None if t is None else jax.device_put(t, dev_a)
    return model_api.PairOutput(
        X1=out_m.X1, C1=out_m.C1, D1=home(out_a.D1), Q1=home(out_a.Q1),
        X2=out_m.X2, C2=out_m.C2, D2=home(out_a.D2), Q2=home(out_a.Q2),
    )


def place_dual(dual, dev_a: jax.Device, dev_b: jax.Device):
    """Return a DualParams copy with MonST3R weights on dev_a and MASt3R
    weights on dev_b (one jitted identity per model: a single transfer
    dispatch each, not one per leaf)."""
    put_a = jax.jit(lambda p: p, out_shardings=jax.sharding.SingleDeviceSharding(dev_a))
    put_b = jax.jit(lambda p: p, out_shardings=jax.sharding.SingleDeviceSharding(dev_b))
    return type(dual)(
        monst3r=put_a(dual.monst3r),
        monst3r_cfg=dual.monst3r_cfg,
        mast3r=put_b(dual.mast3r),
        mast3r_cfg=dual.mast3r_cfg,
    )
