"""Per-stage timing of the monster (dynamic) pipeline's frame step.

Breaks the 1.6 s/frame figure from bench.py's monster metric into:
encode, MonST3R decode, MASt3R decode, RAFT flow, ego-flow + error map,
hysteresis refine, GrabCut refine, masked match+track.
Run on the real chip (ONE TPU process at a time).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from monst3r_slam_tpu.models import mast3r as model_api
from monst3r_slam_tpu.models.config import MAST3R_512, MONST3R_512
from monst3r_slam_tpu.models.convert import cast_params_for_inference
from monst3r_slam_tpu.models.init import init_params
from monst3r_slam_tpu.dynamic import mask as dyn
from monst3r_slam_tpu.dynamic import raft as raft_mod
from monst3r_slam_tpu.dynamic.refine import hysteresis_mask, grabcut_refine, refine_dynamic_mask
from monst3r_slam_tpu.core import lie

h, w = 384, 512
hw = h * w


def timeit(name, fn, n=5):
    fn()  # warm (compile)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    # force a host sync on whatever came back
    leaves = jax.tree_util.tree_leaves(out)
    if leaves and hasattr(leaves[-1], "block_until_ready"):
        np.asarray(leaves[-1])
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:34s} {dt:9.2f} ms")
    return dt


def main():
    cfg, mcfg = MAST3R_512, MONST3R_512
    params = cast_params_for_inference(init_params(jax.random.PRNGKey(0), cfg))
    mparams = cast_params_for_inference(init_params(jax.random.PRNGKey(1), mcfg))
    raft_cfg = raft_mod.RAFTConfig()
    raft_params = raft_mod.init_raft_params(jax.random.PRNGKey(2), raft_cfg)

    rng = np.random.default_rng(0)
    u0 = rng.integers(0, 255, (h, w, 3), np.uint8)
    u1 = np.roll(u0, 3, axis=1).copy()
    u1[120:180, 200:280] = 255 - u1[120:180, 200:280]
    img = jnp.asarray((u0.astype(np.float32) / 255 - 0.5) / 0.5)[None]

    feat, pos = model_api.encode(params, cfg, img)
    np.asarray(feat)
    K = jnp.asarray([[0.6 * w, 0, w / 2], [0, 0.6 * w, h / 2], [0, 0, 1]], jnp.float32)
    T_i = jnp.asarray(lie.sim3_identity())
    T_j = lie.sim3_retr(T_i, jnp.asarray([0.01, 0, 0, 0, 0.002, 0, 0]))
    depth = jnp.full((h, w), 3.0)

    timeit("encode", lambda: model_api.encode(params, cfg, img))
    timeit("decode mast3r (D/Q heads)", lambda: model_api.decode(params, cfg, feat, pos, feat, pos, (h, w)))
    timeit("decode monst3r (X/C)", lambda: model_api.decode(mparams, mcfg, feat, pos, feat, pos, (h, w)))

    fi = jnp.asarray(u0, jnp.float32)
    fj = jnp.asarray(u1, jnp.float32)
    timeit("raft flow 20 iters (device only)", lambda: raft_mod.raft_flow(raft_params, fi, fj, raft_cfg))
    flow_fn = raft_mod.make_raft_flow_estimator(raft_params, raft_cfg)
    timeit("raft flow (host adapter)", lambda: flow_fn(u0, u1))

    flow_np = flow_fn(u0, u1)
    timeit("ego flow + err map (jnp+sync)", lambda: np.asarray(
        dyn.flow_error_map(jnp.asarray(flow_np), dyn.ego_motion_flow(T_i, T_j, depth, K))
    ))
    err = np.asarray(dyn.flow_error_map(jnp.asarray(flow_np), dyn.ego_motion_flow(T_i, T_j, depth, K)))
    raw = err > 0.35
    print(f"{'raw mask px':34s} {int(raw.sum()):9d}")
    fused = raft_mod.make_fused_flow_error_program(raft_params, raft_cfg)
    timeit("fused flow+ego+err program", lambda: fused(u0, u1, T_i, T_j, depth, K))
    timeit("hysteresis", lambda: hysteresis_mask(err, 0.35, 0.1575), n=3)
    grown = hysteresis_mask(err, 0.35, 0.1575) | raw
    print(f"{'grown mask px':34s} {int(grown.sum()):9d}")
    timeit("grabcut full-res", lambda: grabcut_refine(u0, grown, scale=1), n=3)
    timeit("grabcut 2x-down", lambda: grabcut_refine(u0, grown, scale=2), n=3)
    timeit("full refine_dynamic_mask", lambda: refine_dynamic_mask(u0, err, raw), n=3)
    dyn.set_flow_error_program(fused)
    timeit("full get_dynamic_mask (fused)", lambda: dyn.get_dynamic_mask(
        u0, u1, T_i, T_j, depth, K, threshold=0.35, refine=True
    ), n=3)


if __name__ == "__main__":
    dyn.set_flow_estimator(None)  # keep DIS out; we install RAFT explicitly
    main()
