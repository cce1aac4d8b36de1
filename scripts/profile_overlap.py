#!/usr/bin/env python
"""A/B the monster-frame decode/refine overlap (dynamic/mask.py overlap_cb).

Sequential: MonST3R decode -> MASt3R decode -> flow-error -> hysteresis +
GrabCut -> masked match. Overlapped: the MASt3R decode is enqueued right
after the flow-error program, so it executes on-device while the host runs
the refiner. Both paths produce identical outputs (same programs, same
inputs); only the dispatch order differs.
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


def main():
    from monst3r_slam_tpu.dynamic import mask as dyn
    from monst3r_slam_tpu.dynamic import raft as raft_mod
    from monst3r_slam_tpu.models import mast3r as model_api
    from monst3r_slam_tpu.models.config import MAST3R_512, MONST3R_512
    from monst3r_slam_tpu.models.convert import cast_params_for_inference
    from monst3r_slam_tpu.models.init import init_params
    from monst3r_slam_tpu.core import lie

    h, w = 384, 512
    params = cast_params_for_inference(init_params(jax.random.PRNGKey(0), MAST3R_512))
    mparams = cast_params_for_inference(init_params(jax.random.PRNGKey(7), MONST3R_512))
    raft_params = raft_mod.init_raft_params(jax.random.PRNGKey(8))
    dyn.set_flow_error_program(
        raft_mod.make_fused_flow_error_program(raft_params)
    )

    rng = np.random.default_rng(0)
    base_u8 = rng.integers(0, 255, (h, w, 3), np.uint8)
    K = jnp.asarray(
        [[0.6 * w, 0.0, w / 2.0], [0.0, 0.6 * w, h / 2.0], [0.0, 0.0, 1.0]],
        jnp.float32,
    )
    T = lie.sim3_identity()

    def make_uimg(k):
        u = np.roll(base_u8, k * 2, axis=1).copy()
        y0, x0 = h // 3, (w // 4 + k * 5) % (w - 40)
        u[y0 : y0 + 32, x0 : x0 + 32] = 255 - u[y0 : y0 + 32, x0 : x0 + 32]
        return u

    n = 8
    uimgs = [make_uimg(k) for k in range(n + 1)]
    imgs = [
        jnp.asarray((u.astype(np.float32) / 255.0 - 0.5) / 0.5)[None] for u in uimgs
    ]
    kf_feat, kf_pos = model_api.encode(mparams, MONST3R_512, imgs[-1])
    np.asarray(kf_feat)

    def frame(k, overlap: bool):
        img_t, uimg_t, uimg_k = imgs[k % n], uimgs[k % n], uimgs[-1]
        feat, pos = model_api.encode(mparams, MONST3R_512, img_t)
        out_m = model_api.decode(
            mparams, MONST3R_512, feat, pos, kf_feat, kf_pos, (h, w)
        )
        box = {}

        def cb():
            box["a"] = model_api.decode(
                params, MAST3R_512, feat, pos, kf_feat, kf_pos, (h, w)
            )

        if not overlap:
            cb()
        m = dyn.get_dynamic_mask(
            uimg_t, uimg_k, T, T, out_m.X1[0, ..., 2], K,
            threshold=0.35, refine=True, img_i_flow=img_t,
            overlap_cb=cb if overlap else None,
        )
        out_a = box["a"]
        # final consumer sync (stand-in for match_track's output pull)
        np.asarray(out_a.D1[0, 0, 0])
        return m

    for label, overlap in (("sequential", False), ("overlap", True),
                           ("sequential2", False), ("overlap2", True)):
        frame(0, overlap)  # warm
        t0 = time.perf_counter()
        for k in range(n):
            frame(k, overlap)
        dt = (time.perf_counter() - t0) / n
        print(f"{label}_ms: {dt*1e3:.1f}", flush=True)


if __name__ == "__main__":
    main()
