#!/usr/bin/env python
"""Self-golden fixtures for RAFT and SAM2 (CPU, fixed seeds).

There is no external oracle for these in this image (the reference's RAFT /
SAM2 submodules are empty and torchvision is absent), so the goldens freeze
OUR implementations' numerics: any unintended change to padding, activation
flavors, precision, or layer wiring fails tests/test_golden.py by VALUE.
Regenerate (and say why in the commit) when the architecture changes
deliberately.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")  # env vars are too late (sitecustomize)

import jax.numpy as jnp
import numpy as np

OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures"


RAFT_PROBE_YX = np.asarray([[7, 11], [30, 50], [60, 90], [15, 80]])


def compute_raft():
    """The frozen recipe — shared with tests/test_golden.py, which imports
    this module so the test can never drift from the generator."""
    from monst3r_slam_tpu.dynamic import raft as raft_mod

    cfg = raft_mod.RAFTConfig(iters=4)
    params = raft_mod.init_raft_params(jax.random.PRNGKey(11), cfg)
    rng = np.random.default_rng(5)
    h, w = 64, 96
    u0 = rng.integers(0, 255, (h, w, 3), np.uint8)
    u1 = np.roll(u0, 2, axis=1)
    return np.asarray(
        raft_mod.raft_flow(
            params, jnp.asarray(u0, jnp.float32), jnp.asarray(u1, jnp.float32), cfg
        )
    )


def compute_sam2():
    from monst3r_slam_tpu.dynamic import sam2 as sam2_mod

    scfg = sam2_mod.SAM2_TEST
    sparams = sam2_mod.init_sam2_params(jax.random.PRNGKey(7), scfg)
    S = scfg.img_size
    img = jax.random.uniform(jax.random.PRNGKey(9), (1, S, S, 3))
    pts = jnp.asarray([[[0.4, 0.3]], [[0.7, 0.6]]], jnp.float32)
    lbs = jnp.asarray([[1], [1]], jnp.int32)
    masks, iou = sam2_mod.sam2_image_forward(sparams, scfg, img, pts, lbs)
    return np.asarray(masks), np.asarray(iou)


def gen_raft():
    flow = compute_raft()
    np.savez(
        OUT / "raft_self_golden.npz",
        probe_yx=RAFT_PROBE_YX,
        probe_vals=flow[RAFT_PROBE_YX[:, 0], RAFT_PROBE_YX[:, 1]],
        mean=flow.mean(axis=(0, 1)),
        std=np.float32(flow.std()),
    )
    print("raft golden:", flow.mean(axis=(0, 1)), flow.std())


def gen_sam2():
    masks, iou = compute_sam2()
    np.savez(
        OUT / "sam2_self_golden.npz",
        mask_probe=masks[:, :, ::37, ::41],
        iou=iou,
    )
    print("sam2 golden:", iou.ravel()[:4], masks.std())


if __name__ == "__main__":
    gen_raft()
    gen_sam2()
