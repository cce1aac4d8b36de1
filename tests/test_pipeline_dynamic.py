"""Integration test: dynamic (MonST3R-style dual-model) pipeline on CPU."""

import numpy as np
import jax
import pytest

from monst3r_slam_tpu.app.config import load_config
from monst3r_slam_tpu.app.pipeline import SLAMSystem
from monst3r_slam_tpu.dynamic.inference import DualParams
from monst3r_slam_tpu.models.config import TINY, ModelConfig
from monst3r_slam_tpu.models.init import init_params
from monst3r_slam_tpu.slam import retrieval as retrieval_mod
from tests.test_pipeline import H, W, synth_video

import dataclasses

TINY_NODESC = dataclasses.replace(TINY, desc_dim=None, two_confs=False)


@pytest.fixture(scope="module")
def dyn_slam():
    cfg = load_config("config/base.yaml")
    cfg["single_thread"] = True  # deterministic eval mode
    cfg["tracking"]["Q_conf"] = -1e9
    cfg["tracking"]["C_conf"] = -1e9
    cfg["tracking"]["min_match_frac"] = 0.0
    cfg["local_opt"]["Q_conf"] = -1e9
    cfg["local_opt"]["min_match_frac"] = 0.0
    cfg["use_dynamic_mask"] = True
    cfg["use_calib"] = True
    # keep test runs from writing per-frame debug PNGs into logs/
    cfg["debug_save_dynamic_mask"] = False
    cfg["debug_save_final_valid_opt_mask"] = False
    cfg["debug_save_pointmap_visualization"] = False
    cfg["debug_save_3d_pointclouds"] = False

    mast3r = init_params(jax.random.PRNGKey(0), TINY)
    monst3r = init_params(jax.random.PRNGKey(1), TINY_NODESC)
    dual = DualParams(monst3r, TINY_NODESC, mast3r, TINY)

    K = np.asarray([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1.0]], np.float32)
    return SLAMSystem(
        params=mast3r,
        model_cfg=TINY,
        cfg=cfg,
        img_size=(H, W),
        K=jax.numpy.asarray(K),
        retrieval_params=retrieval_mod.init_retrieval_params(
            jax.random.PRNGKey(2), TINY.enc_dim, hdims=(32,)
        ),
        retrieval_db=retrieval_mod.ASMKDatabase(
            retrieval_mod.make_random_codebook(jax.random.PRNGKey(3), 128, 32)
        ),
        kf_capacity=16,
        dual=dual,
    )


def test_dynamic_pipeline_runs(dyn_slam):
    frames = synth_video(5, seed=7)
    rng = np.random.default_rng(0)
    for i, img in enumerate(frames):
        uimg = np.uint8(np.clip((img + 1) / 2, 0, 1) * 255)
        dyn_slam.process_frame(i, float(i) / 30.0, img, uimg=uimg)
    assert len(dyn_slam.frame_poses) == 5
    poses = np.stack(dyn_slam.frame_poses)
    assert np.isfinite(poses).all()
    assert int(dyn_slam.mem.count) >= 1
