"""Integration test: Easi3R pipeline (attention-reweighted double inference
feeding tracking) — the reference tracker3.py:15 / easi3r_utils.py:53-150 path."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monst3r_slam_tpu.app.config import load_config
from monst3r_slam_tpu.app.pipeline import SLAMSystem
from monst3r_slam_tpu.dynamic.inference import EasiParams, easi3r_asymmetric_inference
from monst3r_slam_tpu.models.config import TINY
from monst3r_slam_tpu.models.init import init_params
from monst3r_slam_tpu.slam import retrieval as retrieval_mod
from tests.test_pipeline import H, W, synth_video

TINY_NODESC = dataclasses.replace(TINY, desc_dim=None, two_confs=False)


@pytest.fixture(scope="module")
def easi_params():
    mast3r = init_params(jax.random.PRNGKey(0), TINY)
    easi = init_params(jax.random.PRNGKey(1), TINY_NODESC)
    return EasiParams(easi, TINY_NODESC, mast3r, TINY, k_mad=2.0)


@pytest.fixture(scope="module")
def easi_slam(easi_params):
    cfg = load_config("config/base.yaml")
    cfg["single_thread"] = True  # deterministic eval mode
    cfg["tracking"]["Q_conf"] = -1e9
    cfg["tracking"]["C_conf"] = -1e9
    cfg["tracking"]["min_match_frac"] = 0.0
    cfg["local_opt"]["Q_conf"] = -1e9
    cfg["local_opt"]["min_match_frac"] = 0.0
    cfg["use_dynamic_mask"] = False  # Easi3R masks inside the pair decode

    return SLAMSystem(
        params=easi_params.mast3r,
        model_cfg=TINY,
        cfg=cfg,
        img_size=(H, W),
        retrieval_params=retrieval_mod.init_retrieval_params(
            jax.random.PRNGKey(2), TINY.enc_dim, hdims=(32,)
        ),
        retrieval_db=retrieval_mod.ASMKDatabase(
            retrieval_mod.make_random_codebook(jax.random.PRNGKey(3), 128, 32)
        ),
        kf_capacity=16,
        easi3r=easi_params,
    )


def test_easi3r_inference_shapes_and_gating(easi_params):
    """The pair inference returns MASt3R descriptors with Easi3R pointmaps,
    and zeroes C/Q exactly on the attention dynamic mask."""
    from monst3r_slam_tpu.dynamic.easi3r import easi3r_double_inference_pair
    from monst3r_slam_tpu.models import mast3r as model_api

    img = jnp.asarray(synth_video(2, seed=5)[0])[None]
    img2 = jnp.asarray(synth_video(2, seed=5)[1])[None]
    feat1, pos1 = model_api.encode(easi_params.easi3r, TINY_NODESC, img)
    feat2, pos2 = model_api.encode(easi_params.easi3r, TINY_NODESC, img2)

    out = easi3r_asymmetric_inference(
        easi_params, feat1, pos1, feat2, pos2, (H, W)
    )
    assert out.X1.shape == (1, H, W, 3)
    assert out.D1.shape[-1] == TINY.desc_dim
    raw = easi3r_double_inference_pair(
        easi_params.easi3r, TINY_NODESC, feat1, pos1, feat2, pos2, (H, W),
        k_mad=easi_params.k_mad,
    )
    # C is zeroed exactly on dynamic pixels and untouched elsewhere
    np.testing.assert_allclose(
        np.asarray(out.C1), np.asarray(raw.C1 * (~raw.dyn_mask1)), rtol=1e-6
    )
    m = np.asarray(raw.dyn_mask1)
    if m.any():
        assert (np.asarray(out.Q1)[m] == 0).all()


def test_easi3r_pipeline_runs(easi_slam):
    frames = synth_video(5, seed=11)
    for i, img in enumerate(frames):
        uimg = np.uint8(np.clip((img + 1) / 2, 0, 1) * 255)
        easi_slam.process_frame(i, float(i) / 30.0, img, uimg=uimg)
    assert len(easi_slam.frame_poses) == 5
    poses = np.stack(easi_slam.frame_poses)
    assert np.isfinite(poses).all()
    assert int(easi_slam.mem.count) >= 1
    qn = np.linalg.norm(poses[:, 3:7], axis=-1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-4)
