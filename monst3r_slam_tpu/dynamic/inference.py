"""Dual-model inference for the dynamic pipeline.

The MonST3R pipeline runs BOTH decoders on the SAME MonST3R encoder features
(`monst3r_utils.py:256-298`): pointmaps X, C come from the MonST3R decoder
(dynamic-scene finetuned, no descriptor head), while descriptors D and
confidences Q come from the MASt3R decoder + catMLP head. One encoder pass,
two decoder passes — batched here where the reference runs them serially.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax

from monst3r_slam_tpu.models import mast3r as model_api
from monst3r_slam_tpu.models.config import ModelConfig


class DualParams(NamedTuple):
    monst3r: dict
    monst3r_cfg: ModelConfig
    mast3r: dict
    mast3r_cfg: ModelConfig


def monst3r_asymmetric_inference(dual: DualParams, feat_i, pos_i, feat_j, pos_j, shape):
    """Returns a PairOutput with X/C from MonST3R and D/Q from MASt3R.

    feat_* are MonST3R encoder features (cached on frames).
    """
    out_m = model_api.decode(
        dual.monst3r, dual.monst3r_cfg, feat_i, pos_i, feat_j, pos_j, shape
    )
    out_a = model_api.decode(
        dual.mast3r, dual.mast3r_cfg, feat_i, pos_i, feat_j, pos_j, shape
    )
    return model_api.PairOutput(
        X1=out_m.X1, C1=out_m.C1, D1=out_a.D1, Q1=out_a.Q1,
        X2=out_m.X2, C2=out_m.C2, D2=out_a.D2, Q2=out_a.Q2,
    )


def monst3r_inference_mono(dual: DualParams, feat, pos, shape):
    return monst3r_asymmetric_inference(dual, feat, pos, feat, pos, shape)
