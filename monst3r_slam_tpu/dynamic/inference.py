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


# ---------------------------------------------------------------------------
# Easi3R pipeline (reference tracker3.py:15 + easi3r_utils.py:53-150):
# pointmaps from a two-pass attention-reweighted DUSt3R inference, descriptors
# from MASt3R, with the attention-derived dynamic masks gating C and Q.
# ---------------------------------------------------------------------------


class EasiParams(NamedTuple):
    easi3r: dict  # DUSt3R-architecture params (no descriptor head needed)
    easi3r_cfg: ModelConfig
    mast3r: dict
    mast3r_cfg: ModelConfig
    k_mad: float = 2.0


def easi3r_asymmetric_inference(ep: EasiParams, feat_i, pos_i, feat_j, pos_j, shape):
    """PairOutput with X/C from the Easi3R double inference (second pass,
    attention-reweighted) and D/Q from MASt3R; the per-pixel dynamic masks
    from pass 1 zero C and Q on dynamic pixels (the reference applies its
    masks into confidence gating the same way, easi3r_utils.py:220-329).

    feat_* are Easi3R encoder features (both decoders share them, as in the
    MonST3R dual path).
    """
    from monst3r_slam_tpu.dynamic.easi3r import easi3r_double_inference_pair

    out_e = easi3r_double_inference_pair(
        ep.easi3r, ep.easi3r_cfg, feat_i, pos_i, feat_j, pos_j, shape,
        k_mad=ep.k_mad,
    )
    out_a = model_api.decode(
        ep.mast3r, ep.mast3r_cfg, feat_i, pos_i, feat_j, pos_j, shape
    )
    keep1 = (~out_e.dyn_mask1).astype(out_e.C1.dtype)
    keep2 = (~out_e.dyn_mask2).astype(out_e.C2.dtype)
    return model_api.PairOutput(
        X1=out_e.X1, C1=out_e.C1 * keep1,
        D1=out_a.D1, Q1=out_a.Q1 * keep1,
        X2=out_e.X2, C2=out_e.C2 * keep2,
        D2=out_a.D2, Q2=out_a.Q2 * keep2,
    )


def easi3r_inference_mono(ep: EasiParams, feat, pos, shape):
    return easi3r_asymmetric_inference(ep, feat, pos, feat, pos, shape)
