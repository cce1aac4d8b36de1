"""Golden-value regression tests — NO torch / reference tree required.

Replays the committed fixtures from tests/fixtures/ (generated once by
scripts/gen_golden_fixtures.py from the reference torch oracle):

  * model golden: the state dict is reconstructed from the committed
    name/shape manifest + the deterministic numpy fill recipe, converted with
    models/convert.py, and the JAX forward pass must reproduce the frozen
    torch-oracle probe values (catches converter AND model regressions by
    VALUE, even where the live torch-parity tests would be skipped).
  * resize goldens: data/preprocess.resize_img must match the reference
    `resize_img` (mast3r_utils.py:248-282) PIXEL-EXACTLY for landscape /
    portrait / square inputs at 512 and 224.
"""

import importlib.util
import json
import pathlib

import numpy as np
import pytest

FIX = pathlib.Path(__file__).parent / "fixtures"
SCRIPTS = pathlib.Path(__file__).parent.parent / "scripts"

if not (FIX / "model_golden.npz").is_file():  # pragma: no cover
    pytest.skip("golden fixtures not generated", allow_module_level=True)


def _gen_module():
    """Load the generation script for the shared weight/image recipes."""
    spec = importlib.util.spec_from_file_location(
        "gen_golden_fixtures", SCRIPTS / "gen_golden_fixtures.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _probe(a, k=64):
    a = np.asarray(a, np.float64).ravel()
    step = max(1, a.size // k)
    return a[::step][:k].astype(np.float32)


def test_model_golden_values():
    import jax.numpy as jnp

    from monst3r_slam_tpu.models import mast3r as jmodel
    from monst3r_slam_tpu.models.config import INF, ModelConfig
    from monst3r_slam_tpu.models.convert import params_from_state_dict

    gen = _gen_module()
    cfg = ModelConfig(
        enc_depth=2, enc_dim=64, enc_heads=4,
        dec_depth=12, dec_dim=48, dec_heads=4,
        desc_dim=24, two_confs=True, desc_conf_mode=("exp", 0.0, INF),
    )
    manifest = json.loads((FIX / "model_manifest.json").read_text())
    rng = np.random.default_rng(1234)
    sd = {name: gen.fill_value(name, shape, rng) for name, shape in manifest}
    params = params_from_state_dict(sd, cfg)

    H, W = 64, 80
    rng_in = np.random.default_rng(99)
    img1 = rng_in.standard_normal((1, 3, H, W)).astype(np.float32) * 0.5
    img2 = rng_in.standard_normal((1, 3, H, W)).astype(np.float32) * 0.5

    feat1, pos1 = jmodel.encode(
        params, cfg, jnp.asarray(img1.transpose(0, 2, 3, 1)), dtype=jnp.float32
    )
    feat2, pos2 = jmodel.encode(
        params, cfg, jnp.asarray(img2.transpose(0, 2, 3, 1)), dtype=jnp.float32
    )
    out = jmodel.decode(
        params, cfg, feat1, pos1, feat2, pos2, (H, W), dtype=jnp.float32
    )

    g = np.load(FIX / "model_golden.npz")
    got = {
        "feat1": feat1, "X1": out.X1, "C1": out.C1, "D1": out.D1, "Q1": out.Q1,
        "X2": out.X2, "C2": out.C2, "D2": out.D2, "Q2": out.Q2,
    }
    for key, t in got.items():
        t = np.asarray(t)
        assert tuple(t.shape) == tuple(g[f"{key}_shape"]), key
        atol = 2e-4 if key == "feat1" else 2e-3
        np.testing.assert_allclose(
            _probe(t), g[f"{key}_probe"], atol=atol, rtol=1e-2,
            err_msg=f"golden mismatch: {key}",
        )
        np.testing.assert_allclose(
            t.mean(), g[f"{key}_mean"], atol=atol, rtol=1e-2, err_msg=key
        )
        np.testing.assert_allclose(
            t.std(), g[f"{key}_std"], atol=atol, rtol=1e-2, err_msg=key
        )


@pytest.mark.parametrize(
    "case", ["landscape_512", "portrait_512", "square_512", "landscape_224"]
)
def test_resize_img_pixel_exact(case):
    from monst3r_slam_tpu.data.preprocess import resize_img

    gen = _gen_module()
    g = np.load(FIX / f"resize_golden_{case}.npz")
    img = gen.make_test_image(int(g["in_h"]), int(g["in_w"]), int(g["seed"]))
    res = resize_img(img, int(g["size"]))

    np.testing.assert_array_equal(
        res["unnormalized_img"], g["unnormalized_img"],
        err_msg=f"resize_img pixel mismatch vs reference ({case})",
    )
    np.testing.assert_array_equal(res["true_shape"], g["true_shape"])
    # ImgNorm equivalence: normalized output == (u8/255 - .5)/.5 bit-exactly
    expect = (g["unnormalized_img"].astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_array_equal(res["img"][0], expect)


def _self_gen_module():
    """Load the self-golden generator so test and generator share ONE
    input/forward recipe (same pattern as _gen_module above)."""
    spec = importlib.util.spec_from_file_location(
        "gen_self_goldens", SCRIPTS / "gen_self_goldens.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_raft_self_golden():
    """Freeze RAFT numerics (no external oracle in this image: the
    reference's RAFT submodule is empty, torchvision absent). Catches
    unintended changes to padding, precision, or layer wiring by value.
    Regenerate with scripts/gen_self_goldens.py on DELIBERATE changes."""
    gen = _self_gen_module()
    gold = np.load(FIX / "raft_self_golden.npz")
    flow = gen.compute_raft()
    yx = gold["probe_yx"]
    np.testing.assert_allclose(
        flow[yx[:, 0], yx[:, 1]], gold["probe_vals"], atol=1e-3, rtol=1e-3
    )
    np.testing.assert_allclose(flow.mean(axis=(0, 1)), gold["mean"], atol=1e-3)
    np.testing.assert_allclose(flow.std(), gold["std"], atol=1e-3)


def test_sam2_self_golden():
    """Freeze SAM2 numerics (same rationale as the RAFT self-golden); locks
    the round-3 fidelity fixes: patch-embed (3,3) padding, lagged window
    spec, first-two-way-layer replace, no_mem/no_mask embeddings."""
    gen = _self_gen_module()
    gold = np.load(FIX / "sam2_self_golden.npz")
    masks, iou = gen.compute_sam2()
    np.testing.assert_allclose(
        masks[:, :, ::37, ::41], gold["mask_probe"], atol=2e-3, rtol=2e-3
    )
    np.testing.assert_allclose(iou, gold["iou"], atol=1e-3)
