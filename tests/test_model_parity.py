"""Numerical parity of the JAX model vs the reference torch implementation.

Builds the reference AsymmetricMASt3R (vendored at /root/reference, imported
as a test oracle only) with small random weights, converts the state dict with
`models/convert.py`, and compares encoder features and all head outputs.
Skipped automatically when the reference tree is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/MASt3R-SLAM/thirdparty/mast3r"

torch = pytest.importorskip("torch")
if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference tree unavailable", allow_module_level=True)

for p in (REF, f"{REF}/dust3r", f"{REF}/dust3r/croco"):
    if p not in sys.path:
        sys.path.insert(0, p)

import jax.numpy as jnp  # noqa: E402

from monst3r_slam_tpu.models import mast3r as jmodel  # noqa: E402
from monst3r_slam_tpu.models.config import INF, ModelConfig  # noqa: E402
from monst3r_slam_tpu.models.convert import (  # noqa: E402
    config_from_arch_string,
    params_from_state_dict,
)

H, W = 64, 80

CFG = ModelConfig(
    enc_depth=2,
    enc_dim=64,
    enc_heads=4,
    dec_depth=12,
    dec_dim=48,
    dec_heads=4,
    desc_dim=24,
    two_confs=True,
    desc_conf_mode=("exp", 0.0, INF),
)


@pytest.fixture(scope="module")
def oracle():
    from mast3r.model import AsymmetricMASt3R

    torch.manual_seed(0)
    model = AsymmetricMASt3R(
        output_mode="pts3d+desc24",
        head_type="catmlp+dpt",
        depth_mode=("exp", -INF, INF),
        conf_mode=("exp", 1, INF),
        desc_conf_mode=("exp", 0, INF),
        two_confs=True,
        enc_embed_dim=CFG.enc_dim,
        enc_depth=CFG.enc_depth,
        enc_num_heads=CFG.enc_heads,
        dec_embed_dim=CFG.dec_dim,
        dec_depth=CFG.dec_depth,
        dec_num_heads=CFG.dec_heads,
        pos_embed="RoPE100",
        img_size=(H, W),
        patch_embed_cls="PatchEmbedDust3R",
        landscape_only=False,
    ).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = params_from_state_dict(sd, CFG)
    return model, params


def _torch_forward(model, img1, img2):
    with torch.inference_mode():
        shape = torch.tensor([[H, W]])
        feat1, pos1, _ = model._encode_image(torch.from_numpy(img1), shape)
        feat2, pos2, _ = model._encode_image(torch.from_numpy(img2), shape)
        d1, d2 = model._decoder(feat1, pos1, feat2, pos2)
        r1 = model._downstream_head(1, [t.float() for t in d1], shape)
        r2 = model._downstream_head(2, [t.float() for t in d2], shape)
    return (feat1, pos1), (r1, r2)


def test_full_pair_parity(oracle):
    model, params = oracle
    rng = np.random.default_rng(0)
    img1 = rng.standard_normal((1, 3, H, W), dtype=np.float32) * 0.5
    img2 = rng.standard_normal((1, 3, H, W), dtype=np.float32) * 0.5

    (feat1_t, pos1_t), (r1_t, r2_t) = _torch_forward(model, img1, img2)

    img1_j = jnp.asarray(img1.transpose(0, 2, 3, 1))
    img2_j = jnp.asarray(img2.transpose(0, 2, 3, 1))
    feat1, pos1 = jmodel.encode(params, CFG, img1_j, dtype=jnp.float32)
    feat2, pos2 = jmodel.encode(params, CFG, img2_j, dtype=jnp.float32)

    np.testing.assert_allclose(
        np.asarray(feat1), feat1_t.numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_array_equal(np.asarray(pos1), pos1_t.numpy())

    out = jmodel.decode(params, CFG, feat1, pos1, feat2, pos2, (H, W), dtype=jnp.float32)

    np.testing.assert_allclose(
        np.asarray(out.X1), r1_t["pts3d"].numpy(), atol=2e-3, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(out.C1), r1_t["conf"].numpy(), atol=2e-3, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(out.D1), r1_t["desc"].numpy(), atol=2e-3, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(out.Q1), r1_t["desc_conf"].numpy(), atol=2e-3, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(out.X2), r2_t["pts3d"].numpy(), atol=2e-3, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(out.C2), r2_t["conf"].numpy(), atol=2e-3, rtol=1e-2
    )


def test_config_from_arch_string():
    arch = (
        "AsymmetricMASt3R(desc_conf_mode=('exp', 0, inf), two_confs=True, "
        "output_mode='pts3d+desc24', head_type='catmlp+dpt', "
        "depth_mode=('exp', -inf, inf), conf_mode=('exp', 1, inf), "
        "enc_embed_dim=1024, enc_depth=24, enc_num_heads=16, "
        "dec_embed_dim=768, dec_depth=12, dec_num_heads=12, "
        "patch_embed_cls='PatchEmbedDust3R', img_size=(512, 512), "
        "landscape_only=False)"
    )
    cfg = config_from_arch_string(arch)
    assert cfg.enc_dim == 1024 and cfg.enc_depth == 24 and cfg.enc_heads == 16
    assert cfg.dec_dim == 768 and cfg.dec_depth == 12
    assert cfg.desc_dim == 24 and cfg.two_confs
    assert cfg.desc_conf_mode == ("exp", 0.0, INF)
    assert cfg.conf_mode == ("exp", 1.0, INF)
    assert cfg.hooks == (0, 6, 9, 12)


@pytest.fixture(scope="module")
def vitl_oracle():
    """Torch AsymmetricMASt3R at PRODUCTION dims (ViT-L encoder 1024/24/16,
    decoder 768/12/12, catmlp+dpt heads) + the converted JAX params."""
    from mast3r.model import AsymmetricMASt3R

    cfg = ModelConfig()  # production ViT-L defaults
    torch.manual_seed(1)
    model = AsymmetricMASt3R(
        output_mode="pts3d+desc24",
        head_type="catmlp+dpt",
        depth_mode=("exp", -INF, INF),
        conf_mode=("exp", 1, INF),
        desc_conf_mode=("exp", 0, INF),
        two_confs=True,
        enc_embed_dim=cfg.enc_dim,
        enc_depth=cfg.enc_depth,
        enc_num_heads=cfg.enc_heads,
        dec_embed_dim=cfg.dec_dim,
        dec_depth=cfg.dec_depth,
        dec_num_heads=cfg.dec_heads,
        pos_embed="RoPE100",
        img_size=(H, W),
        patch_embed_cls="PatchEmbedDust3R",
        landscape_only=False,
    ).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = params_from_state_dict(sd, cfg)
    return model, params, cfg


def test_full_vitl_dims_parity(vitl_oracle):
    """VERDICT item 5: converter parity at PRODUCTION dims — the exact
    architecture of the MASt3R_ViTLarge_BaseDecoder_512 checkpoint — on a
    small image. Guards the weight-name mapping and stacking at real shapes."""
    model, params, cfg = vitl_oracle

    rng = np.random.default_rng(1)
    img1 = rng.standard_normal((1, 3, H, W), dtype=np.float32) * 0.5
    img2 = rng.standard_normal((1, 3, H, W), dtype=np.float32) * 0.5
    (feat1_t, _), (r1_t, r2_t) = _torch_forward(model, img1, img2)

    feat1, pos1 = jmodel.encode(
        params, cfg, jnp.asarray(img1.transpose(0, 2, 3, 1)), dtype=jnp.float32
    )
    feat2, pos2 = jmodel.encode(
        params, cfg, jnp.asarray(img2.transpose(0, 2, 3, 1)), dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(feat1), feat1_t.numpy(), atol=5e-4, rtol=1e-3
    )
    out = jmodel.decode(params, cfg, feat1, pos1, feat2, pos2, (H, W), dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out.X1), r1_t["pts3d"].numpy(), atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(out.C1), r1_t["conf"].numpy(), atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(out.D1), r1_t["desc"].numpy(), atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(out.Q1), r1_t["desc_conf"].numpy(), atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(out.X2), r2_t["pts3d"].numpy(), atol=5e-3, rtol=1e-2)


def test_bf16_drift_bound_vitl_dims(vitl_oracle):
    """VERDICT r3 item 3b: bound the bf16-weight drift on X/C/D/Q at ViT-L
    depth (24x1024 encoder blocks, 2x12x768 decoder blocks). The production
    inference path casts matmul weights to bf16 (`cast_params_for_inference`);
    this asserts the accumulated rounding through the full depth stays within
    tolerances that keep matching/tracking behavior unchanged (descriptor
    drift ~1e-2 against a refine window of +-15px; ray direction drift ~1e-2
    vs sigma_ray=3e-3 whitening of residuals that are themselves ~1e-1)."""
    _, params, cfg = vitl_oracle
    from monst3r_slam_tpu.models.convert import cast_params_for_inference

    rng = np.random.default_rng(7)
    img1 = jnp.asarray(rng.standard_normal((1, H, W, 3)).astype(np.float32) * 0.5)
    img2 = jnp.asarray(rng.standard_normal((1, H, W, 3)).astype(np.float32) * 0.5)

    feat1, pos1 = jmodel.encode(params, cfg, img1, dtype=jnp.float32)
    feat2, pos2 = jmodel.encode(params, cfg, img2, dtype=jnp.float32)
    ref = jmodel.decode(params, cfg, feat1, pos1, feat2, pos2, (H, W),
                        dtype=jnp.float32)

    bf = cast_params_for_inference(params)
    feat1b, pos1b = jmodel.encode(bf, cfg, img1)
    feat2b, pos2b = jmodel.encode(bf, cfg, img2)
    out = jmodel.decode(bf, cfg, feat1b, pos1b, feat2b, pos2b, (H, W))

    def rel(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return float(
            np.median(np.abs(a - b)) / max(np.median(np.abs(b)), 1e-12)
        )

    drift = {
        "X": rel(out.X1, ref.X1),
        "C": rel(out.C1, ref.C1),
        "D": rel(out.D1, ref.D1),
        "Q": rel(out.Q1, ref.Q1),
    }
    # Bounds: ~2x the measured drift at these dims (see NOTES_r4); a
    # regression past them signals a numerics bug (e.g. a layernorm or
    # softmax accidentally computed in bf16), not ordinary rounding.
    assert drift["X"] < 0.08, drift
    assert drift["C"] < 0.08, drift
    assert drift["D"] < 0.15, drift
    assert drift["Q"] < 0.08, drift
    # Descriptors drive matching via dot-product argmax: directions must
    # agree much tighter than elementwise values.
    d_ref = np.asarray(ref.D1, np.float64).reshape(-1, cfg.desc_dim)
    d_bf = np.asarray(out.D1, np.float64).reshape(-1, cfg.desc_dim)
    cos = (d_ref * d_bf).sum(-1) / (
        np.linalg.norm(d_ref, axis=-1) * np.linalg.norm(d_bf, axis=-1) + 1e-12
    )
    assert float(np.median(cos)) > 0.995, float(np.median(cos))


def test_load_checkpoint_real_pickle_format(tmp_path, oracle):
    """VERDICT r3 item 3c: the converter must ingest the reference's REAL
    on-disk checkpoint layout end-to-end — torch.save of
    {'args': Namespace(model=<ctor string with ManyAR_PatchEmbed and NO
    landscape_only kwarg>), 'model': state_dict} (mast3r/model.py:21-37
    rewrites that string at load; we parse it instead)."""
    import argparse

    model, params_direct = oracle
    arch = (
        "AsymmetricMASt3R(pos_embed='RoPE100', patch_embed_cls='ManyAR_PatchEmbed', "
        "img_size=(512, 512), head_type='catmlp+dpt', output_mode='pts3d+desc24', "
        "depth_mode=('exp', -inf, inf), conf_mode=('exp', 1, inf), "
        f"enc_embed_dim={CFG.enc_dim}, enc_depth={CFG.enc_depth}, "
        f"enc_num_heads={CFG.enc_heads}, dec_embed_dim={CFG.dec_dim}, "
        f"dec_depth={CFG.dec_depth}, dec_num_heads={CFG.dec_heads}, "
        "two_confs=True, desc_conf_mode=('exp', 0, inf))"
    )
    path = tmp_path / "fake_mast3r.pth"
    torch.save(
        {"args": argparse.Namespace(model=arch), "model": model.state_dict()},
        path,
    )
    from monst3r_slam_tpu.models.convert import load_checkpoint

    params, cfg = load_checkpoint(str(path))
    assert cfg.enc_dim == CFG.enc_dim and cfg.enc_depth == CFG.enc_depth
    assert cfg.dec_dim == CFG.dec_dim and cfg.desc_dim == 24 and cfg.two_confs
    assert cfg.desc_conf_mode == ("exp", 0.0, INF)
    # loaded params are numerically identical to the direct-state-dict path
    import jax

    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(params_direct),
    ):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dust3r_variant_parity():
    """MonST3R/DUSt3R convert path (head_type='dpt', no descriptor head,
    shared dec_blocks2 fallback) vs the torch AsymmetricCroCo3DStereo."""
    from dust3r.model import AsymmetricCroCo3DStereo

    cfg = ModelConfig(
        enc_depth=2, enc_dim=64, enc_heads=4,
        dec_depth=12, dec_dim=48, dec_heads=4,
        desc_dim=None, two_confs=False,
    )
    torch.manual_seed(2)
    model = AsymmetricCroCo3DStereo(
        output_mode="pts3d",
        head_type="dpt",
        depth_mode=("exp", -INF, INF),
        conf_mode=("exp", 1, INF),
        enc_embed_dim=cfg.enc_dim,
        enc_depth=cfg.enc_depth,
        enc_num_heads=cfg.enc_heads,
        dec_embed_dim=cfg.dec_dim,
        dec_depth=cfg.dec_depth,
        dec_num_heads=cfg.dec_heads,
        pos_embed="RoPE100",
        img_size=(H, W),
        patch_embed_cls="PatchEmbedDust3R",
        landscape_only=False,
    ).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = params_from_state_dict(sd, cfg)

    rng = np.random.default_rng(2)
    img1 = rng.standard_normal((1, 3, H, W), dtype=np.float32) * 0.5
    img2 = rng.standard_normal((1, 3, H, W), dtype=np.float32) * 0.5
    (_, _), (r1_t, r2_t) = _torch_forward(model, img1, img2)

    feat1, pos1 = jmodel.encode(
        params, cfg, jnp.asarray(img1.transpose(0, 2, 3, 1)), dtype=jnp.float32
    )
    feat2, pos2 = jmodel.encode(
        params, cfg, jnp.asarray(img2.transpose(0, 2, 3, 1)), dtype=jnp.float32
    )
    out = jmodel.decode(params, cfg, feat1, pos1, feat2, pos2, (H, W), dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out.X1), r1_t["pts3d"].numpy(), atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(out.C1), r1_t["conf"].numpy(), atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(out.X2), r2_t["pts3d"].numpy(), atol=2e-3, rtol=1e-2)
    assert out.D1 is None and out.Q1 is None


def test_config_from_arch_string_dust3r_variant():
    """MonST3R/DUSt3R checkpoints store an AsymmetricCroCo3DStereo ctor string
    with no descriptor head (dust3r/model.py:25-43)."""
    arch = (
        "AsymmetricCroCo3DStereo(output_mode='pts3d', head_type='dpt', "
        "depth_mode=('exp', -inf, inf), conf_mode=('exp', 1, inf), "
        "enc_embed_dim=1024, enc_depth=24, enc_num_heads=16, "
        "dec_embed_dim=768, dec_depth=12, dec_num_heads=12, "
        "patch_embed_cls='PatchEmbedDust3R', img_size=(512, 512), "
        "landscape_only=False)"
    )
    cfg = config_from_arch_string(arch)
    assert cfg.desc_dim is None and not cfg.two_confs
    assert cfg.enc_dim == 1024 and cfg.dec_depth == 12
    assert cfg.depth_mode == ("exp", -INF, INF)
