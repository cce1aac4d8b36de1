"""SAM2 JAX implementation: forward shapes, converter mapping round-trip,
conv-transpose parity vs torch, refiner mechanism.

Reference role: `monst3r_utils.py:640-703` (SAM2 refinement of the dynamic
mask, seeded by connected-component centroids)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monst3r_slam_tpu.dynamic import sam2


CFG = sam2.SAM2_TEST


def _points(B=3):
    pts = np.array(
        [[[0.3, 0.4]], [[0.6, 0.5]], [[0.0, 0.0]]], np.float32
    )[:B]
    lbs = np.array([[1], [1], [-1]], np.int32)[:B]
    return jnp.asarray(pts), jnp.asarray(lbs)


def test_forward_shapes_and_finite():
    params = sam2.init_sam2_params(jax.random.PRNGKey(0), CFG)
    S = CFG.img_size
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, S, S, 3))
    pts, lbs = _points()
    masks, iou = sam2.sam2_image_forward(params, CFG, img, pts, lbs)
    assert masks.shape == (3, CFG.num_mask_tokens, S, S)
    assert iou.shape == (3, CFG.num_mask_tokens)
    assert jnp.isfinite(masks).all() and jnp.isfinite(iou).all()


def test_encoder_stage_resolutions():
    params = sam2.init_sam2_params(jax.random.PRNGKey(0), CFG)
    S = CFG.img_size
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, S, S, 3))
    img_emb, hr0, hr1 = sam2.sam2_encode(params, CFG, img)
    assert img_emb.shape == (1, S // 16, S // 16, CFG.d_model)
    assert hr0.shape == (1, S // 4, S // 4, CFG.d_model // 8)
    assert hr1.shape == (1, S // 8, S // 8, CFG.d_model // 4)


def test_conv_transpose_matches_torch():
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 7, 6)).astype(np.float32)
    wt = rng.normal(size=(6, 4, 2, 2)).astype(np.float32)  # torch (I, O, 2, 2)
    b = rng.normal(size=(4,)).astype(np.float32)
    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(wt),
        torch.from_numpy(b), stride=2,
    ).numpy().transpose(0, 2, 3, 1)
    p = {"w": jnp.asarray(wt.transpose(2, 3, 0, 1)), "b": jnp.asarray(b)}
    out = np.asarray(sam2._conv2d_transpose(p, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def _fabricate_torch_sd(params, cfg):
    """Reverse the converter's transforms to build an official-names state
    dict from a JAX pytree — locks the name/transpose mapping both ways."""
    torch = pytest.importorskip("torch")
    sd = {}

    def lin(name, p):
        sd[f"{name}.weight"] = torch.from_numpy(np.asarray(p["w"]).T.copy())
        sd[f"{name}.bias"] = torch.from_numpy(np.asarray(p["b"]).copy())

    def ln(name, p):
        sd[f"{name}.weight"] = torch.from_numpy(np.asarray(p["w"]).copy())
        sd[f"{name}.bias"] = torch.from_numpy(np.asarray(p["b"]).copy())

    def cv(name, p):
        sd[f"{name}.weight"] = torch.from_numpy(
            np.asarray(p["w"]).transpose(3, 2, 0, 1).copy()
        )
        if "b" in p:
            sd[f"{name}.bias"] = torch.from_numpy(np.asarray(p["b"]).copy())

    def cvt(name, p):
        sd[f"{name}.weight"] = torch.from_numpy(
            np.asarray(p["w"]).transpose(2, 3, 0, 1).copy()
        )
        if "b" in p:
            sd[f"{name}.bias"] = torch.from_numpy(np.asarray(p["b"]).copy())

    def attn(name, p):
        lin(f"{name}.q_proj", p["q"])
        lin(f"{name}.k_proj", p["k"])
        lin(f"{name}.v_proj", p["v"])
        lin(f"{name}.out_proj", p["out"])

    tk = "image_encoder.trunk"
    cv(f"{tk}.patch_embed.proj", params["trunk"]["patch_embed"])
    sd[f"{tk}.pos_embed"] = torch.from_numpy(
        np.asarray(params["trunk"]["pos_embed"]).transpose(0, 3, 1, 2).copy()
    )
    sd[f"{tk}.pos_embed_window"] = torch.from_numpy(
        np.asarray(params["trunk"]["pos_embed_window"]).transpose(0, 3, 1, 2).copy()
    )
    for i, blk in enumerate(params["trunk"]["blocks"]):
        b = f"{tk}.blocks.{i}"
        ln(f"{b}.norm1", blk["norm1"])
        lin(f"{b}.attn.qkv", blk["attn"]["qkv"])
        lin(f"{b}.attn.proj", blk["attn"]["proj"])
        ln(f"{b}.norm2", blk["norm2"])
        lin(f"{b}.mlp.layers.0", blk["mlp"]["fc1"])
        lin(f"{b}.mlp.layers.1", blk["mlp"]["fc2"])
        if "proj" in blk:
            lin(f"{b}.proj", blk["proj"])
    # checkpoint neck convs are DESCENDING (convs.0 = 1/32); params ascending
    n_lv = len(params["neck"]["convs"])
    for i, c in enumerate(params["neck"]["convs"]):
        cv(f"image_encoder.neck.convs.{n_lv - 1 - i}.conv", c)

    pk = "sam_prompt_encoder"
    pr = params["prompt"]
    sd[f"{pk}.pe_layer.positional_encoding_gaussian_matrix"] = torch.from_numpy(
        np.asarray(pr["pe_gaussian"]).copy()
    )
    sd[f"{pk}.point_embeddings.0.weight"] = torch.from_numpy(
        np.asarray(pr["point_neg"])[None].copy()
    )
    sd[f"{pk}.point_embeddings.1.weight"] = torch.from_numpy(
        np.asarray(pr["point_pos"])[None].copy()
    )
    sd[f"{pk}.not_a_point_embed.weight"] = torch.from_numpy(
        np.asarray(pr["not_a_point"])[None].copy()
    )
    sd[f"{pk}.no_mask_embed.weight"] = torch.from_numpy(
        np.asarray(pr["no_mask_embed"])[None].copy()
    )
    sd["no_mem_embed"] = torch.from_numpy(
        np.asarray(params["no_mem_embed"])[0].copy()  # (1, 1, d) in the ckpt
    )

    dk = "sam_mask_decoder"
    dec = params["dec"]
    sd[f"{dk}.iou_token.weight"] = torch.from_numpy(np.asarray(dec["iou_token"]).copy())
    sd[f"{dk}.mask_tokens.weight"] = torch.from_numpy(
        np.asarray(dec["mask_tokens"]).copy()
    )
    sd[f"{dk}.obj_score_token.weight"] = torch.from_numpy(
        np.asarray(dec["obj_token"]).copy()
    )
    for i, L in enumerate(dec["layers"]):
        base = f"{dk}.transformer.layers.{i}"
        attn(f"{base}.self_attn", L["self_attn"])
        ln(f"{base}.norm1", L["norm1"])
        attn(f"{base}.cross_attn_token_to_image", L["cross_t2i"])
        ln(f"{base}.norm2", L["norm2"])
        lin(f"{base}.mlp.layers.0", L["mlp"]["fc1"])
        lin(f"{base}.mlp.layers.1", L["mlp"]["fc2"])
        ln(f"{base}.norm3", L["norm3"])
        attn(f"{base}.cross_attn_image_to_token", L["cross_i2t"])
        ln(f"{base}.norm4", L["norm4"])
    attn(f"{dk}.transformer.final_attn_token_to_image", dec["final_t2i"])
    ln(f"{dk}.transformer.norm_final_attn", dec["norm_final"])
    cvt(f"{dk}.output_upscaling.0", dec["up1"])
    ln(f"{dk}.output_upscaling.1", dec["up_norm"])
    cvt(f"{dk}.output_upscaling.3", dec["up2"])
    cv(f"{dk}.conv_s0", dec["skip0"])
    cv(f"{dk}.conv_s1", dec["skip1"])
    for m, mlp in enumerate(dec["hyper"]):
        for j, lp in enumerate(mlp):
            lin(f"{dk}.output_hypernetworks_mlps.{m}.layers.{j}", lp)
    for j, lp in enumerate(dec["iou_head"]):
        lin(f"{dk}.iou_prediction_head.layers.{j}", lp)
    # memory components present in real checkpoints; converter must ignore
    sd["memory_encoder.out_proj.weight"] = torch.zeros(4, 4)
    sd["maskmem_tpos_enc"] = torch.zeros(7, 1, 1, 4)
    return sd


def test_torch_converter_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    src = sam2.init_sam2_params(jax.random.PRNGKey(3), CFG)
    sd = _fabricate_torch_sd(src, CFG)
    path = tmp_path / "sam2_fake.pt"
    torch.save({"model": sd}, path)

    conv = sam2.sam2_params_from_torch(str(path), CFG)
    flat_src = dict(
        (jax.tree_util.keystr(p), l)
        for p, l in jax.tree_util.tree_leaves_with_path(src)
    )
    flat_conv = dict(
        (jax.tree_util.keystr(p), l)
        for p, l in jax.tree_util.tree_leaves_with_path(conv)
    )
    assert set(flat_src) == set(flat_conv)
    for k in flat_src:
        np.testing.assert_allclose(
            np.asarray(flat_src[k]), np.asarray(flat_conv[k]),
            err_msg=k, atol=1e-6,
        )
    # identical forward
    S = CFG.img_size
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, S, S, 3))
    pts, lbs = _points()
    m1, i1 = sam2.sam2_image_forward(src, CFG, img, pts, lbs)
    m2, i2 = sam2.sam2_image_forward(conv, CFG, img, pts, lbs)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), atol=1e-5)


def test_refiner_mechanism():
    """With random weights the masks are arbitrary; checked here: seeding
    from CC centroids, static-shape prompt batching, output shape/dtype,
    raw-mask passthrough when nothing to prompt."""
    params = sam2.init_sam2_params(jax.random.PRNGKey(0), CFG)
    ref = sam2.Sam2Refiner(params, CFG, max_objects=3, iou_floor=-1e9)
    h, w = 48, 64
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (h, w, 3), np.uint8)
    err = np.zeros((h, w), np.float32)
    raw = np.zeros((h, w), bool)
    raw[10:20, 12:22] = True
    raw[30:40, 40:52] = True
    out = ref(img, err, raw, 0.35, 20)
    assert out.shape == (h, w) and out.dtype == bool

    empty = np.zeros((h, w), bool)
    np.testing.assert_array_equal(ref(img, err, empty, 0.35, 20), empty)


def test_refiner_installs_into_mask_pipeline():
    from monst3r_slam_tpu.dynamic import mask as dyn

    params = sam2.init_sam2_params(jax.random.PRNGKey(0), CFG)
    ref = sam2.Sam2Refiner(params, CFG, max_objects=2, iou_floor=-1e9)
    dyn.set_mask_refiner(ref)
    try:
        h, w = 32, 32
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        err = np.zeros((h, w), np.float32)
        err[8:16, 8:16] = 1.0
        T = jnp.asarray([0, 0, 0, 0, 0, 0, 1.0, 0])  # identity-ish Sim3 embed
        from monst3r_slam_tpu.core import lie

        T = jnp.asarray(lie.sim3_identity())
        m = dyn.get_dynamic_mask(
            img, img, T, T, jnp.full((h, w), 2.0),
            jnp.asarray([[32.0, 0, 16], [0, 32.0, 16], [0, 0, 1]]),
            threshold=0.35, refine=True,
        )
        assert m.shape == (h, w)
    finally:
        dyn.set_mask_refiner(None)


def test_patch_embed_padding_matches_torch():
    """7x7/s4 patch embed must pad (3, 3) like torch, not XLA-SAME (1, 2)."""
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    wt = rng.normal(size=(8, 3, 7, 7)).astype(np.float32)  # torch OIHW
    b = rng.normal(size=(8,)).astype(np.float32)
    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(wt),
        torch.from_numpy(b), stride=4, padding=3,
    ).numpy().transpose(0, 2, 3, 1)
    p = {"w": jnp.asarray(wt.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)}
    out = np.asarray(
        sam2._conv2d(p, jnp.asarray(x), stride=4, padding=((3, 3), (3, 3)))
    )
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_refiner_keeps_unprompted_components():
    """Components beyond the prompt budget must keep their raw flow-error
    pixels — a moving object must not silently re-enter the static set."""
    params = sam2.init_sam2_params(jax.random.PRNGKey(0), CFG)
    ref = sam2.Sam2Refiner(params, CFG, max_objects=1, iou_floor=-1e9)
    h, w = 48, 64
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (h, w, 3), np.uint8)
    err = np.zeros((h, w), np.float32)
    raw = np.zeros((h, w), bool)
    raw[10:20, 12:22] = True  # big component (prompted)
    raw[34:40, 44:52] = True  # small component (beyond the budget of 1)
    out = ref(img, err, raw, 0.35, 8)
    assert out[34:40, 44:52].all(), "unprompted component was dropped"


def test_propagator_adapter_installed_globally_does_not_recurse():
    """set_mask_refiner(prop.as_refiner()) is the documented wiring; the
    propagator must recognize its own adapter instead of calling itself."""
    from monst3r_slam_tpu.dynamic import mask as dyn
    from monst3r_slam_tpu.dynamic.refine import TemporalMaskPropagator

    prop = TemporalMaskPropagator()
    dyn.set_mask_refiner(prop.as_refiner(use_grabcut=False))
    try:
        h, w = 32, 40
        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        err = np.zeros((h, w), np.float32)
        err[8:16, 8:16] = 0.9
        raw = err > 0.35
        out = prop(img, err, raw, 0.35, 4, use_grabcut=False)  # must terminate
        assert out.shape == (h, w)
    finally:
        dyn.set_mask_refiner(None)
