"""SAM2 video predictor: memory attention, memory encoder, object pointers.

VERDICT r3 item 6: the one reference mechanism previously substituted
(`monst3r_utils.py:640-703` build_sam2_video_predictor / propagate_in_video).
Validated with fabricated weights: converter round-trip, conditioning-frame
equivalence with the image pipeline (the reference's exact 1-frame-video
usage), and multi-frame propagation through the fixed-capacity memory bank.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from monst3r_slam_tpu.dynamic import sam2 as S
from monst3r_slam_tpu.dynamic import sam2_video as V

CFG = S.SAM2_TEST
VCFG = V.VIDEO_TEST


@pytest.fixture(scope="module")
def params():
    return S.init_sam2_params(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def vparams():
    return V.init_video_params(jax.random.PRNGKey(1), CFG, VCFG)


def _frames(n, seed=3):
    rng = np.random.default_rng(seed)
    Simg = CFG.img_size
    yy, xx = np.mgrid[0:Simg, 0:Simg].astype(np.float32)
    out = []
    for i in range(n):
        img = np.stack(
            [np.sin(0.05 * xx + i), np.cos(0.07 * yy), 0 * xx + 0.5], -1
        ) * 0.5 + 0.5
        x0 = 30 + 10 * i
        img[40:70, x0:x0 + 30] = [0.9, 0.1, 0.1]  # moving block
        out.append(img.astype(np.float32))
    return out


def test_rope_is_a_rotation():
    cos, sin = V.axial_rope_freqs(4, 6, 16, 10000.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 24, 16))
    y = V.apply_rope(x, cos, sin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )
    # position 0 is the identity rotation
    np.testing.assert_allclose(np.asarray(y[..., 0, :]), np.asarray(x[..., 0, :]),
                               rtol=1e-5, atol=1e-6)


def test_sine_pe_shape_and_range():
    pe = np.asarray(V.sine_pe_2d(8, 12, 64))
    assert pe.shape == (8, 12, 64)
    assert np.abs(pe).max() <= 1.0 + 1e-6
    # distinct positions get distinct codes
    assert not np.allclose(pe[0, 0], pe[7, 11])


def test_cond_frame_matches_image_pipeline(params, vparams):
    """On a 1-frame video (the reference's exact usage — it breaks after
    frame 0, monst3r_utils.py:675-680) the predictor must reproduce the
    image pipeline: no_mem path == sam2_encode's directly_add_no_mem_embed."""
    img = _frames(1)[0]
    pred = V.Sam2VideoPredictor(params, vparams, CFG, VCFG)
    state = pred.init_state([img])
    pts = np.asarray([[[60.0, 55.0]]], np.float32)  # pixels at img_size res
    labels = np.ones((1, 1), np.int32)
    pred.add_new_points(state, 0, 1, pts, labels)
    out = None
    for fi, obj_ids, logits in pred.propagate_in_video(state):
        if fi == 0:
            out = np.asarray(logits[0])
            break
    assert out is not None

    # image pipeline on the same prompt at the decoder's native H4 res:
    # multimask best-IoU selection among tokens 1..3, exactly like
    # _condition_and_decode with multimask=True (no resize round trip)
    img_emb, hr0, hr1 = S.sam2_encode(params, CFG, jnp.asarray(img)[None])
    Simg = CFG.img_size
    pe = S.dense_pe(params["prompt"], img_emb.shape[1:3])
    sparse = S.encode_points(
        params["prompt"], CFG, jnp.asarray(pts / Simg), jnp.asarray(labels)
    )
    src = img_emb + params["prompt"]["no_mask_embed"]
    masks, iou, _ = S.mask_decoder(
        params["dec"], CFG, src, pe, sparse, [hr0, hr1]
    )
    best = 1 + int(np.argmax(np.asarray(iou)[0, 1:]))
    ref = np.asarray(masks)[0, best]
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_propagation_fills_memory_and_stays_finite(params, vparams):
    frames = _frames(3)
    pred = V.Sam2VideoPredictor(params, vparams, CFG, VCFG)
    state = pred.init_state(frames)
    pts = np.asarray([[[60.0, 55.0]]], np.float32)
    pred.add_new_points(state, 0, 1, pts, np.ones((1, 1), np.int32))
    outs = {}
    for fi, obj_ids, logits in pred.propagate_in_video(state):
        assert obj_ids == [1]
        outs[fi] = np.asarray(logits[0])
        assert np.isfinite(outs[fi]).all()
    assert sorted(outs) == [0, 1, 2]
    # cond slot 0 + two rotating slots written
    assert state["mem_valid"][0]
    assert int(state["mem_valid"].sum()) == 3
    assert int(state["ptr_valid"].sum()) == 3
    # frames 1/2 are memory-conditioned: their logits must differ from what
    # the memoryless image path would produce (memory attention is live)
    img_emb, hr0, hr1 = S.sam2_encode(params, CFG, jnp.asarray(frames[1])[None])
    m0, _ = S.sam2_decode(
        params, CFG, img_emb, hr0, hr1,
        jnp.zeros((1, 1, 2)), -jnp.ones((1, 1), jnp.int32),
    )
    h4 = outs[1].shape[0]
    memoryless = np.asarray(
        jax.image.resize(jnp.asarray(np.asarray(m0)[0, 0]), (h4, h4),
                         method="bilinear")
    )
    assert not np.allclose(outs[1], memoryless, atol=1e-4)


def test_video_converter_roundtrip(tmp_path, params, vparams):
    """init params -> official-names torch checkpoint -> converter ->
    identical pytree (locks the memory-module name/transpose mapping)."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "tests")
    from test_sam2 import _fabricate_torch_sd

    sd = _fabricate_torch_sd(params, CFG)
    # replace the image test's dummy memory entries with REAL fabricated ones
    sd.pop("memory_encoder.out_proj.weight", None)
    sd.pop("maskmem_tpos_enc", None)

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

    me = "memory_encoder"
    cv(f"{me}.pix_feat_proj", vparams["mem_enc"]["pix_feat_proj"])
    for i, (conv, lnp) in enumerate(vparams["mem_enc"]["downsampler"]):
        cv(f"{me}.mask_downsampler.encoder.{3 * i}", conv)
        ln(f"{me}.mask_downsampler.encoder.{3 * i + 1}", lnp)
    cv(f"{me}.mask_downsampler.encoder.12", vparams["mem_enc"]["down_out"])
    for i, blk in enumerate(vparams["mem_enc"]["fuser"]):
        b = f"{me}.fuser.layers.{i}"
        sd[f"{b}.dwconv.weight"] = torch.from_numpy(
            np.asarray(blk["dwconv"]["w"]).transpose(3, 2, 0, 1).copy()
        )
        sd[f"{b}.dwconv.bias"] = torch.from_numpy(
            np.asarray(blk["dwconv"]["b"]).copy()
        )
        ln(f"{b}.norm", blk["norm"])
        lin(f"{b}.pwconv1", blk["pwconv1"])
        lin(f"{b}.pwconv2", blk["pwconv2"])
        sd[f"{b}.gamma"] = torch.from_numpy(np.asarray(blk["gamma"]).copy())
    cv(f"{me}.out_proj", vparams["mem_enc"]["out_proj"])

    ma = "memory_attention"
    for i, L in enumerate(vparams["mem_attn"]["layers"]):
        b = f"{ma}.layers.{i}"
        for nm, ap in (("self_attn", L["self_attn"]),
                       ("cross_attn_image", L["cross_attn"])):
            lin(f"{b}.{nm}.q_proj", ap["q"])
            lin(f"{b}.{nm}.k_proj", ap["k"])
            lin(f"{b}.{nm}.v_proj", ap["v"])
            lin(f"{b}.{nm}.out_proj", ap["out"])
        ln(f"{b}.norm1", L["norm1"])
        ln(f"{b}.norm2", L["norm2"])
        ln(f"{b}.norm3", L["norm3"])
        lin(f"{b}.linear1", L["linear1"])
        lin(f"{b}.linear2", L["linear2"])
    ln(f"{ma}.norm", vparams["mem_attn"]["norm"])
    for j, lp in enumerate(vparams["obj_ptr_proj"]):
        lin(f"obj_ptr_proj.layers.{j}", lp)
    for j, lp in enumerate(vparams["obj_score_head"]):
        lin(f"sam_mask_decoder.pred_obj_score_head.layers.{j}", lp)
    sd["no_obj_ptr"] = torch.from_numpy(np.asarray(vparams["no_obj_ptr"])[None].copy())
    sd["maskmem_tpos_enc"] = torch.from_numpy(
        np.asarray(vparams["maskmem_tpos_enc"])[:, None, None, :].copy()
    )

    path = tmp_path / "fake_sam2_video.pt"
    torch.save({"model": sd}, path)
    got_img, got_vid = V.video_params_from_torch(str(path), CFG, VCFG)

    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_leaves_with_path(got_vid),
        jax.tree_util.tree_leaves_with_path(vparams),
    ):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=str(p1))
    # image half converts too (same file)
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_leaves_with_path(got_img),
        jax.tree_util.tree_leaves_with_path(params),
    ):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=str(p1))


def test_video_refiner_mechanism(params, vparams):
    """Sam2VideoRefiner drives the predictor exactly like the reference
    (1-frame video per SLAM frame) and returns a well-formed mask; the
    carry_memory variant accumulates state across calls."""
    h, w = 48, 64
    raw = np.zeros((h, w), bool)
    raw[10:30, 20:44] = True
    img_u8 = (np.stack([_frames(1)[0]] * 1)[0, :h * 2:2, :w * 2:2] * 255).astype(
        np.uint8
    )
    img_u8 = np.ascontiguousarray(img_u8[:h, :w])
    err = raw.astype(np.float32)

    ref = V.Sam2VideoRefiner(params, vparams, CFG, VCFG)
    out = ref(img_u8, err, raw, 0.35, 20)
    assert out.shape == (h, w) and out.dtype == bool

    ref2 = V.Sam2VideoRefiner(params, vparams, CFG, VCFG, carry_memory=True)
    out1 = ref2(img_u8, err, raw, 0.35, 20)
    assert ref2._state is not None and len(ref2._state["images"]) == 1
    out2 = ref2(img_u8, err, raw, 0.35, 20)
    assert len(ref2._state["images"]) == 2
    assert out1.shape == out2.shape == (h, w)
    ref2.reset()
    assert ref2._state is None


def test_tpos_indices_follow_recency_not_slot(params, vparams):
    """maskmem_tpos_enc must be indexed by temporal distance from the
    current frame (official sam2_base: most recent prev frame -> index 0,
    farther -> t_rel - 1, conditioning frame -> num_maskmem - 1), NOT by the
    round-robin storage slot (ADVICE r4 medium)."""
    pred = V.Sam2VideoPredictor(params, vparams, CFG, VCFG)
    nm = VCFG.num_maskmem
    state = pred.init_state(_frames(1))
    # fabricate a bank: cond frame 0 in slot 0; frames 7..11 rotated through
    # slots 1..5 (slot = 1 + t % (nm-1) would place them out of slot order)
    state["mem_valid"][:] = False
    state["mem_frame"][:] = -1
    for t in [7, 8, 9, 10, 11]:
        slot = 1 + t % (nm - 1)
        state["mem_valid"][slot] = True
        state["mem_frame"][slot] = t
    state["mem_valid"][0] = True
    state["mem_frame"][0] = 0
    _, _, valid, tpos, _, _ = pred._bank_views(state, t=12, cond_idx=0)
    tpos = np.asarray(tpos)
    valid = np.asarray(valid)
    # cond slot gets the reserved last index
    assert tpos[0] == nm - 1
    for t in [7, 8, 9, 10, 11]:
        slot = 1 + t % (nm - 1)
        assert valid[slot]
        assert tpos[slot] == min(12 - t - 1, nm - 2), (t, slot, tpos[slot])
    # most recent frame (11) maps to index 0 regardless of its slot
    assert tpos[1 + 11 % (nm - 1)] == 0
