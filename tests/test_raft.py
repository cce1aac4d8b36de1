"""Architecture tests for the JAX RAFT implementation."""

import jax
import jax.numpy as jnp
import numpy as np

from monst3r_slam_tpu.dynamic import raft


def test_raft_shapes_and_finite():
    cfg = raft.RAFTConfig(iters=2)
    params = raft.init_raft_params(jax.random.PRNGKey(0), cfg)
    h, w = 64, 96
    img1 = jax.random.uniform(jax.random.PRNGKey(1), (h, w, 3)) * 255
    img2 = jax.random.uniform(jax.random.PRNGKey(2), (h, w, 3)) * 255
    flow = raft.raft_flow(params, img1, img2, cfg)
    assert flow.shape == (h, w, 2)
    assert bool(jnp.isfinite(flow).all())


def test_corr_pyramid_and_lookup():
    h, w, c = 8, 12, 16
    f = jax.random.normal(jax.random.PRNGKey(0), (h, w, c))
    pyr = raft.corr_pyramid(f, f, levels=3)
    assert pyr[0].shape == (h * w, h, w)
    assert pyr[1].shape == (h * w, h // 2, w // 2)
    # Self-correlation at zero flow: the center tap (offset 0,0 at level 0)
    # equals |f|^2/sqrt(c) at each position
    flow = jnp.zeros((h, w, 2))
    out = raft.corr_lookup(pyr, flow, radius=1)
    center_tap = out.reshape(h * w, 3, 9)[:, 0, 4]  # level 0, offset (0,0)
    expect = jnp.sum(f.reshape(h * w, c) ** 2, axis=-1) / np.sqrt(c)
    np.testing.assert_allclose(center_tap, expect, atol=1e-4, rtol=1e-4)


def test_convex_upsample_constant_flow():
    """Uniform mask upsampling of constant flow gives constant flow * 8."""
    h, w = 4, 6
    flow = jnp.ones((h, w, 2)) * jnp.asarray([2.0, -1.0])
    mask = jnp.zeros((h, w, 9 * 64))
    up = raft.convex_upsample(flow, mask)
    assert up.shape == (h * 8, w * 8, 2)
    np.testing.assert_allclose(up[8:-8, 8:-8, 0], 16.0, atol=1e-4)
    np.testing.assert_allclose(up[8:-8, 8:-8, 1], -8.0, atol=1e-4)


def test_raft_wired_into_dynamic_mask_pipeline():
    """VERDICT item 2: the JAX RAFT must actually execute inside the
    dynamic-mask path when installed (DIS is only the uninstalled fallback)."""
    from monst3r_slam_tpu.core import lie
    from monst3r_slam_tpu.dynamic import mask as dyn

    h, w = 32, 40
    cfg = raft.RAFTConfig(iters=2)
    params = raft.init_raft_params(jax.random.PRNGKey(0), cfg)
    calls = []
    base = raft.make_raft_flow_estimator(params, cfg)

    def counting(img_i, img_j):
        calls.append(1)
        return base(img_i, img_j)

    dyn.set_flow_estimator(counting)
    try:
        rng = np.random.default_rng(0)
        img_i = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        img_j = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        K = jnp.asarray([[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1]])
        T = lie.sim3_identity()
        m = dyn.get_dynamic_mask(img_i, img_j, T, T, jnp.ones((h, w)), K)
    finally:
        dyn.set_flow_estimator(None)
    assert calls, "RAFT estimator was not invoked by get_dynamic_mask"
    assert m.shape == (h, w) and m.dtype == bool


def test_raft_torch_converter_roundtrip(tmp_path):
    """VERDICT item 5: the RAFT torch-checkpoint converter digests a
    synthetically constructed state dict in the official RAFT naming/layout
    (module.fnet/cnet/update_block.*, OIHW conv weights) and reproduces the
    source parameters exactly — including identical flow output."""
    import torch

    cfg = raft.RAFTConfig(iters=2)
    src = raft.init_raft_params(jax.random.PRNGKey(7), cfg)

    sd = {}

    def put_conv(name, p):
        sd[f"{name}.weight"] = torch.from_numpy(
            np.asarray(p["w"]).transpose(3, 2, 0, 1).copy()  # HWIO -> OIHW
        )
        if "b" in p:
            sd[f"{name}.bias"] = torch.from_numpy(np.asarray(p["b"]).copy())

    def put_in(name, p):
        sd[f"{name}.weight"] = torch.from_numpy(np.asarray(p["w"]).copy())
        sd[f"{name}.bias"] = torch.from_numpy(np.asarray(p["b"]).copy())

    for pfx in ("fnet", "cnet"):
        enc = src[pfx]
        put_conv(f"{pfx}.conv1", enc["conv1"])
        put_in(f"{pfx}.norm1", enc["norm1"])
        put_conv(f"{pfx}.conv2", enc["conv2"])
        for blk, (li, bi) in zip(enc["layers"], ((1, 0), (1, 1), (2, 0), (2, 1), (3, 0), (3, 1))):
            name = f"{pfx}.layer{li}.{bi}"
            put_conv(f"{name}.conv1", blk["conv1"])
            put_in(f"{name}.norm1", blk["norm1"])
            put_conv(f"{name}.conv2", blk["conv2"])
            put_in(f"{name}.norm2", blk["norm2"])
            if "downsample" in blk:
                put_conv(f"{name}.downsample.0", blk["downsample"])
                put_in(f"{name}.downsample.1", blk["norm3"])
    up = src["update"]
    for k in ("convc1", "convc2", "convf1", "convf2", "conv"):
        put_conv(f"update_block.encoder.{k}", up["encoder"][k])
    for k in ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2"):
        put_conv(f"update_block.gru.{k}", up["gru"][k])
    put_conv("update_block.flow_head.conv1", up["flow_head"]["conv1"])
    put_conv("update_block.flow_head.conv2", up["flow_head"]["conv2"])
    put_conv("update_block.mask.0", up["mask"]["conv1"])
    put_conv("update_block.mask.2", up["mask"]["conv2"])

    # the real checkpoint prefixes everything with "module." and nests under
    # a key (Tartan-C-T-TSKH checkpoints store the raw sd)
    sd = {f"module.{k}": v for k, v in sd.items()}
    path = tmp_path / "raft_synth.pth"
    torch.save(sd, path)

    conv = raft.raft_params_from_torch(str(path))
    # exact value round-trip on every leaf
    flat_src = jax.tree_util.tree_leaves_with_path(src)
    flat_conv = dict(
        (jax.tree_util.keystr(p), l) for p, l in jax.tree_util.tree_leaves_with_path(conv)
    )
    assert len(flat_src) == len(flat_conv)
    for p, leaf in flat_src:
        key = jax.tree_util.keystr(p)
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_conv[key]),
                                   err_msg=key, atol=1e-6)

    # converted params drive raft_flow to the identical result
    h, w = 32, 40
    img1 = jax.random.uniform(jax.random.PRNGKey(1), (h, w, 3)) * 255
    img2 = jax.random.uniform(jax.random.PRNGKey(2), (h, w, 3)) * 255
    f_src = raft.raft_flow(src, img1, img2, cfg)
    f_conv = raft.raft_flow(conv, img1, img2, cfg)
    np.testing.assert_allclose(np.asarray(f_src), np.asarray(f_conv), atol=1e-5)


def test_bilinear_lookup_mm_matches_gather():
    """The MXU matmul form of the corr lookup == the gather form (the gather
    form is the oracle; the mm form is what raft_flow runs on TPU, where
    per-element gathers were the dominant cost of the whole flow)."""
    key = jax.random.PRNGKey(0)
    n, hl, wl, k = 37, 12, 18, 25
    vol = jax.random.normal(key, (n, hl, wl))
    k1, k2 = jax.random.split(key)
    # in-bounds, fractional, AND out-of-bounds coords (clipping parity)
    u = jax.random.uniform(k1, (n, k), minval=-3.0, maxval=wl + 3.0)
    v = jax.random.uniform(k2, (n, k), minval=-3.0, maxval=hl + 3.0)
    ref = raft._bilinear_lookup(vol, u, v)
    out = raft._bilinear_lookup_mm(vol, u, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_corr_lookup_mm_matches_gather_in_raft():
    key = jax.random.PRNGKey(3)
    h, w, c = 6, 8, 16
    f1 = jax.random.normal(key, (h, w, c))
    f2 = jax.random.normal(jax.random.PRNGKey(4), (h, w, c))
    pyr = raft.corr_pyramid(f1, f2, 2)
    flow = 0.7 * jax.random.normal(jax.random.PRNGKey(5), (h, w, 2))
    ref = raft.corr_lookup(pyr, flow, 2, use_mm=False)
    out = raft.corr_lookup(pyr, flow, 2, use_mm=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_corr_lookup_sep_matches_81tap_form():
    """The separable (9-row x 9-col factored) lookup == the 81-tap matmul
    form, including per-tap border clipping: flows large enough to push the
    tap window past every volume edge at every pyramid level."""
    key = jax.random.PRNGKey(7)
    h, w, c = 8, 12, 16
    f1 = jax.random.normal(key, (h, w, c))
    f2 = jax.random.normal(jax.random.PRNGKey(8), (h, w, c))
    pyr = raft.corr_pyramid(f1, f2, 3)
    # level 2 is (2, 3): radius-4 windows clip on all sides everywhere
    flow = 6.0 * jax.random.normal(jax.random.PRNGKey(9), (h, w, 2))
    ref = raft.corr_lookup(pyr, flow, 4, use_mm=True, use_sep=False)
    out = raft.corr_lookup(pyr, flow, 4, use_mm=True, use_sep=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)
    gather = raft.corr_lookup(pyr, flow, 4, use_mm=False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(gather), atol=1e-5, rtol=1e-5
    )


def test_fused_flow_error_program_matches_split_path():
    """raft.make_fused_flow_error_program == compute_flow + ego_motion_flow +
    flow_error_map run separately (the split path is the oracle; the fused
    program is the production single-dispatch path)."""
    from monst3r_slam_tpu.core import lie
    from monst3r_slam_tpu.dynamic import mask as dyn

    cfg = raft.RAFTConfig(iters=3)
    params = raft.init_raft_params(jax.random.PRNGKey(0), cfg)
    h, w = 32, 40
    rng = np.random.default_rng(0)
    u0 = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    u1 = np.roll(u0, 2, axis=1)
    T_i = jnp.asarray(lie.sim3_identity())
    T_j = lie.sim3_retr(T_i, jnp.asarray([0.01, 0.0, 0.0, 0.0, 0.01, 0.0, 0.0]))
    depth = jnp.full((h, w), 2.5)
    K = jnp.asarray([[w, 0, w / 2], [0, w, h / 2], [0, 0, 1]], jnp.float32)

    flow = raft.make_raft_flow_estimator(params, cfg)(u0, u1)
    ego = np.asarray(dyn.ego_motion_flow(T_i, T_j, depth, K))
    ref = np.asarray(dyn.flow_error_map(jnp.asarray(flow), jnp.asarray(ego)))

    fused = raft.make_fused_flow_error_program(params, cfg, out_u8=False)
    out = fused(u0, u1, T_i, T_j, depth, K)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)

    # u8 transfer mode: quantized to 1/255 steps of the [0, 1] map
    fused_q = raft.make_fused_flow_error_program(params, cfg, out_u8=True)
    out_q = fused_q(u0, u1, T_i, T_j, depth, K)
    np.testing.assert_allclose(out_q, ref, atol=0.5 / 255 + 1e-4)

    # and get_dynamic_mask consumes the installed program
    dyn.set_flow_error_program(fused)
    try:
        m = dyn.get_dynamic_mask(u0, u1, T_i, T_j, depth, K, threshold=0.35)
        np.testing.assert_array_equal(m, ref > 0.35)
    finally:
        dyn.set_flow_error_program(None)


def test_fused_flow_program_device_input_and_cache():
    """The fused program accepts a device-resident ImgNorm-normalized image
    for the flow stage (the tensor the encoder consumed) and produces
    BIT-IDENTICAL output to uploading the raw u8 image — the in-program
    round((x+1)*127.5) denormalization cancels the normalize's f32 rounding.
    Repeated host images (the keyframe) hit the adapter's device LRU cache
    without changing results."""
    from monst3r_slam_tpu.core import lie

    cfg = raft.RAFTConfig(iters=2)
    params = raft.init_raft_params(jax.random.PRNGKey(0), cfg)
    h, w = 32, 40
    rng = np.random.default_rng(1)
    u0 = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    u1 = np.roll(u0, 3, axis=1)
    T_i = jnp.asarray(lie.sim3_identity())
    T_j = lie.sim3_retr(T_i, jnp.asarray([0.02, 0.0, 0.0, 0.0, 0.01, 0.0, 0.0]))
    depth = jnp.full((h, w), 2.0)
    K = jnp.asarray([[w, 0, w / 2], [0, w, h / 2], [0, 0, 1]], jnp.float32)

    fused = raft.make_fused_flow_error_program(params, cfg)
    ref = fused(u0, u1, T_i, T_j, depth, K)

    # normalized device tensor, with and without a leading batch dim
    norm = jnp.asarray((u0.astype(np.float32) / 255.0 - 0.5) / 0.5)
    out_dev = fused(norm, u1, T_i, T_j, depth, K)
    np.testing.assert_array_equal(out_dev, ref)
    out_dev_b = fused(norm[None], u1, T_i, T_j, depth, K)
    np.testing.assert_array_equal(out_dev_b, ref)

    # repeated identical host array (keyframe case): second call hits the
    # device cache; a DIFFERENT array with equal content also matches
    again = fused(u0, u1, T_i, T_j, depth, K)
    np.testing.assert_array_equal(again, ref)
    fresh = fused(u0.copy(), u1.copy(), T_i, T_j, depth, K)
    np.testing.assert_array_equal(fresh, ref)
