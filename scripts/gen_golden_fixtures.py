#!/usr/bin/env python
"""Generate committed golden-value fixtures from the reference torch oracle.

Run ONCE (requires /root/reference + torch); outputs land in tests/fixtures/
and are committed. tests/test_golden.py then replays them WITHOUT torch or
the reference tree, so converter / model / preprocess regressions fail by
VALUE even when the live torch-parity tests are skipped.

Fixtures:
  * model_golden.npz — probe values of encoder features + all head outputs of
    the reference AsymmetricMASt3R (small dims, full 12-block decoder depth),
    with weights built from a numpy-rng RECIPE (manifest of state-dict
    names/shapes + deterministic fill rule) so the test can reconstruct the
    identical weights without torch.
  * resize_golden_*.npz — pixel-exact outputs of the reference `resize_img`
    (mast3r_utils.py:248-282: PIL LANCZOS/BICUBIC long-side resize, 16-px
    center crop, ImgNorm) for landscape / portrait / square inputs.
"""

import json
import pathlib
import sys

import numpy as np

REF = "/root/reference/MASt3R-SLAM"
for p in (f"{REF}/thirdparty/mast3r", f"{REF}/thirdparty/mast3r/dust3r",
          f"{REF}/thirdparty/mast3r/dust3r/croco"):
    if p not in sys.path:
        sys.path.insert(0, p)

OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures"
OUT.mkdir(parents=True, exist_ok=True)

H, W = 64, 80
INF = float("inf")


def fill_value(name: str, shape, rng: np.random.Generator) -> np.ndarray:
    """Deterministic weight recipe shared with tests/test_golden.py."""
    n = np.prod(shape, dtype=int)
    v = rng.standard_normal(n).astype(np.float32).reshape(shape)
    if ("norm" in name and name.endswith(".weight")) or name.endswith(".gamma"):
        return 1.0 + 0.02 * v
    if name.endswith(".bias"):
        return 0.01 * v
    return 0.02 * v


def gen_model_golden():
    import torch
    from mast3r.model import AsymmetricMASt3R

    model = AsymmetricMASt3R(
        output_mode="pts3d+desc24",
        head_type="catmlp+dpt",
        depth_mode=("exp", -INF, INF),
        conf_mode=("exp", 1, INF),
        desc_conf_mode=("exp", 0, INF),
        two_confs=True,
        enc_embed_dim=64,
        enc_depth=2,
        enc_num_heads=4,
        dec_embed_dim=48,
        dec_depth=12,
        dec_num_heads=4,
        pos_embed="RoPE100",
        img_size=(H, W),
        patch_embed_cls="PatchEmbedDust3R",
        landscape_only=False,
    ).eval()

    manifest = [(k, list(v.shape)) for k, v in model.state_dict().items()]
    rng = np.random.default_rng(1234)
    sd = {}
    for name, shape in manifest:
        sd[name] = fill_value(name, shape, rng)
    model.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})

    rng_in = np.random.default_rng(99)
    img1 = rng_in.standard_normal((1, 3, H, W)).astype(np.float32) * 0.5
    img2 = rng_in.standard_normal((1, 3, H, W)).astype(np.float32) * 0.5

    with torch.inference_mode():
        shape = torch.tensor([[H, W]])
        feat1, pos1, _ = model._encode_image(torch.from_numpy(img1), shape)
        feat2, pos2, _ = model._encode_image(torch.from_numpy(img2), shape)
        d1, d2 = model._decoder(feat1, pos1, feat2, pos2)
        r1 = model._downstream_head(1, [t.float() for t in d1], shape)
        r2 = model._downstream_head(2, [t.float() for t in d2], shape)

    def probes(a, k=64):
        a = np.asarray(a, np.float64).ravel()
        assert np.isfinite(a).all(), "non-finite oracle output; lower the recipe scale"
        step = max(1, a.size // k)
        return a[::step][:k].astype(np.float32), np.float32(a.mean()), np.float32(a.std())

    out = {}
    for key, t in [
        ("feat1", feat1.numpy()),
        ("X1", r1["pts3d"].numpy()), ("C1", r1["conf"].numpy()),
        ("D1", r1["desc"].numpy()), ("Q1", r1["desc_conf"].numpy()),
        ("X2", r2["pts3d"].numpy()), ("C2", r2["conf"].numpy()),
        ("D2", r2["desc"].numpy()), ("Q2", r2["desc_conf"].numpy()),
    ]:
        p, m, s = probes(t)
        out[f"{key}_probe"] = p
        out[f"{key}_mean"] = m
        out[f"{key}_std"] = s
        out[f"{key}_shape"] = np.asarray(t.shape)
    np.savez_compressed(OUT / "model_golden.npz", **out)
    (OUT / "model_manifest.json").write_text(json.dumps(manifest))
    print(f"model golden: {len(manifest)} tensors, "
          f"{sum(np.prod(s) for _, s in manifest):,} params")


def _reference_resize_img():
    """The reference resize_img (mast3r_utils.py:248-282), extracted without
    importing mast3r_slam (whose module imports need lietorch/CUDA). ImgNorm
    is torchvision Compose(ToTensor, Normalize(.5, .5)) — reproduced with
    numpy (no torchvision in this image)."""
    import PIL.Image

    def ImgNorm(pil):
        arr = np.asarray(pil, np.float32).transpose(2, 0, 1) / 255.0
        return (arr - 0.5) / 0.5

    def _resize_pil_image(img, long_edge_size):
        S = max(img.size)
        if S > long_edge_size:
            interp = PIL.Image.LANCZOS
        elif S <= long_edge_size:
            interp = PIL.Image.BICUBIC
        new_size = tuple(int(round(x * long_edge_size / S)) for x in img.size)
        return img.resize(new_size, interp)

    def resize_img(img, size, square_ok=False):
        assert size == 224 or size == 512
        img = PIL.Image.fromarray(np.uint8(img * 255))
        W1, H1 = img.size
        if size == 224:
            img = _resize_pil_image(img, round(size * max(W1 / H1, H1 / W1)))
        else:
            img = _resize_pil_image(img, size)
        W, H = img.size
        cx, cy = W // 2, H // 2
        if size == 224:
            half = min(cx, cy)
            img = img.crop((cx - half, cy - half, cx + half, cy + half))
        else:
            halfw, halfh = ((2 * cx) // 16) * 8, ((2 * cy) // 16) * 8
            if not (square_ok) and W == H:
                halfh = 3 * halfw / 4
            img = img.crop((cx - halfw, cy - halfh, cx + halfw, cy + halfh))
        return dict(
            img=ImgNorm(img)[None],
            true_shape=np.int32([img.size[::-1]]),
            unnormalized_img=np.asarray(img),
        )

    return resize_img


def make_test_image(h, w, seed):
    """Deterministic high-frequency test pattern in [0, 1] float (recipe
    shared with tests/test_golden.py)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [
            0.5 + 0.5 * np.sin(0.21 * xx + 0.13 * yy),
            np.clip((xx % 17) / 16.0, 0, 1),
            0.5 + 0.5 * np.cos(0.08 * xx * yy / (h + w)),
        ],
        axis=-1,
    )
    # high-frequency but smooth detail (keeps the committed npz small while
    # still exercising LANCZOS/BICUBIC kernels); a sparse speckle grid adds
    # hard edges without killing compressibility
    img += 0.1 * np.sin(1.3 * xx[..., None] + 0.9 * yy[..., None] + np.asarray([0.0, 2.1, 4.2]))
    img[::7, ::11] = rng.random((img[::7, ::11].shape))
    return np.clip(img, 0.0, 1.0)


def gen_resize_goldens():
    resize_img = _reference_resize_img()
    cases = {
        "landscape_512": ((480, 640), 512, 11),
        "portrait_512": ((640, 480), 512, 12),
        "square_512": ((500, 500), 512, 13),  # exercises the W==H 3/4 branch
        "landscape_224": ((480, 640), 224, 14),
    }
    for name, ((h, w), size, seed) in cases.items():
        img = make_test_image(h, w, seed)
        res = resize_img(img, size)
        # normalized 'img' is NOT stored: ImgNorm == (u8/255 - .5)/.5
        # bit-exactly, so the test recomputes it from unnormalized_img.
        np.savez_compressed(
            OUT / f"resize_golden_{name}.npz",
            in_h=h, in_w=w, seed=seed, size=size,
            true_shape=res["true_shape"],
            unnormalized_img=res["unnormalized_img"],
        )
        print(f"resize golden {name}: out {res['unnormalized_img'].shape}")


if __name__ == "__main__":
    gen_model_golden()
    gen_resize_goldens()
