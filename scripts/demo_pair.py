#!/usr/bin/env python
"""Minimum end-to-end slice (BASELINE.json config 1): two frames ->
MASt3R pointmaps + dense matches (SURVEY.md §7 first milestone).

Usage:
  python scripts/demo_pair.py --img1 a.png --img2 b.png \
      [--checkpoint ckpt.pth] [--out out_dir]

Outputs: out_dir/pair.ply (both pointmaps, color-coded), matches.npz
(idx_1_to_2, valid), and a match-quality summary on stdout.
"""

import argparse
import pathlib
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img1", required=True)
    p.add_argument("--img2", required=True)
    p.add_argument("--checkpoint", default="")
    p.add_argument("--out", default="logs/demo_pair")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from monst3r_slam_tpu.app.config import load_config
    from monst3r_slam_tpu.app.evaluate import save_ply
    from monst3r_slam_tpu.data.preprocess import resize_img
    from monst3r_slam_tpu.models import mast3r as model_api
    from monst3r_slam_tpu.models.config import MAST3R_512
    from monst3r_slam_tpu.ops import matching, matching_tiled

    load_config("config/base.yaml")

    def load(path):
        img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        return resize_img(img.astype(np.float32) / 255.0, 512)

    r1, r2 = load(args.img1), load(args.img2)
    img1 = jnp.asarray(r1["img"])
    img2 = jnp.asarray(r2["img"])
    h, w = img1.shape[1:3]

    ckpt = pathlib.Path(args.checkpoint) if args.checkpoint else None
    if ckpt and ckpt.is_file():
        from monst3r_slam_tpu.models.convert import load_checkpoint

        params, cfg = load_checkpoint(str(ckpt))
    else:
        from monst3r_slam_tpu.models.init import init_params

        print("WARNING: no checkpoint — random weights (geometry meaningless)")
        params, cfg = init_params(jax.random.PRNGKey(args.seed), MAST3R_512), MAST3R_512

    feat1, pos1 = model_api.encode(params, cfg, img1)
    feat2, pos2 = model_api.encode(params, cfg, img2)
    out = model_api.decode(params, cfg, feat1, pos1, feat2, pos2, (h, w))

    idx, valid = matching_tiled.match(
        out.X1, out.X2, out.D1, out.D2,
        cfg=matching.MatchingConfig(),
        tcfg=matching_tiled.TiledConfig(),
    )
    match_frac = float(jnp.mean(valid.astype(jnp.float32)))
    print(f"pointmaps: {out.X1.shape}, match fraction: {match_frac:.3f}")

    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    pts = np.concatenate(
        [np.asarray(out.X1).reshape(-1, 3), np.asarray(out.X2).reshape(-1, 3)]
    )
    col1 = r1["unnormalized_img"].reshape(-1, 3)
    col2 = r2["unnormalized_img"].reshape(-1, 3)
    save_ply(out_dir / "pair.ply", pts, np.concatenate([col1, col2]))
    np.savez(out_dir / "matches.npz",
             idx_1_to_2=np.asarray(idx), valid=np.asarray(valid),
             conf1=np.asarray(out.C1), conf2=np.asarray(out.C2))
    print(f"wrote {out_dir}/pair.ply and matches.npz")


if __name__ == "__main__":
    main()
