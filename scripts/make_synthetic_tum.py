#!/usr/bin/env python
"""Write a tiny TUM-layout dataset (rgb/ + rgb.txt + groundtruth.txt) from a
synthetic textured scene, for smoke-testing scripts/run_real.sh in-image.

The directory name must contain 'freiburg1' so the TUM loader picks up the
fr1 hardcoded calibration (data/datasets.py:78-109; reference
dataloader.py:67-105). Ground truth is a slow sideways pan in TUM format
(t x y z qx qy qz qw).

Usage: python scripts/make_synthetic_tum.py <out_dir> [n_frames]
"""

import argparse
import pathlib
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("n_frames", nargs="?", type=int, default=8)
    args = ap.parse_args()

    import cv2

    out = pathlib.Path(args.out)
    (out / "rgb").mkdir(parents=True, exist_ok=True)
    h, w = 480, 640
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    bg = (
        np.stack(
            [
                np.sin(0.05 * xx) * 0.5 + 0.5,
                np.cos(0.07 * yy) * 0.5 + 0.5,
                np.sin(0.03 * (xx + yy)) * 0.5 + 0.5,
            ],
            -1,
        )
        * 255
    ).astype(np.uint8)
    rgb_rows, gt_rows = [], []
    for i in range(args.n_frames):
        t = i / 30.0
        img = np.roll(bg, shift=3 * i, axis=1)
        x0 = 80 + 30 * i
        img[200:280, x0 : x0 + 80] = [255, 40, 40]
        name = f"rgb/{t:.6f}.png"
        cv2.imwrite(str(out / name), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        rgb_rows.append(f"{t:.6f} {name}")
        gt_rows.append(f"{t:.6f} {0.01 * i:.6f} 0.000000 0.000000 0 0 0 1")
    (out / "rgb.txt").write_text(
        "# color images\n# timestamp filename\n" + "\n".join(rgb_rows) + "\n"
    )
    (out / "groundtruth.txt").write_text(
        "# ground truth trajectory\n# timestamp tx ty tz qx qy qz qw\n"
        + "\n".join(gt_rows)
        + "\n"
    )
    print(f"wrote {out} ({args.n_frames} frames, TUM layout)")


if __name__ == "__main__":
    main()
