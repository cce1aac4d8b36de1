#!/usr/bin/env python
"""Convert raw dataset ground truth to TUM trajectory format.

The reference ships pre-converted `groundtruths/{euroc,7-scenes}/*.txt`
(TUM format: `t x y z qx qy qz qw`) because those datasets do not carry a
TUM-format groundtruth.txt themselves. This tool derives the same files from
the raw downloads, so nothing needs to be vendored:

  * EuRoC: `<seq>/mav0/state_groundtruth_estimate0/data.csv`
    (timestamp[ns], p_RS_R xyz, q_RS wxyz, ...) -> seconds + xyzw.
  * 7-Scenes: `<scene>/seq-XX/frame-XXXXXX.pose.txt` (4x4 camera-to-world
    matrices) -> frame-index timestamps, like the reference's committed
    files (groundtruths/7-scenes/chess.txt: "0 x y z qx qy qz qw").

Usage:
  python scripts/convert_groundtruth.py euroc  <seq_dir>  [-o out.txt]
  python scripts/convert_groundtruth.py 7scenes <scene_dir> [-o out.txt]
"""

import argparse
import pathlib
import sys

import numpy as np


def rotmat_to_quat_xyzw(R: np.ndarray) -> np.ndarray:
    """(3, 3) rotation matrix -> quaternion (x, y, z, w), Shepperd's method."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2.0
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] >= R[1, 1] and R[0, 0] >= R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2.0
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] >= R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2.0
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2.0
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    q = np.asarray([x, y, z, w])
    return q / np.linalg.norm(q)


def convert_euroc(seq_dir: pathlib.Path):
    csv = seq_dir / "mav0" / "state_groundtruth_estimate0" / "data.csv"
    rows = np.loadtxt(csv, delimiter=",", skiprows=1, usecols=range(8))
    out = np.empty((len(rows), 8))
    out[:, 0] = rows[:, 0] * 1e-9  # ns -> s
    out[:, 1:4] = rows[:, 1:4]  # position
    out[:, 4:7] = rows[:, 5:8]  # q x, y, z (csv stores w, x, y, z)
    out[:, 7] = rows[:, 4]  # q w
    return out


def convert_7scenes(scene_dir: pathlib.Path):
    poses = sorted(scene_dir.glob("seq-*/frame-*.pose.txt"))
    if not poses:
        raise FileNotFoundError(f"no seq-*/frame-*.pose.txt under {scene_dir}")
    out = np.empty((len(poses), 8))
    for i, p in enumerate(poses):
        M = np.loadtxt(p).reshape(4, 4)  # camera-to-world
        out[i, 0] = i  # frame-index timestamps (reference convention)
        out[i, 1:4] = M[:3, 3]
        out[i, 4:8] = rotmat_to_quat_xyzw(M[:3, :3])
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["euroc", "7scenes"])
    p.add_argument("path", type=pathlib.Path)
    p.add_argument("-o", "--output", type=pathlib.Path, default=None)
    args = p.parse_args(argv)
    traj = (convert_euroc if args.kind == "euroc" else convert_7scenes)(args.path)
    out = args.output or pathlib.Path(f"{args.path.name}.txt")
    with open(out, "w") as f:
        for r in traj:
            # timestamp at fixed 9 decimals: %g would collapse EuRoC's
            # ~1.4e9-second stamps to whole seconds, breaking the TUM
            # nearest-timestamp association (max_diff = 0.02 s)
            f.write(f"{r[0]:.9f} " + " ".join(f"{v:.10g}" for v in r[1:]) + "\n")
    print(f"wrote {len(traj)} poses to {out}")


if __name__ == "__main__":
    main()
