#!/usr/bin/env python
"""Transform Bonn trajectory estimates into the ground-truth frame.

Equivalent of the reference `scripts/prepare_bonn.py`: Bonn ground truth is
expressed in a different world frame than the sensor trajectory; estimates
are pre-multiplied by T_g = T_ros @ T_0 @ T_ros @ T_m where T_0 is the first
ground-truth pose. The fixed matrices are dataset calibration constants.

Pure numpy (no `quaternion` package): TUM rows are
`timestamp x y z qx qy qz qw`.
"""

import argparse
import os

import numpy as np

T_m = np.array(
    [
        [1.0157, 0.1828, -0.2389, 0.0113],
        [0.0009, -0.8431, -0.6413, -0.0098],
        [-0.3009, 0.6147, -0.8085, 0.0111],
        [0, 0, 0, 1.0],
    ]
)
T_ros = np.array(
    [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=float
)


def quat_to_R(qx, qy, qz, qw):
    q = np.array([qw, qx, qy, qz], float)
    q = q / np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def R_to_quat(R):
    """-> (qx, qy, qz, qw), Shepperd's method.

    T_m is a calibration (not exactly rigid) matrix, so R may be slightly
    non-orthogonal; project to the closest rotation first (the reference's
    `quaternion.from_rotation_matrix` does the equivalent internally)."""
    U, _, Vt = np.linalg.svd(R)
    R = U @ np.diag([1.0, 1.0, np.sign(np.linalg.det(U @ Vt))]) @ Vt
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        qw = 0.25 * s
        qx = (R[2, 1] - R[1, 2]) / s
        qy = (R[0, 2] - R[2, 0]) / s
        qz = (R[1, 0] - R[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(1.0 + R[i, i] - R[j, j] - R[k, k]) * 2
        q = np.empty(3)
        q[i] = 0.25 * s
        q[j] = (R[j, i] + R[i, j]) / s
        q[k] = (R[k, i] + R[i, k]) / s
        qw = (R[k, j] - R[j, k]) / s
        qx, qy, qz = q
    return qx, qy, qz, qw


def pose_to_T(row):
    T = np.eye(4)
    T[:3, :3] = quat_to_R(row[4], row[5], row[6], row[7])
    T[:3, 3] = row[1:4]
    return T


def convert_bonn(groundtruth_path, estimated_path, output_path):
    gt = np.loadtxt(groundtruth_path)
    est = np.loadtxt(estimated_path)
    if est.ndim == 1:
        est = est[None]

    T_0 = pose_to_T(gt[2])  # reference uses the 3rd ground-truth row
    T_g = T_ros @ T_0 @ T_ros @ T_m  # inv(T_ros) = T_ros

    out = []
    for row in est:
        T_est = T_g @ pose_to_T(row)
        qx, qy, qz, qw = R_to_quat(T_est[:3, :3])
        out.append([row[0], *T_est[:3, 3], qx, qy, qz, qw])

    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    np.savetxt(output_path, out, fmt="%f")
    print(f"transformed: {estimated_path} -> {output_path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--groundtruth_path", required=True)
    parser.add_argument("--estimated_path", required=True)
    parser.add_argument("--output_path", required=True)
    args = parser.parse_args()
    convert_bonn(args.groundtruth_path, args.estimated_path, args.output_path)
