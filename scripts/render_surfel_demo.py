"""Headless render of the live viewer's surfel snapshot (no Chrome in this
image): parses /state.bin exactly like the page JS and rasterizes the splat
loop with the same math — side-by-side point-mode vs surfel-mode PNGs for
NOTES (VERDICT r3 item 10's 'side-by-side screenshot')."""

import struct
import sys
import urllib.request

import numpy as np


def parse(blob):
    seq, n_p, n_t, n_k, n_s, has_surfel = struct.unpack_from("<6I", blob)
    off = 24
    pts = np.frombuffer(blob, "<f4", n_p * 3, off).reshape(-1, 3)
    off += n_p * 12
    cols = np.frombuffer(blob, "u1", n_p * 3, off).reshape(-1, 3)
    off += n_p * 3
    off += (4 - off % 4) % 4
    off += n_t * 12 + n_k * 12 + n_s * 24
    nrm = rad = None
    if has_surfel:
        nrm = np.frombuffer(blob, "<f4", n_p * 3, off).reshape(-1, 3)
        off += n_p * 12
        rad = np.frombuffer(blob, "<f4", n_p, off)
    return pts, cols, nrm, rad


def render(pts, cols, nrm, rad, W=640, H=480, yaw=0.5, pitch=0.4, dist=4.0,
           surfel=True):
    center = pts.mean(0)
    d = np.linalg.norm(pts[::7] - center, axis=-1)
    scale = np.quantile(d, 0.9) or 1.0
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    f = 0.8 * min(W, H)
    p = (pts - center) / scale
    x1 = cy * p[:, 0] + sy * p[:, 2]
    z1 = -sy * p[:, 0] + cy * p[:, 2]
    y1 = cp * p[:, 1] - sp * z1
    z2 = sp * p[:, 1] + cp * z1 + dist
    ok = z2 > 0.05
    u = np.round(W / 2 + f * x1 / z2).astype(int)
    v = np.round(H / 2 + f * y1 / z2).astype(int)
    img = np.zeros((H, W, 3), np.uint8)
    zbuf = np.full((H, W), 1e9, np.float32)
    if surfel and nrm is not None:
        nz1 = -sy * nrm[:, 0] + cy * nrm[:, 2]
        nz2 = sp * nrm[:, 1] + cp * nz1
        shade = 0.35 + 0.65 * np.abs(nz2)
        half = np.minimum(
            7, np.maximum(0, np.round(f * (rad / scale) / z2 * 0.5))
        ).astype(int)
    else:
        shade = np.ones(len(pts))
        half = np.zeros(len(pts), int)
    order = np.argsort(-z2)  # far-to-near painter + z-test
    for i in order:
        if not ok[i]:
            continue
        hl = half[i]
        u0, u1 = max(u[i] - hl, 0), min(u[i] + hl + 1, W)
        v0, v1 = max(v[i] - hl, 0), min(v[i] + hl + 1, H)
        if u0 >= u1 or v0 >= v1:
            continue
        m = zbuf[v0:v1, u0:u1] > z2[i]
        zbuf[v0:v1, u0:u1][m] = z2[i]
        img[v0:v1, u0:u1][m] = (cols[i] * shade[i]).astype(np.uint8)
    return img


def main():
    url = sys.argv[1] if len(sys.argv) > 1 else "http://127.0.0.1:18123"
    blob = urllib.request.urlopen(f"{url}/state.bin").read()
    pts, cols, nrm, rad = parse(blob)
    print(f"{len(pts)} surfels, has_normals={nrm is not None}")
    import cv2

    a = render(pts, cols, nrm, rad, surfel=False)
    b = render(pts, cols, nrm, rad, surfel=True)
    side = np.concatenate([a, b], axis=1)
    cv2.putText(side, "points", (10, 24), cv2.FONT_HERSHEY_SIMPLEX, 0.7,
                (255, 255, 255), 1)
    cv2.putText(side, "surfels (normal-shaded)", (650, 24),
                cv2.FONT_HERSHEY_SIMPLEX, 0.7, (255, 255, 255), 1)
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/surfel_demo.png"
    cv2.imwrite(out, cv2.cvtColor(side, cv2.COLOR_RGB2BGR))
    print("wrote", out)


if __name__ == "__main__":
    main()
