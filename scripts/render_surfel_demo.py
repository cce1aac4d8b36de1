"""Headless render of the live viewer's surfel snapshot (no Chrome in this
image): parses /state.bin exactly like the page JS and rasterizes the splat
loop and the triangle-mesh loop with the same math — side-by-side PNGs for
NOTES (VERDICT r3 item 10 'surfel screenshot', r4 item 10 'mesh screenshot',
reference resources/programs/surfelmap.glsl + trianglemap.glsl)."""

import struct
import sys
import urllib.request

import numpy as np


def parse(blob):
    seq, n_p, n_t, n_k, n_s, has_surfel, gh, gw = struct.unpack_from(
        "<8I", blob
    )
    off = 32
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
    return pts, cols, nrm, rad, (gh, gw)


def _camera(pts, W, H, yaw, pitch, dist):
    fin = np.isfinite(pts[:, 0])
    center = pts[fin].mean(0)
    d = np.linalg.norm(pts[fin][::7] - center, axis=-1)
    scale = np.quantile(d, 0.9) or 1.0
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    f = 0.8 * min(W, H)
    p = (pts - center) / scale
    x1 = cy * p[:, 0] + sy * p[:, 2]
    z1 = -sy * p[:, 0] + cy * p[:, 2]
    y1 = cp * p[:, 1] - sp * z1
    z2 = sp * p[:, 1] + cp * z1 + dist
    ok = fin & (z2 > 0.05)
    u = W / 2 + f * np.where(ok, x1 / np.where(ok, z2, 1.0), 0)
    v = H / 2 + f * np.where(ok, y1 / np.where(ok, z2, 1.0), 0)
    return u, v, z2, ok, (cy, sy, cp, sp, f, scale)


def render(pts, cols, nrm, rad, W=640, H=480, yaw=0.5, pitch=0.4, dist=4.0,
           surfel=True):
    u, v, z2, ok, (cy, sy, cp, sp, f, scale) = _camera(
        pts, W, H, yaw, pitch, dist
    )
    u = np.round(u).astype(int)
    v = np.round(v).astype(int)
    img = np.zeros((H, W, 3), np.uint8)
    zbuf = np.full((H, W), 1e9, np.float32)
    if surfel and nrm is not None:
        nz1 = -sy * nrm[:, 0] + cy * nrm[:, 2]
        nz2 = sp * nrm[:, 1] + cp * nz1
        shade = 0.35 + 0.65 * np.abs(nz2)
        half = np.minimum(
            7,
            np.maximum(0, np.round(f * (rad / scale) / np.maximum(z2, 0.05)
                                   * 0.5)),
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


def render_mesh(pts, cols, nrm, grid, W=640, H=480, yaw=0.5, pitch=0.4,
                dist=4.0):
    """Filled-mesh mode (trianglemap.glsl:1-144 parity, same loop as the
    page JS): two triangles per strided-grid cell whose 4 corners are valid,
    slant-gated on the view-space normal, flat-shaded, z-buffered."""
    gh, gw = grid
    u, v, z2, ok, (cy, sy, cp, sp, f, scale) = _camera(
        pts, W, H, yaw, pitch, dist
    )
    img = np.zeros((H, W, 3), np.uint8)
    zbuf = np.full((H, W), 1e9, np.float32)
    npkf = gh * gw
    nkf = len(pts) // npkf
    if nrm is not None:
        nz1 = -sy * nrm[:, 0] + cy * nrm[:, 2]
        nz2 = sp * nrm[:, 1] + cp * nz1
    else:
        nz2 = np.ones(len(pts))

    def tri(i0, i1, i2, rgb, z):
        p = np.array([[u[i0], v[i0]], [u[i1], v[i1]], [u[i2], v[i2]]])
        x0, y0 = np.floor(p.min(0)).astype(int)
        x1, y1 = np.ceil(p.max(0)).astype(int)
        if x1 - x0 > 96 or y1 - y0 > 96:
            return  # degenerate sliver across a depth break
        x0, y0 = max(x0, 0), max(y0, 0)
        x1, y1 = min(x1, W - 1), min(y1, H - 1)
        if x1 < x0 or y1 < y0:
            return
        ys, xs = np.mgrid[y0:y1 + 1, x0:x1 + 1]
        e = lambda a, b: ((p[b, 0] - p[a, 0]) * (ys - p[a, 1])
                          - (p[b, 1] - p[a, 1]) * (xs - p[a, 0]))
        a2 = ((p[1, 0] - p[0, 0]) * (p[2, 1] - p[0, 1])
              - (p[1, 1] - p[0, 1]) * (p[2, 0] - p[0, 0]))
        if a2 == 0:
            return
        s = 1.0 if a2 > 0 else -1.0
        inside = (s * e(0, 1) >= 0) & (s * e(1, 2) >= 0) & (s * e(2, 0) >= 0)
        sub = zbuf[y0:y1 + 1, x0:x1 + 1]
        m = inside & (z < sub)
        sub[m] = z
        img[y0:y1 + 1, x0:x1 + 1][m] = rgb

    for k in range(nkf):
        base = k * npkf
        for y in range(gh - 1):
            for x in range(gw - 1):
                i00 = base + y * gw + x
                i01, i10, i11 = i00 + 1, i00 + gw, i00 + gw + 1
                vix = (i00, i01, i10, i11)
                if not all(ok[i] for i in vix):
                    continue
                if abs(nz2[i00]) < 0.1:
                    continue  # slant_threshold
                shade = 0.35 + 0.65 * abs(nz2[i00])
                rgb = (cols[list(vix)].mean(0) * shade).astype(np.uint8)
                z = (z2[i00] + z2[i01] + z2[i10] + z2[i11]) / 4
                tri(i00, i10, i01, rgb, z)
                tri(i01, i10, i11, rgb, z)
    return img


def main():
    url = sys.argv[1] if len(sys.argv) > 1 else "http://127.0.0.1:18123"
    blob = urllib.request.urlopen(f"{url}/state.bin").read()
    pts, cols, nrm, rad, grid = parse(blob)
    print(f"{len(pts)} surfels, has_normals={nrm is not None}, grid={grid}")
    import cv2

    a = render(pts, cols, nrm, rad, surfel=False)
    b = render(pts, cols, nrm, rad, surfel=True)
    panels = [("points", a), ("surfels (normal-shaded)", b)]
    if grid[0] > 1 and grid[1] > 1:
        panels.append(
            ("mesh (trianglemap)", render_mesh(pts, cols, nrm, grid))
        )
    side = np.concatenate([p for _, p in panels], axis=1)
    for i, (label, _) in enumerate(panels):
        cv2.putText(side, label, (10 + 640 * i, 24),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.7, (255, 255, 255), 1)
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/surfel_demo.png"
    cv2.imwrite(out, cv2.cvtColor(side, cv2.COLOR_RGB2BGR))
    print("wrote", out)


if __name__ == "__main__":
    main()
