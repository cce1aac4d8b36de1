"""Live reconstruction viewer: in-process HTTP server + browser renderer.

The reference runs a moderngl/imgui window in a separate process fed by
shared-CUDA-memory states (`visualization.py:42-474`, N11). On a headless
TPU host the equivalent live surface is a localhost web viewer: the SLAM
loop posts state snapshots (downsampled cloud, keyframe poses, trajectory)
to a daemon-thread HTTP server; a dependency-free WebGL-less canvas page
polls `/state.bin` and re-renders. Start it with the mains' default viz mode
(disable with --no-viz, same flag as the reference).

Binary snapshot layout (little-endian):
  uint32 seq, n_points, n_traj, n_kf, n_seg
  f32 points[n_points*3], u8 colors[n_points*3],
  f32 traj[n_traj*3], f32 kf[n_kf*3], f32 segs[n_seg*6]
(kf = keyframe center markers; segs = frustum line segments)
"""

from __future__ import annotations

import http.server
import socketserver
import struct
import threading
from typing import Optional

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>monst3r-slam-tpu live</title>
<style>body{margin:0;background:#111;color:#9a9;font:12px monospace}
#hud{position:fixed;top:6px;left:8px}</style></head>
<body><canvas id="c"></canvas><div id="hud">connecting...</div>
<script>
const canvas = document.getElementById('c');
const hud = document.getElementById('hud');
canvas.width = innerWidth; canvas.height = innerHeight;
const ctx = canvas.getContext('2d');
let pts = new Float32Array(0), cols = new Uint8Array(0);
let traj = new Float32Array(0), kfs = new Float32Array(0);
let segs = new Float32Array(0);
let seq = -1, center = [0,0,0], scale = 1;
let yaw = 0.5, pitch = 0.4, dist = 4;
let dragging = false, lx = 0, ly = 0;
canvas.onmousedown = e => { dragging = true; lx = e.x; ly = e.y; };
window.onmouseup = () => dragging = false;
window.onmousemove = e => {
  if (!dragging) return;
  yaw += (e.x - lx) * 0.005; pitch += (e.y - ly) * 0.005;
  lx = e.x; ly = e.y; draw();
};
canvas.onwheel = e => { dist *= Math.exp(e.deltaY * 0.001); draw(); e.preventDefault(); };
function recenter() {
  if (!pts.length) return;
  let c = [0,0,0], n = pts.length/3;
  for (let i = 0; i < pts.length; i += 3)
    { c[0]+=pts[i]; c[1]+=pts[i+1]; c[2]+=pts[i+2]; }
  center = [c[0]/n, c[1]/n, c[2]/n];
  let d = [];
  for (let i = 0; i < pts.length; i += 3*7) {
    const dx=pts[i]-center[0], dy=pts[i+1]-center[1], dz=pts[i+2]-center[2];
    d.push(Math.sqrt(dx*dx+dy*dy+dz*dz));
  }
  d.sort((a,b)=>a-b);
  scale = d[Math.floor(d.length*0.9)] || 1;
}
function proj(x, y, z, cyaw, syaw, cp, sp, f) {
  x -= center[0]; y -= center[1]; z -= center[2];
  x /= scale; y /= scale; z /= scale;
  const x1 = cyaw * x + syaw * z, z1 = -syaw * x + cyaw * z;
  const y1 = cp * y - sp * z1, z2 = sp * y + cp * z1 + dist;
  if (z2 < 0.05) return null;
  return [canvas.width/2 + f*x1/z2, canvas.height/2 + f*y1/z2, z2];
}
function draw() {
  ctx.fillStyle = '#111'; ctx.fillRect(0, 0, canvas.width, canvas.height);
  const cyaw = Math.cos(yaw), syaw = Math.sin(yaw);
  const cp = Math.cos(pitch), sp = Math.sin(pitch);
  const f = 0.8 * Math.min(canvas.width, canvas.height);
  const img = ctx.createImageData(canvas.width, canvas.height);
  const zbuf = new Float32Array(canvas.width * canvas.height).fill(1e9);
  for (let i = 0; i < pts.length; i += 3) {
    const p = proj(pts[i], pts[i+1], pts[i+2], cyaw, syaw, cp, sp, f);
    if (!p) continue;
    const u = Math.round(p[0]), v = Math.round(p[1]);
    if (u < 0 || v < 0 || u >= canvas.width || v >= canvas.height) continue;
    const idx = v * canvas.width + u;
    if (p[2] > zbuf[idx]) continue;
    zbuf[idx] = p[2];
    const o = idx * 4;
    img.data[o] = cols[i]; img.data[o+1] = cols[i+1];
    img.data[o+2] = cols[i+2]; img.data[o+3] = 255;
  }
  ctx.putImageData(img, 0, 0);
  ctx.strokeStyle = '#4f4'; ctx.lineWidth = 1.5; ctx.beginPath();
  let started = false;
  for (let i = 0; i < traj.length; i += 3) {
    const p = proj(traj[i], traj[i+1], traj[i+2], cyaw, syaw, cp, sp, f);
    if (!p) { started = false; continue; }
    if (started) ctx.lineTo(p[0], p[1]); else ctx.moveTo(p[0], p[1]);
    started = true;
  }
  ctx.stroke();
  ctx.fillStyle = '#ff4';
  for (let i = 0; i < kfs.length; i += 3) {
    const p = proj(kfs[i], kfs[i+1], kfs[i+2], cyaw, syaw, cp, sp, f);
    if (p) ctx.fillRect(p[0]-2, p[1]-2, 4, 4);
  }
  ctx.strokeStyle = '#fa4'; ctx.lineWidth = 1; ctx.beginPath();
  for (let i = 0; i < segs.length; i += 6) {
    const p0 = proj(segs[i], segs[i+1], segs[i+2], cyaw, syaw, cp, sp, f);
    const p1 = proj(segs[i+3], segs[i+4], segs[i+5], cyaw, syaw, cp, sp, f);
    if (p0 && p1) { ctx.moveTo(p0[0], p0[1]); ctx.lineTo(p1[0], p1[1]); }
  }
  ctx.stroke();
}
async function poll() {
  try {
    const r = await fetch('/state.bin', {cache: 'no-store'});
    const buf = await r.arrayBuffer();
    const head = new Uint32Array(buf, 0, 5);
    if (head[0] !== seq) {
      seq = head[0];
      const np_ = head[1], nt = head[2], nk = head[3], ns = head[4];
      let off = 20;
      pts = new Float32Array(buf.slice(off, off + np_*12)); off += np_*12;
      cols = new Uint8Array(buf.slice(off, off + np_*3)); off += np_*3;
      off += (4 - off % 4) % 4;
      traj = new Float32Array(buf.slice(off, off + nt*12)); off += nt*12;
      kfs = new Float32Array(buf.slice(off, off + nk*12)); off += nk*12;
      segs = new Float32Array(buf.slice(off, off + ns*24));
      recenter(); draw();
      hud.textContent = `update ${seq}: ${np_} pts, ${nk} keyframes, ${nt} poses`;
    }
  } catch (e) { hud.textContent = 'stream lost: ' + e; }
  setTimeout(poll, 1000);
}
poll();
</script></body></html>
"""

_EMPTY = struct.pack("<5I", 0, 0, 0, 0, 0)


class LiveViewer:
    """Thread-safe snapshot store + daemon HTTP server."""

    def __init__(self):
        self._lock = threading.Lock()
        self._blob = _EMPTY
        self._seq = 0
        self._server: Optional[socketserver.TCPServer] = None
        self.port: Optional[int] = None

    @staticmethod
    def frustum_segments(kf_poses: np.ndarray, size: float = 0.1) -> np.ndarray:
        """Sim(3) keyframe poses (k, 8: t, q_xyzw, s) -> (k*8, 2, 3) line
        segments forming camera frustums (apex->corners + image-plane ring),
        the live-viewer equivalent of the reference's Frustums geometry
        (`visualization_utils.py:27-83`)."""
        kf_poses = np.asarray(kf_poses, np.float32).reshape(-1, 8)
        t = kf_poses[:, :3]
        q = kf_poses[:, 3:7]  # xyzw
        s = kf_poses[:, 7:8]
        x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        R = np.stack(
            [
                1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
                2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
                2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
            ],
            axis=-1,
        ).reshape(-1, 3, 3)
        a, b, f = 0.8 * size, 0.6 * size, size
        local = np.array(
            [
                [0, 0, 0],
                [-a, -b, f], [a, -b, f], [a, b, f], [-a, b, f],
            ],
            np.float32,
        )  # apex + 4 corners
        pts = (
            np.einsum("kij,cj->kci", R, local) * s[:, :, None] + t[:, None, :]
        )  # (k, 5, 3)
        idx = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]
        segs = np.stack(
            [np.stack([pts[:, i], pts[:, j]], axis=1) for i, j in idx], axis=1
        )  # (k, 8, 2, 3)
        return segs.reshape(-1, 2, 3)

    def update(
        self,
        points: np.ndarray,  # (n, 3) float
        colors: np.ndarray,  # (n, 3) float [0,1] or uint8
        traj: Optional[np.ndarray] = None,  # (t, 3) camera centers
        kf_centers: Optional[np.ndarray] = None,  # (k, 3)
        kf_segments: Optional[np.ndarray] = None,  # (L, 2, 3) frustum lines
        max_points: int = 250_000,
    ):
        points = np.asarray(points, np.float32).reshape(-1, 3)
        colors = np.asarray(colors).reshape(-1, 3)
        if colors.dtype != np.uint8:
            colors = np.uint8(np.clip(colors, 0, 1) * 255)
        finite = np.isfinite(points).all(axis=1)
        points, colors = points[finite], colors[finite]
        if points.shape[0] > max_points:
            sel = np.random.default_rng(0).choice(
                points.shape[0], max_points, replace=False
            )
            points, colors = points[sel], colors[sel]
        traj = (
            np.zeros((0, 3), np.float32)
            if traj is None
            else np.asarray(traj, np.float32).reshape(-1, 3)
        )
        kf = (
            np.zeros((0, 3), np.float32)
            if kf_centers is None
            else np.asarray(kf_centers, np.float32).reshape(-1, 3)
        )
        segs = (
            np.zeros((0, 2, 3), np.float32)
            if kf_segments is None
            else np.asarray(kf_segments, np.float32).reshape(-1, 2, 3)
        )
        self._seq += 1
        head = struct.pack(
            "<5I", self._seq, points.shape[0], traj.shape[0], kf.shape[0],
            segs.shape[0],
        )
        body = points.tobytes() + colors.tobytes()
        body += b"\0" * ((4 - (len(head) + len(body)) % 4) % 4)
        blob = head + body + traj.tobytes() + kf.tobytes() + segs.tobytes()
        with self._lock:
            self._blob = blob

    def start(self, port: int = 8089) -> Optional[int]:
        """Serve on localhost:port (tries a few successors if busy).

        Returns the bound port, or None if no port could be bound."""
        viewer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                if self.path == "/state.bin":
                    with viewer._lock:
                        blob = viewer._blob
                    self.send_response(200)
                    self.send_header("Content-Type", "application/octet-stream")
                    self.send_header("Content-Length", str(len(blob)))
                    self.end_headers()
                    self.wfile.write(blob)
                else:
                    page = _PAGE.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.send_header("Content-Length", str(len(page)))
                    self.end_headers()
                    self.wfile.write(page)

            def log_message(self, *a):  # quiet
                pass

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        for p in range(port, port + 16):
            try:
                self._server = Server(("127.0.0.1", p), Handler)
            except OSError:
                continue
            self.port = p
            t = threading.Thread(target=self._server.serve_forever, daemon=True)
            t.start()
            return p
        return None

    def stop(self):
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
