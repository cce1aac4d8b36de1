"""Factor graph: fixed-capacity edge store + symmetric-match edge creation.

Host-side orchestration of `mast3r_slam/global_opt.py:12-213` (FactorGraph):
edges live in bucketed device arrays (capacity doubles on demand -> bounded
recompiles), and both directions of every accepted edge are stored eagerly
(the reference mirrors them at solve time via prep_two_way_edges,
global_opt.py:104-119).

Edge semantics (matching gn_kernels.cu:913-920): edge e relates keyframes
(i, j) = (ii[e], jj[e]); `idx_ii2jj[e][k]` maps pixel k of keyframe j to a
pixel of keyframe i; Q[e][k] is the combined descriptor confidence.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from monst3r_slam_tpu.slam import backend as backend_mod
from monst3r_slam_tpu.slam.frame import KeyframeMemory, kf_update_poses


def _next_pow2(n: int, lo: int = 8) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


class FactorGraph:
    def __init__(self, hw: int, edge_capacity: int = 16):
        self.hw = hw
        self.capacity = edge_capacity
        self.n_edges = 0
        self.ii = np.zeros(edge_capacity, np.int32)
        self.jj = np.zeros(edge_capacity, np.int32)
        self.idx = jnp.zeros((edge_capacity, hw), jnp.int32)
        self.valid_match = jnp.zeros((edge_capacity, hw), bool)
        self.Q = jnp.zeros((edge_capacity, hw), jnp.float32)

    def _grow(self, needed: int):
        if self.n_edges + needed <= self.capacity:
            return
        new_cap = _next_pow2(self.n_edges + needed, self.capacity * 2)
        pad = new_cap - self.capacity
        self.ii = np.concatenate([self.ii, np.zeros(pad, np.int32)])
        self.jj = np.concatenate([self.jj, np.zeros(pad, np.int32)])
        self.idx = jnp.concatenate([self.idx, jnp.zeros((pad, self.hw), jnp.int32)])
        self.valid_match = jnp.concatenate(
            [self.valid_match, jnp.zeros((pad, self.hw), bool)]
        )
        self.Q = jnp.concatenate([self.Q, jnp.zeros((pad, self.hw), jnp.float32)])
        self.capacity = new_cap

    def add_edge_pair(self, i: int, j: int, idx_i2j, valid_j, Qj, idx_j2i, valid_i, Qi):
        """Store both directions of an accepted (i, j) edge."""
        self._grow(2)
        e = self.n_edges
        self.ii[e], self.jj[e] = i, j
        self.ii[e + 1], self.jj[e + 1] = j, i
        self.idx = self.idx.at[e].set(idx_i2j).at[e + 1].set(idx_j2i)
        self.valid_match = (
            self.valid_match.at[e].set(valid_j).at[e + 1].set(valid_i)
        )
        self.Q = self.Q.at[e].set(Qj).at[e + 1].set(Qi)
        self.n_edges += 2

    def edge_list(self) -> List[tuple]:
        return [
            (int(self.ii[e]), int(self.jj[e])) for e in range(0, self.n_edges, 2)
        ]

    def solve(
        self,
        mem: KeyframeMemory,
        cfg: backend_mod.BackendConfig,
        use_calib: bool = False,
        K=None,
        img_size=None,
        host_solve: bool = False,
        mesh=None,
    ) -> KeyframeMemory:
        """Run the global GN (global_opt.py:121-213) and write back poses.

        host_solve=True routes the linear solves through the native C++ f64
        solver (config `local_opt.solver: host`). `mesh` shards the edge
        accumulation over the mesh's dp axis (config `parallel.mesh`)."""
        n_kf = int(mem.count)
        if self.n_edges == 0 or n_kf <= cfg.pin:
            return mem
        P = min(_next_pow2(n_kf, cfg.pose_pad_lo), mem.capacity)
        Twc_new = self.solve_poses(
            mem.T_WC[:P], mem.X_canon[:P],
            mem.C[:P] / jnp.maximum(mem.N[:P, None, None].astype(jnp.float32), 1.0),
            n_kf, cfg, use_calib=use_calib, K=K, img_size=img_size,
            host_solve=host_solve, mesh=mesh,
        )
        if Twc_new is None:
            return mem
        return kf_update_poses(mem, Twc_new, jnp.arange(P))

    def solve_poses(
        self,
        Twc,  # (P, 8) poses (P >= n_kf, pow2-padded)
        Xs,  # (P, hw, 3)
        Cs,  # (P, hw, 1) average confidences
        n_kf: int,
        cfg: backend_mod.BackendConfig,
        use_calib: bool = False,
        K=None,
        img_size=None,
        host_solve: bool = False,
        mesh=None,
    ):
        """Array-level global GN on explicit state snapshots; returns the
        updated (P, 8) poses, or None when there is nothing to solve. Used
        directly by the async backend, which must not touch the live
        (donation-cycled) keyframe buffers."""
        if self.n_edges == 0 or n_kf <= cfg.pin:
            return None
        P = Twc.shape[0]
        E = _next_pow2(self.n_edges, cfg.edge_pad_lo)
        if mesh is not None and not host_solve:
            # Sharded GN needs the padded edge count to divide the dp size
            # (pow2 buckets with edge_pad_lo >= 8 always do for pow2 meshes,
            # but keep it correct for any mesh).
            dp = mesh.shape["dp"]
            E = ((E + dp - 1) // dp) * dp
        if use_calib:
            from monst3r_slam_tpu.core import geometry

            Xs = geometry.constrain_points_to_ray(img_size, Xs, K)

        ii = jnp.asarray(np.resize(self.ii[: self.n_edges], E))
        jj = jnp.asarray(np.resize(self.jj[: self.n_edges], E))
        edge_valid = jnp.asarray(np.arange(E) < self.n_edges)
        idx = self._padded(self.idx, E)
        valid_match = self._padded(self.valid_match, E)
        Q = self._padded(self.Q, E)

        if host_solve:
            Twc_new = backend_mod.gauss_newton_host_solve(
                Twc, Xs, Cs, ii, jj, idx, valid_match, Q, edge_valid, cfg,
                n_poses=P, use_calib=use_calib, K=K, img_size=img_size,
            )
        elif mesh is not None:
            Twc_new, _ = backend_mod.gauss_newton_sharded(
                mesh, Twc, Xs, Cs, ii, jj, idx, valid_match, Q, edge_valid,
                cfg, n_poses=P, use_calib=use_calib, K=K, img_size=img_size,
            )
        else:
            Twc_new, _ = backend_mod.gauss_newton(
                Twc, Xs, Cs, ii, jj, idx, valid_match, Q, edge_valid, cfg,
                n_poses=P, use_calib=use_calib, K=K, img_size=img_size,
            )
        return Twc_new

    def _padded(self, arr, E):
        cur = arr.shape[0]
        if cur >= E:
            return arr[:E]
        reps = -(-E // cur)
        return jnp.concatenate([arr] * reps, axis=0)[:E]
