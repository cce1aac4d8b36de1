"""Sharded training step: dp x tp mesh, optax AdamW, GSPMD collectives.

The batch (image pairs + ground-truth pointmaps) is sharded over `dp`;
parameters follow the Megatron rules in `parallel/mesh.py` over `tp` (XLA
inserts the all-reduces for row-parallel matmuls and the gradient psum over
dp automatically from the shardings).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from monst3r_slam_tpu.models import croco, heads
from monst3r_slam_tpu.models.config import ModelConfig
from monst3r_slam_tpu.train.loss import conf_regression_loss


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jax.Array


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.05):
    return optax.adamw(lr, b1=0.9, b2=0.95, weight_decay=weight_decay)


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def pair_forward(params, cfg: ModelConfig, img1, img2, dtype=jnp.bfloat16):
    """Two-view forward (training path: no jit boundary, grads flow)."""
    h, w = img1.shape[1:3]
    n_h, n_w = h // cfg.patch_size, w // cfg.patch_size
    feat1, pos1 = croco.encode_image(params, cfg, img1, dtype)
    feat2, pos2 = croco.encode_image(params, cfg, img2, dtype)
    dec1, dec2 = croco.decode_pair(params, cfg, feat1, pos1, feat2, pos2, dtype)
    out1 = heads.head_forward(params["head1"], cfg, dec1, n_h, n_w)
    out2 = heads.head_forward(params["head2"], cfg, dec2, n_h, n_w)
    return out1, out2


def loss_fn(params, cfg: ModelConfig, batch, alpha: float = 0.2):
    out1, out2 = pair_forward(params, cfg, batch["img1"], batch["img2"])
    l1 = conf_regression_loss(out1.pts3d, out1.conf, batch["gt_X1"], batch["valid1"], alpha)
    l2 = conf_regression_loss(out2.pts3d, out2.conf, batch["gt_X2"], batch["valid2"], alpha)
    return l1 + l2


@partial(jax.jit, static_argnames=("cfg", "optimizer"), donate_argnums=(0,))
def train_step(state: TrainState, cfg: ModelConfig, optimizer, batch):
    loss, grads = jax.value_and_grad(loss_fn)(state.params, cfg, batch)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss
