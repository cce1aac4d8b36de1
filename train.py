#!/usr/bin/env python
"""Fine-tune the two-view pointmap model on a dp x tp TPU mesh.

The reference ships inference-only; this driver exercises the framework's
training path (train/step.py): confidence-weighted pointmap regression with
AdamW, batch sharded over `dp`, Megatron-style tensor parallelism over `tp`.

Data: directory of .npz samples with img1/img2 (H, W, 3) normalized,
gt_X1/gt_X2 (H, W, 3), valid1/valid2 (H, W); or --synthetic for a smoke run.
"""

from __future__ import annotations

import argparse
import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np


def synthetic_batch(key, b, h, w):
    ks = jax.random.split(key, 3)
    img1 = jax.random.normal(ks[0], (b, h, w, 3)) * 0.5
    img2 = img1 + 0.05 * jax.random.normal(ks[1], (b, h, w, 3))
    z = 2.0 + jax.nn.sigmoid(img1[..., 0:1]) * 2.0
    u = jnp.linspace(-1, 1, w)[None, None, :, None]
    v = jnp.linspace(-0.75, 0.75, h)[None, :, None, None]
    gt = jnp.concatenate([u * z, v * z, z], axis=-1)
    valid = jnp.ones((b, h, w))
    return {
        "img1": img1, "img2": img2,
        "gt_X1": gt, "gt_X2": gt,
        "valid1": valid, "valid2": valid,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="", help="dir of .npz samples")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--checkpoint", default="", help="torch .pth to start from")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--img-size", type=int, nargs=2, default=[224, 224])
    p.add_argument("--tiny", action="store_true", help="tiny config (smoke)")
    p.add_argument("--save", default="trained_params.npz")
    p.add_argument("--ckpt-dir", default="",
                   help="orbax checkpoint dir: resumes the full TrainState "
                        "(params + AdamW moments + step) if one exists")
    p.add_argument("--ckpt-every", type=int, default=50)
    args = p.parse_args()

    from monst3r_slam_tpu.models.config import MAST3R_512, TINY
    from monst3r_slam_tpu.models.init import init_params
    from monst3r_slam_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params
    from monst3r_slam_tpu.train.step import (
        init_train_state, make_optimizer, train_step,
    )

    cfg = TINY if args.tiny else MAST3R_512
    if args.checkpoint:
        from monst3r_slam_tpu.models.convert import load_checkpoint

        params, cfg = load_checkpoint(args.checkpoint)
    else:
        params = init_params(jax.random.PRNGKey(0), cfg)

    mesh = make_mesh()
    print(f"mesh: {dict(mesh.shape)}")
    params = shard_params(params, mesh)
    optimizer = make_optimizer(args.lr)
    state = init_train_state(params, optimizer)

    mngr = None
    ckpt = None
    start_step = 0
    if args.ckpt_dir:
        from monst3r_slam_tpu.train import checkpoint as ckpt

        mngr = ckpt.make_manager(args.ckpt_dir)
        restored = ckpt.restore_latest(mngr, state)
        if restored is not None:
            state = restored
            start_step = int(state.step)
            print(f"resumed from {args.ckpt_dir} at step {start_step}")

    h, w = args.img_size
    bsh = batch_sharding(mesh)

    files = sorted(pathlib.Path(args.data).glob("*.npz")) if args.data else []

    def get_batch(step):
        if args.synthetic or not files:
            batch = synthetic_batch(jax.random.PRNGKey(step), args.batch, h, w)
        else:
            samples = [np.load(files[(step * args.batch + i) % len(files)])
                       for i in range(args.batch)]
            batch = {
                k: jnp.asarray(np.stack([s[k] for s in samples]))
                for k in ("img1", "img2", "gt_X1", "gt_X2", "valid1", "valid2")
            }
        return {k: jax.device_put(v, bsh) for k, v in batch.items()}

    t0 = time.time()
    with mesh:
        for step in range(start_step, args.steps):
            state, loss = train_step(state, cfg, optimizer, get_batch(step))
            if step % 10 == 0:
                done = step - start_step + 1  # steps completed this run
                print(f"step {step}: loss {float(loss):.4f} "
                      f"({(time.time() - t0) / done:.2f} s/step)")
            if mngr is not None and (step + 1) % max(args.ckpt_every, 1) == 0:
                ckpt.save(mngr, state)
    if mngr is not None:
        # no-op when the last loop iteration already saved this step
        # (orbax skips saves for steps <= latest_step)
        ckpt.save(mngr, state)
        mngr.wait_until_finished()

    if args.save:
        flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
        np.savez_compressed(
            args.save,
            **{jax.tree_util.keystr(k): np.asarray(v) for k, v in flat},
        )
        print(f"saved params to {args.save}")


if __name__ == "__main__":
    main()
