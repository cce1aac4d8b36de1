"""Training checkpoint/resume: the full TrainState (params + AdamW moments
+ step) round-trips through orbax and a resumed run continues bit-exact."""

import jax
import jax.numpy as jnp
import numpy as np

from monst3r_slam_tpu.models.config import TINY
from monst3r_slam_tpu.models.init import init_params
from monst3r_slam_tpu.train import checkpoint as ckpt
from monst3r_slam_tpu.train.step import (
    init_train_state, make_optimizer, train_step,
)


def _batch(step, b=2, h=32, w=32):
    k = jax.random.PRNGKey(step)
    img = jax.random.normal(k, (b, h, w, 3)) * 0.5
    gt = jnp.concatenate(
        [img[..., :2] * 0.1, 2.0 + jax.nn.sigmoid(img[..., 2:])], axis=-1
    )
    valid = jnp.ones((b, h, w))
    return {"img1": img, "img2": img + 0.01, "gt_X1": gt, "gt_X2": gt,
            "valid1": valid, "valid2": valid}


def test_train_state_checkpoint_resume(tmp_path):
    params = init_params(jax.random.PRNGKey(0), TINY)
    opt = make_optimizer(1e-4)
    state = init_train_state(params, opt)

    # uninterrupted 4-step run
    ref = state
    losses = []
    for step in range(4):
        ref, loss = train_step(ref, TINY, opt, _batch(step))
        losses.append(float(loss))

    # 2 steps -> checkpoint -> restore into a FRESH state -> 2 more steps
    # (fresh init with the same key: train_step donates its input state,
    # so the first run consumed the original param buffers)
    state2 = init_train_state(init_params(jax.random.PRNGKey(0), TINY), opt)
    for step in range(2):
        state2, _ = train_step(state2, TINY, opt, _batch(step))
    mngr = ckpt.make_manager(tmp_path / "ckpts")
    ckpt.save(mngr, state2)
    mngr.wait_until_finished()

    fresh = init_train_state(init_params(jax.random.PRNGKey(1), TINY), opt)
    restored = ckpt.restore_latest(mngr, fresh)
    assert restored is not None
    assert int(restored.step) == 2
    resumed = restored
    losses2 = []
    for step in range(2, 4):
        resumed, loss = train_step(resumed, TINY, opt, _batch(step))
        losses2.append(float(loss))
    # bit-exact continuation: same losses and same final params
    np.testing.assert_allclose(losses2, losses[2:], rtol=0, atol=0)
    for a, b in zip(jax.tree.leaves(resumed.params), jax.tree.leaves(ref.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_latest_empty_dir(tmp_path):
    opt = make_optimizer(1e-4)
    state = init_train_state(init_params(jax.random.PRNGKey(0), TINY), opt)
    mngr = ckpt.make_manager(tmp_path / "empty")
    assert ckpt.restore_latest(mngr, state) is None
