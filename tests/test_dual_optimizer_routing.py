"""Dual optimizer: encoder/decoder groups must get their own schedules."""

import jax
import jax.numpy as jnp
import numpy as np

from p4fr_tpu.train.dual_opt import build_dual_optimizer


def test_groups_get_separate_learning_rates():
    total = 100
    opt = build_dual_optimizer(
        1e-2, 1e-3, total, warmup_ratio=0.1, max_grad_norm=None
    )
    params = {
        "encoder": {"w": jnp.ones((4,))},
        "decoder": {"w": jnp.ones((4,))},
    }
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    # step a few times past both warmups
    updates = None
    for _ in range(30):
        updates, state = opt.update(grads, state, params)

    enc_step = float(np.abs(np.asarray(updates["encoder"]["w"])[0]))
    dec_step = float(np.abs(np.asarray(updates["decoder"]["w"])[0]))
    # Adam with constant unit grads -> |update| ~ lr; encoder (cosine to
    # 1e-2) and decoder (constant 1e-3) must differ by roughly their ratio
    assert enc_step > 3 * dec_step, (enc_step, dec_step)
    # decoder is at its constant LR
    assert abs(dec_step - 1e-3) < 3e-4, dec_step


def test_clipping_is_per_group():
    opt = build_dual_optimizer(1e-2, 1e-2, 100, max_grad_norm=1.0)
    params = {
        "encoder": {"w": jnp.ones((4,))},
        "decoder": {"w": jnp.ones((4,))},
    }
    state = opt.init(params)
    # huge encoder grads, tiny decoder grads: encoder clipping must not
    # shrink the decoder's update
    grads = {
        "encoder": {"w": jnp.full((4,), 1e6)},
        "decoder": {"w": jnp.full((4,), 1e-3)},
    }
    updates, _ = opt.update(grads, state, params)
    assert np.isfinite(np.asarray(updates["encoder"]["w"])).all()
    assert np.isfinite(np.asarray(updates["decoder"]["w"])).all()
