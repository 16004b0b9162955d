"""Jitted train/eval steps: loss goes down, both TF branches work."""

import jax
import jax.numpy as jnp
import numpy as np

from p4fr_tpu.train.schedules import cosine_warmup_restarts
from p4fr_tpu.train.steps import (
    TrainState,
    build_optimizer,
    cross_entropy_ignore_pad,
    make_eval_step,
    make_train_step,
)

from helpers import synth_images, synth_labels, tiny_satrn

B, L = 4, 8
PAD = 2


def _init():
    model = tiny_satrn()
    images = jnp.asarray(synth_images(B))
    text = jnp.asarray(synth_labels(B, L))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images,
        text,
        train=False,
    )
    sched = cosine_warmup_restarts(1e-3, 100)
    opt = build_optimizer("adamw", sched, weight_decay=1e-6, max_grad_norm=2.0)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=opt.init(variables["params"]),
        step=jnp.asarray(0, jnp.int32),
    )
    return model, opt, state, images, text


def test_cross_entropy_ignores_pad():
    logits = jnp.zeros((2, 3, 5))
    targets = jnp.asarray([[1, PAD, PAD], [1, 2, PAD]])
    # uniform logits -> nll = log(5) per valid target
    loss = cross_entropy_ignore_pad(logits, targets, PAD)
    assert abs(float(loss) - np.log(5)) < 1e-6


def test_teacher_forced_training_reduces_loss():
    model, opt, state, images, text = _init()
    step_fn = make_train_step(model, opt, PAD)
    losses = []
    for i in range(8):
        rng = jax.random.PRNGKey(100 + i)
        state, metrics, seqs = step_fn(state, images, text, rng, teacher_forced=True)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert seqs.shape == (B, L - 1)
    assert int(state.step) == 8
    assert np.isfinite(losses).all()


def test_ar_branch_trains_too():
    model, opt, state, images, text = _init()
    step_fn = make_train_step(model, opt, PAD)
    # the step DONATES its input state; keep a host copy for comparison
    init_params = jax.tree_util.tree_map(np.asarray, state.params)
    state1 = state
    for i in range(3):  # lr warms up from exactly 0 at step 0
        state1, m1, _ = step_fn(
            state1, images, text, jax.random.PRNGKey(i), teacher_forced=False
        )
        assert np.isfinite(float(m1["loss"]))
        assert float(m1["grad_norm"]) > 0
    # params actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        init_params,
        state1.params,
    )
    assert any(jax.tree_util.tree_leaves(moved))


def test_eval_step_shapes():
    model, opt, state, images, text = _init()
    eval_fn = make_eval_step(model, PAD)
    loss, seqs = eval_fn(state.params, state.batch_stats, images, text)
    assert np.isfinite(float(loss))
    assert seqs.shape == (B, L - 1)


def test_grad_clipping_bounds_update_norm():
    model, opt, state, images, text = _init()
    step_fn = make_train_step(model, opt, PAD)
    _, metrics, _ = step_fn(state, images, text, jax.random.PRNGKey(5))
    # grad_norm reported is the raw (pre-clip) global norm, like the
    # reference's clip_grad_norm_ return value
    assert float(metrics["grad_norm"]) > 0
