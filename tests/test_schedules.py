"""Schedules vs stateful oracles of the reference scheduler recurrences."""

import math

import numpy as np

from p4fr_tpu.train.schedules import (
    TeacherForcingScheduler,
    circular_lr,
    constant_with_warmup,
    cosine_warmup_restarts,
    teacher_forcing_arctan,
)


class CosineOracle:
    """Stateful per-iteration oracle of CustomCosineAnnealingWarmUpRestarts
    (step(epoch=None) path), base_lr = 0."""

    def __init__(self, t_0, t_mult, eta_max, t_up, gamma):
        self.t_0, self.t_mult, self.t_up, self.gamma = t_0, t_mult, t_up, gamma
        self.base_eta = eta_max
        self.eta = eta_max
        self.t_i = t_0
        self.t_cur = 0
        self.cycle = 0

    def lr(self):
        if self.t_cur < self.t_up:
            return self.eta * self.t_cur / self.t_up
        return (
            self.eta
            * (1 + math.cos(math.pi * (self.t_cur - self.t_up) / (self.t_i - self.t_up)))
            / 2
        )

    def step(self):
        self.t_cur += 1
        if self.t_cur >= self.t_i:
            self.cycle += 1
            self.t_cur -= self.t_i
            self.t_i = (self.t_i - self.t_up) * self.t_mult + self.t_up
        self.eta = self.base_eta * (self.gamma ** self.cycle)


def test_cosine_warmup_restarts_matches_oracle():
    total = 100
    for cycles, t_mult in [(1, 1), (2, 1), (2, 2)]:
        sched = cosine_warmup_restarts(
            5e-4, total, warmup_ratio=0.1, gamma=0.8, cycles=cycles, t_mult=t_mult
        )
        t_0 = total // cycles
        oracle = CosineOracle(t_0, t_mult, 5e-4, int(t_0 * 0.1), 0.8)
        for step in range(total):
            got = float(sched(step))
            want = oracle.lr()
            assert abs(got - want) < 1e-9, (cycles, t_mult, step, got, want)
            oracle.step()


def test_circular_lr_matches_oracle():
    lr_max, step_size = 1e-3, 50
    sched = circular_lr(lr_max, step_size)
    cycle_step = int(step_size * (1 - 10 / 100) / 2)
    for it in range(2 * step_size):
        i = it % step_size
        if i > 2 * cycle_step:
            cut = (i - 2 * cycle_step) / (step_size - 2 * cycle_step)
            want = lr_max * (1 + (cut * (1 - 100) / 100)) / 10
        elif i > cycle_step:
            cut = 1 - (i - cycle_step) / cycle_step
            want = lr_max * (1 + cut * 9) / 10
        else:
            cut = i / cycle_step
            want = lr_max * (1 + cut * 9) / 10
        assert abs(float(sched(it)) - want) < 1e-9


def test_circular_momentum_matches_oracle():
    """beta1 counter-cycle of CircularLRBeta.get_momentum
    (schedulers/circular_lr.py:36-48) with momentum=[0.95, 0.85]."""
    from p4fr_tpu.train.schedules import circular_momentum

    step_size = 50
    sched = circular_momentum(step_size)
    cycle_step = int(step_size * (1 - 10 / 100) / 2)
    for it in range(2 * step_size):
        i = it % step_size
        if i > 2 * cycle_step:
            want = 0.95
        elif i > cycle_step:
            cut = 1 - (i - cycle_step) / cycle_step
            want = 0.95 + cut * (0.85 - 0.95)
        else:
            cut = i / cycle_step
            want = 0.95 + cut * (0.85 - 0.95)
        assert abs(float(sched(it)) - want) < 1e-7, (it, want)


def test_build_optimizer_applies_b1_schedule():
    """build_optimizer(b1_schedule=...) must produce updates IDENTICAL to
    a fixed-b1 adam at each step's scheduled value — proving
    inject_hyperparams actually drives the optimizer math, not just a
    recorded hyperparam."""
    import jax.numpy as jnp
    import optax

    from p4fr_tpu.train.schedules import circular_momentum
    from p4fr_tpu.train.steps import build_optimizer

    step_size = 20
    b1s = circular_momentum(step_size)
    opt = build_optimizer("adam", 1e-3, b1_schedule=b1s)
    params = {"w": jnp.ones((3,))}
    state = opt.init(params)
    grads = {"w": jnp.asarray([0.1, -0.2, 0.3])}
    # manual reference: optax.adam re-built per step at the scheduled b1,
    # with moments carried forward by hand
    mu = {"w": jnp.zeros((3,))}
    nu = {"w": jnp.zeros((3,))}
    p_ref = params
    for step in range(5):
        updates, state = opt.update(grads, state, params)
        b1 = float(b1s(step))
        mu = {"w": b1 * mu["w"] + (1 - b1) * grads["w"]}
        nu = {"w": 0.999 * nu["w"] + 0.001 * grads["w"] ** 2}
        mu_hat = mu["w"] / (1 - b1 ** (step + 1))
        # optax bias-corrects nu with the CURRENT b2 only; b1 correction
        # uses the current b1 value (matches inject_hyperparams semantics)
        nu_hat = nu["w"] / (1 - 0.999 ** (step + 1))
        want = -1e-3 * mu_hat / (jnp.sqrt(nu_hat) + 1e-8)
        np.testing.assert_allclose(
            np.asarray(updates["w"]), np.asarray(want), rtol=1e-5
        )
        p_ref = {"w": p_ref["w"] + want}
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(
        np.asarray(params["w"]), np.asarray(p_ref["w"]), rtol=1e-5
    )


def test_constant_with_warmup():
    sched = constant_with_warmup(5e-4, 10)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(5)) - 2.5e-4) < 1e-9
    assert abs(float(sched(10)) - 5e-4) < 1e-9
    assert abs(float(sched(1000)) - 5e-4) < 1e-9


def test_teacher_forcing_arctan_curve():
    vals = teacher_forcing_arctan(1000, 0.8, 0.3)
    assert len(vals) == 900  # first 10% trimmed
    assert vals[0] <= 0.8 and vals[0] > 0.7  # starts near (below) tf_max
    assert abs(vals[-1] - 0.3) < 1e-9  # ends exactly at tf_min
    assert (np.diff(vals) <= 1e-12).all()  # monotone decreasing


def test_teacher_forcing_scheduler_exhaustion():
    s = TeacherForcingScheduler(20, 0.8, 0.3)
    vals = [s.step() for _ in range(25)]
    assert vals[-1] == 0.3  # tf_min after exhaustion
    assert len([v for v in vals if v > 0.3]) >= 10
