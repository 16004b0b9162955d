"""Learning-rate and teacher-forcing schedules as pure functions of step.

Rebuilds the three reference schedulers (reference: schedulers/) in optax
style — a schedule is ``step -> value`` and composes with any optax chain;
nothing is stateful, so jitted train steps can consume the value directly.

- ``cosine_warmup_restarts``: CustomCosineAnnealingWarmUpRestarts
  (schedulers/cosineannealing.py:7-81) in its per-iteration ``step()`` form:
  linear warmup base->eta_max over T_up, cosine back to base over the rest
  of the cycle, cycle length recurrence T_{i+1} = (T_i - T_up)*T_mult + T_up,
  amplitude decay eta_max *= gamma per cycle. The trainers instantiate it
  with base_lr=0, T_0=total_steps//cycle, T_up=10%, gamma=0.8
  (train_modules/train_single_opt.py:317-345).
- ``circular_lr`` / ``circular_momentum``: CircularLRBeta triangular LR
  plus its Adam beta1 momentum counter-cycle (schedulers/circular_lr.py:6-70
  — the reference always constructs it with ``momentum=[0.95, 0.85]``,
  train_modules/train_single_opt.py:385, train_distillation.py:436); the
  trainers feed the beta1 schedule through ``optax.inject_hyperparams``.
- ``teacher_forcing_arctan``: arctan decay from tf_max to tf_min with the
  first 10% trimmed and tf_min after exhaustion
  (schedulers/tf_scheduler.py:44-54).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

MAX_CYCLES = 64  # precomputed restart horizon (reference uses cycle=1)


def cosine_warmup_restarts(
    eta_max: float,
    total_steps: int,
    *,
    base_lr: float = 0.0,
    t_mult: int = 1,
    warmup_ratio: float = 0.1,
    gamma: float = 0.8,
    cycles: int = 1,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Reference-parity cosine annealing with warmup + restarts.

    ``cycles`` splits total_steps into T_0 = total_steps // cycles, like the
    trainers do; ``warmup_ratio`` of each cycle is linear warmup.
    """
    t_0 = max(1, total_steps // max(1, cycles))
    t_up = int(t_0 * warmup_ratio)

    # precompute cycle boundaries with the reference recurrence
    lengths = []
    t_i = t_0
    for _ in range(MAX_CYCLES):
        lengths.append(t_i)
        t_i = (t_i - t_up) * t_mult + t_up
    starts = np.concatenate([[0], np.cumsum(lengths)])  # [MAX_CYCLES+1]
    lengths = np.asarray(lengths, np.float64)

    starts_j = jnp.asarray(starts[:-1], jnp.float32)
    lengths_j = jnp.asarray(lengths, jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        cycle = jnp.clip(
            jnp.searchsorted(jnp.asarray(starts[1:], jnp.float32), step, side="right"),
            0,
            MAX_CYCLES - 1,
        )
        t_cur = step - starts_j[cycle]
        t_i_c = lengths_j[cycle]
        eta = eta_max * (gamma ** cycle.astype(jnp.float32))
        warm = (eta - base_lr) * t_cur / jnp.maximum(t_up, 1) + base_lr
        denom = jnp.maximum(t_i_c - t_up, 1.0)
        cos = base_lr + (eta - base_lr) * (
            1 + jnp.cos(jnp.pi * (t_cur - t_up) / denom)
        ) / 2
        lr = jnp.where(t_cur < t_up, warm, cos)
        # reference T_cur==-1 initial state never happens in the step() path
        return lr

    return schedule


def constant_with_warmup(
    lr: float, warmup_steps: int
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """transformers.get_constant_schedule_with_warmup semantics
    (used for the decoder in train_dual_opt.py:357-359)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        factor = jnp.where(
            step < warmup_steps,
            step / jnp.maximum(1.0, float(warmup_steps)),
            1.0,
        )
        return lr * factor

    return schedule


def circular_lr(
    lr_max: float,
    step_size: int,
    *,
    lr_divider: float = 10.0,
    cut_point: int = 10,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """CircularLRBeta triangular LR (schedulers/circular_lr.py:19-34).

    Rises lr_max/div -> lr_max over cycle_step iters, falls back over the
    next cycle_step, then decays toward ~0 over the tail; wraps every
    ``step_size`` iterations.
    """
    cycle_step = int(step_size * (1 - cut_point / 100) / 2)

    def schedule(step):
        it = jnp.mod(jnp.asarray(step, jnp.float32), step_size)
        tail_cut = (it - 2 * cycle_step) / max(step_size - 2 * cycle_step, 1)
        tail = lr_max * (1 + tail_cut * (1 - 100) / 100) / lr_divider
        down_cut = 1 - (it - cycle_step) / max(cycle_step, 1)
        down = lr_max * (1 + down_cut * (lr_divider - 1)) / lr_divider
        up_cut = it / max(cycle_step, 1)
        up = lr_max * (1 + up_cut * (lr_divider - 1)) / lr_divider
        return jnp.where(
            it > 2 * cycle_step, tail, jnp.where(it > cycle_step, down, up)
        )

    return schedule


def circular_momentum(
    step_size: int,
    *,
    m0: float = 0.95,
    m1: float = 0.85,
    cut_point: int = 10,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """CircularLRBeta's Adam beta1 cycle (schedulers/circular_lr.py:36-48).

    Counter-cycles against the triangular LR: beta1 falls m0 -> m1 while
    the LR rises, climbs back m1 -> m0 while it falls, and pins at m0
    through the tail. The reference applies it by rewriting
    ``group["betas"] = (momentum, beta2)`` every step
    (circular_lr.py:62-66); here it is a pure ``step -> b1`` schedule for
    ``optax.inject_hyperparams``. Wraps every ``step_size`` iterations
    like the LR leg.
    """
    cycle_step = int(step_size * (1 - cut_point / 100) / 2)

    def schedule(step):
        it = jnp.mod(jnp.asarray(step, jnp.float32), step_size)
        down_cut = 1 - (it - cycle_step) / max(cycle_step, 1)
        down = m0 + down_cut * (m1 - m0)
        up_cut = it / max(cycle_step, 1)
        up = m0 + up_cut * (m1 - m0)
        return jnp.where(
            it > 2 * cycle_step, m0, jnp.where(it > cycle_step, down, up)
        )

    return schedule


def teacher_forcing_arctan(
    num_steps: int, tf_max: float, tf_min: float
) -> np.ndarray:
    """Precomputed per-step TF ratios (host-side array, indexed per batch).

    Matches TeacherForcingScheduler._get_arctan including the 10% trim;
    callers clamp the index and fall back to tf_min past the end.
    """
    if num_steps < 2:  # degenerate runs (tiny tests): constant tf_max
        return np.full(max(num_steps, 1), tf_max, np.float64)
    diff = tf_max - tf_min
    inflection = int(num_steps * 0.1)
    x = np.linspace(-5, 5, num_steps)
    x = -np.arctan(x)
    x -= x[-1]
    x *= diff / x[0]
    x += tf_min
    return x[inflection:].astype(np.float64)


class TeacherForcingScheduler:
    """Stateful host-side wrapper mirroring the reference step() API."""

    def __init__(self, num_steps: int, tf_max: float = 1.0, tf_min: float = 0.4):
        self.values = teacher_forcing_arctan(num_steps, tf_max, tf_min)
        self.tf_min = tf_min
        self.i = 0

    def step(self) -> float:
        if self.i < len(self.values):
            v = float(self.values[self.i])
            self.i += 1
            return v
        return float(self.tf_min)

    def state_dict(self):
        return {"i": self.i}

    def load_state_dict(self, d):
        self.i = int(d["i"])
