"""Jitted training / validation step functions.

Reference semantics (train_modules/train_single_opt.py:40-212):

- loss = cross-entropy over ``logits[:, t]`` vs ``expected[:, t+1]`` with
  the pad id ignored (mean over non-pad targets);
- per batch the trainer flips a coin against the teacher-forcing ratio and
  runs EITHER the full-sequence teacher-forced path OR the
  autoregressively-sampled path with gradients flowing through the decode
  chain (EfficientSATRN.py:489-525). Here both are separate jit variants
  selected per batch on the host (two compilations, zero traced branches);
- gradient clipping by global norm, then the optimizer step; the LR comes
  from an optax schedule so it lives inside the optimizer chain.

TPU notes: the AR-sampled branch is a ``lax.scan`` over decode steps with
``jax.checkpoint`` on the step body (BPTT through ~L steps without storing
every intermediate); teacher-forced is one big MXU-friendly pass.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar


def cross_entropy_ignore_pad(
    logits: jnp.ndarray, targets: jnp.ndarray, pad_id: int
) -> jnp.ndarray:
    """Mean CE over non-pad targets. logits [B,L,V], targets [B,L]."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    valid = (targets != pad_id).astype(jnp.float32)
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def teacher_forced_logits(model, variables, images, text_in, rng, train: bool):
    """Full-sequence path; returns (logits, new_batch_stats)."""
    if train:
        (logits, updates) = model.apply(
            variables,
            images,
            text_in,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        return logits, updates["batch_stats"]
    logits = model.apply(variables, images, text_in, train=False)
    return logits, variables.get("batch_stats")


def ar_sampled_logits(
    model, variables, images, num_steps: int, rng, train: bool
):
    """Autoregressive path with argmax feedback (the reference's sampled
    train branch and its validation/inference path).

    Gradients flow through the cached activations chain exactly as in the
    reference (the argmax token index itself is non-differentiable there
    too). Returns (logits [B, num_steps, V], new_batch_stats).
    """
    if train:
        src, updates = model.apply(
            variables,
            images,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
            method="encode",
        )
        new_stats = updates["batch_stats"]
    else:
        src = model.apply(variables, images, method="encode")
        new_stats = variables.get("batch_stats")

    src_kv = model.apply(variables, src, method="precompute_src")
    cache = model.init_decode_cache(src.shape[0], num_steps)
    token0 = jnp.full((src.shape[0],), model.sos_id, jnp.int32)

    def body(carry, t):
        token, cache = carry
        if train:
            step_rng = jax.random.fold_in(rng, t)
            logits, cache = model.apply(
                variables,
                token,
                t,
                src_kv,
                cache,
                False,  # deterministic=False -> dropout active
                rngs={"dropout": step_rng},
                method="decode_step",
            )
        else:
            logits, cache = model.apply(
                variables, token, t, src_kv, cache, method="decode_step"
            )
        target = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (target, cache), logits

    body = jax.checkpoint(body, prevent_cse=False)
    _, logits = jax.lax.scan(body, (token0, cache), jnp.arange(num_steps))
    return jnp.transpose(logits, (1, 0, 2)), new_stats


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    pad_id: int,
) -> Callable:
    """Returns train_step(state, images, text, rng, teacher_forced: bool).

    ``teacher_forced`` is a host bool -> two jit specializations.
    Output: (new_state, metrics dict with loss/grad_norm, sequences).

    The input ``state`` is DONATED (its buffers are reused for the new
    state — params/opt-state never copy); don't read it after the call.
    """

    @functools.partial(jax.jit, static_argnames=("teacher_forced",),
                       donate_argnums=(0,))
    def train_step(
        state: TrainState,
        images: jnp.ndarray,
        text: jnp.ndarray,  # [B, L] with <SOS> ... <EOS> <PAD>*
        rng: jnp.ndarray,
        teacher_forced: bool = True,
    ):
        num_steps = text.shape[1] - 1

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            if teacher_forced:
                logits, new_stats = teacher_forced_logits(
                    model, variables, images, text[:, :-1], rng, train=True
                )
            else:
                logits, new_stats = ar_sampled_logits(
                    model, variables, images, num_steps, rng, train=True
                )
            loss = cross_entropy_ignore_pad(logits, text[:, 1:], pad_id)
            return loss, (logits, new_stats)

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        grad_norm = optax.global_norm(grads)
        sequences = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        metrics = {"loss": loss, "grad_norm": grad_norm}
        return new_state, metrics, sequences

    return train_step


def make_eval_step(model, pad_id: int) -> Callable:
    """Validation step: AR greedy (TF=0, reference _valid_one_epoch) +
    teacher-forced loss on the same batch."""

    @jax.jit
    def eval_step(params, batch_stats, images, text):
        variables = {"params": params, "batch_stats": batch_stats}
        num_steps = text.shape[1] - 1
        logits, _ = ar_sampled_logits(
            model, variables, images, num_steps, None, train=False
        )
        loss = cross_entropy_ignore_pad(logits, text[:, 1:], pad_id)
        sequences = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return loss, sequences

    return eval_step


def build_optimizer(
    name: str,
    schedule,
    *,
    weight_decay: float = 0.0,
    max_grad_norm: Optional[float] = None,
    b1_schedule=None,
) -> optax.GradientTransformation:
    """Adam / AdamW / Adadelta with clip-by-global-norm, reference defaults
    (utils/utils.py:83-95: Adam has NO weight decay; AdamW/Adadelta do).

    ``b1_schedule``: optional ``step -> beta1`` schedule for the Adam
    family, injected via ``optax.inject_hyperparams`` — the TPU analog of
    CircularLRBeta rewriting ``group["betas"]`` per step
    (schedulers/circular_lr.py:62-66). Adadelta has no betas; the
    reference's group["betas"] write is a dead key there, so it is
    ignored for parity.
    """
    name = name.lower()
    if name == "adam":
        if b1_schedule is not None:
            core = optax.inject_hyperparams(optax.adam)(
                learning_rate=schedule, b1=b1_schedule
            )
        else:
            core = optax.adam(schedule)
    elif name == "adamw":
        if b1_schedule is not None:
            core = optax.inject_hyperparams(optax.adamw)(
                learning_rate=schedule, b1=b1_schedule,
                weight_decay=weight_decay,
            )
        else:
            core = optax.adamw(schedule, weight_decay=weight_decay)
    elif name == "adadelta":
        core = optax.adadelta(schedule, weight_decay=weight_decay)
    else:
        raise NotImplementedError(f"optimizer {name}")
    if max_grad_norm is not None:
        return optax.chain(optax.clip_by_global_norm(max_grad_norm), core)
    return core
