"""Sharded (pjit) train & inference step builders.

Composes the jitted step functions from ``train.steps`` / ``decoding`` with
mesh shardings: batch over the ``data`` axis, parameters replicated or
tensor-sharded over ``model`` (see ``mesh.param_shardings``). XLA emits the
gradient psums / activation collectives; nothing here hand-schedules
communication.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax

from p4fr_tpu.parallel.mesh import (
    Mesh,
    NamedSharding,
    P,
    batch_sharding,
    param_shardings,
    replicated,
)
from p4fr_tpu.train.steps import TrainState, cross_entropy_ignore_pad


def make_sharded_train_step(
    model,
    optimizer: optax.GradientTransformation,
    pad_id: int,
    mesh: Mesh,
) -> Callable:
    """Data/tensor-parallel teacher-forced train step under the mesh.

    The batch shards over ``data``; params/opt state follow
    ``param_shardings`` (replicated unless the model axis is >1, in which
    case transformer projections are tensor-sharded). The mean loss and the
    gradient all-reduce are emitted by XLA from the sharding constraints.
    """
    batch_sh = batch_sharding(mesh)
    repl = replicated(mesh)

    def step(state: TrainState, images, text, rng):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            logits, updates = model.apply(
                variables,
                images,
                text[:, :-1],
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            loss = cross_entropy_ignore_pad(logits, text[:, 1:], pad_id)
            return loss, updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_stats, new_opt, state.step + 1),
            {"loss": loss, "grad_norm": optax.global_norm(grads)},
        )

    cache = {}

    def wrap(state: TrainState, images, text, rng):
        if "jitted" not in cache:
            param_sh = param_shardings(state.params, mesh)
            state_sh = TrainState(
                params=param_sh,
                batch_stats=jax.tree_util.tree_map(
                    lambda _: repl, state.batch_stats
                ),
                opt_state=jax.tree_util.tree_map(lambda _: repl, state.opt_state),
                step=repl,
            )
            cache["jitted"] = jax.jit(
                step,
                in_shardings=(state_sh, batch_sh, batch_sh, repl),
                out_shardings=(state_sh, {"loss": repl, "grad_norm": repl}),
            )
        return cache["jitted"](state, images, text, rng)

    return wrap


def make_sharded_infer_fn(
    decode_fn: Callable, mesh: Mesh, compiler_options=None
) -> Callable:
    """Data-parallel wrapper for a greedy/beam decode fn built by
    ``decoding.*.make_*_fn``: images shard over ``data``, params replicate.
    Used for single-model and ensemble inference throughput scaling.

    Implemented with ``shard_map`` (manual SPMD) rather than
    ``jit(in_shardings=...)``: decode is embarrassingly parallel over the
    batch, and manual SPMD lets each device run the FULL per-shard
    program — including Pallas kernels, which the GSPMD partitioner
    cannot split through a ``pallas_call`` — with zero collectives.

    ``compiler_options`` rides the top-level jit (e.g. the raised
    scoped-VMEM limit from ``utils.xla_opts.decode_compiler_options``
    when ``decode_fn`` was built with the matching ``vmem_limit_kib``).
    """
    try:
        from jax import shard_map  # jax >= 0.6 (check_vma kwarg)
        rep_kw = {"check_vma": False}
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
        rep_kw = {"check_rep": False}

    # params replicate (P() leaves), the image batch shards over `data`
    data_spec = P("data")
    repl_spec = P()

    sharded = jax.jit(
        shard_map(
            decode_fn,
            mesh=mesh,
            in_specs=(repl_spec, data_spec),
            out_specs=data_spec,
            **rep_kw,
        ),
        compiler_options=compiler_options,
    )

    def run(variables, images):
        return sharded(variables, images)

    return run


def make_tp_infer_fn(decode_fn: Callable, mesh: Mesh, variables) -> Callable:
    """AR decode with MODEL-AXIS-SHARDED weights (true tensor-parallel
    inference): the batch shards over ``data``, transformer projection
    kernels stay sharded over ``model`` per ``param_shardings``, and
    GSPMD inserts the per-step collectives (all-reduce after row-parallel
    projections) inside the decode scan.

    Use for the jnp/generic decode paths only — the GSPMD partitioner
    cannot split a ``pallas_call`` over the model axis, so Pallas-kernel
    decodes take ``make_sharded_infer_fn`` (pure DP, replicated weights)
    instead. ``variables`` supplies the tree structure for shardings.
    """
    batch_sh = batch_sharding(mesh)
    repl = replicated(mesh)
    var_sh = {"params": param_shardings(variables["params"], mesh)}
    for coll in variables:
        if coll != "params":
            var_sh[coll] = jax.tree_util.tree_map(
                lambda _: repl, variables[coll]
            )
    return jax.jit(
        decode_fn, in_shardings=(var_sh, batch_sh), out_shardings=batch_sh
    )
