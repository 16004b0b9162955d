"""Fused-weight fast AR decode for the ASTER (attention-LSTM) decoder.

The generic ``ASTER.decode_step`` (models/aster.py:167) issues ~15 small
ops per token: embedding gather, additive-attention h2h/score denses, a
context reduction, and per-LSTM-cell ``x@W_ih.T + h@W_hh.T`` pairs. On
TPU the AR loop is op-count bound, so — exactly like the transformer's
``fast_step.py`` — this module extracts the weights ONCE into a fused
layout:

- each cell's (weight_ih, weight_hh) become ONE ``[in+H, 4H]`` matmul on
  the concatenated ``[x | h]`` input, with ``bias_ih + bias_hh`` folded;
- the attention i2h projection of the encoder memory is precomputed per
  sequence (same as the generic path);
- everything runs as plain jnp inside the caller's scan.

Numerics match the generic step up to f32 reassociation (the fused
matmul sums the x/h partial products in a different order); tokens are
identical in practice — tested in tests/test_fast_aster.py.

Reference semantics: /root/reference/networks/EfficientASTER.py:78-155
(AttentionCell), :222-320 (decoder loop).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class FastAsterCell(NamedTuple):
    w_cat: jnp.ndarray  # [in+H, 4H] = [W_ih.T ; W_hh.T]
    b: jnp.ndarray  # [4H] = b_ih + b_hh


class FastAster(NamedTuple):
    embed: jnp.ndarray  # [V+1, E]
    i2h_w: jnp.ndarray  # [C, H] (no bias)
    h2h_w: jnp.ndarray  # [H, H]
    h2h_b: jnp.ndarray  # [H]
    score_w: jnp.ndarray  # [H, 1]
    cells: Tuple[FastAsterCell, ...]
    w_gen: jnp.ndarray  # [H, V]
    b_gen: jnp.ndarray  # [V]
    hidden_dim: int


def build_fast_aster(model, variables) -> FastAster:
    """Extract + fuse the ASTER decoder weights from flax variables."""
    p = variables["params"]
    ac = p["attention_cell"]
    dtype = model.dtype

    def j(x):
        return jnp.asarray(x, dtype)

    cells: List[FastAsterCell] = []
    for i in range(model.layer_num):
        c = ac[f"cell{i}"]
        cells.append(
            FastAsterCell(
                w_cat=jnp.concatenate(
                    [j(c["weight_ih"]).T, j(c["weight_hh"]).T], axis=0
                ),
                b=j(c["bias_ih"]) + j(c["bias_hh"]),
            )
        )
    return FastAster(
        embed=j(p["embedding"]["embedding"]),
        i2h_w=j(ac["i2h"]["kernel"]),
        h2h_w=j(ac["h2h"]["kernel"]),
        h2h_b=j(ac["h2h"]["bias"]),
        score_w=j(ac["score"]["kernel"]),
        cells=tuple(cells),
        w_gen=j(p["generator"]["kernel"]),
        b_gen=j(p["generator"]["bias"]),
        hidden_dim=model.hidden_dim,
    )


def precompute_aster_src(fast: FastAster, src: jnp.ndarray):
    """(src, i2h(src)) — the per-sequence attention precomputation."""
    return src, src @ fast.i2h_w


def init_fast_aster_cache(fast: FastAster, batch: int):
    z = jnp.zeros((batch, fast.hidden_dim), fast.w_gen.dtype)
    return tuple((z, z) for _ in fast.cells)


def fast_aster_step(
    fast: FastAster,
    token: jnp.ndarray,  # [B]
    src: jnp.ndarray,  # [B, L, C]
    src_proj: jnp.ndarray,  # [B, L, H]
    hidden: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...],
):
    """One AR step -> (logits [B, V] f32, new hidden)."""
    emb = fast.embed[token]
    top_h = hidden[-1][0]
    prev = top_h @ fast.h2h_w + fast.h2h_b  # [B, H]
    logit = jnp.tanh(src_proj + prev[:, None, :]) @ fast.score_w  # [B,L,1]
    alpha = jax.nn.softmax(logit, axis=1)
    ctx = jnp.sum(alpha * src, axis=1)  # [B, C]
    x = jnp.concatenate([ctx, emb], axis=-1)

    new_hidden = []
    for cell, (h, c) in zip(fast.cells, hidden):
        gates = jnp.concatenate([x, h], axis=-1) @ cell.w_cat + cell.b
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        new_c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
        new_hidden.append((new_h, new_c))
        x = new_h
    logits = (x @ fast.w_gen + fast.b_gen).astype(jnp.float32)
    return logits, tuple(new_hidden)


def make_fast_aster_greedy_fn(
    model,
    variables,
    *,
    max_steps: int,
    tables=None,
    early_stop_eos: Optional[int] = None,
    stop_override: Optional[jnp.ndarray] = None,
):
    """Greedy decode over the fused ASTER step; contract matches
    ``make_fast_greedy_fn``: fn(images) -> tokens [B, max_steps]."""
    from p4fr_tpu.decoding import manager as dm

    sos_id = model.sos_id
    if stop_override is not None and early_stop_eos is None:
        raise ValueError(
            "stop_override requires early_stop_eos (it gates the "
            "early-exit while_loop; without it the fixed-length scan "
            "would silently ignore the injected stop steps)"
        )

    def fn(*args):
        if len(args) == 2:
            vars_, images = args
        else:
            (images,) = args
            vars_ = variables
        fast = build_fast_aster(model, vars_)
        src = model.apply(vars_, images, method="encode")
        batch = src.shape[0]
        src_, src_proj = precompute_aster_src(
            fast, src.astype(fast.w_gen.dtype)
        )
        hidden = init_fast_aster_cache(fast, batch)
        token0 = jnp.full((batch,), sos_id, jnp.int32)

        def select(mstate, logits):
            if tables is not None:
                target, _, mstate = dm.sift(mstate, logits, tables)
            else:
                target = jnp.argmax(logits, -1).astype(jnp.int32)
            return target, mstate

        mstate0 = dm.init_state(batch, tables) if tables is not None else None

        if early_stop_eos is not None:
            buf0 = jnp.full((batch, max_steps), early_stop_eos, jnp.int32)
            done0 = jnp.zeros((batch,), bool)

            def cond(carry):
                return (carry[0] < max_steps) & ~jnp.all(carry[4])

            def wbody(carry):
                t, token, hidden, mstate, done, buf = carry
                logits, hidden = fast_aster_step(
                    fast, token, src_, src_proj, hidden
                )
                target, mstate = select(mstate, logits)
                buf = buf.at[:, t].set(
                    jnp.where(done, early_stop_eos, target)
                )
                done = done | (target == early_stop_eos)
                if stop_override is not None:
                    done = done | (t >= stop_override)
                return t + 1, target, hidden, mstate, done, buf

            carry = (jnp.asarray(0), token0, hidden, mstate0, done0, buf0)
            *_, buf = jax.lax.while_loop(cond, wbody, carry)
            return buf

        def body(carry, t):
            token, hidden, mstate = carry
            logits, hidden = fast_aster_step(
                fast, token, src_, src_proj, hidden
            )
            target, mstate = select(mstate, logits)
            return (target, hidden, mstate), target

        _, tokens = jax.lax.scan(
            body, (token0, hidden, mstate0), jnp.arange(max_steps)
        )
        return tokens.T

    return fn
