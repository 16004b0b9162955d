"""Greedy AR decode where each step is ONE fused Pallas launch.

Wraps ops/pallas/fused_decode.py: embedding + all decoder layers +
generator + DecodingManager sift fused into a single kernel per step,
caches time-major and HBM-resident with in-kernel slot write-back. The
scan body is exactly one launch — this removes the ~16 XLA ops/step the
modular fast path dispatches (measured: dispatch, not FLOPs or bandwidth,
dominates the decode loop on TPU).

Output contract matches ``make_fast_greedy_fn`` (decoding/fast_step.py):
fn(images) -> tokens [B, max_steps]. Numerics are the same class as the
bf16 fast path (bf16 MXU contractions, f32 softmax stats/LayerNorm);
argmax flips only on bf16 near-ties, same as the v2 layer kernel.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from p4fr_tpu.decoding.fast_step import (
    build_fast_decoder,
    precompute_cross_kv,
)
from p4fr_tpu.ops.pallas.fused_decode import (
    build_fused_params,
    fused_greedy_step,
)


def make_fused_greedy_fn(
    model,
    variables,
    *,
    max_steps: int,
    tables=None,
    early_stop_eos: Optional[int] = None,
    stop_override: Optional[jnp.ndarray] = None,
    batch_tile: int = 16,
    chunk: int = 128,
    interpret: bool = False,
):
    """Build fn(images) -> tokens [B, max_steps] over the fused kernel.

    ``early_stop_eos`` switches the fixed-length scan to a while_loop that
    exits once every sequence has emitted <EOS> (output-equivalent up to
    the <EOS> padding, like make_fast_greedy_fn's). ``stop_override`` is
    the same benchmarking hook as fast_step's (see its docstring).
    """
    if stop_override is not None and early_stop_eos is None:
        raise ValueError(
            "stop_override requires early_stop_eos (it gates the "
            "early-exit while_loop; without it the fixed-length scan "
            "would silently ignore the injected stop steps)"
        )
    if not interpret and jax.default_backend() != "tpu":
        # compiled Pallas requires a TPU; fall back to the (slow but
        # correct) interpreter so the CLI option degrades gracefully
        interpret = True
    vocab_size = int(model.num_classes)
    sos_id = int(model.sos_id)
    eos_id = int(tables.eos_id) if tables is not None else 0
    nl, _, hidden = model.cache_spec()
    cache_len = ((max_steps + chunk - 1) // chunk) * chunk

    kw = dict(
        head_num=model.cache_spec()[1],
        cache_outputs=bool(getattr(model, "reference_parity", True)),
        use_manager=tables is not None,
        sos_id=sos_id,
        eos_id=eos_id,
        lbrace_id=int(tables.lbrace_id) if tables is not None else 0,
        rbrace_id=int(tables.rbrace_id) if tables is not None else 0,
        vocab_size=vocab_size,
        batch_tile=batch_tile,
        chunk=chunk,
        interpret=interpret,
    )

    def fn(*args):
        if len(args) == 2:
            vars_, images = args
        else:
            (images,) = args
            vars_ = variables
        fast = build_fast_decoder(model, vars_)
        params = build_fused_params(
            fast, tables, max_steps=max_steps, vocab_size=vocab_size,
            sos_id=sos_id, eos_id=eos_id,
        )
        param_arrays = tuple(params[:20])
        src = model.apply(vars_, images, method="encode")
        b0 = src.shape[0]
        # Mosaic's (CK, TB, H) -> (CK*TB, H) reshape needs TB to be a
        # multiple of the sublane tile (16 for bf16); pad the batch after
        # the encoder so the kernel always sees full tiles.
        batch = ((b0 + batch_tile - 1) // batch_tile) * batch_tile
        if batch != b0:
            src = jnp.pad(src, ((0, batch - b0), (0, 0), (0, 0)))
        cross = jnp.stack(
            precompute_cross_kv(fast, src.astype(fast.w_gen.dtype))
        )  # [NL, B, S, 2H]
        caches = jnp.zeros(
            (nl, cache_len, batch, 2 * hidden), fast.w_gen.dtype
        )
        token0 = jnp.full((batch,), sos_id, jnp.int32)
        mstate0 = jnp.zeros((batch, 4), jnp.int32)
        mstate0 = mstate0.at[:, 0].set(sos_id).at[:, 1].set(1)

        if early_stop_eos is not None:
            out0 = jnp.full((batch, max_steps), early_stop_eos, jnp.int32)
            done0 = jnp.arange(batch) >= b0  # padding rows never gate exit

            def cond(carry):
                t = carry[0]
                done = carry[4]
                return (t < max_steps) & ~jnp.all(done)

            def wbody(carry):
                t, token, caches, mstate, done, buf = carry
                token, caches, mstate, _ = fused_greedy_step(
                    token, t, caches, cross, mstate, param_arrays, **kw
                )
                buf = buf.at[:, t].set(
                    jnp.where(done, early_stop_eos, token)
                )
                done = done | (token == early_stop_eos)
                if stop_override is not None:
                    done = done | (t >= stop_override)
                return t + 1, token, caches, mstate, done, buf

            carry = (jnp.asarray(0), token0, caches, mstate0, done0, out0)
            *_, buf = jax.lax.while_loop(cond, wbody, carry)
            return buf[:b0]

        def body(carry, t):
            token, caches, mstate = carry
            token, caches, mstate, _ = fused_greedy_step(
                token, t, caches, cross, mstate, param_arrays, **kw
            )
            return (token, caches, mstate), token

        _, tokens = jax.lax.scan(
            body, (token0, caches, mstate0), jnp.arange(max_steps)
        )
        return tokens.T[:b0]

    return fn
