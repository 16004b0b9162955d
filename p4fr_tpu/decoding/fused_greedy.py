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
    batch_tile: int = 16,
    chunk: int = 128,
    interpret: bool = False,
):
    """Build fn(images) -> tokens [B, max_steps] over the fused kernel."""
    fast = build_fast_decoder(model, variables)
    vocab_size = int(fast.w_gen.shape[1])
    sos_id = int(model.sos_id)
    eos_id = int(tables.eos_id) if tables is not None else 0
    params = build_fused_params(
        fast, tables, max_steps=max_steps, vocab_size=vocab_size,
        sos_id=sos_id, eos_id=eos_id,
    )
    param_arrays = tuple(params[:20])
    cache_len = ((max_steps + chunk - 1) // chunk) * chunk
    nl = len(fast.layers)
    hidden = int(fast.w_gen.shape[0])

    kw = dict(
        head_num=params.head_num,
        cache_outputs=params.cache_outputs,
        use_manager=tables is not None,
        sos_id=params.sos_id,
        eos_id=params.eos_id,
        lbrace_id=params.lbrace_id,
        rbrace_id=params.rbrace_id,
        vocab_size=vocab_size,
        batch_tile=batch_tile,
        chunk=chunk,
        interpret=interpret,
    )

    def fn(images):
        src = model.apply(variables, images, method="encode")
        batch = src.shape[0]
        cross = jnp.stack(
            precompute_cross_kv(fast, src.astype(fast.w_gen.dtype))
        )  # [NL, B, S, 2H]
        caches = jnp.zeros(
            (nl, cache_len, batch, 2 * hidden), fast.w_gen.dtype
        )
        token0 = jnp.full((batch,), sos_id, jnp.int32)
        mstate0 = jnp.zeros((batch, 4), jnp.int32)
        mstate0 = mstate0.at[:, 0].set(sos_id).at[:, 1].set(1)

        def body(carry, t):
            token, caches, mstate = carry
            token, caches, mstate, _ = fused_greedy_step(
                token, t, caches, cross, mstate, param_arrays, **kw
            )
            return (token, caches, mstate), token

        _, tokens = jax.lax.scan(
            body, (token0, caches, mstate0), jnp.arange(max_steps)
        )
        return tokens.T

    return fn
