"""Greedy autoregressive decoding as a single fused ``lax.scan``.

The reference decodes with a Python loop over token steps, growing the
attention cache by concatenation and syncing to the host every step when
grammar masking is on (reference: networks/EfficientSATRN.py:507-557,
postprocessing/postprocessing.py:192-231). Here the whole decode — encoder
memory projection, per-step attention over a preallocated KV cache, and the
vectorized rule masking — compiles into one XLA program that never leaves
the device.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from p4fr_tpu.decoding import manager as dm


def make_greedy_fn(
    model,
    *,
    max_steps: int,
    tables: Optional[dm.RuleTables] = None,
    from_memory: bool = False,
    return_outputs: bool = True,
    early_stop_eos: Optional[int] = None,
) -> Callable:
    """Build a jittable greedy-decode function.

    Args:
      model: a model following the unified contract (``encode``,
        ``precompute_src``, ``decode_step``, ``cache_spec``).
      max_steps: number of generated tokens (reference num_steps =
        batch_max_length - 1).
      tables: optional RuleTables to enable grammar-constrained decoding.
      from_memory: if True the returned fn takes encoder memory (``src``)
        instead of images.
      return_outputs: also return the per-step outputs ([B, T, V] logits,
        or masked softmax probs when the manager is on — matching what the
        reference records).
      early_stop_eos: when set to the <EOS> id, decode as a
        ``lax.while_loop`` that exits once every sequence has emitted
        <EOS>. Output-equivalent to the fixed-length scan (detokenization
        stops at <EOS> anyway; the reference always burns all steps —
        EfficientSATRN.py:518) but ~(mean_len/max_len) of the work on real
        data. Requires ``return_outputs=False``.

    Returns:
      fn(variables, images_or_src) -> tokens [B, T] (int32)
      or (tokens, outputs) when ``return_outputs``.
    """
    sos_id = model.sos_id
    if early_stop_eos is not None and return_outputs:
        raise ValueError("early_stop_eos requires return_outputs=False")

    def fn(variables, inputs):
        if from_memory:
            src = inputs
        else:
            src = model.apply(variables, inputs, method="encode")
        batch = src.shape[0]
        src_kv = model.apply(variables, src, method="precompute_src")
        cache = model.init_decode_cache(batch, max_steps)
        token0 = jnp.full((batch,), sos_id, jnp.int32)

        if early_stop_eos is not None:
            out_buf = jnp.full((batch, max_steps), early_stop_eos, jnp.int32)
            mstate0 = dm.init_state(batch, tables) if tables is not None else None
            done0 = jnp.zeros((batch,), bool)

            def cond(carry):
                t, _, _, _, done, _ = carry
                return (t < max_steps) & ~jnp.all(done)

            def body(carry):
                t, token, cache, mstate, done, buf = carry
                logits, cache = model.apply(
                    variables, token, t, src_kv, cache, method="decode_step"
                )
                if tables is not None:
                    target, _, mstate = dm.sift(mstate, logits, tables)
                else:
                    target = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                buf = buf.at[:, t].set(
                    jnp.where(done, early_stop_eos, target)
                )
                done = done | (target == early_stop_eos)
                return t + 1, target, cache, mstate, done, buf

            carry = (jnp.asarray(0), token0, cache, mstate0, done0, out_buf)
            *_, out_buf = jax.lax.while_loop(cond, body, carry)
            return out_buf

        if tables is not None:
            mstate0 = dm.init_state(batch, tables)

            def body(carry, t):
                token, cache, mstate = carry
                logits, cache = model.apply(
                    variables, token, t, src_kv, cache, method="decode_step"
                )
                target, probs, mstate = dm.sift(mstate, logits, tables)
                return (target, cache, mstate), (target, probs)

            carry0 = (token0, cache, mstate0)
        else:

            def body(carry, t):
                token, cache = carry
                logits, cache = model.apply(
                    variables, token, t, src_kv, cache, method="decode_step"
                )
                target = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (target, cache), (target, logits)

            carry0 = (token0, cache)

        _, (tokens, outputs) = jax.lax.scan(
            body, carry0, jnp.arange(max_steps)
        )
        tokens = tokens.T  # [B, T]
        if return_outputs:
            return tokens, jnp.transpose(outputs, (1, 0, 2))
        return tokens

    return fn


def greedy_decode(
    model,
    variables,
    images,
    *,
    max_steps: int,
    tables: Optional[dm.RuleTables] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-shot convenience wrapper (compiles on first call per shape)."""
    fn = make_greedy_fn(model, max_steps=max_steps, tables=tables)
    return fn(variables, images)
