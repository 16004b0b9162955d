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

import functools
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

    Returns:
      fn(variables, images_or_src) -> tokens [B, T] (int32)
      or (tokens, outputs) when ``return_outputs``.
    """
    sos_id = model.sos_id

    def fn(variables, inputs):
        if from_memory:
            src = inputs
        else:
            src = model.apply(variables, inputs, method="encode")
        batch = src.shape[0]
        src_kv = model.apply(variables, src, method="precompute_src")
        cache = model.init_decode_cache(batch, max_steps)
        token0 = jnp.full((batch,), sos_id, jnp.int32)

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
