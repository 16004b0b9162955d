"""Decoding package: greedy / beam / grammar-constrained decoding.

``decode`` mirrors the reference dispatch function
(reference: postprocessing/decoding.py:6-53): one entry point that routes
``method='greedy'`` to the fused-scan greedy decoder and ``method='beam'``
to the batched beam search.
"""

from __future__ import annotations

from typing import Optional

import jax

from p4fr_tpu.decoding import manager
from p4fr_tpu.decoding.beam import make_beam_fn
from p4fr_tpu.decoding.greedy import greedy_decode, make_greedy_fn


def decode(
    model,
    variables,
    images,
    *,
    method: str = "greedy",
    max_steps: int = 231,
    beam_width: int = 3,
    eos_id: int = 1,
    tables: Optional["manager.RuleTables"] = None,
):
    """One-shot decode dispatch (compiles per shape; build the fn yourself
    via make_greedy_fn/make_beam_fn for hot loops)."""
    if method == "greedy":
        fn = make_greedy_fn(
            model, max_steps=max_steps, tables=tables, return_outputs=False
        )
    elif method == "beam":
        fn = make_beam_fn(
            model, max_steps=max_steps, beam_width=beam_width, eos_id=eos_id
        )
    else:
        raise ValueError(f"unknown decode method: {method}")
    return jax.jit(fn)(variables, images)


__all__ = [
    "decode",
    "greedy_decode",
    "make_greedy_fn",
    "make_beam_fn",
    "manager",
]
