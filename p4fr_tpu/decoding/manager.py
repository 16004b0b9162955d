"""Vectorized grammar-constrained decoding ("DecodingManager").

The reference implements per-step LaTeX-grammar masking with one Python
``MemoryNode`` object per sample, rebuilt every token step on the host
(reference: postprocessing/postprocessing.py:158-404) — a GPU->CPU sync per
generated token. Here the same rules compile to static ``[V]`` tables plus
four ``[B]`` state vectors carried through ``lax.scan``, so masking is a
handful of on-device vector ops and decode never leaves the TPU.

Rule semantics reproduced exactly (postprocessing.py:326-388):

- always ban ``<SOS>`` and the empty token;
- ban ``}`` whenever the left/right bracket counts are balanced;
- after ``<SOS>`` (step 0) additionally ban the ``cannot_initial`` set;
- after ``<EOS>`` no further rule applies;
- otherwise ban the previous token once its consecutive-run length has
  reached its per-token repeat limit.

Rule data lives in ``rules.json`` (hand-mined token statistics from the
reference corpus); the ``next_underbar``/``next_lbracket``/``cannot_next_*``
rule families are empty in the reference (disabled for hurting scores,
postprocessing.py:22-74) and are therefore not materialized here.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from p4fr_tpu.data.vocab import Vocab

_RULES_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "rules.json")
_NO_LIMIT = np.iinfo(np.int32).max


def load_rules() -> dict:
    with open(_RULES_PATH, "r") as f:
        return json.load(f)


@dataclasses.dataclass(frozen=True)
class RuleTables:
    """Static per-vocabulary rule tables (device constants)."""

    always_ban: np.ndarray  # [V] bool — <SOS> + empty token
    cannot_initial: np.ndarray  # [V] bool
    repeat_limit: np.ndarray  # [V] int32, _NO_LIMIT when unregulated
    sos_id: int
    eos_id: int
    lbrace_id: int
    rbrace_id: int

    @classmethod
    def build(cls, vocab: Vocab) -> "RuleTables":
        rules = load_rules()
        v = len(vocab)
        always_ban = np.zeros(v, bool)
        always_ban[vocab.sos_id] = True
        if "" in vocab.token_to_id:
            always_ban[vocab.token_to_id[""]] = True
        cannot_initial = np.zeros(v, bool)
        for tok in rules["cannot_initial"]:
            if tok in vocab.token_to_id:
                cannot_initial[vocab.token_to_id[tok]] = True
        repeat_limit = np.full(v, _NO_LIMIT, np.int32)
        for tok, limit in rules["repeat_limits"].items():
            if tok in vocab.token_to_id:
                repeat_limit[vocab.token_to_id[tok]] = limit
        return cls(
            always_ban=always_ban,
            cannot_initial=cannot_initial,
            repeat_limit=repeat_limit,
            sos_id=vocab.sos_id,
            eos_id=vocab.eos_id,
            lbrace_id=vocab.token_to_id["{"],
            rbrace_id=vocab.token_to_id["}"],
        )


class ManagerState(NamedTuple):
    """Per-sample scan state ([B] each)."""

    last_token: jnp.ndarray  # int32
    run_length: jnp.ndarray  # int32 — consecutive occurrences of last_token
    lbrackets: jnp.ndarray  # int32
    rbrackets: jnp.ndarray  # int32


def init_state(batch: int, tables: RuleTables) -> ManagerState:
    return ManagerState(
        last_token=jnp.full((batch,), tables.sos_id, jnp.int32),
        run_length=jnp.ones((batch,), jnp.int32),
        lbrackets=jnp.zeros((batch,), jnp.int32),
        rbrackets=jnp.zeros((batch,), jnp.int32),
    )


def step_mask(state: ManagerState, tables: RuleTables) -> jnp.ndarray:
    """[B, V] boolean ban-mask for the next step (True = banned)."""
    v = tables.always_ban.shape[0]
    always = jnp.asarray(tables.always_ban)[None, :]
    # bracket balance: ban '}' when counts are equal
    balanced = (state.lbrackets == state.rbrackets)[:, None]
    rbrace = jnp.zeros((v,), bool).at[tables.rbrace_id].set(True)[None, :]
    mask = always | (balanced & rbrace)

    is_sos = state.last_token == tables.sos_id
    is_eos = state.last_token == tables.eos_id
    mask = mask | (
        is_sos[:, None] & jnp.asarray(tables.cannot_initial)[None, :]
    )
    # repeat limit on the previous token (not after <SOS>/<EOS>)
    limit = jnp.asarray(tables.repeat_limit)[state.last_token]
    over = (~is_sos) & (~is_eos) & (state.run_length >= limit)
    last_onehot = jax.nn.one_hot(state.last_token, v, dtype=jnp.float32) > 0
    return mask | (over[:, None] & last_onehot)


def update_state(
    state: ManagerState, targets: jnp.ndarray, tables: RuleTables
) -> ManagerState:
    """Record the chosen tokens (postprocessing.py:304-324 semantics)."""
    same = targets == state.last_token
    run = jnp.where(same, state.run_length + 1, 1)
    lb = state.lbrackets + (targets == tables.lbrace_id).astype(jnp.int32)
    rb = state.rbrackets + (targets == tables.rbrace_id).astype(jnp.int32)
    return ManagerState(
        last_token=targets.astype(jnp.int32),
        run_length=run,
        lbrackets=lb,
        rbrackets=rb,
    )


def sift(
    state: ManagerState, logits: jnp.ndarray, tables: RuleTables
) -> Tuple[jnp.ndarray, jnp.ndarray, ManagerState]:
    """Softmax -> zero banned tokens -> argmax -> record.

    Matches reference ``DecodingManager.sift`` (postprocessing.py:192-231):
    returns (targets [B], masked softmax probs [B,V], new state).
    ``logits`` may be raw logits or already-averaged probabilities; the
    reference applies softmax unconditionally, and softmax is monotonic so
    the argmax is unchanged either way.
    """
    probs = jax.nn.softmax(logits, axis=-1)
    mask = step_mask(state, tables)
    probs = jnp.where(mask, 0.0, probs)
    targets = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    return targets, probs, update_state(state, targets, tables)
