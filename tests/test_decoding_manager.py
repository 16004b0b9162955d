"""Vectorized DecodingManager vs a per-sample Python oracle.

The oracle independently re-implements the reference MemoryNode rule
semantics (postprocessing/postprocessing.py:277-404) in plain Python so the
on-device vectorized masks can be checked step by step.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from p4fr_tpu.decoding import manager as dm  # noqa: E402


class OracleNode:
    """Per-sample rule tracker with reference semantics."""

    def __init__(self, vocab, rules):
        self.v = vocab
        self.cannot_initial = {
            vocab.token_to_id[t]
            for t in rules["cannot_initial"]
            if t in vocab.token_to_id
        }
        self.limits = {
            vocab.token_to_id[t]: n
            for t, n in rules["repeat_limits"].items()
            if t in vocab.token_to_id
        }
        self.last = vocab.sos_id
        self.run = 1
        self.lb = 0
        self.rb = 0

    def banned(self):
        out = {self.v.sos_id, self.v.token_to_id[""]}
        if self.lb == self.rb:
            out.add(self.v.token_to_id["}"])
        if self.last == self.v.eos_id:
            return out
        if self.last == self.v.sos_id:
            return out | self.cannot_initial
        limit = self.limits.get(self.last)
        if limit is not None and self.run >= limit:
            out.add(self.last)
        return out

    def record(self, t):
        self.run = self.run + 1 if t == self.last else 1
        if t == self.v.token_to_id["{"]:
            self.lb += 1
        elif t == self.v.token_to_id["}"]:
            self.rb += 1
        self.last = t


def test_masks_match_oracle_over_random_decode(vocab):
    rules = dm.load_rules()
    tables = dm.RuleTables.build(vocab)
    B, V, steps = 4, len(vocab), 60
    rng = np.random.default_rng(0)

    state = dm.init_state(B, tables)
    oracles = [OracleNode(vocab, rules) for _ in range(B)]

    for step in range(steps):
        mask = np.asarray(dm.step_mask(state, tables))
        for b, node in enumerate(oracles):
            expected = node.banned()
            got = set(np.nonzero(mask[b])[0].tolist())
            assert got == expected, (step, b, got ^ expected)
        # feed random logits through sift and mirror updates in the oracle
        logits = jnp.asarray(rng.normal(size=(B, V)).astype(np.float32) * 3)
        targets, probs, state = dm.sift(state, logits, tables)
        targets = np.asarray(targets)
        probs = np.asarray(probs)
        # banned tokens got zero probability; chosen token not banned
        assert (probs[mask] == 0).all()
        for b, node in enumerate(oracles):
            assert targets[b] not in node.banned()
            node.record(int(targets[b]))


def test_repeat_limit_forces_switch(vocab):
    """Drive 'x' (limit 4) repeatedly; the 5th consecutive must be banned."""
    tables = dm.RuleTables.build(vocab)
    x_id = vocab.token_to_id["x"]
    state = dm.init_state(1, tables)
    logits = np.full((1, len(vocab)), -10.0, np.float32)
    logits[0, x_id] = 10.0
    logits[0, vocab.token_to_id["y"]] = 5.0
    chosen = []
    for _ in range(6):
        t, _, state = dm.sift(state, jnp.asarray(logits), tables)
        chosen.append(int(t[0]))
    assert chosen[:4] == [x_id] * 4
    assert chosen[4] != x_id  # limit 4 reached -> banned
    assert chosen[5] == x_id  # run reset by the interloper


def test_bracket_balance_bans_rbrace(vocab):
    tables = dm.RuleTables.build(vocab)
    lb, rb = vocab.token_to_id["{"], vocab.token_to_id["}"]
    state = dm.init_state(1, tables)
    mask0 = np.asarray(dm.step_mask(state, tables))
    assert mask0[0, rb]  # balanced at start -> '}' banned
    state = dm.update_state(state, jnp.asarray([lb]), tables)
    mask1 = np.asarray(dm.step_mask(state, tables))
    assert not mask1[0, rb]  # one open bracket -> '}' allowed
    state = dm.update_state(state, jnp.asarray([rb]), tables)
    mask2 = np.asarray(dm.step_mask(state, tables))
    assert mask2[0, rb]  # balanced again


def test_cannot_initial_only_after_sos(vocab):
    tables = dm.RuleTables.build(vocab)
    bad = vocab.token_to_id["\\downarrow"]  # in cannot_initial
    state = dm.init_state(1, tables)
    assert np.asarray(dm.step_mask(state, tables))[0, bad]
    state = dm.update_state(state, jnp.asarray([vocab.token_to_id["a"]]), tables)
    assert not np.asarray(dm.step_mask(state, tables))[0, bad]


def test_eos_only_base_bans(vocab):
    tables = dm.RuleTables.build(vocab)
    state = dm.init_state(1, tables)
    state = dm.update_state(state, jnp.asarray([vocab.eos_id]), tables)
    mask = np.asarray(dm.step_mask(state, tables))
    expected = {vocab.sos_id, vocab.token_to_id[""], vocab.token_to_id["}"]}
    assert set(np.nonzero(mask[0])[0].tolist()) == expected
