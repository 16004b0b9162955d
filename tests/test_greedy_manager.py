"""Greedy decode with grammar masking: fused scan, on-device end to end."""

import jax
import jax.numpy as jnp
import numpy as np

from p4fr_tpu.decoding import manager as dm
from p4fr_tpu.decoding.greedy import make_greedy_fn

from helpers import synth_images, synth_labels, tiny_satrn

B, L = 2, 10


def test_greedy_with_manager_respects_rules(vocab):
    model = tiny_satrn()
    images = jnp.asarray(synth_images(B))
    text = jnp.asarray(synth_labels(B, L))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images,
        text,
        train=False,
    )
    tables = dm.RuleTables.build(vocab)
    fn = jax.jit(make_greedy_fn(model, max_steps=L, tables=tables))
    tokens, probs = fn(variables, images)
    tokens = np.asarray(tokens)
    probs = np.asarray(probs)
    assert tokens.shape == (B, L)
    # never generates <SOS> or the empty token
    assert (tokens != vocab.sos_id).all()
    assert (tokens != vocab.token_to_id[""]).all()
    # first generated token is never in cannot_initial
    rules = dm.load_rules()
    banned_first = {
        vocab.token_to_id[t] for t in rules["cannot_initial"] if t in vocab.token_to_id
    }
    assert not set(tokens[:, 0].tolist()) & banned_first
    # probs rows are masked softmaxes: sum in (0, 1]
    sums = probs.sum(-1)
    assert (sums > 0).all() and (sums <= 1.0 + 1e-5).all()


def test_greedy_without_manager_vs_with_differ_only_by_masking(vocab):
    model = tiny_satrn()
    images = jnp.asarray(synth_images(B))
    text = jnp.asarray(synth_labels(B, L))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images,
        text,
        train=False,
    )
    tables = dm.RuleTables.build(vocab)
    plain = jax.jit(make_greedy_fn(model, max_steps=L))
    managed = jax.jit(make_greedy_fn(model, max_steps=L, tables=tables))
    t_plain, logits = plain(variables, images)
    t_managed, _ = managed(variables, images)
    # step-0 logits argmax: if it's not banned, managed must agree
    first = np.asarray(logits[:, 0]).argmax(-1)
    mask0 = np.asarray(dm.step_mask(dm.init_state(B, tables), tables))
    for b in range(B):
        if not mask0[b, first[b]]:
            assert np.asarray(t_managed)[b, 0] == first[b]
