"""Early-stop greedy decode must be output-equivalent up to <EOS>."""

import jax
import jax.numpy as jnp
import numpy as np

from p4fr_tpu.decoding import manager as dm
from p4fr_tpu.decoding.greedy import make_greedy_fn

from helpers import synth_images, synth_labels, tiny_satrn

B, T = 3, 12


def _truncate(row, eos):
    out = []
    for t in row:
        if t == eos:
            break
        out.append(int(t))
    return out


def test_early_stop_matches_fixed_length(vocab):
    model = tiny_satrn()
    images = jnp.asarray(synth_images(B))
    text = jnp.asarray(synth_labels(B, 8))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    for tables in (None, dm.RuleTables.build(vocab)):
        fixed = jax.jit(
            make_greedy_fn(model, max_steps=T, tables=tables,
                           return_outputs=False)
        )
        early = jax.jit(
            make_greedy_fn(model, max_steps=T, tables=tables,
                           return_outputs=False, early_stop_eos=vocab.eos_id)
        )
        a = np.asarray(fixed(variables, images))
        b = np.asarray(early(variables, images))
        for ra, rb in zip(a, b):
            assert _truncate(ra, vocab.eos_id) == _truncate(rb, vocab.eos_id)


def test_stop_override_bench_hook(vocab):
    """stop_override (bench.py's synthetic-length hook) must truncate each
    sequence at its injected stop step and match the fixed-length decode
    before it; stop_override=None must be exactly the fixed decode."""
    from p4fr_tpu.decoding.fast_step import make_fast_greedy_fn

    model = tiny_satrn()
    images = jnp.asarray(synth_images(B))
    text = jnp.asarray(synth_labels(B, 8))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    fixed = jax.jit(make_fast_greedy_fn(model, variables, max_steps=T))
    plain_early = jax.jit(make_fast_greedy_fn(
        model, variables, max_steps=T, early_stop_eos=vocab.eos_id))
    stops = jnp.asarray([2, 7, T], jnp.int32)
    forced = jax.jit(make_fast_greedy_fn(
        model, variables, max_steps=T, early_stop_eos=vocab.eos_id,
        stop_override=stops))

    a = np.asarray(fixed(images))
    b = np.asarray(plain_early(images))
    c = np.asarray(forced(images))
    for ra, rb in zip(a, b):
        assert _truncate(ra, vocab.eos_id) == _truncate(rb, vocab.eos_id)
    for i, (ra, rc) in enumerate(zip(a, c)):
        stop = int(stops[i])
        ta = _truncate(ra, vocab.eos_id)[: stop + 1]
        tc = _truncate(rc, vocab.eos_id)
        assert tc == ta, (i, tc, ta)
        # everything past the stop step is <EOS> padding
        assert (rc[stop + 1:] == vocab.eos_id).all()
