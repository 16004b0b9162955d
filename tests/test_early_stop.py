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
