"""Batched beam search: width-1 equals greedy; wider beams behave."""

import jax
import jax.numpy as jnp
import numpy as np

from p4fr_tpu.decoding.beam import make_beam_fn
from p4fr_tpu.decoding.greedy import make_greedy_fn

from helpers import synth_images, synth_labels, tiny_satrn

B, T = 2, 7


def _setup():
    model = tiny_satrn()
    images = jnp.asarray(synth_images(B))
    text = jnp.asarray(synth_labels(B, T + 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images,
        text,
        train=False,
    )
    return model, variables, images


def test_beam_width_1_equals_greedy():
    model, variables, images = _setup()
    greedy = jax.jit(
        make_greedy_fn(model, max_steps=T, return_outputs=False)
    )
    beam = jax.jit(
        make_beam_fn(model, max_steps=T, beam_width=1, eos_id=1)
    )
    g = np.asarray(greedy(variables, images))
    b = np.asarray(beam(variables, images))
    np.testing.assert_array_equal(g, b)


def test_beam_width_3_runs_and_scores_sane():
    model, variables, images = _setup()
    beam = jax.jit(
        make_beam_fn(model, max_steps=T, beam_width=3, eos_id=1)
    )
    out = np.asarray(beam(variables, images))
    assert out.shape == (B, T)
    assert (out >= 0).all() and (out < 245).all()
    # deterministic
    out2 = np.asarray(beam(variables, images))
    np.testing.assert_array_equal(out, out2)


def test_beam_pads_after_eos():
    """Once a hypothesis emits <EOS>, the continuation must be <PAD>."""
    model, variables, images = _setup()
    beam = jax.jit(
        make_beam_fn(model, max_steps=T, beam_width=2, eos_id=1)
    )
    out = np.asarray(beam(variables, images))
    for row in out:
        if 1 in row.tolist():
            k = row.tolist().index(1)
            assert all(t == 2 for t in row[k + 1 :]), row
