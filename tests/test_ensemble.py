"""Ensemble decoding: joint stepping + softmax averaging across
heterogeneous architectures (transformer SATRN + LSTM ASTER)."""

import jax
import jax.numpy as jnp
import numpy as np

from p4fr_tpu.decoding import manager as dm
from p4fr_tpu.infer.ensemble import make_ensemble_decode_fn

from helpers import synth_images, synth_labels, tiny_satrn
from test_aster_swin import tiny_aster

B, T = 2, 6


def _init(model, images, text):
    return model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )


def test_heterogeneous_ensemble_decode(vocab):
    satrn = tiny_satrn()
    aster = tiny_aster()
    text = jnp.asarray(synth_labels(B, T + 1))
    satrn_imgs = jnp.asarray(synth_images(B, 32, 64))
    aster_imgs = jnp.asarray(synth_images(B, 64, 256))
    v1 = _init(satrn, satrn_imgs, text)
    v2 = _init(aster, aster_imgs, text)

    mem1 = satrn.apply(v1, satrn_imgs, method="encode")
    mem2 = aster.apply(v2, aster_imgs, method="encode")

    tables = dm.RuleTables.build(vocab)
    fn = jax.jit(
        make_ensemble_decode_fn([satrn, aster], max_steps=T, tables=tables)
    )
    tokens = np.asarray(fn([v1, v2], [mem1, mem2]))
    assert tokens.shape == (B, T)
    assert (tokens != vocab.sos_id).all()

    # deterministic across calls
    tokens2 = np.asarray(fn([v1, v2], [mem1, mem2]))
    np.testing.assert_array_equal(tokens, tokens2)


def test_single_model_ensemble_equals_greedy(vocab):
    """An ensemble of one model must reproduce plain greedy decoding."""
    from p4fr_tpu.decoding.greedy import make_greedy_fn

    satrn = tiny_satrn()
    text = jnp.asarray(synth_labels(B, T + 1))
    imgs = jnp.asarray(synth_images(B, 32, 64))
    v1 = _init(satrn, imgs, text)
    mem = satrn.apply(v1, imgs, method="encode")

    ens = jax.jit(make_ensemble_decode_fn([satrn], max_steps=T))
    greedy = jax.jit(
        make_greedy_fn(satrn, max_steps=T, from_memory=True,
                       return_outputs=False)
    )
    np.testing.assert_array_equal(
        np.asarray(ens([v1], [mem])), np.asarray(greedy(v1, mem))
    )


def test_ensemble_kernel_paths_agree(vocab):
    """The fused-weight fast step inside the ensemble scan ("jnp" kernel)
    must produce exactly the generic flax decode_step's tokens (they are
    numerically identical; tested per-step in test_fast_step.py)."""
    import numpy as np
    from helpers import synth_images, synth_labels, tiny_satrn

    satrn = tiny_satrn()
    images = jnp.asarray(synth_images(2))
    text = jnp.asarray(synth_labels(2, 6))
    v1 = satrn.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    mem = satrn.apply(v1, images, method="encode")
    tables = dm.RuleTables.build(vocab)
    T = 8
    for tabs in (None, tables):
        a = jax.jit(make_ensemble_decode_fn(
            [satrn], max_steps=T, tables=tabs, kernel="generic"
        ))([v1], [mem])
        b = jax.jit(make_ensemble_decode_fn(
            [satrn], max_steps=T, tables=tabs, kernel="jnp"
        ))([v1], [mem])
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
