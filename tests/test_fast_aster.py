"""Fused-weight ASTER fast decode vs the generic flax step (CPU f32)."""

import jax
import jax.numpy as jnp
import numpy as np

from p4fr_tpu.decoding import manager as dm
from p4fr_tpu.decoding.fast_aster import (
    build_fast_aster,
    fast_aster_step,
    init_fast_aster_cache,
    make_fast_aster_greedy_fn,
    precompute_aster_src,
)
from p4fr_tpu.decoding.greedy import make_greedy_fn

from helpers import synth_images

B, T = 3, 10


def _aster():
    from p4fr_tpu.models.aster import ASTER

    return ASTER(
        num_classes=245, pad_id=2, sos_id=0,
        src_dim=48, hidden_dim=48, embedding_dim=48, layer_num=2,
    )


def _init(model):
    images = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, 64, 256, 3)),
        jnp.float32,
    )
    text = jnp.zeros((B, 6), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    return images, variables


def test_fast_aster_step_matches_generic():
    model = _aster()
    images, variables = _init(model)
    src = model.apply(variables, images, method="encode")
    src_kv = model.apply(variables, src, method="precompute_src")
    cache_g = model.init_decode_cache(B, T)

    fast = build_fast_aster(model, variables)
    src_, src_proj = precompute_aster_src(fast, src)
    np.testing.assert_allclose(
        np.asarray(src_kv["proj"]), np.asarray(src_proj), rtol=1e-6,
        atol=1e-6,
    )
    cache_f = init_fast_aster_cache(fast, B)
    token = jnp.zeros((B,), jnp.int32)
    for t in range(5):
        l1, cache_g = model.apply(
            variables, token, jnp.asarray(t), src_kv, cache_g,
            method="decode_step",
        )
        l2, cache_f = fast_aster_step(fast, token, src_, src_proj, cache_f)
        np.testing.assert_allclose(
            np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5
        )
        token = jnp.argmax(l1, -1).astype(jnp.int32)


def test_fast_aster_greedy_matches_generic(vocab):
    model = _aster()
    images, variables = _init(model)
    for tables in (None, dm.RuleTables.build(vocab)):
        generic = jax.jit(make_greedy_fn(
            model, max_steps=T, tables=tables, return_outputs=False
        ))
        fast = jax.jit(make_fast_aster_greedy_fn(
            model, variables, max_steps=T, tables=tables
        ))
        a = np.asarray(generic(variables, images))
        b = np.asarray(fast(images))
        np.testing.assert_array_equal(a, b)


def test_fast_aster_in_ensemble(vocab):
    """Ensemble with an ASTER member routes it through the fused LSTM step
    and must match the generic-kernel ensemble token for token."""
    from p4fr_tpu.infer.ensemble import make_ensemble_decode_fn

    model = _aster()
    images, variables = _init(model)
    mem = model.apply(variables, images, method="encode")
    for kern in ("jnp",):
        a = jax.jit(make_ensemble_decode_fn(
            [model], max_steps=T, kernel="generic"
        ))([variables], [mem])
        b = jax.jit(make_ensemble_decode_fn(
            [model], max_steps=T, kernel=kern
        ))([variables], [mem])
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
