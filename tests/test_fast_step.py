"""Fast fused decode path must match the flax decode step numerically."""

import jax
import jax.numpy as jnp
import numpy as np

from p4fr_tpu.decoding import manager as dm
from p4fr_tpu.decoding.fast_step import (
    build_fast_decoder,
    fast_decode_step,
    init_fast_cache,
    make_fast_greedy_fn,
    precompute_cross_kv,
)
from p4fr_tpu.decoding.greedy import make_greedy_fn

from helpers import synth_images, synth_labels, tiny_satrn

B, T = 2, 9


def _setup(parity=True):
    model = tiny_satrn(parity=parity)
    images = jnp.asarray(synth_images(B))
    text = jnp.asarray(synth_labels(B, 8))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    return model, variables, images


def test_fast_step_matches_flax_step():
    for parity in (True, False):
        model, variables, images = _setup(parity)
        src = model.apply(variables, images, method="encode")
        src_kv = model.apply(variables, src, method="precompute_src")
        cache = model.init_decode_cache(B, T)

        fast = build_fast_decoder(model, variables)
        assert fast.cache_outputs == parity
        cross = precompute_cross_kv(fast, src)
        fcache = init_fast_cache(fast, B, T)

        token = jnp.zeros((B,), jnp.int32)
        for t in range(4):
            ref_logits, cache = model.apply(
                variables, token, jnp.asarray(t), src_kv, cache,
                method="decode_step",
            )
            fast_logits, fcache = fast_decode_step(
                fast, token, jnp.asarray(t), cross, fcache
            )
            np.testing.assert_allclose(
                np.asarray(ref_logits), np.asarray(fast_logits),
                rtol=2e-4, atol=2e-4,
            )
            token = jnp.argmax(ref_logits, -1).astype(jnp.int32)


def test_fast_greedy_matches_slow_greedy(vocab):
    model, variables, images = _setup()
    tables = dm.RuleTables.build(vocab)
    slow = jax.jit(
        make_greedy_fn(model, max_steps=T, tables=tables, return_outputs=False)
    )
    fast = jax.jit(
        make_fast_greedy_fn(model, variables, max_steps=T, tables=tables)
    )
    np.testing.assert_array_equal(
        np.asarray(slow(variables, images)), np.asarray(fast(images))
    )


def test_fast_greedy_scan_unroll_token_identical(vocab, monkeypatch):
    """P4FR_SCAN_UNROLL (loop-boundary experiment knob, a measured
    wash on TPU — docs/PERFORMANCE.md) must never change tokens: the
    unrolled scan runs the same body, including at a T that does not
    divide the unroll factor."""
    model, variables, images = _setup()
    tables = dm.RuleTables.build(vocab)
    base = jax.jit(
        make_fast_greedy_fn(model, variables, max_steps=T, tables=tables)
    )
    ref = np.asarray(base(images))
    assert T % 4 != 0  # exercise the remainder path
    monkeypatch.setenv("P4FR_SCAN_UNROLL", "4")
    unrolled = jax.jit(
        make_fast_greedy_fn(model, variables, max_steps=T, tables=tables)
    )
    np.testing.assert_array_equal(ref, np.asarray(unrolled(images)))


def test_fast_greedy_early_stop(vocab):
    model, variables, images = _setup()
    fast = jax.jit(
        make_fast_greedy_fn(
            model, variables, max_steps=T, early_stop_eos=vocab.eos_id
        )
    )
    slow = jax.jit(
        make_greedy_fn(model, max_steps=T, return_outputs=False)
    )
    a = np.asarray(slow(variables, images))
    b = np.asarray(fast(images))
    for ra, rb in zip(a, b):
        ta = ra.tolist()
        tb = rb.tolist()
        la = ta.index(vocab.eos_id) if vocab.eos_id in ta else len(ta)
        lb = tb.index(vocab.eos_id) if vocab.eos_id in tb else len(tb)
        assert ta[:la] == tb[:lb]


def test_pallas_v2_pads_odd_batches(vocab):
    """An odd/prime batch must not degrade the v2 kernel to tb=1 tiles:
    make_fast_greedy_fn pads post-encoder to a multiple of 16 and slices
    tokens back. Interpret mode; tokens must equal the jnp fast path."""
    import numpy as np
    from helpers import synth_images, synth_labels, tiny_satrn

    model = tiny_satrn()
    B = 3  # not a multiple of 16
    images = jnp.asarray(synth_images(B))
    text = jnp.asarray(synth_labels(B, 6))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    T = 8
    ref = make_fast_greedy_fn(model, variables, max_steps=T)(images)
    got = make_fast_greedy_fn(
        model, variables, max_steps=T, use_pallas_v2=True
    )(images)
    assert got.shape == (B, T)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
