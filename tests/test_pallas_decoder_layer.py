"""Fused Pallas decoder-layer kernels vs the jnp fast step (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from p4fr_tpu.decoding.fast_step import (
    build_fast_decoder,
    fast_decode_step,
    init_fast_cache,
    pallas_decode_step,
    pallas_decode_step_v2,
    precompute_cross_kv,
)

from helpers import synth_images, synth_labels, tiny_satrn

B, T = 4, 6


def test_pallas_layer_step_matches_fast_step():
    for parity in (True, False):
        model = tiny_satrn(parity=parity)
        images = jnp.asarray(synth_images(B))
        text = jnp.asarray(synth_labels(B, 8))
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            images, text, train=False,
        )
        src = model.apply(variables, images, method="encode")
        fast = build_fast_decoder(model, variables)
        cross = precompute_cross_kv(fast, src)
        c1 = init_fast_cache(fast, B, T)
        c2 = init_fast_cache(fast, B, T)
        token = jnp.zeros((B,), jnp.int32)
        for t in range(4):
            l1, c1 = fast_decode_step(fast, token, jnp.asarray(t), cross, c1)
            l2, c2 = pallas_decode_step(
                fast, token, jnp.asarray(t), cross, c2,
                batch_tile=2, interpret=True,
            )
            np.testing.assert_allclose(
                np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5
            )
            for a, b in zip(c1, c2):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
                )
            token = jnp.argmax(l1, -1).astype(jnp.int32)


def test_pallas_v2_flash_decode_matches_fast_step():
    """v2: HBM cache + prefix-chunk DMA + online softmax + XLA slot DUS."""
    for parity in (True, False):
        model = tiny_satrn(parity=parity)
        images = jnp.asarray(synth_images(B))
        text = jnp.asarray(synth_labels(B, 8))
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            images, text, train=False,
        )
        src = model.apply(variables, images, method="encode")
        fast = build_fast_decoder(model, variables)
        cross = precompute_cross_kv(fast, src)
        c1 = init_fast_cache(fast, B, 8)
        c2 = init_fast_cache(fast, B, 8)
        token = jnp.zeros((B,), jnp.int32)
        for t in range(6):
            l1, c1 = fast_decode_step(fast, token, jnp.asarray(t), cross, c1)
            l2, c2 = pallas_decode_step_v2(
                fast, token, jnp.asarray(t), cross, c2,
                batch_tile=2, chunk=4, interpret=True,
            )
            np.testing.assert_allclose(
                np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5
            )
            for a, b in zip(c1, c2):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
                )
            token = jnp.argmax(l1, -1).astype(jnp.int32)


def test_pallas_v2_tiled_cache_matches_fast_step():
    """tiled_cache=True: the [G, L, TB, 2H] tile-contiguous layout must
    reproduce the jnp fast step exactly (the DMA geometry changes, the
    math must not)."""
    model = tiny_satrn()
    images = jnp.asarray(synth_images(B))
    text = jnp.asarray(synth_labels(B, 8))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    src = model.apply(variables, images, method="encode")
    fast = build_fast_decoder(model, variables)
    cross = precompute_cross_kv(fast, src)
    c1 = init_fast_cache(fast, B, 8)
    c2 = init_fast_cache(fast, B, 8, tiled_tile=2)
    assert all(c.shape == (B // 2, 8, 2, c1[0].shape[-1]) for c in c2)
    token = jnp.zeros((B,), jnp.int32)
    for t in range(6):
        l1, c1 = fast_decode_step(fast, token, jnp.asarray(t), cross, c1)
        l2, c2 = pallas_decode_step_v2(
            fast, token, jnp.asarray(t), cross, c2,
            batch_tile=2, chunk=4, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5
        )
        # cache contents equal up to the layout permutation
        for a, b in zip(c1, c2):
            g, L, tb, twoh = b.shape
            b_flat = np.asarray(b).transpose(0, 2, 1, 3).reshape(
                g * tb, L, twoh
            )
            np.testing.assert_allclose(
                np.asarray(a), b_flat, rtol=1e-5, atol=1e-5
            )
        token = jnp.argmax(l1, -1).astype(jnp.int32)
