"""ops/pallas/beam_gather vs the jnp parent gather (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from p4fr_tpu.ops.pallas.beam_gather import (
    beam_parent_gather,
    gather_supported,
)

from helpers import synth_images, tiny_satrn


def _block_diag_parents(rng, b, w):
    """Random beam parents with the block-diagonal property (duplication
    and dropped slots included, exactly like top-k output)."""
    local = rng.integers(0, w, size=(b, w))
    return (local + np.arange(b)[:, None] * w).reshape(-1).astype(np.int32)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("pos", [0, 3, 7, 15])
def test_kernel_matches_take_on_written_prefix(dtype, pos):
    rng = np.random.default_rng(0)
    b, w, slots, feat = 4, 3, 16, 8
    bw = b * w
    cache = jnp.asarray(
        rng.standard_normal((bw, slots, feat)), dtype=dtype
    )
    parent = jnp.asarray(_block_diag_parents(rng, b, w))
    got = beam_parent_gather(
        cache, parent, jnp.asarray(pos), group=w, chunk=4, interpret=True
    )
    want = jnp.take(cache, parent, axis=0)
    # only chunks covering slots 0..pos are reordered; the tail keeps
    # the pre-gather buffer (decode masks/overwrites it before reading)
    covered = (pos // 4 + 1) * 4
    np.testing.assert_array_equal(
        np.asarray(got[:, :covered]), np.asarray(want[:, :covered])
    )
    np.testing.assert_array_equal(
        np.asarray(got[:, covered:]), np.asarray(cache[:, covered:])
    )


def test_identity_tiles_skip_but_match():
    rng = np.random.default_rng(1)
    b, w, slots, feat = 32, 3, 8, 4  # 32 interpret-mode tiles (rt=W=3)
    bw = b * w
    cache = jnp.asarray(rng.standard_normal((bw, slots, feat)), jnp.float32)
    # identity everywhere: kernel must leave the buffer untouched
    parent = jnp.arange(bw, dtype=jnp.int32)
    got = beam_parent_gather(
        cache, parent, jnp.asarray(slots - 1), group=w, chunk=4,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(cache))
    # one group permuted, the rest identity (mixed skip/work tiles)
    p = np.arange(bw, dtype=np.int32)
    p[3:6] = [5, 5, 3]  # sample 1's beams: duplication + reorder
    got = beam_parent_gather(
        cache, jnp.asarray(p), jnp.asarray(slots - 1), group=w, chunk=4,
        interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(jnp.take(cache, jnp.asarray(p), axis=0))
    )


def test_non_dividing_chunk_shrinks_in_interpret():
    rng = np.random.default_rng(2)
    cache = jnp.asarray(rng.standard_normal((6, 10, 4)), jnp.float32)
    parent = jnp.asarray(_block_diag_parents(rng, 2, 3))
    got = beam_parent_gather(
        cache, parent, jnp.asarray(9), group=3, chunk=64, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(jnp.take(cache, parent, axis=0))
    )


def test_gather_supported_gates():
    # compiled constraints: 16*W row tiles, 64-divisible slots, 128 feat
    assert gather_supported((768, 256, 512), jnp.bfloat16, 3)
    assert not gather_supported((768, 256, 512), jnp.int8, 3)
    assert not gather_supported((768, 250, 512), jnp.bfloat16, 3)
    assert not gather_supported((768, 256, 500), jnp.bfloat16, 3)
    assert not gather_supported((70, 256, 512), jnp.bfloat16, 3)
    assert not gather_supported((768, 512), jnp.bfloat16, 3)
    # interpret mode only needs the group structure
    assert gather_supported((6, 10, 4), jnp.float32, 3, interpret=True)
    assert not gather_supported((7, 10, 4), jnp.float32, 3, interpret=True)


def test_beam_e2e_token_identity_with_pallas_gather():
    """Full beam search: forced pallas gather == jnp gather, token for
    token (CPU interpret mode; the decode step stays jnp)."""
    from p4fr_tpu.decoding.beam import make_beam_fn

    model = tiny_satrn()
    images = jnp.asarray(synth_images(4))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, jnp.zeros((4, 8), jnp.int32), train=False,
    )
    kw = dict(max_steps=8, beam_width=3, eos_id=1, kernel="jnp")
    ref = make_beam_fn(model, gather_kernel="jnp", **kw)
    got = make_beam_fn(model, gather_kernel="pallas", **kw)
    t_ref = np.asarray(ref(variables, images))
    t_got = np.asarray(got(variables, images))
    np.testing.assert_array_equal(t_ref, t_got)


def test_beam_early_stop_e2e_with_pallas_gather():
    """The serving config that produced the headline beam number: the
    early-stop while_loop with per-sample stop injection, pallas gather
    forced — token-identical to the jnp-gather path."""
    from p4fr_tpu.decoding.beam import make_beam_fn

    model = tiny_satrn()
    images = jnp.asarray(synth_images(4))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, jnp.zeros((4, 8), jnp.int32), train=False,
    )
    stops = jnp.asarray([2, 5, 3, 8], jnp.int32)
    kw = dict(max_steps=8, beam_width=3, eos_id=1, kernel="jnp",
              early_stop=True, stop_override="arg")
    ref = make_beam_fn(model, gather_kernel="jnp", **kw)
    got = make_beam_fn(model, gather_kernel="pallas", **kw)
    t_ref = np.asarray(ref(variables, images, stops))
    t_got = np.asarray(got(variables, images, stops))
    np.testing.assert_array_equal(t_ref, t_got)
