"""Data-parallel inference sharding on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from p4fr_tpu.decoding.greedy import make_greedy_fn
from p4fr_tpu.parallel.mesh import make_mesh, shard_batch
from p4fr_tpu.parallel.sharding import make_sharded_infer_fn

from helpers import synth_images, synth_labels, tiny_satrn


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_greedy_matches_single_device():
    model = tiny_satrn()
    B, T = 16, 6
    images = jnp.asarray(synth_images(B))
    text = jnp.asarray(synth_labels(B, 8))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    decode = make_greedy_fn(model, max_steps=T, return_outputs=False)
    want = np.asarray(jax.jit(decode)(variables, images))

    mesh = make_mesh(8, 1)
    fn = make_sharded_infer_fn(decode, mesh)
    images_sharded = shard_batch(mesh, np.asarray(images))
    got = np.asarray(fn(variables, images_sharded))
    np.testing.assert_array_equal(want, got)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_ensemble_matches_single_device():
    """DP ensemble (BASELINE north star): joint decode over the data axis
    must reproduce the single-device ensemble exactly (CPU f32)."""
    from p4fr_tpu.infer.ensemble import make_ensemble_decode_fn
    from p4fr_tpu.parallel.mesh import batch_sharding, replicated

    B, T = 16, 6
    models, variables_list, memories = [], [], []
    images = jnp.asarray(synth_images(B))
    for seed in (0, 1):
        model = tiny_satrn()
        v = model.init(
            {"params": jax.random.PRNGKey(seed),
             "dropout": jax.random.PRNGKey(seed + 10)},
            images, jnp.asarray(synth_labels(B, 8)), train=False,
        )
        models.append(model)
        variables_list.append(v)
        memories.append(model.apply(v, images, method="encode"))

    decode = make_ensemble_decode_fn(models, max_steps=T)
    want = np.asarray(jax.jit(decode)(variables_list, memories))

    mesh = make_mesh(8, 1)
    sharded = jax.jit(
        decode,
        in_shardings=(replicated(mesh), batch_sharding(mesh)),
        out_shardings=batch_sharding(mesh),
    )
    mem_sharded = [shard_batch(mesh, np.asarray(m)) for m in memories]
    got = np.asarray(sharded(variables_list, mem_sharded))
    np.testing.assert_array_equal(want, got)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_fast_and_pallas_paths_match_single_device():
    """The fused-weight fast path AND the flash-decode Pallas kernel
    (interpret mode on CPU) must survive shard_map data parallelism and
    reproduce the single-device tokens — this is the production multi-chip
    configuration (pjit's GSPMD cannot split a pallas_call; shard_map
    runs it per-device on the batch shard)."""
    from p4fr_tpu.decoding.fast_step import make_fast_greedy_fn

    model = tiny_satrn()
    B, T = 16, 6
    images = jnp.asarray(synth_images(B))
    text = jnp.asarray(synth_labels(B, 8))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    mesh = make_mesh(8, 1)
    for pallas in (False, True):
        fast = make_fast_greedy_fn(
            model, variables, max_steps=T, use_pallas_v2=pallas
        )
        decode = lambda v, im: fast(im)  # noqa: E731
        want = np.asarray(jax.jit(decode)(variables, images))
        fn = make_sharded_infer_fn(decode, mesh)
        got = np.asarray(fn(variables, shard_batch(mesh, np.asarray(images))))
        np.testing.assert_array_equal(want, got)
