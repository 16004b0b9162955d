"""ASTER and SwinTRN models: shapes, decode paths, window-attention math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from p4fr_tpu.decoding.greedy import make_greedy_fn

B = 2


def tiny_aster():
    from p4fr_tpu.models.aster import ASTER

    return ASTER(
        num_classes=245, pad_id=2, sos_id=0,
        src_dim=48, hidden_dim=48, embedding_dim=48, layer_num=2,
    )


def test_aster_forward_and_greedy():
    model = tiny_aster()
    # 64x256 -> stem 31x127 -> /16 -> 2x8 -> pool/conv tail -> [B, W', 384]
    images = jnp.asarray(np.random.default_rng(0).normal(
        size=(B, 64, 256, 3)).astype(np.float32))
    text = jnp.zeros((B, 6), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    logits = model.apply(variables, images, text, train=False)
    assert logits.shape == (B, 6, 245)
    assert np.isfinite(np.asarray(logits)).all()

    fn = jax.jit(make_greedy_fn(model, max_steps=5, return_outputs=False))
    tokens = fn(variables, images)
    assert tokens.shape == (B, 5)

    # train mode mutates batch stats (CNN BN)
    _, updates = model.apply(
        variables, images, text, train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert "batch_stats" in updates


def test_aster_teacher_forced_matches_stepwise():
    """decode_train (nn.scan) must equal manual decode_step chaining when
    fed the same tokens (LSTM state is exact, no cache quirks)."""
    model = tiny_aster()
    images = jnp.asarray(np.random.default_rng(1).normal(
        size=(B, 64, 256, 3)).astype(np.float32))
    text = jnp.asarray(np.array([[0, 5, 9, 7], [0, 11, 3, 8]], np.int32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    src = model.apply(variables, images, method="encode")
    tf_logits = np.asarray(
        model.apply(variables, src, text, method="decode_train")
    )
    src_kv = model.apply(variables, src, method="precompute_src")
    cache = model.init_decode_cache(B, 4)
    for t in range(4):
        logits, cache = model.apply(
            variables, text[:, t], jnp.asarray(t), src_kv, cache,
            method="decode_step",
        )
        np.testing.assert_allclose(
            tf_logits[:, t], np.asarray(logits), rtol=2e-5, atol=2e-5
        )


def test_swin_window_partition_roundtrip():
    from p4fr_tpu.models.swin import window_partition, window_reverse

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 3)))
    w = window_partition(x, 4)
    assert w.shape == (2 * 4, 16, 3)
    back = window_reverse(w, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(back))


def test_swin_relative_position_index():
    from p4fr_tpu.models.swin import relative_position_index

    idx = relative_position_index(3)
    assert idx.shape == (9, 9)
    assert idx.min() >= 0 and idx.max() < 25
    # symmetric pairs map to mirrored offsets, diagonal is the center
    assert (np.diag(idx) == idx[0, 0]).all()


def test_swin_tiny_forward_and_greedy():
    from p4fr_tpu.models.swin import SwinEncoder

    enc = SwinEncoder(
        img_size=16, patch_size=4, embed_dim=8, depths=(1, 2),
        num_heads=(2, 4), window=2, drop_path_rate=0.0,
    )
    images = jnp.asarray(np.random.default_rng(0).normal(
        size=(B, 16, 16, 3)).astype(np.float32))
    variables = enc.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, train=False,
    )
    out = enc.apply(variables, images)
    # 16/4=4 tokens/side, one merge -> 2x2=4 tokens, dim 16
    assert out.shape == (B, 4, 16)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.skipif(
    not __import__("os").environ.get("RUN_SLOW"),
    reason="set RUN_SLOW=1 (full Swin-B/384 init+forward, several minutes)",
)
def test_swin_base_384_full_size_forward(tokens_path):
    """Instantiate the REAL Swin-B/384 SwinTRN (88M-param backbone,
    reference /root/reference/networks/SWIN.py:1020-1060 scale) and run a
    teacher-forced forward: proves the full-size model initializes,
    compiles, and produces finite logits — not just the tiny-config
    variants the default suite uses."""
    from p4fr_tpu.data.vocab import Vocab
    from p4fr_tpu.models.registry import get_network
    from p4fr_tpu.utils.flags import Flags

    vocab = Vocab.from_files([tokens_path])
    options = Flags("p4fr_tpu/configs/SWIN.yaml").get()
    model = get_network(options.network, options, vocab, dtype=jnp.float32)

    images = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 384, 384, 3)),
        jnp.float32,
    )
    text = jnp.zeros((1, 4), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(
            variables["params"]
        )
    )
    # Swin-B backbone alone is ~87-88M; with the 4-layer/512-wide decoder
    # the full SwinTRN lands well above 90M.
    assert n_params > 90_000_000, n_params

    src = model.apply(variables, images, method="encode")
    assert src.shape == (1, 144, 1024), src.shape  # 384/32=12 -> 12*12
    logits = model.apply(variables, images, text, train=False)
    assert logits.shape[0] == 1 and logits.shape[-1] == len(vocab.id_to_token)
    assert np.isfinite(np.asarray(logits)).all()
