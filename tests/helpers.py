"""Shared test helpers: tiny model configs + synthetic data."""

import numpy as np

from p4fr_tpu.models.satrn import SATRN


def tiny_satrn(num_classes=245, pad_id=2, sos_id=0, parity=True, dtype=None):
    """A LiteSATRN-shaped model small enough for CPU tests."""
    import jax.numpy as jnp

    return SATRN(
        num_classes=num_classes,
        pad_id=pad_id,
        sos_id=sos_id,
        input_height=32,
        input_width=64,
        enc_hidden_dim=32,
        enc_filter_dim=32,
        enc_layer_num=1,
        enc_head_num=4,
        dec_src_dim=32,
        dec_hidden_dim=32,
        dec_filter_dim=64,
        dec_layer_num=2,
        dec_head_num=4,
        dropout=0.1,
        dtype=dtype or jnp.float32,
        backbone="shallow",
        reference_parity=parity,
    )


def synth_images(batch, h=32, w=64, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(batch, h, w, c)).astype(np.float32)


def synth_labels(batch, length, vocab_size=245, pad_id=2, sos_id=0, eos_id=1, seed=1):
    """[B, length] int32: <SOS> body <EOS> <PAD>*"""
    rng = np.random.default_rng(seed)
    out = np.full((batch, length), pad_id, np.int32)
    out[:, 0] = sos_id
    for b in range(batch):
        n = int(rng.integers(1, length - 1))
        out[b, 1 : 1 + n] = rng.integers(3, vocab_size, size=n)
        out[b, 1 + n if 1 + n < length else length - 1] = eos_id
    return out
