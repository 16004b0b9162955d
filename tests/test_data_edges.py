"""Edge paths: greyscale images, bbox crop, rotate rule, decode() dispatch."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from p4fr_tpu.data.augment import get_valid_transforms
from p4fr_tpu.data.dataset import load_image


def _save(tmp_path, arr, name="img.png"):
    p = tmp_path / name
    Image.fromarray(arr).save(p)
    return str(p)


def test_greyscale_pipeline_and_model(tmp_path):
    from p4fr_tpu.models.satrn import SATRN

    arr = (np.random.default_rng(0).random((40, 80)) * 255).astype(np.uint8)
    path = _save(tmp_path, arr)
    img = load_image(path, rgb=1)
    assert img.ndim == 2
    out = get_valid_transforms(32, 64, rgb=1)(img)
    assert out.shape == (32, 64, 1)

    model = SATRN(
        num_classes=245, pad_id=2, sos_id=0, input_height=32, input_width=64,
        enc_hidden_dim=32, enc_filter_dim=32, enc_layer_num=1, enc_head_num=4,
        dec_src_dim=32, dec_hidden_dim=32, dec_filter_dim=64,
        dec_layer_num=1, dec_head_num=4,
    )
    images = jnp.asarray(out[None])
    text = jnp.zeros((1, 4), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    logits = model.apply(variables, images, text, train=False)
    assert logits.shape == (1, 4, 245)


def test_crop_shrinks_to_content(tmp_path):
    arr = np.full((50, 100, 3), 255, np.uint8)
    arr[20:30, 40:60] = 0  # black box on white background
    path = _save(tmp_path, arr)
    img = load_image(path, rgb=3, crop=True)
    assert img.shape[0] <= 12 and img.shape[1] <= 22, img.shape


def test_tall_image_rotates():
    # h/w > 2 -> rotate 90 (reference dataset.py:78-79)
    from PIL import Image as PILImage
    import tempfile, os

    arr = (np.random.default_rng(1).random((120, 30, 3)) * 255).astype(np.uint8)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "tall.png")
        PILImage.fromarray(arr).save(p)
        img = load_image(p, rgb=3)
    assert img.shape[0] == 30 and img.shape[1] == 120


def test_decode_dispatch():
    from p4fr_tpu.decoding import decode
    from helpers import synth_images, synth_labels, tiny_satrn

    model = tiny_satrn()
    images = jnp.asarray(synth_images(2))
    text = jnp.asarray(synth_labels(2, 6))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    g = decode(model, variables, images, method="greedy", max_steps=5)
    b = decode(model, variables, images, method="beam", max_steps=5,
               beam_width=2, eos_id=1)
    assert g.shape == (2, 5) and b.shape == (2, 5)
    with pytest.raises(ValueError):
        decode(model, variables, images, method="nope", max_steps=5)
