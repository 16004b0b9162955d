"""Device-side resize feed: canvas transform + fused resize/standardize.

The "--preprocess device_resize" path ships RAW uint8 images on an
edge-replicated fixed canvas and compiles the cv2-convention bilinear
resize + ImageNet standardization into the decode program
(ops/pallas/preprocess.resize_standardize). These tests pin the host
canvas transform semantics and the device resize against the
host cv2 path (reference data/augmentations.py valid pipeline).
"""

import numpy as np
import pytest

from p4fr_tpu.data.augment import (
    Transform,
    get_valid_transforms,
    normalize,
    resize,
    to_canvas,
)


def _rand_u8(h, w, c=3, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, c), dtype=np.uint8
    )


def test_to_canvas_replicates_edges():
    img = _rand_u8(5, 7)
    canvas, (h, w) = to_canvas(img, 16, 24)
    assert canvas.shape == (16, 24, 3) and canvas.dtype == np.uint8
    assert (h, w) == (5, 7)
    np.testing.assert_array_equal(canvas[:5, :7], img)
    # replicated right column / bottom row (cv2 boundary-clamp stand-in)
    np.testing.assert_array_equal(canvas[:5, 7:], np.repeat(
        img[:, -1:], 24 - 7, axis=1))
    np.testing.assert_array_equal(canvas[5:, :7], np.repeat(
        img[-1:, :], 16 - 5, axis=0))
    # grayscale gets a channel axis
    g, (gh, gw) = to_canvas(_rand_u8(4, 6)[:, :, 0], 8, 8)
    assert g.shape == (8, 8, 1) and (gh, gw) == (4, 6)
    with pytest.raises(ValueError, match="exceeds"):
        to_canvas(img, 4, 24)


def test_canvas_transform_mode_guards():
    t = get_valid_transforms(32, 64, normalize=False, canvas=(64, 128))
    out = t(_rand_u8(48, 96))
    assert isinstance(out, tuple) and out[0].shape == (64, 128, 3)
    with pytest.raises(ValueError, match="eval-only"):
        Transform(32, 64, train=True, normalize=False, canvas=(64, 128))
    with pytest.raises(ValueError, match="eval-only"):
        Transform(32, 64, canvas=(64, 128))  # normalize=True default


@pytest.mark.parametrize(
    "h,w", [(48, 96), (20, 40), (32, 64), (100, 30), (7, 130)]
)
def test_resize_standardize_matches_cv2(h, w):
    """Down-, up-, identity- and mixed-scale images through the device
    path match the host cv2 Resize+Normalize within u8 rounding."""
    import jax.numpy as jnp

    from p4fr_tpu.ops.pallas.preprocess import resize_standardize

    target_h, target_w = 32, 64
    img = _rand_u8(h, w, seed=h * 1000 + w)
    canvas, hw = to_canvas(img, 112, 144)

    got = np.asarray(
        resize_standardize(
            jnp.asarray(canvas[None]),
            jnp.asarray(np.array([hw], np.int32)),
            target_h,
            target_w,
            out_dtype=jnp.float32,
        )
    )[0]
    want = normalize(resize(img, target_h, target_w))
    # budget: cv2 resizes in u8 fixed point (<=1 LSB) before normalize;
    # 1/255/std ~ 0.018 on the tightest channel
    np.testing.assert_allclose(got, want, atol=0.03)


def test_resize_standardize_batch_mixed_sizes():
    """One compile serves a batch of different valid extents, and each
    row matches its per-image host resize (the vmapped scale is traced)."""
    import jax.numpy as jnp

    from p4fr_tpu.ops.pallas.preprocess import resize_standardize

    sizes = [(48, 96), (16, 120), (60, 33)]
    canvases, hws, wants = [], [], []
    for i, (h, w) in enumerate(sizes):
        img = _rand_u8(h, w, seed=i)
        canvas, hw = to_canvas(img, 64, 128)
        canvases.append(canvas)
        hws.append(hw)
        wants.append(normalize(resize(img, 32, 64)))
    got = np.asarray(
        resize_standardize(
            jnp.asarray(np.stack(canvases)),
            jnp.asarray(np.array(hws, np.int32)),
            32,
            64,
            out_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(got, np.stack(wants), atol=0.03)


def test_canvas_for_applies_rotate_quirk(tmp_path):
    """canvas_for sizes from PNG headers AFTER the reference's
    rotate-if-h/w>2 rule (data.dataset.load_image)."""
    from PIL import Image

    from p4fr_tpu.infer.single import canvas_for

    Image.fromarray(_rand_u8(30, 50)).save(tmp_path / "wide.png")
    Image.fromarray(_rand_u8(90, 20)).save(tmp_path / "tall.png")  # rotates
    hc, wc = canvas_for(
        [str(tmp_path / "wide.png"), str(tmp_path / "tall.png")]
    )
    # tall 90x20 -> rotated 20x90; maxes (30, 90) -> rounded to 8
    assert (hc, wc) == (32, 96)
