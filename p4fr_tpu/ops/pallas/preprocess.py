"""Pallas TPU kernel: fused image standardization (u8 -> normalized bf16).

The reference normalizes images on the host with albumentations
(reference: data/augmentations.py — ``(x/255 - mean)/std``) and ships
float32 NCHW tensors over PCIe. On TPU the cheap win is to ship raw uint8
NHWC (4x less host->device bandwidth) and fuse scale/shift/cast into one
VMEM pass on device; the kernel is bandwidth-bound so the fusion runs at
HBM speed.

``standardize(images_u8)`` dispatches to the Pallas kernel on TPU and to an
identical jnp expression elsewhere (CPU tests, interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _stats_for(channels: int):
    """Per-channel (mean, std); grayscale uses scalar averaged stats like
    the host pipeline (data/augment.py::normalize rgb=1 branch)."""
    if channels == 3:
        return IMAGENET_MEAN, IMAGENET_STD
    return (
        np.full(channels, IMAGENET_MEAN.mean(), np.float32),
        np.full(channels, IMAGENET_STD.mean(), np.float32),
    )


def _kernel(img_ref, scale_ref, shift_ref, out_ref):
    """One [rows, W*C] tile: out = u8 * scale + shift (channel-folded).

    Mosaic has no direct u8->f32 cast; hop through int32.
    """
    x = img_ref[:].astype(jnp.int32).astype(jnp.float32)
    out_ref[:] = (x * scale_ref[:] + shift_ref[:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def _standardize_pallas(
    images: jnp.ndarray, out_dtype=jnp.bfloat16, interpret: bool = False
):
    from jax.experimental import pallas as pl

    b, h, w, c = images.shape
    mean, std = _stats_for(c)
    # fold W*C into the lane dimension; per-position channel pattern repeats
    flat = images.reshape(b, h, w * c)
    scale = jnp.tile(1.0 / (255.0 * std), w)[None, :]  # [1, W*C]
    shift = jnp.tile(-mean / std, w)[None, :]

    tile_rows = 8
    grid = (b, pl.cdiv(h, tile_rows))
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w * c), out_dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, tile_rows, w * c),
                    lambda i, j: (i, j, 0),
                ),
                pl.BlockSpec((1, w * c), lambda i, j: (0, 0)),
                pl.BlockSpec((1, w * c), lambda i, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, tile_rows, w * c), lambda i, j: (i, j, 0)
            ),
        ),
        interpret=interpret,
    )(flat, scale, shift)
    return out.reshape(b, h, w, c)


def _standardize_jnp(images: jnp.ndarray, out_dtype=jnp.bfloat16):
    mean, std = _stats_for(images.shape[-1])
    x = images.astype(jnp.float32) / 255.0
    x = (x - mean) / std
    return x.astype(out_dtype)


def standardize(images: jnp.ndarray, out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """[B, H, W, 3] uint8 -> normalized [B, H, W, 3] ``out_dtype``."""
    if jax.default_backend() == "tpu":
        return _standardize_pallas(images, out_dtype=out_dtype)
    return _standardize_jnp(images, out_dtype=out_dtype)


@functools.partial(
    jax.jit, static_argnames=("height", "width", "out_dtype")
)
def resize_standardize(
    canvas_u8: jnp.ndarray,
    orig_hw: jnp.ndarray,
    height: int,
    width: int,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Device-side per-image bilinear resize + ImageNet standardization.

    ``canvas_u8``: [B, Hc, Wc, C] uint8 — each image edge-replicated onto
    a fixed canvas by ``data.augment.to_canvas``; ``orig_hw``: [B, 2]
    int32 valid extents. Output: [B, height, width, C] ``out_dtype``.

    Replaces the host cv2 Resize+Normalize of the eval feed
    (reference data/augmentations.py valid pipeline) with one compiled
    program: ``jax.image.scale_and_translate`` with ``scale = out/valid``
    and zero translation samples at ``(i + 0.5) * valid/out - 0.5`` —
    exactly cv2's INTER_LINEAR half-pixel convention — and the
    edge-replicated canvas reproduces cv2's boundary clamp, so the only
    difference from the host path is cv2's u8 fixed-point rounding
    (<= 1 LSB per pixel). ``antialias=False`` matches cv2 (no low-pass
    on downscale). The per-image scales are traced values: one compile
    serves every (h, w) mix, and the two weight-matrix contractions run
    on the MXU. The standardization is algebraically hoisted after the
    (linear) resize so it touches H*W, not Hc*Wc, pixels; XLA fuses it
    into the resize epilogue, so no separate Pallas pass is needed.
    """
    _, _, _, c = canvas_u8.shape
    mean, std = _stats_for(c)
    out_shape = (height, width, c)

    def one(img: jnp.ndarray, hw: jnp.ndarray) -> jnp.ndarray:
        scale = jnp.stack(
            [height / hw[0].astype(jnp.float32),
             width / hw[1].astype(jnp.float32)]
        )
        return jax.image.scale_and_translate(
            img.astype(jnp.float32),
            out_shape,
            (0, 1),
            scale,
            jnp.zeros((2,), jnp.float32),
            method="linear",
            antialias=False,
            precision=jax.lax.Precision.HIGHEST,
        )

    x = jax.vmap(one)(canvas_u8, orig_hw)
    x = (x / 255.0 - mean) / std
    return x.astype(out_dtype)
