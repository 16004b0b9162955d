"""Image preprocessing & augmentation (host side, cv2/NumPy).

Reimplements the reference albumentations pipeline
(reference: data/augmentations.py):

- train: Resize -> ShiftScaleRotate(shift 0, scale +-0.1, rotate 0, p=0.3)
  -> GridDistortion(8 steps, +-0.5, nearest, zero border, p=0.3)
  -> ImageNet Normalize -> channel-last float tensor;
- valid/test: Resize -> Normalize.

Outputs are NHWC float32 (TPU-friendly layout; the reference emits NCHW for
torch). Normalization matches albumentations.Normalize semantics:
``(pixel/255 - mean) / std``.

A fused Pallas resize+normalize path for the inference hot loop lives in
``ops/pallas/preprocess.py``; this module is the reference-parity host
implementation and the training-time augmenter.
"""

from __future__ import annotations

from typing import Optional, Tuple

import cv2
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def resize(image: np.ndarray, height: int, width: int) -> np.ndarray:
    """A.Resize default: bilinear."""
    return cv2.resize(image, (width, height), interpolation=cv2.INTER_LINEAR)


def normalize(image: np.ndarray, rgb: int = 3) -> np.ndarray:
    """albumentations.Normalize: (x/255 - mean)/std, ImageNet stats."""
    x = image.astype(np.float32) / 255.0
    if rgb == 3:
        return (x - IMAGENET_MEAN) / IMAGENET_STD
    # greyscale: albumentations broadcasts scalar stats
    return (x - IMAGENET_MEAN.mean()) / IMAGENET_STD.mean()


def shift_scale_rotate(
    image: np.ndarray,
    rng: np.random.Generator,
    scale_limit: float = 0.1,
) -> np.ndarray:
    """ShiftScaleRotate with shift=0, rotate=0 -> a pure random scale about
    the image center (the only active component in the reference config)."""
    scale = 1.0 + rng.uniform(-scale_limit, scale_limit)
    h, w = image.shape[:2]
    m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), 0.0, scale)
    return cv2.warpAffine(
        image, m, (w, h), flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT_101
    )


def grid_distortion(
    image: np.ndarray,
    rng: np.random.Generator,
    num_steps: int = 8,
    distort_limit: float = 0.5,
) -> np.ndarray:
    """GridDistortion: per-grid-cell random stretch of the coordinate map
    (nearest interpolation, zero border — reference interpolation=0,
    border_mode=0)."""
    h, w = image.shape[:2]
    xsteps = 1 + rng.uniform(-distort_limit, distort_limit, num_steps + 1)
    ysteps = 1 + rng.uniform(-distort_limit, distort_limit, num_steps + 1)

    def axis_map(size, steps):
        step = size // num_steps
        xx = np.zeros(size, np.float32)
        prev = 0.0
        for idx in range(num_steps + 1):
            x = idx * step
            start = int(x)
            end = int(min(x + step, size))
            cur = prev + step * steps[idx]
            if end > start:
                xx[start:end] = np.linspace(prev, cur, end - start, endpoint=False)
            prev = cur
        return xx

    map_x = np.tile(axis_map(w, xsteps)[None, :], (h, 1))
    map_y = np.tile(axis_map(h, ysteps)[:, None], (1, w))
    return cv2.remap(
        image,
        map_x,
        map_y,
        interpolation=cv2.INTER_NEAREST,
        borderMode=cv2.BORDER_CONSTANT,
        borderValue=0,
    )


def to_canvas(
    image: np.ndarray, canvas_h: int, canvas_w: int
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Raw uint8 image -> (edge-replicated [canvas_h, canvas_w, C] canvas,
    original (h, w)).

    Host half of the device-resize feed: the bilinear resize samples at
    most 0.5 px past the valid region (half-pixel convention), so
    edge-replicated padding makes the device resize of the canvas's
    valid window exactly reproduce cv2's boundary-clamped resize of the
    original image.
    """
    if image.ndim == 2:
        image = image[:, :, None]
    h, w = image.shape[:2]
    if h > canvas_h or w > canvas_w:
        raise ValueError(
            f"image {h}x{w} exceeds the canvas {canvas_h}x{canvas_w}"
        )
    out = np.pad(
        image, ((0, canvas_h - h), (0, canvas_w - w), (0, 0)), mode="edge"
    )
    return np.ascontiguousarray(out), (h, w)


class Transform:
    """Callable pipeline mirroring get_{train,valid,test}_transforms."""

    def __init__(
        self,
        height: int,
        width: int,
        *,
        train: bool = False,
        rgb: int = 3,
        aug_prob: float = 0.3,
        seed: Optional[int] = None,
        normalize: bool = True,
        canvas: Optional[Tuple[int, int]] = None,
    ):
        self.height = height
        self.width = width
        self.train = train
        self.rgb = rgb
        self.aug_prob = aug_prob
        self.rng = np.random.default_rng(seed)
        # normalize=False ships resized uint8 and defers the ImageNet
        # standardization to the device (ops/pallas/preprocess.standardize):
        # 4x less H2D bandwidth on the inference hot path.
        self.normalize = normalize
        # canvas=(Hc, Wc): skip the host resize too — return the raw u8
        # image on an edge-replicated fixed canvas plus its valid (h, w);
        # the bilinear resize then runs ON DEVICE fused with the
        # standardization (ops/pallas/preprocess.resize_standardize).
        # Eval-only (train augments operate on the host-resized image).
        self.canvas = canvas
        if canvas is not None and (train or normalize):
            raise ValueError("canvas mode is eval-only and implies "
                             "normalize=False (device-side standardize)")

    def __call__(self, image: np.ndarray):
        """uint8 HWC (or HW) -> float32 HWC normalized
        (or resized uint8 HWC when ``normalize=False``,
        or ``(canvas_u8, (h, w))`` when ``canvas`` is set)."""
        if self.canvas is not None:
            return to_canvas(image, *self.canvas)
        image = resize(image, self.height, self.width)
        if self.train:
            if self.rng.random() < self.aug_prob:
                image = shift_scale_rotate(image, self.rng)
            if self.rng.random() < self.aug_prob:
                image = grid_distortion(image, self.rng)
        if self.normalize:
            image = normalize(image, self.rgb)
        if image.ndim == 2:
            image = image[:, :, None]
        return image


def get_train_transforms(height, width, rgb=3, seed=None) -> Transform:
    return Transform(height, width, train=True, rgb=rgb, seed=seed)


def get_valid_transforms(
    height, width, rgb=3, normalize=True, canvas=None
) -> Transform:
    return Transform(
        height, width, train=False, rgb=rgb, normalize=normalize,
        canvas=canvas,
    )


def get_test_transforms(height, width, rgb=3) -> Transform:
    return Transform(height, width, train=False, rgb=rgb)
