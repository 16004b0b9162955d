"""Positional encodings (precomputed host-side, closed over by jit).

Two distinct layouts exist in the reference and both matter for checkpoint
parity:

- ``sinusoid_interleaved`` — decoder 1D PE: channel i uses rate
  1/10000^(2*(i//2)/d); even channels sin, odd channels cos
  (reference: networks/EfficientSATRN.py:400-426).
- ``sinusoid_concat`` — encoder per-axis 2D PE signal: first d/2 channels
  are sin, last d/2 are cos over d/2 timescales
  (reference: networks/EfficientSATRN.py:111-127).
"""

from __future__ import annotations

import numpy as np


def sinusoid_interleaved(max_len: int, dim: int) -> np.ndarray:
    """[max_len, dim] with interleaved sin/cos (decoder-style)."""
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    i = np.arange(dim, dtype=np.float32)[None, :]
    angle_rates = 1.0 / np.power(10000.0, (2.0 * (i // 2)) / dim)
    enc = pos * angle_rates
    enc[:, 0::2] = np.sin(enc[:, 0::2])
    enc[:, 1::2] = np.cos(enc[:, 1::2])
    return enc.astype(np.float32)


def sinusoid_concat(length: int, dim: int) -> np.ndarray:
    """[length, dim] with [sin | cos] concatenation (encoder-axis style).

    Matches the reference's min/max-timescale formulation with
    num_timescales = dim // 2.
    """
    min_timescale, max_timescale = 1.0, 1.0e4
    num_timescales = dim // 2
    position = np.arange(length, dtype=np.float32)
    log_increment = np.log(max_timescale / min_timescale) / (num_timescales - 1)
    inv_timescales = min_timescale * np.exp(
        np.arange(num_timescales, dtype=np.float32) * -log_increment
    )
    scaled = position[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(
        np.float32
    )
