"""Pallas standardize kernel (interpret mode on CPU) vs the jnp reference
and the host cv2 normalize path."""

import numpy as np

import jax.numpy as jnp

from p4fr_tpu.data.augment import normalize
from p4fr_tpu.ops.pallas.preprocess import (
    _standardize_jnp,
    _standardize_pallas,
    standardize,
)


def test_pallas_kernel_matches_jnp_interpret():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, size=(2, 16, 128, 3), dtype=np.uint8))
    a = np.asarray(
        _standardize_pallas(img, out_dtype=jnp.float32, interpret=True)
    )
    b = np.asarray(_standardize_jnp(img, out_dtype=jnp.float32))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_jnp_path_matches_host_cv2_normalize():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(8, 12, 3), dtype=np.uint8)
    device = np.asarray(
        _standardize_jnp(jnp.asarray(img[None]), out_dtype=jnp.float32)
    )[0]
    host = normalize(img)
    np.testing.assert_allclose(device, host, rtol=1e-5, atol=1e-5)


def test_dispatch_runs_on_cpu():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.integers(0, 256, size=(1, 8, 128, 3), dtype=np.uint8))
    out = standardize(img, out_dtype=jnp.float32)
    assert out.shape == (1, 8, 128, 3)
