"""REAL reference SWIN encoder as the parity oracle.

Closes the last family whose encoder was only validated against a
hand-built torch-hub mirror: the actual ``SwinTransformer``
(/root/reference/networks/SWIN.py:590-741 — patch embed, window
attention with relative-position bias, shifted-window masks, patch
merging, final norm) is constructed at tiny dims, its state_dict pushed
through the production ``convert_pth`` SWIN rules, and the flax
``SwinEncoder`` must reproduce the [B, L, C] features.

Config exercises every structural branch: window 3 on a 12x12 patch
grid (4x4 windows, roll-shift masks active in odd blocks), one
PatchMerging down to 6x6 (still shifted), and a final 3x3 stage where
resolution == window disables shifting — the same clamp rule both
implementations apply.
"""

import numpy as np
import pytest

from reference_loader import load_reference_full

from p4fr_tpu.models.swin import SwinEncoder
from p4fr_tpu.utils.convert_pth import convert_state_dict

IMG, PATCH, EMBED = 48, 4, 16
DEPTHS, HEADS, WINDOW = (2, 2, 2), (2, 2, 4), 3
B = 2


@pytest.fixture(scope="module")
def ref():
    return load_reference_full()


@pytest.mark.parametrize("ape", [False, True])
def test_swin_encoder_features_match_real_reference(ref, ape):
    """ape=True is the configuration the reference SWIN actually runs
    (SWIN.py:1028-1034 builds its SwinTransformer with ape=True): the
    learned absolute position embedding must convert and be applied at
    the same point (after the patch norm)."""
    import jax.numpy as jnp
    import torch

    torch.manual_seed(11)
    tmodel = ref.swin.SwinTransformer(
        img_size=IMG, patch_size=PATCH, in_chans=3, num_classes=5,
        embed_dim=EMBED, depths=list(DEPTHS), num_heads=list(HEADS),
        window_size=WINDOW, drop_path_rate=0.1, ape=ape,
    )
    tmodel.eval()

    sd = {"encoder." + k: v for k, v in tmodel.state_dict().items()}
    params, stats, unmatched = convert_state_dict("SWIN", sd)
    # only the decoder-side rules stay unmatched (we feed encoder keys)
    assert not unmatched, unmatched
    assert not stats

    enc = SwinEncoder(
        img_size=IMG, patch_size=PATCH, embed_dim=EMBED,
        depths=DEPTHS, num_heads=HEADS, window=WINDOW, ape=ape,
        dtype=jnp.float32,
    )

    rng = np.random.default_rng(13)
    images = rng.standard_normal((B, IMG, IMG, 3)).astype(np.float32)

    with torch.no_grad():
        want = tmodel(
            torch.from_numpy(images.transpose(0, 3, 1, 2))
        ).numpy()  # [B, L, C]

    got = enc.apply(
        {"params": params["encoder"]}, jnp.asarray(images), train=False
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)
