"""Positional encodings vs torch oracles of the reference formulas."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from p4fr_tpu.models.satrn import AdaptivePositionalEncoding2D  # noqa: E402
from p4fr_tpu.ops.posenc import sinusoid_concat, sinusoid_interleaved  # noqa: E402
from p4fr_tpu.utils.convert_pth import convert_state_dict  # noqa: E402


def _reference_axis_encoding(length, hidden):
    """Torch transcription of the reference get_position_encoding formula
    (LiteSATRN.py:93-109): sin|cos concat over hidden/2 timescales."""
    import math

    position = torch.arange(length).float()
    num_timescales = hidden // 2
    log_inc = math.log(1.0e4) / (num_timescales - 1)
    inv = torch.exp(torch.arange(num_timescales).float() * -log_inc)
    scaled = position.unsqueeze(1) * inv.unsqueeze(0)
    return torch.cat((torch.sin(scaled), torch.cos(scaled)), dim=1)


def test_axis_encoding_matches_reference_formula():
    for length, hidden in [(8, 32), (16, 64), (5, 16)]:
        want = _reference_axis_encoding(length, hidden).numpy()
        got = sinusoid_concat(length, hidden)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_interleaved_encoding_matches_reference_formula():
    """Reference PositionEncoder1D.generate_encoder (LiteSATRN.py:387-397)."""
    max_len, dim = 12, 16
    pos = torch.arange(max_len).float().unsqueeze(1)
    i = torch.arange(dim).float().unsqueeze(0)
    rates = 1 / torch.pow(10000, (2 * (i // 2)) / dim)
    enc = pos * rates
    enc[:, 0::2] = torch.sin(enc[:, 0::2])
    enc[:, 1::2] = torch.cos(enc[:, 1::2])
    np.testing.assert_allclose(
        sinusoid_interleaved(max_len, dim), enc.numpy(), rtol=1e-5, atol=1e-6
    )


def test_adaptive_2d_pe_matches_torch_oracle():
    """Full gated 2D PE vs a torch oracle of PositionalEncoding.forward
    (LiteSATRN.py:117-136)."""
    H, HH, WW, B = 16, 3, 5, 2
    torch.manual_seed(0)
    dense0 = torch.nn.Linear(H, H // 2)
    dense1 = torch.nn.Linear(H // 2, H * 2)
    h_pe = _reference_axis_encoding(HH, H).unsqueeze(1)  # [HH, 1, H]
    w_pe = _reference_axis_encoding(WW, H).unsqueeze(0)  # [1, WW, H]
    x = torch.randn(B, H, HH, WW)

    with torch.no_grad():
        g = torch.mean(x, dim=[2, 3])
        g = torch.relu(dense0(g))
        g = torch.sigmoid(dense1(g))
        g = g.reshape(-1, 2, 1, H)
        pe = (
            g[:, 0:1, :, :] * h_pe.unsqueeze(0)
            + g[:, 1:2, :, :] * w_pe.unsqueeze(0)
        )  # [B, HH, WW, H]
        want = (pe.permute(0, 3, 1, 2) + x).numpy()

    sd = {
        "encoder.positional_encoding.dense0.weight": dense0.weight,
        "encoder.positional_encoding.dense0.bias": dense0.bias,
        "encoder.positional_encoding.dense1.weight": dense1.weight,
        "encoder.positional_encoding.dense1.bias": dense1.bias,
    }
    params, _, unmatched = convert_state_dict("LiteSATRN", sd)
    assert unmatched == []
    module = AdaptivePositionalEncoding2D(
        hidden_size=H, height=HH, width=WW, dropout=0.0
    )
    got = np.asarray(
        module.apply(
            {"params": params["encoder"]["positional_encoding"]},
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
            True,
        )
    )
    np.testing.assert_allclose(
        got, want.transpose(0, 2, 3, 1), rtol=2e-5, atol=2e-5
    )
