"""SATRN encoder layer vs a torch oracle — proves the scrambled conv-FF
layout and shared-LayerNorm quirks are reproduced exactly."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from p4fr_tpu.models.satrn import SATRNEncoderLayer  # noqa: E402
from p4fr_tpu.utils.convert_pth import convert_state_dict  # noqa: E402

H, F_, HEADS = 16, 24, 4
B, HH, WW = 2, 4, 6


class TorchEncoderLayer(torch.nn.Module):
    """Oracle following the reference EncoderLayer spec
    (LiteSATRN.py:213-263): shared LN, MHA with sqrt(d_model) temperature,
    conv-FF on the raw-reshaped [B,HW,C]->[B,C,H,W] view."""

    def __init__(self):
        super().__init__()
        tnn = torch.nn
        self.norm = tnn.LayerNorm(H)
        self.attention_layer = torch.nn.ModuleDict(
            {
                "q_linear": tnn.Linear(H, H),
                "k_linear": tnn.Linear(H, H),
                "v_linear": tnn.Linear(H, H),
                "out_linear": tnn.Linear(H, H),
            }
        )
        self.conv0 = tnn.Conv2d(H, F_, 1, bias=False)
        self.norm0 = tnn.BatchNorm2d(F_)
        self.depthwise = tnn.Conv2d(F_, F_, 3, padding=1, groups=F_)
        self.depthwise_norm = tnn.BatchNorm2d(F_)
        self.conv1 = tnn.Conv2d(F_, H, 1, bias=False)
        self.norm1 = tnn.BatchNorm2d(H)

    def mha(self, x):
        b, l, _ = x.shape
        hd = H // HEADS
        a = self.attention_layer
        q = a["q_linear"](x).view(b, l, HEADS, hd).transpose(1, 2)
        k = a["k_linear"](x).view(b, l, HEADS, hd).transpose(1, 2)
        v = a["v_linear"](x).view(b, l, HEADS, hd).transpose(1, 2)
        att = torch.softmax(q @ k.transpose(2, 3) / (H ** 0.5), dim=-1)
        out = (att @ v).transpose(1, 2).reshape(b, l, H)
        return a["out_linear"](out)

    def forward(self, x):  # x [B, C, H, W]
        features = x
        b, c, h, w = x.shape
        flat = x.view(b, c, h * w).transpose(1, 2)
        y = self.norm(flat)
        y = self.mha(y)
        y = self.norm(y + flat)
        y = y.reshape(-1, c, h, w)  # the reference's raw-reshape scramble
        z = torch.relu(self.norm0(self.conv0(y)))
        z = torch.relu(self.depthwise_norm(self.depthwise(z)))
        z = torch.relu(self.norm1(self.conv1(z)))
        return z + features


def test_encoder_layer_matches_torch_oracle():
    torch.manual_seed(0)
    layer_t = TorchEncoderLayer().eval()
    x = torch.randn(B, H, HH, WW)
    with torch.no_grad():
        want = layer_t(x).numpy()  # [B, C, H, W]

    sd = {
        f"encoder.attention_layers.0.{k}": v
        for k, v in layer_t.state_dict().items()
    }
    params, stats, unmatched = convert_state_dict("LiteSATRN", sd)
    assert unmatched == [], unmatched

    layer_f = SATRNEncoderLayer(
        hidden_dim=H, filter_dim=F_, head_num=HEADS, dropout=0.0,
        scrambled_ff=True,
    )
    variables = {
        "params": params["encoder"]["layer0"],
        "batch_stats": stats["encoder"]["layer0"],
    }
    x_nhwc = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    got = np.asarray(layer_f.apply(variables, x_nhwc, True))
    np.testing.assert_allclose(
        got, want.transpose(0, 2, 3, 1), rtol=3e-5, atol=3e-5
    )


def test_natural_layout_differs_from_oracle():
    """Sanity: with scrambled_ff=False the outputs must NOT match the
    torch oracle (the quirk flag is load-bearing)."""
    torch.manual_seed(0)
    layer_t = TorchEncoderLayer().eval()
    x = torch.randn(B, H, HH, WW)
    with torch.no_grad():
        want = layer_t(x).numpy()
    sd = {
        f"encoder.attention_layers.0.{k}": v
        for k, v in layer_t.state_dict().items()
    }
    params, stats, _ = convert_state_dict("LiteSATRN", sd)
    layer_f = SATRNEncoderLayer(
        hidden_dim=H, filter_dim=F_, head_num=HEADS, dropout=0.0,
        scrambled_ff=False,
    )
    variables = {
        "params": params["encoder"]["layer0"],
        "batch_stats": stats["encoder"]["layer0"],
    }
    x_nhwc = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    got = np.asarray(layer_f.apply(variables, x_nhwc, True))
    assert not np.allclose(got, want.transpose(0, 2, 3, 1), atol=1e-3)
