"""Full teacher-forced TransformerDecoder vs a torch oracle, with pads.

Covers the integration pieces layer tests miss: embedding x sqrt(d), the
interleaved 1D PE addition, the pad-mask quirk (column 0 never masked —
reference pad_mask, LiteSATRN.py:448-452), the causal mask OR, and the
generator head."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from p4fr_tpu.models.common import TransformerDecoder  # noqa: E402
from p4fr_tpu.utils.convert_pth import convert_state_dict  # noqa: E402

V, H, S, F_, HEADS, LAYERS = 30, 16, 7, 24, 4, 2
B, L = 3, 6
PAD, SOS = 2, 0


class TorchMHA(torch.nn.Module):
    def __init__(self, q_ch, k_ch):
        super().__init__()
        tnn = torch.nn
        self.q_linear = tnn.Linear(q_ch, q_ch)
        self.k_linear = tnn.Linear(k_ch, q_ch)
        self.v_linear = tnn.Linear(k_ch, q_ch)
        self.out_linear = tnn.Linear(q_ch, q_ch)

    def forward(self, q, k, v, mask=None):
        b, ql, kl = q.size(0), q.size(1), k.size(1)
        hd = H // HEADS
        qh = self.q_linear(q).view(b, ql, HEADS, hd).transpose(1, 2)
        kh = self.k_linear(k).view(b, kl, HEADS, hd).transpose(1, 2)
        vh = self.v_linear(v).view(b, kl, HEADS, hd).transpose(1, 2)
        att = qh @ kh.transpose(2, 3) / (H ** 0.5)
        if mask is not None:
            att = att.masked_fill(mask.unsqueeze(1), float("-inf"))
        att = torch.softmax(att, dim=-1)
        out = (att @ vh).transpose(1, 2).reshape(b, ql, H)
        return self.out_linear(out)


class TorchDecoder(torch.nn.Module):
    """Oracle of the reference SATRNDecoder teacher-forced path."""

    def __init__(self):
        super().__init__()
        tnn = torch.nn
        self.embedding = tnn.Embedding(V + 1, H)
        layers = []
        for _ in range(LAYERS):
            layer = tnn.Module()
            layer.self_attention_layer = TorchMHA(H, H)
            layer.self_attention_norm = tnn.LayerNorm(H)
            layer.attention_layer = TorchMHA(H, S)
            layer.attention_norm = tnn.LayerNorm(H)
            layer.feedforward_layer = tnn.Module()
            layer.feedforward_layer.linear0 = tnn.Linear(H, F_)
            layer.feedforward_layer.linear1 = tnn.Linear(F_, H)
            layer.feedforward_norm = tnn.LayerNorm(H)
            layers.append(layer)
        self.attention_layers = tnn.ModuleList(layers)
        self.generator = tnn.Linear(H, V)
        # reference PositionEncoder1D table
        pos = torch.arange(500).float().unsqueeze(1)
        i = torch.arange(H).float().unsqueeze(0)
        rates = 1 / torch.pow(10000, (2 * (i // 2)) / H)
        enc = pos * rates
        enc[:, 0::2] = torch.sin(enc[:, 0::2])
        enc[:, 1::2] = torch.cos(enc[:, 1::2])
        self.pe = enc

    def forward(self, src, text):
        tgt = self.embedding(text) * math.sqrt(H)
        tgt = tgt + self.pe[: text.size(1)].unsqueeze(0)
        pad_mask = text == PAD
        pad_mask[:, 0] = False
        pad_mask = pad_mask.unsqueeze(1)
        order = torch.triu(
            torch.ones(text.size(1), text.size(1)), diagonal=1
        ).bool().unsqueeze(0)
        mask = pad_mask | order
        for layer in self.attention_layers:
            att = layer.self_attention_layer(tgt, tgt, tgt, mask)
            out = layer.self_attention_norm(att + tgt)
            att = layer.attention_layer(out, src, src)
            out = layer.attention_norm(att + out)
            ff = torch.relu(layer.feedforward_layer.linear1(
                torch.relu(layer.feedforward_layer.linear0(out))))
            tgt = layer.feedforward_norm(ff + out)
        return self.generator(tgt)


def test_full_decoder_matches_torch_with_pads():
    torch.manual_seed(0)
    oracle = TorchDecoder().eval()
    src = torch.randn(B, S, S)  # src_dim = S here
    # text with pads in the tail AND a pad at column 0 of one row
    # (the quirk: column 0 is never masked even if it equals PAD)
    text = torch.tensor([
        [SOS, 5, 9, PAD, PAD, PAD],
        [SOS, 7, 3, 4, 8, PAD],
        [PAD, 6, 6, PAD, PAD, PAD],
    ])
    with torch.no_grad():
        want = oracle(src, text).numpy()

    sd = {f"decoder.{k}": v for k, v in oracle.state_dict().items()}
    params, _, unmatched = convert_state_dict("LiteSATRN", sd)
    assert unmatched == [], unmatched

    dec = TransformerDecoder(
        num_classes=V, src_dim=S, hidden_dim=H, filter_dim=F_,
        head_num=HEADS, layer_num=LAYERS, pad_id=PAD, sos_id=SOS,
        dropout=0.0,
    )
    got = np.asarray(
        dec.apply(
            {"params": params["decoder"]},
            jnp.asarray(src.numpy()),
            jnp.asarray(text.numpy()),
            True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)
