"""SATRN-family models: LiteSATRN and EfficientSATRN.

TPU-native rebuild of the reference SATRN models (reference:
networks/LiteSATRN.py, networks/EfficientSATRN.py): a CNN stem
(ShallowCNN at /16 for Lite, EfficientNetV2-S at /32 for Efficient),
an adaptive 2D positional encoding, N self-attention encoder layers with a
convolutional feed-forward, and the shared transformer decoder from
``models.common``.

All tensors are NHWC (TPU-friendly); static shapes throughout.

Reference-parity quirks (kept, toggleable):

- the encoder layer applies ONE LayerNorm instance both pre-attention and
  post-residual (LiteSATRN.py:217,247-250 reuses ``self.norm``);
- the conv feed-forward consumes a torch-``reshape``-scrambled view of the
  [B,HW,C] attention output (LiteSATRN.py:251 reshapes [B,HW,C] directly
  to [B,C,H,W] without a transpose). ``scrambled_ff=True`` reproduces the
  exact permutation so converted checkpoints match bit-for-bit; new
  training can use the fixed natural layout.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from p4fr_tpu.models.common import TransformerDecoder
from p4fr_tpu.ops.attention import MultiHeadAttention
from p4fr_tpu.ops.posenc import sinusoid_concat


class ShallowCNN(nn.Module):
    """4x (conv3x3-BN-ReLU-maxpool2) stem, stride /16 (LiteSATRN.py:21-70)."""

    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        widths = [self.hidden_size // 2] + [self.hidden_size] * 3
        for i, width in enumerate(widths):
            x = nn.Conv(
                width, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"bn{i}",
            )(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x  # [B, H/16, W/16, hidden]


class AdaptivePositionalEncoding2D(nn.Module):
    """Gated per-axis sinusoidal 2D PE (LiteSATRN.py:72-136).

    A 2-way MLP on globally pooled features produces sigmoid gates for the
    H-axis and W-axis sinusoid tables; the gated sum is added to the
    feature map.
    """

    hidden_size: int
    height: int
    width: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h_pe = jnp.asarray(sinusoid_concat(self.height, self.hidden_size))
        w_pe = jnp.asarray(sinusoid_concat(self.width, self.hidden_size))
        g = jnp.mean(x, axis=(1, 2))  # [B, C]
        g = nn.relu(nn.Dense(self.hidden_size // 2, dtype=self.dtype, name="dense0")(g))
        g = nn.Dropout(self.dropout)(g, deterministic=deterministic)
        g = nn.sigmoid(nn.Dense(self.hidden_size * 2, dtype=self.dtype, name="dense1")(g))
        g = g.reshape(-1, 2, self.hidden_size)
        pe = (
            g[:, 0][:, None, None, :] * h_pe[None, :, None, :].astype(self.dtype)
            + g[:, 1][:, None, None, :] * w_pe[None, None, :, :].astype(self.dtype)
        )
        return x + pe


class SATRNEncoderLayer(nn.Module):
    """Self-attention over flattened HxW tokens + convolutional FF.

    Reference: LiteSATRN.py:213-263 (EncoderLayer).
    """

    hidden_dim: int
    filter_dim: int
    head_num: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    scrambled_ff: bool = True  # reference layout quirk

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, h, w, c = x.shape
        flat = x.reshape(b, h * w, c)
        # NOTE: the reference reuses one LayerNorm for both applications.
        norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")
        y = norm(flat)
        y = MultiHeadAttention(
            q_dim=self.hidden_dim,
            k_dim=self.hidden_dim,
            head_num=self.head_num,
            dropout=self.dropout,
            dtype=self.dtype,
            name="attention",
        )(y, y, y, None, deterministic)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = norm(y + flat)

        if self.scrambled_ff:
            # torch `.reshape(-1, c, h, w)` on a [B, HW, C] tensor: a raw
            # row-major reinterpretation (no transpose). Reproduced exactly,
            # then moved to NHWC for the convs.
            y2d = y.reshape(b, c, h, w).transpose(0, 2, 3, 1)
        else:
            y2d = y.reshape(b, h, w, c)

        def bn(z, name):
            return nn.BatchNorm(
                use_running_average=deterministic, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=name,
            )(z)

        z = nn.Conv(self.filter_dim, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv0")(y2d)
        z = nn.relu(bn(z, "bn0"))
        z = nn.Conv(
            self.filter_dim, (3, 3), padding=1,
            feature_group_count=self.filter_dim, dtype=self.dtype,
            name="depthwise",
        )(z)
        z = nn.relu(bn(z, "bn_depth"))
        z = nn.Conv(self.hidden_dim, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(z)
        z = nn.relu(bn(z, "bn1"))
        return z + x


class SATRNEncoder(nn.Module):
    """Stem + adaptive 2D PE + N encoder layers -> [B, HW, C] memory."""

    input_height: int
    input_width: int
    hidden_dim: int
    filter_dim: int
    head_num: int
    layer_num: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    backbone: str = "shallow"  # 'shallow' (/16) | 'efficientnetv2s' (/32)
    scrambled_ff: bool = True
    backbone_stages: Any = None  # reduced V2 stage list (schema of V2_S_STAGES)

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.backbone == "shallow":
            x = ShallowCNN(self.hidden_dim, dtype=self.dtype, name="shallow_cnn")(
                images, train
            )
            stride = 16
        elif self.backbone == "efficientnetv2s":
            from p4fr_tpu.models.efficientnetv2 import EfficientNetV2Backbone

            x = EfficientNetV2Backbone(
                output_channel=self.hidden_dim, dtype=self.dtype,
                name="efficientnet", stages=self.backbone_stages,
            )(images, train)
            stride = 32
            if self.backbone_stages is not None:
                stride = 2  # stem
                for row in self.backbone_stages:
                    stride *= row[2]
        else:
            raise ValueError(f"unknown backbone: {self.backbone}")

        x = AdaptivePositionalEncoding2D(
            hidden_size=self.hidden_dim,
            height=self.input_height // stride,
            width=self.input_width // stride,
            dropout=self.dropout,
            dtype=self.dtype,
            name="positional_encoding",
        )(x, deterministic=not train)

        for i in range(self.layer_num):
            x = SATRNEncoderLayer(
                hidden_dim=self.hidden_dim,
                filter_dim=self.filter_dim,
                head_num=self.head_num,
                dropout=self.dropout,
                dtype=self.dtype,
                scrambled_ff=self.scrambled_ff,
                name=f"layer{i}",
            )(x, deterministic=not train)

        b, h, w, c = x.shape
        return x.reshape(b, h * w, c)


class SATRN(nn.Module):
    """Encoder-decoder SATRN; ``backbone`` selects Lite vs Efficient.

    Unified model contract used across the framework:

    - ``__call__(images, text, train)``: teacher-forced logits [B, L, V]
      (also the init path — touches every parameter).
    - ``encode(images, train)``: encoder memory.
    - ``precompute_src(src)``: per-layer cross K/V for AR decode.
    - ``decode_step(token, pos, src_kv, cache)``: one AR step.
    - ``decode_train(src, text, train)``: teacher-forced decode only.
    """

    num_classes: int
    pad_id: int
    sos_id: int
    input_height: int
    input_width: int
    enc_hidden_dim: int
    enc_filter_dim: int
    enc_layer_num: int
    enc_head_num: int
    dec_src_dim: int
    dec_hidden_dim: int
    dec_filter_dim: int
    dec_layer_num: int
    dec_head_num: int
    dropout: float = 0.1
    # decoder-FF dropout is pinned at the reference Feedforward default
    # 0.1 independent of `dropout` (see common.TransformerDecoderLayer)
    ff_dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    backbone: str = "shallow"
    reference_parity: bool = True
    backbone_stages: Any = None

    def setup(self):
        self.encoder = SATRNEncoder(
            input_height=self.input_height,
            input_width=self.input_width,
            hidden_dim=self.enc_hidden_dim,
            filter_dim=self.enc_filter_dim,
            head_num=self.enc_head_num,
            layer_num=self.enc_layer_num,
            dropout=self.dropout,
            dtype=self.dtype,
            backbone=self.backbone,
            scrambled_ff=self.reference_parity,
            backbone_stages=self.backbone_stages,
        )
        self.decoder = TransformerDecoder(
            num_classes=self.num_classes,
            src_dim=self.dec_src_dim,
            hidden_dim=self.dec_hidden_dim,
            filter_dim=self.dec_filter_dim,
            head_num=self.dec_head_num,
            layer_num=self.dec_layer_num,
            pad_id=self.pad_id,
            sos_id=self.sos_id,
            dropout=self.dropout,
            ff_dropout=self.ff_dropout,
            dtype=self.dtype,
            cache_outputs=self.reference_parity,
        )

    def __call__(self, images, text, train: bool = False):
        src = self.encoder(images, train)
        return self.decoder(src, text, deterministic=not train)

    def encode(self, images, train: bool = False):
        return self.encoder(images, train)

    def decode_train(self, src, text, train: bool = False):
        return self.decoder(src, text, deterministic=not train)

    def precompute_src(self, src):
        return self.decoder.precompute_src(src)

    def decode_step(self, token, pos, src_kv, cache, deterministic: bool = True):
        return self.decoder.step(token, pos, src_kv, cache, deterministic)

    # ---- module-free helpers -------------------------------------------
    supports_fast_decode = True  # decoding/fast_step.py weight fusion

    def cache_spec(self) -> Tuple[int, int, int]:
        """(layer_num, head_num, hidden_dim) for cache allocation."""
        return self.dec_layer_num, self.dec_head_num, self.dec_hidden_dim

    def init_decode_cache(self, batch: int, max_steps: int):
        from p4fr_tpu.models.common import empty_cache

        return empty_cache(
            self.dec_layer_num, batch, max_steps, self.dec_head_num,
            self.dec_hidden_dim, self.dtype,
        )


def satrn_from_options(options, num_classes: int, pad_id: int, sos_id: int,
                       dtype=jnp.float32) -> SATRN:
    """Build a SATRN from a reference-schema config node."""
    backbone = "efficientnetv2s" if options.network == "EfficientSATRN" else "shallow"
    tpu = options.get("tpu")
    parity = bool(tpu.get("reference_parity", True)) if tpu is not None else True
    return SATRN(
        num_classes=num_classes,
        pad_id=pad_id,
        sos_id=sos_id,
        input_height=options.input_size.height,
        input_width=options.input_size.width,
        enc_hidden_dim=options.SATRN.encoder.hidden_dim,
        enc_filter_dim=options.SATRN.encoder.filter_dim,
        enc_layer_num=options.SATRN.encoder.layer_num,
        enc_head_num=options.SATRN.encoder.head_num,
        dec_src_dim=options.SATRN.decoder.src_dim,
        dec_hidden_dim=options.SATRN.decoder.hidden_dim,
        dec_filter_dim=options.SATRN.decoder.filter_dim,
        dec_layer_num=options.SATRN.decoder.layer_num,
        dec_head_num=options.SATRN.decoder.head_num,
        dropout=options.dropout_rate,
        dtype=dtype,
        backbone=backbone,
        reference_parity=parity,
        backbone_stages=(
            tuple(tuple(r) for r in stages) if (stages := getattr(
                options.SATRN.encoder, "backbone_stages", None
            )) is not None else None
        ),
    )
