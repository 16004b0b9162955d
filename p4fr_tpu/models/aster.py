"""EfficientASTER: CNN+BLSTM encoder, additive-attention LSTM decoder.

TPU-native rebuild of the reference ASTER family (reference:
networks/EfficientASTER.py):

- ``DeepCNN``: EfficientNetV2-S blocks + height-collapsing conv/pool tail
  -> a width-axis feature sequence [B, W', 384] (EfficientASTER.py:21-75;
  the reference defines a ``conv2`` stage it never calls in forward — we
  simply don't have one);
- encoder: 2-layer bidirectional LSTM + linear projection
  (EfficientASTER.py:158-179);
- decoder: Bahdanau-style additive attention
  ``score = w . tanh(i2h(src) + h2h(h))`` feeding stacked LSTMCells over
  ``[context; embedding]`` (EfficientASTER.py:78-155, 182-330).

Unified decode contract: ``precompute_src`` caches the ``i2h`` projection
of the encoder memory (the reference recomputes it every step); the AR
state is the stack of LSTM (h, c) pairs carried through ``lax.scan``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from p4fr_tpu.models.efficientnetv2 import EfficientNetV2Blocks, _bn
from p4fr_tpu.ops.lstm import BiLSTM, TorchLSTMCell


def _tail_bn(train: bool, name: str, dtype):
    """convRelu-tail BatchNorm: the reference builds these with plain
    ``nn.BatchNorm2d`` (EfficientASTER.py:68) -> torch defaults
    eps=1e-5, unlike the stem/backbone BNs' explicit eps=1e-3."""
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        dtype=dtype, name=name,
    )


class DeepCNN(nn.Module):
    """EfficientNetV2-S blocks + height-collapse tail -> [B, W', 384].

    ``backbone_stages`` (default: full V2-S) swaps in a reduced stage
    list with identical block semantics/naming."""

    dtype: jnp.dtype = jnp.float32
    backbone_stages: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # stem: torch Conv2d(k3, s2, pad 0) -> VALID
        x = nn.Conv(24, (3, 3), strides=2, padding="VALID", use_bias=False,
                    dtype=self.dtype, name="conv_stem")(x)
        x = _bn(train, "bn1", self.dtype)(x)
        x = nn.silu(x)
        blocks_kw = (
            {} if self.backbone_stages is None
            else {"stages": tuple(tuple(r) for r in self.backbone_stages)}
        )
        x = EfficientNetV2Blocks(
            dtype=self.dtype, name="blocks", **blocks_kw
        )(x, train)
        # pooling1: MaxPool k2 s(2,1) pad (0,1)
        x = nn.max_pool(
            x, (2, 2), strides=(2, 1), padding=((0, 0), (1, 1))
        )
        # conv1 = convRelu(i=4): k3 s1 p1, 256->384, BN+ReLU
        x = nn.Conv(384, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x)
        x = _tail_bn(train, "conv1_bn", self.dtype)(x)
        x = nn.relu(x)
        # pooling2: MaxPool k2 s(2,1) pad (0,1)
        x = nn.max_pool(
            x, (2, 2), strides=(2, 1), padding=((0, 0), (1, 1))
        )
        # conv3 = convRelu(i=6): k2 s1 p0, 384->384, BN+ReLU -> height 1
        x = nn.Conv(384, (2, 2), padding="VALID", dtype=self.dtype,
                    name="conv3")(x)
        x = _tail_bn(train, "conv3_bn", self.dtype)(x)
        x = nn.relu(x)
        # [B, H'=1, W', C] -> [B, W', C*H']  (reference view(b, c*h, w))
        b, h, w, c = x.shape
        return x.transpose(0, 2, 3, 1).reshape(b, w, c * h)


class ASTEREncoder(nn.Module):
    hidden_dim: int
    dtype: jnp.dtype = jnp.float32
    backbone_stages: Any = None

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = DeepCNN(dtype=self.dtype, name="cnn",
                    backbone_stages=self.backbone_stages)(images, train)
        x = BiLSTM(self.hidden_dim, num_layers=2, dtype=self.dtype,
                   name="blstm")(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="proj")(x)
        return x  # [B, W', H]


class AttentionCell(nn.Module):
    """Additive attention + stacked LSTMCells (EfficientASTER.py:78-155)."""

    src_dim: int
    hidden_dim: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.i2h = nn.Dense(self.hidden_dim, use_bias=False, dtype=self.dtype)
        self.h2h = nn.Dense(self.hidden_dim, dtype=self.dtype)
        self.score = nn.Dense(1, use_bias=False, dtype=self.dtype)
        self.cells = [
            TorchLSTMCell(self.hidden_dim, dtype=self.dtype, name=f"cell{i}")
            for i in range(self.num_layers)
        ]

    def project_src(self, src: jnp.ndarray) -> jnp.ndarray:
        """i2h(src) [B, L, H] — precomputed once per sequence."""
        return self.i2h(src)

    def __call__(
        self,
        hidden: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...],
        src: jnp.ndarray,
        src_proj: jnp.ndarray,
        embedded: jnp.ndarray,
    ):
        """One attention+LSTM step.

        hidden: per-layer (h, c); src [B,L,C]; src_proj = i2h(src);
        embedded [B,E]. Returns (new_hidden, alpha).
        """
        top_h = hidden[-1][0]
        prev_proj = self.h2h(top_h)[:, None, :]  # [B,1,H]
        logit = self.score(jnp.tanh(src_proj + prev_proj))  # [B,L,1]
        alpha = nn.softmax(logit, axis=1)
        context = jnp.sum(alpha * src, axis=1)  # [B,C]
        x = jnp.concatenate([context, embedded], axis=1)
        new_hidden = []
        for i, cell in enumerate(self.cells):
            h, c = cell(x, hidden[i])
            new_hidden.append((h, c))
            x = h
        return tuple(new_hidden), alpha


class ASTER(nn.Module):
    """Encoder-decoder ASTER following the unified model contract."""

    supports_fast_lstm_decode = True  # decoding/fast_aster.py weight fusion

    num_classes: int
    pad_id: int
    sos_id: int
    src_dim: int
    hidden_dim: int
    embedding_dim: int
    layer_num: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    backbone_stages: Any = None

    def setup(self):
        self.encoder = ASTEREncoder(self.hidden_dim, dtype=self.dtype,
                                    backbone_stages=self.backbone_stages)
        # Reference quirk: embedding table has num_classes + 1 rows.
        self.embedding = nn.Embed(
            self.num_classes + 1, self.embedding_dim, dtype=self.dtype
        )
        self.attention_cell = AttentionCell(
            src_dim=self.src_dim,
            hidden_dim=self.hidden_dim,
            num_layers=self.layer_num,
            dtype=self.dtype,
        )
        self.generator = nn.Dense(self.num_classes, dtype=self.dtype)

    # ---- unified contract -------------------------------------------------
    def encode(self, images, train: bool = False):
        return self.encoder(images, train)

    def precompute_src(self, src):
        return {"src": src, "proj": self.attention_cell.project_src(src)}

    def init_decode_cache(self, batch: int, max_steps: int):
        """Per-layer (h, c) zeros — the AR carry."""
        z = jnp.zeros((batch, self.hidden_dim), self.dtype)
        return tuple((z, z) for _ in range(self.layer_num))

    def decode_step(self, token, pos, src_kv, cache, deterministic: bool = True):
        del pos, deterministic  # position-free decoder; no dropout inside
        embedded = self.embedding(token)
        hidden, _ = self.attention_cell(
            cache, src_kv["src"], src_kv["proj"], embedded
        )
        logits = self.generator(hidden[-1][0])
        return logits, hidden

    def decode_train(self, src, text, train: bool = False):
        """Teacher-forced scan over the GT prefix (reference
        ASTERDecoder.forward is_train branch), compiled as one lax.scan."""
        src_kv = self.precompute_src(src)
        hidden = self.init_decode_cache(text.shape[0], text.shape[1])

        def body(mdl, carry, tok):
            embedded = mdl.embedding(tok)
            new_hidden, _ = mdl.attention_cell(
                carry, src_kv["src"], src_kv["proj"], embedded
            )
            return new_hidden, mdl.generator(new_hidden[-1][0])

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=1,
            out_axes=1,
        )
        _, outs = scan(self, hidden, text)
        return outs

    def __call__(self, images, text, train: bool = False):
        src = self.encode(images, train)
        return self.decode_train(src, text, train)

    def cache_spec(self):
        """(layer_num, 1, hidden_dim) — kept for interface compatibility."""
        return self.layer_num, 1, self.hidden_dim


def aster_from_options(options, num_classes, pad_id, sos_id, dtype=jnp.float32):
    stages = getattr(options.ASTER, "backbone_stages", None)
    if stages is not None:
        stages = tuple(tuple(r) for r in stages)
    return ASTER(
        num_classes=num_classes,
        pad_id=pad_id,
        sos_id=sos_id,
        src_dim=options.ASTER.src_dim,
        hidden_dim=options.ASTER.hidden_dim,
        embedding_dim=options.ASTER.embedding_dim,
        layer_num=options.ASTER.layer_num,
        dropout=options.dropout_rate,
        dtype=dtype,
        backbone_stages=stages,
    )
