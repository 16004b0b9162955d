"""Shared transformer-decoder stack for the SATRN family (+ SwinTRN).

Rebuilds the behavior of the reference decoder (reference:
networks/EfficientSATRN.py:330-557 / LiteSATRN.py:307-545 /
SWIN.py:922-1021) as TPU-first flax modules:

- teacher-forced full-sequence path: one causal+pad masked pass, MXU-sized
  matmuls, static shapes;
- autoregressive path: a single-token ``step`` designed to run under
  ``lax.scan`` with a **preallocated** per-layer K/V cache (the reference
  instead concatenates a growing ``features[l]`` list per step —
  EfficientSATRN.py:539-557 — which is host-orchestrated and O(t) realloc);
- cross-attention K/V over the encoder memory are projected ONCE per
  sequence (``precompute_src``), not per step like the reference.

Reference-parity quirks kept (toggleable via ``cache_outputs``):

- During AR decode the reference caches each layer's **outputs** and uses
  them as that same layer's self-attention K/V for later steps, which
  differs from the teacher-forced path where K/V are the layer's *inputs*
  (EfficientSATRN.py:546-548). ``cache_outputs=True`` reproduces this.
- Positional encoding at step ``t`` indexes the PE table directly and does
  NOT apply dropout (PositionEncoder1D.forward point!=-1 branch).
- Token embeddings are scaled by sqrt(hidden_dim); the embedding table has
  ``num_classes + 1`` rows (EfficientSATRN.py:480-483).
- The feed-forward applies ReLU+dropout after BOTH linears
  (EfficientSATRN.py:326-345).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from p4fr_tpu.ops.attention import MultiHeadAttention
from p4fr_tpu.ops.posenc import sinusoid_interleaved

LayerCache = Dict[str, jnp.ndarray]  # {'k': [B,L,h,dh], 'v': [B,L,h,dh]}
SrcKV = Dict[str, jnp.ndarray]


class Feedforward(nn.Module):
    """Position-wise FF with the reference's double-ReLU quirk."""

    filter_dim: int
    hidden_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dense(self.filter_dim, dtype=self.dtype, name="linear0")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="linear1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class TransformerDecoderLayer(nn.Module):
    """Post-norm decoder layer: masked self-attn, cross-attn, FF."""

    hidden_dim: int
    src_dim: int
    filter_dim: int
    head_num: int
    dropout: float = 0.1
    # Reference quirk: every transformer family constructs the decoder
    # Feedforward WITHOUT a dropout argument, so the class default 0.1
    # applies regardless of the configured dropout_rate
    # (networks/LiteSATRN.py:350-352, EfficientSATRN.py:369-371,
    # SWIN.py:864-866) — the FF leg is pinned separately from `dropout`.
    ff_dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    cache_outputs: bool = True  # reference AR-cache semantics

    def setup(self):
        self.self_attention = MultiHeadAttention(
            q_dim=self.hidden_dim,
            k_dim=self.hidden_dim,
            head_num=self.head_num,
            dropout=self.dropout,
            dtype=self.dtype,
            name="self_attention",
        )
        self.self_attention_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.cross_attention = MultiHeadAttention(
            q_dim=self.hidden_dim,
            k_dim=self.src_dim,
            head_num=self.head_num,
            dropout=self.dropout,
            dtype=self.dtype,
            name="cross_attention",
        )
        self.cross_attention_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.feedforward = Feedforward(
            filter_dim=self.filter_dim,
            hidden_dim=self.hidden_dim,
            dropout=self.ff_dropout,
            dtype=self.dtype,
        )
        self.feedforward_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)

    def __call__(
        self,
        tgt: jnp.ndarray,
        src: jnp.ndarray,
        tgt_mask: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Teacher-forced full-sequence pass. tgt [B,L,H], src [B,S,C]."""
        att = self.self_attention(tgt, tgt, tgt, tgt_mask, deterministic)
        out = self.self_attention_norm(att + tgt)
        att = self.cross_attention(out, src, src, None, deterministic)
        out = self.cross_attention_norm(att + out)
        ff = self.feedforward(out, deterministic)
        return self.feedforward_norm(ff + out)

    def project_src(self, src: jnp.ndarray) -> SrcKV:
        """Project encoder memory to this layer's cross K/V once."""
        k, v = self.cross_attention.project_kv(src)
        return {"k": k, "v": v}

    def step(
        self,
        tgt: jnp.ndarray,
        src_kv: SrcKV,
        pos: jnp.ndarray,
        cache: LayerCache,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, LayerCache]:
        """One AR step. tgt [B,1,H]; pos scalar int; cache slots [B,Lmax,h,dh].

        Slot ``pos`` is filled with the current *input*'s K/V for this
        step's attention, then (reference parity) overwritten with the
        layer *output*'s K/V for future steps.
        """
        k_cur, v_cur = self.self_attention.project_kv(tgt)
        k_all = cache["k"].at[:, pos].set(k_cur[:, 0])
        v_all = cache["v"].at[:, pos].set(v_cur[:, 0])
        max_len = k_all.shape[1]
        ban = (jnp.arange(max_len) > pos)[None, None, None, :]

        q = self.self_attention.project_q(tgt)
        att = self.self_attention.attend(q, k_all, v_all, ban, deterministic)
        out = self.self_attention_norm(att + tgt)

        q2 = self.cross_attention.project_q(out)
        att = self.cross_attention.attend(
            q2, src_kv["k"], src_kv["v"], None, deterministic
        )
        out = self.cross_attention_norm(att + out)

        ff = self.feedforward(out, deterministic=deterministic)
        out = self.feedforward_norm(ff + out)

        if self.cache_outputs:
            k_o, v_o = self.self_attention.project_kv(out)
            k_all = k_all.at[:, pos].set(k_o[:, 0])
            v_all = v_all.at[:, pos].set(v_o[:, 0])
        return out, {"k": k_all, "v": v_all}


class TransformerDecoder(nn.Module):
    """Embedding + 1D-PE + N decoder layers + generator head."""

    num_classes: int
    src_dim: int
    hidden_dim: int
    filter_dim: int
    head_num: int
    layer_num: int
    pad_id: int
    sos_id: int
    dropout: float = 0.1
    ff_dropout: float = 0.1  # reference FF-default quirk; see layer note
    dtype: jnp.dtype = jnp.float32
    cache_outputs: bool = True
    pe_max_len: int = 500

    def setup(self):
        # Reference quirk: embedding table has num_classes + 1 rows.
        self.embedding = nn.Embed(
            self.num_classes + 1, self.hidden_dim, dtype=self.dtype
        )
        self.pos_encoding = jnp.asarray(
            sinusoid_interleaved(self.pe_max_len, self.hidden_dim)
        )
        self.pe_dropout = nn.Dropout(self.dropout)
        self.layers = [
            TransformerDecoderLayer(
                hidden_dim=self.hidden_dim,
                src_dim=self.src_dim,
                filter_dim=self.filter_dim,
                head_num=self.head_num,
                dropout=self.dropout,
                ff_dropout=self.ff_dropout,
                dtype=self.dtype,
                cache_outputs=self.cache_outputs,
                name=f"layer{i}",
            )
            for i in range(self.layer_num)
        ]
        self.generator = nn.Dense(self.num_classes, dtype=self.dtype)

    def _embed(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return self.embedding(tokens) * math.sqrt(self.hidden_dim)

    def __call__(
        self, src: jnp.ndarray, text: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        """Teacher-forced logits. src [B,S,C], text [B,L] -> [B,L,V].

        Mask = key-side pad mask (position 0 never masked, reference
        pad_mask quirk) OR causal order mask.
        """
        b, length = text.shape
        tgt = self._embed(text) + self.pos_encoding[None, :length, :].astype(
            self.dtype
        )
        tgt = self.pe_dropout(tgt, deterministic=deterministic)
        pad = text == self.pad_id
        pad = pad.at[:, 0].set(False)
        causal = jnp.triu(jnp.ones((length, length), bool), k=1)
        mask = pad[:, None, :] | causal[None, :, :]
        for layer in self.layers:
            tgt = layer(tgt, src, mask, deterministic)
        return self.generator(tgt)

    def precompute_src(self, src: jnp.ndarray) -> Tuple[SrcKV, ...]:
        """Per-layer cross-attention K/V, projected once per sequence."""
        return tuple(layer.project_src(src) for layer in self.layers)

    def step(
        self,
        token: jnp.ndarray,
        pos: jnp.ndarray,
        src_kv: Tuple[SrcKV, ...],
        cache: Tuple[LayerCache, ...],
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Tuple[LayerCache, ...]]:
        """One AR step: token [B] -> logits [B, V] + updated caches.

        PE is indexed at ``pos`` with no dropout (reference point-indexing
        branch).
        """
        tgt = self._embed(token[:, None])
        tgt = tgt + self.pos_encoding[pos][None, None, :].astype(self.dtype)
        new_cache = []
        for i, (layer, layer_cache) in enumerate(zip(self.layers, cache)):
            tgt, layer_cache = layer.step(
                tgt, src_kv[i], pos, layer_cache, deterministic
            )
            new_cache.append(layer_cache)
        logits = self.generator(tgt[:, 0])
        return logits, tuple(new_cache)

    def init_cache(self, batch: int, max_len: int) -> Tuple[LayerCache, ...]:
        """Preallocated zeroed K/V cache pytree (no params touched)."""
        head_dim = self.hidden_dim // self.head_num
        shape = (batch, max_len, self.head_num, head_dim)
        return tuple(
            {
                "k": jnp.zeros(shape, self.dtype),
                "v": jnp.zeros(shape, self.dtype),
            }
            for _ in range(self.layer_num)
        )


def empty_cache(
    layer_num: int,
    batch: int,
    max_len: int,
    head_num: int,
    hidden_dim: int,
    dtype=jnp.float32,
) -> Tuple[LayerCache, ...]:
    """Module-free cache constructor (usable outside apply)."""
    head_dim = hidden_dim // head_num
    shape = (batch, max_len, head_num, head_dim)
    return tuple(
        {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
        for _ in range(layer_num)
    )
