"""LSTM cells & stacks with torch-compatible parameterization.

The ASTER family needs (reference: networks/EfficientASTER.py:78-179):

- a 2-layer bidirectional LSTM over the width axis of CNN features
  (torch ``nn.LSTM(input, hidden, num_layers=2, bidirectional=True)``);
- per-step ``LSTMCell``s inside the attention decoder.

Parameters follow the torch layout exactly — ``w_ih [4H, in]``,
``w_hh [4H, H]``, two bias vectors, gate order (i, f, g, o) — so reference
``.pth`` weights convert 1:1 and semantics are bit-compatible. The
sequence LSTM runs as a ``lax.scan`` over time; the matmuls batch onto the
MXU.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

State = Tuple[jnp.ndarray, jnp.ndarray]  # (h, c)


class TorchLSTMCell(nn.Module):
    """torch.nn.LSTMCell semantics and parameter layout."""

    hidden_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, state: State) -> State:
        h, c = state
        in_dim = x.shape[-1]
        k = 1.0 / (self.hidden_dim ** 0.5)
        init = nn.initializers.uniform(scale=2 * k)  # torch U(-k, k) shifted

        def u(key, shape, dtype=jnp.float32):
            # uniform(-k, k): flax uniform is [0, scale); shift manually
            return init(key, shape, dtype) - k

        w_ih = self.param("weight_ih", u, (4 * self.hidden_dim, in_dim))
        w_hh = self.param("weight_hh", u, (4 * self.hidden_dim, self.hidden_dim))
        b_ih = self.param("bias_ih", u, (4 * self.hidden_dim,))
        b_hh = self.param("bias_hh", u, (4 * self.hidden_dim,))

        gates = (
            x.astype(self.dtype) @ w_ih.T.astype(self.dtype)
            + h.astype(self.dtype) @ w_hh.T.astype(self.dtype)
            + (b_ih + b_hh).astype(self.dtype)
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = nn.sigmoid(i), nn.sigmoid(f), nn.sigmoid(o)
        g = jnp.tanh(g)
        new_c = f * c + i * g
        new_h = o * jnp.tanh(new_c)
        return new_h, new_c


class LSTMLayer(nn.Module):
    """Unidirectional sequence LSTM (one torch layer/direction)."""

    hidden_dim: int
    reverse: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: jnp.ndarray) -> jnp.ndarray:
        """xs [B, T, in] -> hs [B, T, H]."""
        b = xs.shape[0]
        cell = TorchLSTMCell(self.hidden_dim, dtype=self.dtype, name="cell")
        h0 = jnp.zeros((b, self.hidden_dim), self.dtype)
        c0 = jnp.zeros((b, self.hidden_dim), self.dtype)

        def body(mdl, carry, x):
            new = cell(x, carry)
            return new, new[0]

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
            reverse=self.reverse,
        )
        _, hs = scan(self, (h0, c0), xs)
        return hs


class BiLSTM(nn.Module):
    """torch nn.LSTM(num_layers, bidirectional=True), batch-second inputs
    already transposed to [B, T, in]. Output concat [B, T, 2H]."""

    hidden_dim: int
    num_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: jnp.ndarray) -> jnp.ndarray:
        out = xs
        for layer in range(self.num_layers):
            fwd = LSTMLayer(
                self.hidden_dim, dtype=self.dtype, name=f"l{layer}_fwd"
            )(out)
            bwd = LSTMLayer(
                self.hidden_dim, reverse=True, dtype=self.dtype,
                name=f"l{layer}_bwd",
            )(out)
            out = jnp.concatenate([fwd, bwd], axis=-1)
        return out
