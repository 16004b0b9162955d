"""Multi-head attention, TPU-first.

Semantics match the reference MHA (reference:
networks/EfficientSATRN.py:157-238) so converted checkpoints reproduce
outputs exactly:

- q/k/v/out projections are biased Dense layers;
- scores are scaled by ``1/sqrt(d_model)`` — the reference uses
  ``temperature=(head_num*head_dim)**0.5``, i.e. the FULL model dim, not
  the per-head dim (a quirk we must keep for parity);
- masks are boolean with ``True = banned`` and are applied pre-softmax as
  an additive large-negative.

Design notes (TPU): all shapes static; the einsums lower onto the MXU; for
incremental decode the *projected* K/V live in a preallocated cache so each
step is O(1) projection + one [B,h,1,L]x[B,h,L,dh] matmul. Attention-prob
dropout from the reference is applied identically in train mode.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -1e9


def masked_softmax(scores: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Softmax over the last axis with a boolean ban-mask (True = banned)."""
    if mask is not None:
        scores = jnp.where(mask, jnp.asarray(NEG_INF, scores.dtype), scores)
    return nn.softmax(scores, axis=-1)


class MultiHeadAttention(nn.Module):
    """Reference-parity multi-head attention.

    Attributes:
      q_dim: model dim of queries (and of the output).
      k_dim: model dim of keys/values input.
      head_num: number of heads; head_dim = q_dim // head_num.
      dropout: dropout rate on attention probs and on the output.
      dtype: compute dtype (params stay float32).
    """

    q_dim: int
    k_dim: int
    head_num: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.head_dim = self.q_dim // self.head_num
        inner = self.head_num * self.head_dim
        dense = lambda name: nn.Dense(  # noqa: E731
            inner, dtype=self.dtype, name=name
        )
        self.q_linear = dense("q_linear")
        self.k_linear = nn.Dense(inner, dtype=self.dtype, name="k_linear")
        self.v_linear = nn.Dense(inner, dtype=self.dtype, name="v_linear")
        self.out_linear = nn.Dense(self.q_dim, dtype=self.dtype, name="out_linear")
        self.attn_dropout = nn.Dropout(self.dropout)
        self.out_dropout = nn.Dropout(self.dropout)
        # Reference quirk: temperature is sqrt(model dim), not sqrt(head dim).
        self.temperature = float(inner) ** 0.5

    def _split_heads(self, x: jnp.ndarray) -> jnp.ndarray:
        b, l, _ = x.shape
        return x.reshape(b, l, self.head_num, self.head_dim)

    def project_q(self, q_in: jnp.ndarray) -> jnp.ndarray:
        """[B, Lq, q_dim] -> [B, Lq, h, dh]."""
        return self._split_heads(self.q_linear(q_in))

    def project_kv(self, kv_in: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[B, Lk, k_dim] -> ([B, Lk, h, dh], [B, Lk, h, dh])."""
        return self._split_heads(self.k_linear(kv_in)), self._split_heads(
            self.v_linear(kv_in)
        )

    def attend(
        self,
        q: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Attention over pre-projected heads.

        q: [B, Lq, h, dh]; k/v: [B, Lk, h, dh];
        mask: broadcastable to [B, h, Lq, Lk], True = banned.
        Returns [B, Lq, q_dim].
        """
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.asarray(
            self.temperature, q.dtype
        )
        probs = masked_softmax(scores, mask)
        probs = self.attn_dropout(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        b, lq = out.shape[0], out.shape[1]
        out = out.reshape(b, lq, self.head_num * self.head_dim)
        out = self.out_linear(out)
        return self.out_dropout(out, deterministic=deterministic)

    def __call__(
        self,
        q_in: jnp.ndarray,
        k_in: jnp.ndarray,
        v_in: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Full attention: q_in [B,Lq,q_dim], k_in/v_in [B,Lk,k_dim].

        mask: [B?, Lq?, Lk]-broadcastable boolean (True = banned); it is
        expanded over heads like the reference (mask.unsqueeze(1)).
        """
        q = self.project_q(q_in)
        k = self._split_heads(self.k_linear(k_in))
        v = self._split_heads(self.v_linear(v_in))
        if mask is not None:
            if mask.ndim == 2:  # [Lq, Lk]
                mask = mask[None, None, :, :]
            elif mask.ndim == 3:  # [B, Lq, Lk]
                mask = mask[:, None, :, :]
        return self.attend(q, k, v, mask, deterministic=deterministic)
