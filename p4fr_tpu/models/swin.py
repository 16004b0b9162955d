"""SwinTRN: Swin-Transformer encoder + transformer decoder.

TPU-native rebuild of the reference SWIN model (reference:
networks/SWIN.py): the encoder is a standard Swin-base-384 (patch 4,
embed 128, depths [2,2,18,2], heads [4,8,16,32], window 12 — Liu et al.
2021) producing a [B, 144, 1024] token memory; the decoder is the same
transformer decoder as the SATRN family (SWIN.py:922-1021 duplicates it),
so ``models.common.TransformerDecoder`` is reused directly.

Swin specifics implemented natively for XLA:

- window partition/reverse as pure reshapes/transposes (static shapes);
- relative position bias via a static index table into a learned
  [(2w-1)^2, nH] parameter;
- shifted windows via ``jnp.roll`` with a precomputed additive attention
  mask per (resolution, shift);
- PatchMerging as space-to-depth + LayerNorm + Linear(4C->2C, no bias);
- stochastic depth on residual branches in train mode only.

The reference downloads swin_base_384_22k weights at construction
(SWIN.py:1028-1034); here pretrained weights arrive offline through
``utils/convert_pth.py``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from p4fr_tpu.models.common import TransformerDecoder


def window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nW, w*w, C]."""
    b, h, ww, c = x.shape
    x = x.reshape(b, h // w, w, ww // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def window_reverse(windows: jnp.ndarray, w: int, h: int, ww: int) -> jnp.ndarray:
    """[B*nW, w*w, C] -> [B, H, W, C]."""
    b = windows.shape[0] // ((h // w) * (ww // w))
    x = windows.reshape(b, h // w, ww // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, ww, -1)


def relative_position_index(w: int) -> np.ndarray:
    """Static [w*w, w*w] index into the (2w-1)^2 bias table."""
    coords = np.stack(
        np.meshgrid(np.arange(w), np.arange(w), indexing="ij")
    )  # [2, w, w]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, ww, ww]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def shift_attn_mask(h: int, ww: int, w: int, shift: int) -> np.ndarray:
    """Additive mask [nW, w*w, w*w] for shifted-window attention."""
    img = np.zeros((1, h, ww, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    windows = np.reshape(
        np.transpose(
            img.reshape(1, h // w, w, ww // w, w, 1), (0, 1, 3, 2, 4, 5)
        ),
        (-1, w * w),
    )
    diff = windows[:, None, :] - windows[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class DropPath(nn.Module):
    """Per-sample stochastic depth on a residual branch."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


# Window-attention implementation switch: "auto" takes the fused Pallas
# kernel (ops/pallas/swin_attention.py — scores/softmax stay in VMEM; the
# r4 trace showed the XLA path materializes ~27 ms of [nB,h,144,144]
# score tensors per B=32 encoder batch) whenever dropout is inactive;
# "jnp" forces the reference-shaped XLA path (training with attn_drop,
# oracle tests). Module-wide so benches can A/B the full encoder.
WINDOW_ATTN = "auto"


def _fused_attention_applies(deterministic: bool, attn_drop: float) -> bool:
    if WINDOW_ATTN == "jnp":
        return False
    if not (deterministic or attn_drop == 0.0):
        return False  # active attention dropout needs the jnp path
    import jax

    return jax.default_backend() == "tpu" or WINDOW_ATTN == "fused_interpret"


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (SWIN.py:84-209 semantics)."""

    dim: int
    window: int
    num_heads: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [nB, w*w, C]
        mask: Optional[jnp.ndarray],  # [nW, w*w, w*w] additive or None
        deterministic: bool = True,
    ) -> jnp.ndarray:
        nb, n, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        scale = head_dim ** -0.5

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, self.num_heads),
        )
        idx = relative_position_index(self.window).reshape(-1)
        bias = table[idx].reshape(n, n, self.num_heads)

        if _fused_attention_applies(deterministic, self.attn_drop):
            # fused path: the raw [nB, n, 3C] projection output goes
            # straight into the kernel (no q/k/v extraction copies, no
            # q*scale copy; scores/bias/mask/softmax/AV run in VMEM)
            from p4fr_tpu.ops.pallas.swin_attention import (
                fused_window_attention,
            )

            out = fused_window_attention(
                qkv, bias.transpose(2, 0, 1), mask,
                heads=self.num_heads, scale=scale,
                interpret=WINDOW_ATTN == "fused_interpret",
            )
        else:
            qkv = qkv.reshape(nb, n, 3, self.num_heads, head_dim)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
            attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)

            if mask is not None:
                nw = mask.shape[0]
                attn = attn.reshape(nb // nw, nw, self.num_heads, n, n)
                attn = attn + mask[None, :, None, :, :].astype(attn.dtype)
                attn = attn.reshape(nb, self.num_heads, n, n)
            attn = nn.softmax(attn, axis=-1)
            attn = nn.Dropout(self.attn_drop)(
                attn, deterministic=deterministic
            )
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(nb, n, c)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class SwinBlock(nn.Module):
    dim: int
    resolution: Tuple[int, int]
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h, ww = self.resolution
        b, l, c = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x.reshape(b, h, ww, c)
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(shift_attn_mask(h, ww, self.window, self.shift))
        else:
            mask = None
        windows = window_partition(x, self.window)
        attn = WindowAttention(
            dim=self.dim,
            window=self.window,
            num_heads=self.num_heads,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            dtype=self.dtype,
            name="attn",
        )(windows, mask, deterministic)
        x = window_reverse(attn, self.window, h, ww)
        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = x.reshape(b, l, c)
        x = shortcut + DropPath(self.drop_path, name="drop_path1")(
            x, deterministic
        )

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dropout(self.drop)(y, deterministic=deterministic)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        y = nn.Dropout(self.drop)(y, deterministic=deterministic)
        return x + DropPath(self.drop_path, name="drop_path2")(y, deterministic)


class PatchMerging(nn.Module):
    dim: int
    resolution: Tuple[int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, ww = self.resolution
        b, l, c = x.shape
        x = x.reshape(b, h, ww, c)
        # torch order: x0=[0::2,0::2], x1=[1::2,0::2], x2=[0::2,1::2], x3=[1::2,1::2]
        x = jnp.concatenate(
            [
                x[:, 0::2, 0::2, :],
                x[:, 1::2, 0::2, :],
                x[:, 0::2, 1::2, :],
                x[:, 1::2, 1::2, :],
            ],
            axis=-1,
        ).reshape(b, (h // 2) * (ww // 2), 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class SwinEncoder(nn.Module):
    """Swin-base-384 feature extractor -> [B, 144, 1024]."""

    img_size: int = 384
    patch_size: int = 4
    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    window: int = 12
    drop_path_rate: float = 0.1
    # the reference SWIN builds its SwinTransformer with ape=True
    # (networks/SWIN.py:1028-1034): a LEARNED absolute position embedding
    # added after the patch norm. The hub checkpoint carries no such key
    # (strict=False load leaves it trunc-normal-initialized), so it is
    # train-time-learned state a converted checkpoint must preserve —
    # dropping it (the pre-r5 behavior) silently corrupts trained SWIN
    # imports.
    ape: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        deterministic = not train
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim, (p, p), strides=p, padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(images)
        b, h, ww, c = x.shape
        x = x.reshape(b, h * ww, c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)
        if self.ape:
            pe = self.param(
                "absolute_pos_embed",
                nn.initializers.truncated_normal(stddev=0.02),
                (1, h * ww, self.embed_dim), jnp.float32,
            )
            x = x + pe.astype(self.dtype)

        total_blocks = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total_blocks)
        block_idx = 0
        res = (h, ww)
        dim = self.embed_dim
        for stage, depth in enumerate(self.depths):
            window = min(self.window, res[0], res[1])
            for i in range(depth):
                shift = 0 if i % 2 == 0 else (
                    0 if min(res) <= window else window // 2
                )
                x = SwinBlock(
                    dim=dim,
                    resolution=res,
                    num_heads=self.num_heads[stage],
                    window=window,
                    shift=shift,
                    drop_path=float(dpr[block_idx]),
                    dtype=self.dtype,
                    name=f"stage{stage}_block{i}",
                )(x, deterministic)
                block_idx += 1
            if stage < len(self.depths) - 1:
                x = PatchMerging(
                    dim=dim, resolution=res, dtype=self.dtype,
                    name=f"stage{stage}_merge",
                )(x)
                res = (res[0] // 2, res[1] // 2)
                dim *= 2
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


class SwinTRN(nn.Module):
    """Swin encoder + shared transformer decoder (unified contract)."""

    num_classes: int
    pad_id: int
    sos_id: int
    input_height: int
    input_width: int
    dec_src_dim: int
    dec_hidden_dim: int
    dec_filter_dim: int
    dec_layer_num: int
    dec_head_num: int
    dropout: float = 0.1
    # decoder-FF dropout pinned at the reference default 0.1 (SWIN.py:864)
    ff_dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    reference_parity: bool = True
    # encoder architecture (defaults = Swin-B/384, the reference's
    # swin_base_patch4_window12_384_22k; SWIN.py:1028-1034)
    enc_embed_dim: int = 128
    enc_depths: Sequence[int] = (2, 2, 18, 2)
    enc_num_heads: Sequence[int] = (4, 8, 16, 32)
    enc_window: int = 12
    enc_drop_path_rate: float = 0.1
    enc_ape: bool = True

    def setup(self):
        self.encoder = SwinEncoder(
            img_size=self.input_height,
            embed_dim=self.enc_embed_dim,
            depths=tuple(self.enc_depths),
            num_heads=tuple(self.enc_num_heads),
            window=self.enc_window,
            drop_path_rate=self.enc_drop_path_rate,
            ape=self.enc_ape,
            dtype=self.dtype,
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

    supports_fast_decode = True  # decoding/fast_step.py weight fusion

    def cache_spec(self):
        return self.dec_layer_num, self.dec_head_num, self.dec_hidden_dim

    def init_decode_cache(self, batch: int, max_steps: int):
        from p4fr_tpu.models.common import empty_cache

        return empty_cache(
            self.dec_layer_num, batch, max_steps, self.dec_head_num,
            self.dec_hidden_dim, self.dtype,
        )


def swin_from_options(options, num_classes, pad_id, sos_id, dtype=jnp.float32):
    tpu = options.get("tpu")
    parity = bool(tpu.get("reference_parity", True)) if tpu is not None else True
    swin_cfg = options.get("SWIN")
    enc_kwargs = {}
    if swin_cfg is not None:
        for yaml_key, field in (
            ("embed_dim", "enc_embed_dim"), ("depths", "enc_depths"),
            ("num_heads", "enc_num_heads"), ("window", "enc_window"),
            ("drop_path_rate", "enc_drop_path_rate"),
            ("ape", "enc_ape"),
        ):
            val = swin_cfg.get(yaml_key)
            if val is not None:
                enc_kwargs[field] = (
                    tuple(val) if isinstance(val, (list, tuple)) else val
                )
    return SwinTRN(
        **enc_kwargs,
        num_classes=num_classes,
        pad_id=pad_id,
        sos_id=sos_id,
        input_height=options.input_size.height,
        input_width=options.input_size.width,
        dec_src_dim=options.SATRN.decoder.src_dim,
        dec_hidden_dim=options.SATRN.decoder.hidden_dim,
        dec_filter_dim=options.SATRN.decoder.filter_dim,
        dec_layer_num=options.SATRN.decoder.layer_num,
        dec_head_num=options.SATRN.decoder.head_num,
        dropout=options.dropout_rate,
        dtype=dtype,
        reference_parity=parity,
    )
