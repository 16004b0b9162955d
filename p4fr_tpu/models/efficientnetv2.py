"""EfficientNetV2-S feature blocks, TPU-native flax implementation.

The reference wraps timm's pretrained ``tf_efficientnetv2_s_in21ft1k``
*blocks* (reference: networks/EfficientSATRN.py:63-87 — it replaces the
stem with its own 24-channel conv and appends a 1x1 projection;
networks/EfficientASTER.py:21-48 reuses the same blocks inside DeepCNN).
This module reimplements the EfficientNetV2-S block topology (Tan & Le
2021) so those wrappers can be rebuilt and timm/.pth weights converted in.

Stages (kernel, stride, expand, channels, repeats, SE):
  0: FusedMBConv k3 s1 e1  24 x2   —        (plain conv-bn-act when e=1)
  1: FusedMBConv k3 s2 e4  48 x4   —
  2: FusedMBConv k3 s2 e4  64 x4   —
  3: MBConv      k3 s2 e4 128 x6  SE 0.25 (of block input chs)
  4: MBConv      k3 s1 e6 160 x9  SE 0.25
  5: MBConv      k3 s2 e6 256 x15 SE 0.25

BatchNorm eps 1e-3 / momentum 0.9-decay matches the TF-ported timm
weights. All activations are SiLU. NHWC throughout.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# (num_repeat, kernel, stride, expand_ratio, in_chs, out_chs, use_se, fused)
V2_S_STAGES: Tuple[Tuple[int, int, int, int, int, int, bool, bool], ...] = (
    (2, 3, 1, 1, 24, 24, False, True),
    (4, 3, 2, 4, 24, 48, False, True),
    (4, 3, 2, 4, 48, 64, False, True),
    (6, 3, 2, 4, 64, 128, True, False),
    (9, 3, 1, 6, 128, 160, True, False),
    (15, 3, 2, 6, 160, 256, True, False),
)

BN_EPS = 1e-3
BN_MOMENTUM = 0.9


def _bn(train: bool, name: str, dtype):
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM,
        epsilon=BN_EPS,
        dtype=dtype,
        name=name,
    )


# Global-average-pool implementation for the SE gates. The r4 device
# trace attributed 11.7 ms of the 53.9 ms flagship encoder batch (B=256)
# to the SE pools compiling as ``convert_reduce_fusion`` (bf16 -> f32
# VPU reduce); "matmul" performs the same spatial sum as a ones-vector
# contraction on the MXU with f32 accumulation (identical math, tree
# summation order). Toggled module-wide so examples/bench_se_pool.py can
# A/B the full encoder. MEASURED a wash e2e on v5e (55.3 vs 55.9 ms
# @ B=256 — the trace fusions carry neighbouring work, there is no free
# 11.7 ms): "reduce" stays the default.
SE_POOL = "reduce"


def _global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, 1, 1, C] spatial mean (SE_POOL selects VPU
    reduce vs MXU matmul; numerics agree to f32 accumulation order)."""
    if SE_POOL == "matmul":
        b, h, w, c = x.shape
        flat = x.reshape(b, h * w, c)
        ones = jnp.full((h * w,), 1.0 / (h * w), x.dtype)
        out = jax.lax.dot_general(
            ones, flat, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out.astype(x.dtype)[:, None, None, :]
    return jnp.mean(x, axis=(1, 2), keepdims=True)


class SqueezeExcite(nn.Module):
    """SE gate with reduction relative to the block's input channels."""

    rd_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pooled = _global_avg_pool(x)
        g = nn.Conv(self.rd_channels, (1, 1), dtype=self.dtype, name="conv_reduce")(
            pooled
        )
        g = nn.silu(g)
        g = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="conv_expand")(g)
        return x * nn.sigmoid(g)


class FusedMBConv(nn.Module):
    """Fused block: 3x3 expand conv (+1x1 project when expanded)."""

    out_chs: int
    kernel: int = 3
    stride: int = 1
    expand_ratio: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_chs = x.shape[-1]
        shortcut = x
        mid = in_chs * self.expand_ratio
        if self.expand_ratio == 1:
            # degenerate fused block == conv-bn-act
            x = nn.Conv(
                self.out_chs, (self.kernel, self.kernel),
                strides=self.stride, padding="SAME", use_bias=False,
                dtype=self.dtype, name="conv",
            )(x)
            x = _bn(train, "bn1", self.dtype)(x)
            x = nn.silu(x)
        else:
            x = nn.Conv(
                mid, (self.kernel, self.kernel), strides=self.stride,
                padding="SAME", use_bias=False, dtype=self.dtype,
                name="conv_exp",
            )(x)
            x = _bn(train, "bn1", self.dtype)(x)
            x = nn.silu(x)
            x = nn.Conv(
                self.out_chs, (1, 1), use_bias=False, dtype=self.dtype,
                name="conv_pwl",
            )(x)
            x = _bn(train, "bn2", self.dtype)(x)
        if self.stride == 1 and in_chs == self.out_chs:
            x = x + shortcut
        return x


def _fused_mbconv_mode() -> str:
    """P4FR_FUSED_MBCONV: "auto" (default — fused on TPU inference),
    "1" (force, interpret off-TPU; for parity tests), "0" (off)."""
    import os

    return os.environ.get("P4FR_FUSED_MBCONV", "auto")


class MBConv(nn.Module):
    """Inverted residual with depthwise conv and SE.

    Inference on TPU takes the fused single-launch Pallas block
    (ops/pallas/mbconv.py — whole-block VMEM residency, BNs folded;
    measured HBM-bound composed: stage4 alone is 16.6 ms of the B=256
    flagship encode) for stride-1 3x3 blocks; training, init, stride-2
    heads, and CPU keep the composed path below.
    """

    out_chs: int
    kernel: int = 3
    stride: int = 1
    expand_ratio: int = 6
    se_ratio: float = 0.25
    dtype: jnp.dtype = jnp.float32

    def _fused_ok(self, train: bool) -> bool:
        if train or self.is_initializing():
            return False
        if self.stride != 1 or self.kernel != 3:
            return False
        mode = _fused_mbconv_mode()
        if mode == "1":
            return True
        return mode == "auto" and jax.default_backend() == "tpu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self._fused_ok(train):
            from p4fr_tpu.ops.pallas.mbconv import (
                fold_mbconv_params, fused_mbconv,
            )

            variables = self.variables
            folded = fold_mbconv_params(
                variables["params"], variables["batch_stats"], x.dtype
            )
            return fused_mbconv(
                x, folded, x.shape[1], x.shape[2],
                residual=x.shape[-1] == self.out_chs,
                interpret=jax.default_backend() != "tpu",
            )
        in_chs = x.shape[-1]
        shortcut = x
        mid = in_chs * self.expand_ratio
        x = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype, name="conv_pw")(x)
        x = _bn(train, "bn1", self.dtype)(x)
        x = nn.silu(x)
        x = nn.Conv(
            mid, (self.kernel, self.kernel), strides=self.stride,
            padding="SAME", feature_group_count=mid, use_bias=False,
            dtype=self.dtype, name="conv_dw",
        )(x)
        x = _bn(train, "bn2", self.dtype)(x)
        x = nn.silu(x)
        if self.se_ratio > 0:
            rd = max(1, int(in_chs * self.se_ratio))
            x = SqueezeExcite(rd, dtype=self.dtype, name="se")(x)
        x = nn.Conv(
            self.out_chs, (1, 1), use_bias=False, dtype=self.dtype, name="conv_pwl"
        )(x)
        x = _bn(train, "bn3", self.dtype)(x)
        if self.stride == 1 and in_chs == self.out_chs:
            x = x + shortcut
        return x


class EfficientNetV2Blocks(nn.Module):
    """The six V2-S stages (timm ``m.blocks`` equivalent): 24ch in, 256ch
    out, stride /16 relative to the blocks' input.

    ``stages`` keeps the V2-S default but is configurable (same row
    schema as ``V2_S_STAGES``) so reduced-scale backbones can be built
    with identical block/naming semantics — the converter's
    ``blocks.{s}.{b}`` rules are index-generic, so any stage list
    round-trips with a same-shaped torch module tree."""

    dtype: jnp.dtype = jnp.float32
    stages: Tuple[Tuple[int, int, int, int, int, int, bool, bool], ...] = (
        V2_S_STAGES
    )

    def _chain_ok(self, train: bool) -> bool:
        """Whether eligible MBConv runs take the CHAINED fused kernel
        (one pallas_call per group, boundary activations VMEM-resident;
        ops/pallas/mbconv.fused_mbconv_chain)."""
        if train or self.is_initializing():
            return False
        mode = _fused_mbconv_mode()
        if mode == "1":
            return True
        return mode == "auto" and jax.default_backend() == "tpu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        chain_ok = self._chain_ok(train)
        run: list = []  # pending (name, residual) eligible MBConv blocks

        def flush(x):
            if not run:
                return x
            from p4fr_tpu.ops.pallas.mbconv import (
                fold_mbconv_params, fused_mbconv_chain,
            )

            variables = self.variables
            folded = [
                fold_mbconv_params(
                    variables["params"][name],
                    variables["batch_stats"][name], x.dtype,
                )
                for name, _ in run
            ]
            x = fused_mbconv_chain(
                x, folded, [r for _, r in run], x.shape[1], x.shape[2],
                interpret=jax.default_backend() != "tpu",
            )
            run.clear()
            return x

        for stage_idx, (
            repeats, kernel, stride, expand, _in, out, use_se, fused
        ) in enumerate(self.stages):
            for block_idx in range(repeats):
                name = f"stage{stage_idx}_block{block_idx}"
                s = stride if block_idx == 0 else 1
                if not fused and chain_ok and s == 1 and kernel == 3:
                    # defer: consecutive eligible MBConv blocks chain
                    # into one launch at the next flush (a stride-2
                    # head, a FusedMBConv, or the end of the stack).
                    # The residual flag uses the block's INPUT channels
                    # = the previous pending block's out (or x's).
                    in_chs = pending_chs if run else x.shape[-1]
                    run.append((name, in_chs == out))
                    pending_chs = out
                    continue
                x = flush(x)
                if fused:
                    x = FusedMBConv(
                        out_chs=out, kernel=kernel, stride=s,
                        expand_ratio=expand, dtype=self.dtype, name=name,
                    )(x, train)
                else:
                    x = MBConv(
                        out_chs=out, kernel=kernel, stride=s,
                        expand_ratio=expand,
                        se_ratio=0.25 if use_se else 0.0,
                        dtype=self.dtype, name=name,
                    )(x, train)
        return flush(x)


class EfficientNetV2Backbone(nn.Module):
    """Reference 'EfficientNet' wrapper: custom stem + V2-S blocks + 1x1
    projection to ``output_channel`` (EfficientSATRN.py:63-87). /32 total
    with the default stages; ``stages`` swaps in a reduced list (same row
    schema as ``V2_S_STAGES``)."""

    output_channel: int
    dtype: jnp.dtype = jnp.float32
    stages: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # Torch Conv2d(k3, s2) has implicit padding 0 in the reference stem;
        # replicate with VALID padding to keep shapes identical.
        x = nn.Conv(
            24, (3, 3), strides=2, padding="VALID", use_bias=False,
            dtype=self.dtype, name="conv_stem",
        )(x)
        x = _bn(train, "bn1", self.dtype)(x)
        x = nn.silu(x)
        blocks_kw = (
            {} if self.stages is None
            else {"stages": tuple(tuple(r) for r in self.stages)}
        )
        x = EfficientNetV2Blocks(
            dtype=self.dtype, name="blocks", **blocks_kw
        )(x, train)
        x = nn.Conv(
            self.output_channel, (1, 1), use_bias=False, dtype=self.dtype,
            name="conv_last",
        )(x)
        x = _bn(train, "bn2", self.dtype)(x)
        return nn.silu(x)
