"""Fused MBConv+SE inference block kernel (EfficientNetV2 stages 3-5).

Why: the r5 encoder-stage attribution (examples/bench_encoder_stages.py)
put the flagship encoder's cost in the MBConv stages — stage4 16.6 ms,
stage5 7.8 ms, stage3 2.1 ms of the ~40 ms B=256 encode — and the
arithmetic says they are HBM-bound, not FLOP-bound: each block
materializes its expand_ratio-x intermediate ([B,16,32,960] bf16 = 200 MB
at stage4) FOUR times between the pw/dw/se/pwl convs, ~1 GB of traffic
per block against ~0.25 GFLOP of useful work. This kernel runs the whole
block — 1x1 expand + BN + SiLU + 3x3 depthwise + BN + SiLU + SE gate +
1x1 project + BN + residual — in ONE pallas_call, keeping the expanded
intermediate in VMEM: traffic drops to read-x + write-out (~90 MB at
stage4, a ~10x reduction).

Design notes (each measured on-chip, r5):
- Inference-only: BatchNorm folds ride as per-channel f32 (scale, bias)
  applied to each matmul's OUTPUT; conv weights pass RAW (squeeze-only
  reshapes). In-jit ``w * scale`` materialized transformed weights whose
  layouts XLA copy-converted for the custom-call — kernels stalled
  ~1.7 ms behind those copies.
- Weights live in ANY space, DMA'd into persistent VMEM scratch ONCE at
  grid step 0: auto-pipelined constant operands are re-fetched every
  grid step (~15 operands x 128 steps measured DMA-issue-bound).
- Layout [NB, H(+2 zero-pad), W, C]: dy taps are free leading-dim
  slices; dx taps are 3 sublane ``pltpu.roll``s along W (f32 — Mosaic
  rotate is 32-bit-only) with a [W] wrap-mask folded in once per dx.
  The flat-S 9-roll formulation measured 2x more VPU time.
- SiLU via the exp2 hardware unit + approximate reciprocal (see
  ``_silu``): the in-kernel ablation showed precise-exp SiLU was ~80%
  of kernel time on the 6x-expanded map.
- Matmul accumulators f32 (preferred_element_type); grid over B/NB with
  NB chosen against a VMEM budget.
- Only stride-1 blocks (all 9 of stage4, 14/15 of stage5, 5/6 of
  stage3, and any custom stage list's tail blocks); the three stride-2
  stage heads stay on the composed flax path.

Reference provenance: the blocks mirror timm's InvertedResidual as used
by /root/reference/networks/EfficientSATRN.py:63-87 (via
models/efficientnetv2.py, oracle-tested); this kernel is a pure
execution-strategy change gated to inference.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN_EPS = 1e-3  # timm effnet BN eps (models/efficientnetv2.py:40)

# tap order matches torch/flax 3x3 conv kernels: k = i*3 + j, output
# position (h, w) reads input (h + i - 1, w + j - 1)
_TAPS = [(i - 1, j - 1) for i in range(3) for j in range(3)]


def _fold_bn(bn_params, bn_stats):
    inv = bn_params["scale"].astype(jnp.float32) * jax.lax.rsqrt(
        bn_stats["var"].astype(jnp.float32) + BN_EPS
    )
    bias = bn_params["bias"].astype(jnp.float32) - (
        bn_stats["mean"].astype(jnp.float32) * inv
    )
    return inv, bias


def fold_mbconv_params(params: Dict[str, Any], stats: Dict[str, Any],
                       dtype) -> Dict[str, jnp.ndarray]:
    """flax MBConv param/batch_stats subtrees -> kernel operands.

    The conv weights are passed RAW (squeeze-only reshapes — no
    multiplies, no transposes) and the BN folds ride along as per-channel
    (scale, bias) f32 vectors the kernel applies to each matmul's
    OUTPUT — mathematically identical to scaling the weight columns.
    This matters operationally: an in-jit ``w * scale`` materializes a
    transformed weight whose layout XLA then copy-converts for the
    custom-call operand; a device trace of 9 distinct blocks showed the
    kernels stalling ~1.7 ms each behind exactly those weight
    copy-starts. ``se_*`` keys only when the block has an SE gate.
    """
    s1, b1 = _fold_bn(params["bn1"], stats["bn1"])
    s2, b2 = _fold_bn(params["bn2"], stats["bn2"])
    s3, b3 = _fold_bn(params["bn3"], stats["bn3"])
    pw = params["conv_pw"]["kernel"][0, 0]  # [Cin, Cmid]
    cmid = pw.shape[1]
    dw = params["conv_dw"]["kernel"].reshape(9, cmid)  # [3,3,1,C] squeeze
    out = {
        "pw_w": pw.astype(dtype),
        "pw_s": s1, "pw_b": b1,
        "dw_w": dw.astype(jnp.float32),
        "dw_s": s2, "dw_b": b2,
        "pwl_w": params["conv_pwl"]["kernel"][0, 0].astype(dtype),
        "pwl_s": s3, "pwl_b": b3,
    }
    if "se" in params:
        se = params["se"]
        out["se_rw"] = se["conv_reduce"]["kernel"][0, 0].astype(dtype)
        out["se_rb"] = se["conv_reduce"]["bias"].astype(jnp.float32)
        out["se_ew"] = se["conv_expand"]["kernel"][0, 0].astype(dtype)
        out["se_eb"] = se["conv_expand"]["bias"].astype(jnp.float32)
    return out


def _w_masks(w: int) -> np.ndarray:
    """[3, W] f32 column-validity masks for dx in (-1, 0, +1): after the
    roll-by-(-dx) along W, exactly the wrapped column is invalid."""
    masks = np.ones((3, w), np.float32)
    masks[0, 0] = 0.0      # dx=-1: output w=0 read w=W-1's wrap
    masks[2, w - 1] = 0.0  # dx=+1: output w=W-1 read w=0's wrap
    return masks


def _roll_w(x, shift: int, interpret: bool):
    shift %= x.shape[2]  # pltpu.roll requires a non-negative shift
    if shift == 0:
        return x
    if interpret:
        return jnp.roll(x, shift, axis=2)
    return pltpu.roll(x, shift=shift, axis=2)


def _silu(x, interpret):
    """SiLU. Compiled mode uses the TPU-native formulation
    ``x / (1 + exp2(-x*log2 e))`` with the approximate reciprocal:
    the r5 in-kernel ablation put jax.nn.silu at ~11 of the 13.8 ms
    9-block stage4 group (Mosaic lowers exp with a precise polynomial);
    exp2 hits the pow2 hardware unit and cut the group to 6.7 ms. Error
    is ~1e-4 relative — an order below the bf16 rounding the composed
    path's silu already carries, same argmax-near-tie standard as the
    decode kernels. Interpret mode (CPU parity tests) stays exact.
    Opt out with P4FR_MBCONV_EXACT_SILU=1."""
    import os

    if interpret or os.environ.get("P4FR_MBCONV_EXACT_SILU"):
        return jax.nn.silu(x)
    e = jax.lax.exp2(x * (-1.4426950408889634))
    return x * pl.reciprocal(1.0 + e, approx=True)


def _kernel(x_ref, *rest, height: int, width: int, residual: bool,
            has_se: bool, interpret: bool, n_w: int):
    # layout: x | n_w HBM weight refs | out | n_w VMEM scratch | sem.
    # Weights live in ANY space and are DMA'd into persistent scratch
    # ONCE at grid step 0: auto-pipelined constant blocks are re-fetched
    # every grid step, and with ~15 small operands x 128 steps the
    # kernel measured DMA-issue-bound at 1.9 ms/block (trace r5) —
    # 10x the actual x/out traffic cost.
    hbm = rest[:n_w]
    out_ref = rest[n_w]
    vmem = list(rest[n_w + 1 : 2 * n_w + 1])
    sem = rest[2 * n_w + 1]

    @pl.when(pl.program_id(0) == 0)
    def _load_weights():
        for src, dst in zip(hbm, vmem):
            cp = pltpu.make_async_copy(src, dst, sem)
            cp.start()
            cp.wait()

    (pw_w, pw_s, pw_b, dw_w, dw_s, dw_b, pwl_w, pwl_s, pwl_b,
     masks) = vmem[:10]
    if has_se:
        se_rw, se_rb, se_ew, se_eb = vmem[10:]
    x = x_ref[...]  # [NB, S, Cin]
    nb, s, cin = x.shape
    x2 = x.reshape(nb * s, cin)
    h1 = jnp.dot(x2, pw_w[...], preferred_element_type=jnp.float32)
    h1 = h1 * pw_s[0][None, :] + pw_b[0][None, :]
    h1 = _silu(h1, interpret)
    # f32 through the depthwise taps: Mosaic's rotate only handles
    # 32-bit data ("Rotate with non-32-bit data" on bf16)
    cmid = h1.shape[-1]
    h1 = h1.reshape(nb, height, width, cmid)
    # zero-pad H so the dy taps become free leading-dim slices; the dx
    # taps are 3 sublane rolls along W with a [W] wrap mask folded in
    # once per dx (VPU work: 3 roll+mask passes + 9 FMAs, vs 9 masked
    # rolls in the flat-S formulation)
    h1p = jnp.pad(h1, ((0, 0), (1, 1), (0, 0), (0, 0)))
    acc = jnp.zeros((nb, height, width, cmid), jnp.float32)
    for dx in (-1, 0, 1):
        y = _roll_w(h1p, -dx, interpret)
        y = y * masks[dx + 1][None, None, :, None]
        for dy in (-1, 0, 1):
            k = (dy + 1) * 3 + (dx + 1)
            acc = acc + (
                y[:, 1 + dy : 1 + dy + height]
                * dw_w[k][None, None, None, :]
            )
    h2 = acc * dw_s[0][None, None, None, :] + dw_b[0][None, None, None, :]
    h2 = _silu(h2, interpret)
    h2 = h2.reshape(nb, s, cmid)  # f32 [NB, S, Cmid]

    if has_se:
        pooled = jnp.mean(h2, axis=1)  # [NB, Cmid] f32
        r = jax.nn.silu(
            jnp.dot(pooled.astype(x.dtype), se_rw[...],
                    preferred_element_type=jnp.float32)
            + se_rb[0][None, :]
        )
        g = jax.nn.sigmoid(
            jnp.dot(r.astype(x.dtype), se_ew[...],
                    preferred_element_type=jnp.float32)
            + se_eb[0][None, :]
        )
        h2 = h2 * g[:, None, :]

    h2 = h2.astype(x.dtype).reshape(nb * s, -1)
    out = jnp.dot(h2, pwl_w[...], preferred_element_type=jnp.float32)
    out = out * pwl_s[0][None, :] + pwl_b[0][None, :]
    if residual:
        out = out + x2.astype(jnp.float32)
    out_ref[...] = out.astype(x.dtype).reshape(nb, s, -1)


def _pick_nb(batch: int, s: int, cin: int, cmid: int, cout: int,
             budget_bytes: int = 12 * 1024 * 1024) -> int:
    """Largest batch tile within a conservative VMEM live-set estimate:
    x(2B) + h1(2B) + dw accumulator+h2 (f32, counted twice) + out."""
    per_img = s * (2 * cin + 2 * cmid + 8 * cmid + 2 * cout)
    for nb in (16, 8, 4, 2, 1):
        if batch % nb == 0 and nb * per_img <= budget_bytes:
            return nb
    return 1


def fused_mbconv(x: jnp.ndarray, folded: Dict[str, jnp.ndarray],
                 height: int, width: int, *, residual: bool,
                 interpret: bool = False) -> jnp.ndarray:
    """Apply one stride-1 MBConv(+SE) block. x: [B, H, W, Cin]."""
    b, h, w, cin = x.shape
    assert h == height and w == width
    s = h * w
    cmid = folded["pw_w"].shape[1]
    cout = folded["pwl_w"].shape[1]
    has_se = "se_rw" in folded
    nb = _pick_nb(b, s, cin, cmid, cout)
    masks = jnp.asarray(_w_masks(w))

    x3 = x.reshape(b, s, cin)
    weight_keys = [
        "pw_w", "pw_s", "pw_b", "dw_w", "dw_s", "dw_b",
        "pwl_w", "pwl_s", "pwl_b",
    ]
    if has_se:
        weight_keys += ["se_rw", "se_rb", "se_ew", "se_eb"]
    weights = [folded[k] for k in weight_keys[:9]] + [masks] + [
        folded[k] for k in weight_keys[9:]
    ]
    # 1-D vectors ride as [1, N] (2-D VMEM scratch; kernel indexes [0])
    weights = [w if w.ndim > 1 else w.reshape(1, -1) for w in weights]
    n_w = len(weights)
    in_specs = [pl.BlockSpec((nb, s, cin), lambda i: (i, 0, 0))]
    in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * n_w

    out = pl.pallas_call(
        functools.partial(
            _kernel, height=height, width=width, residual=residual,
            has_se=has_se, interpret=interpret, n_w=n_w,
        ),
        grid=(b // nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nb, s, cout), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM(wt.shape, wt.dtype) for wt in weights
        ] + [pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(x3, *weights)
    return out.reshape(b, h, w, cout)
