"""Fused MBConv+SE inference kernels (EfficientNetV2 stages 3-5).

Why: the r5 encoder-stage attribution (examples/bench_encoder_stages.py)
put the flagship encoder's cost in the MBConv stages — stage4 16.6 ms,
stage5 7.8 ms, stage3 2.1 ms of the ~40 ms B=256 encode — and the
arithmetic says they are HBM-bound, not FLOP-bound: each block
materializes its expand_ratio-x intermediate ([B,16,32,960] bf16 =
200 MB at stage4) FOUR times between the pw/dw/se/pwl convs, ~1 GB of
traffic per block against ~0.25 GFLOP of useful work. These kernels run
whole blocks — 1x1 expand + BN + SiLU + 3x3 depthwise + BN + SiLU + SE
gate + 1x1 project + BN + residual — inside pallas_call with the
expanded intermediate VMEM-resident, and CHAIN consecutive stride-1
blocks into one launch so even the block boundary activations
([B,16,32,160] = 42 MB) never round-trip HBM.

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
- Matmul accumulators f32 (preferred_element_type); the batch tile NB
  and the blocks-per-launch grouping are chosen together against a
  VMEM budget that must also hold every chained block's weights.
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
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN_EPS = 1e-3  # timm effnet BN eps (models/efficientnetv2.py:40)

_BLOCK_KEYS = ("pw_w", "pw_s", "pw_b", "dw_w", "dw_s", "dw_b",
               "pwl_w", "pwl_s", "pwl_b")
_SE_KEYS = ("se_rw", "se_rb", "se_ew", "se_eb")


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


def _apply_block(x, w, masks, *, height: int, width: int, residual: bool,
                 has_se: bool, interpret: bool):
    """One MBConv(+SE) on a VMEM-resident tile.

    x: [NB, S, Cin] array (kernel dtype); w: this block's VMEM weight
    refs in ``_BLOCK_KEYS (+ _SE_KEYS)`` order; masks: shared [3, W]
    wrap-mask ref. Returns [NB, S, Cout]."""
    (pw_w, pw_s, pw_b, dw_w, dw_s, dw_b, pwl_w, pwl_s, pwl_b) = w[:9]
    if has_se:
        se_rw, se_rb, se_ew, se_eb = w[9:]
    nb, s, cin = x.shape
    x2 = x.reshape(nb * s, cin)
    h1 = jnp.dot(x2, pw_w[...], preferred_element_type=jnp.float32)
    h1 = _silu(h1 * pw_s[0][None, :] + pw_b[0][None, :], interpret)
    # f32 through the depthwise taps: Mosaic rotate is 32-bit-only
    cmid = h1.shape[-1]
    h1 = h1.reshape(nb, height, width, cmid)
    # zero-pad H so the dy taps become free leading-dim slices; the dx
    # taps are 3 sublane rolls along W with a [W] wrap mask folded in
    # once per dx
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
    h2 = h2.reshape(nb, s, cmid)  # f32

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
    return out.astype(x.dtype).reshape(nb, s, -1)


def _chain_kernel(x_ref, *rest, height: int, width: int,
                  specs: Sequence, interpret: bool, n_w: int):
    # ref layout: x | masks + flattened per-block weights (ANY space,
    # n_w refs total) | out | matching VMEM scratch | sem. Weights are
    # DMA'd into persistent scratch ONCE at grid step 0 (auto-pipelined
    # constant operands re-fetch every grid step — measured
    # DMA-issue-bound at 1.9 ms/block before this).
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

    masks = vmem[0]
    x = x_ref[...]
    off = 1
    for n_block_w, residual, has_se in specs:
        w = vmem[off : off + n_block_w]
        off += n_block_w
        x = _apply_block(
            x, w, masks, height=height, width=width, residual=residual,
            has_se=has_se, interpret=interpret,
        )
    out_ref[...] = x


def _work_bytes_per_img(s: int, cmid: int, height: int) -> int:
    """Peak live f32 working set per image inside _apply_block: h1p
    ((H+2)/H-padded) + one rolled copy + the accumulator."""
    padded = s * (height + 2) // height
    return 4 * (2 * padded + s) * cmid


def _weight_bytes(folded: Dict[str, jnp.ndarray]) -> int:
    return sum(int(np.prod(v.shape)) * v.dtype.itemsize
               for v in folded.values())


def plan_chain(batch: int, s: int, height: int,
               folded_list: Sequence[Dict[str, jnp.ndarray]],
               budget_bytes: int = 15 * 1024 * 1024):
    """(nb, groups): batch tile + consecutive-block grouping such that
    nb * work_set(max cmid) + group weights fit the VMEM budget. Must
    stay compilable under the DEFAULT 16 MB scoped-VMEM limit (programs
    without the raised decode compile options also run this).

    Measured preference order (stage4, B=256): the LARGEST batch tile
    wins over longer chains — the 9-block chain at nb=1 ran 12.0 ms
    where per-block launches at nb=2 ran ~6.7 (small per-step tiles pay
    more per-op overhead than the saved boundary traffic) — so nb is
    maximized first and chaining uses whatever VMEM is left."""
    max_cmid = max(f["pw_w"].shape[1] for f in folded_list)
    work = _work_bytes_per_img(s, max_cmid, height)
    io = 4 * s * max(
        max(f["pw_w"].shape[0] for f in folded_list),
        max(f["pwl_w"].shape[1] for f in folded_list),
    )  # double-buffered bf16 in+out blocks
    max_wb = max(_weight_bytes(f) for f in folded_list)
    nb = 1
    for cand in (16, 8, 4, 2, 1):
        if batch % cand == 0 and (
            cand * (work + io) + max_wb <= budget_bytes
        ):
            nb = cand
            break
    avail = max(budget_bytes - nb * (work + io), max_wb)
    groups: List[List[int]] = []
    cur: List[int] = []
    used = 0
    for i, f in enumerate(folded_list):
        wb = _weight_bytes(f)
        if cur and used + wb > avail:
            groups.append(cur)
            cur, used = [], 0
        cur.append(i)
        used += wb
    if cur:
        groups.append(cur)
    return nb, groups


def fused_mbconv_chain(
    x: jnp.ndarray,
    folded_list: Sequence[Dict[str, jnp.ndarray]],
    residuals: Sequence[bool],
    height: int,
    width: int,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Apply a run of stride-1 MBConv(+SE) blocks, chained into as few
    pallas_call launches as the VMEM budget allows (block-boundary
    activations never touch HBM within a launch). x: [B, H, W, Cin]."""
    b, h, w, _ = x.shape
    assert h == height and w == width
    s = h * w
    masks = jnp.asarray(_w_masks(w))
    nb, groups = plan_chain(b, s, height, folded_list)

    x3 = x.reshape(b, s, x.shape[-1])
    for group in groups:
        specs = []
        weights = [masks]
        for i in group:
            f = folded_list[i]
            has_se = "se_rw" in f
            keys = _BLOCK_KEYS + (_SE_KEYS if has_se else ())
            blk = [f[k] if f[k].ndim > 1 else f[k].reshape(1, -1)
                   for k in keys]
            weights += blk
            specs.append((len(blk), bool(residuals[i]), has_se))
        n_w = len(weights)
        cin = x3.shape[-1]
        cout = folded_list[group[-1]]["pwl_w"].shape[1]
        in_specs = [pl.BlockSpec((nb, s, cin), lambda i: (i, 0, 0))]
        in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * n_w
        x3 = pl.pallas_call(
            functools.partial(
                _chain_kernel, height=height, width=width,
                specs=tuple(specs), interpret=interpret, n_w=n_w,
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
    return x3.reshape(b, h, w, x3.shape[-1])


def fused_mbconv(x: jnp.ndarray, folded: Dict[str, jnp.ndarray],
                 height: int, width: int, *, residual: bool,
                 interpret: bool = False) -> jnp.ndarray:
    """Single stride-1 MBConv(+SE) block (chain of one)."""
    return fused_mbconv_chain(
        x, [folded], [residual], height, width, interpret=interpret
    )
