"""Fused windowed multi-head attention for the Swin encoder.

Motivation (r4 device trace, `trace_launch.py --e2e --network SWIN
--batch 32`): the Swin-B/384 encoder costs 88.3 ms of the 100 ms e2e
batch, and the XLA window-attention path materializes every
[nB, heads, 144, 144] score tensor to HBM twice (scores, then
post-softmax weights) because XLA never fuses matmul -> softmax ->
matmul. Aggregated, those score-shaped ops are ~27 ms and the qkv
head-split relayout copies another ~10 ms.

This kernel computes one whole window's attention per head entirely in
VMEM — scores, scaling, relative-position bias, (shifted-window) mask,
softmax, and the value contraction — so HBM sees only qkv in and out.
A window is 12x12 = 144 tokens with head_dim 32 (Swin-B), so the full
[144, 144] score matrix fits comfortably in VMEM and no online-softmax
machinery is needed (contrast ops/pallas/decoder_layer_v2.py, which
streams an unbounded KV prefix).

Layout choices (these ARE the optimization — see docs/PERFORMANCE.md):

- the kernel consumes the qkv projection's output [N, n, 3C] DIRECTLY:
  q and v per head are STATIC lane slices at 32-lane offsets inside
  clean 128-multiple q/v lane groups — no [nB, n, C] extraction copies
  outside, and no q*scale copy (the scale multiplies the f32 scores
  in-kernel, mathematically identical since it precedes the bias add).
- k alone is transposed ONCE outside to [N, C, n] (one XLA copy per
  block instead of the jnp path's 3-way head-split relayouts): per-head
  kt slices are then aligned SUBLANE slices, and
  q_h [144, 32] @ kt_h [32, 144] is the MXU's native (M,K)x(K,N) form.
- a [N, H, n, d=32] per-head layout was rejected: d=32 lanes pad to 128
  IN HBM (T(8,128) tiling), 4x the traffic.
- heads are a PYTHON loop over static slices, windows a fori_loop —
  NOT grid dims — so qkv/kt blocks are fetched once per window tile.

Reference semantics mirrored from /root/reference/networks/SWIN.py:84-209
(q scaling, additive relative-position bias, additive shift mask,
softmax over keys); numerics pinned against the jnp path in
tests/test_swin_attention.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    qkv_ref,  # [WT, n, 3C] VMEM — raw projection output
    kt_ref,  # [WT, C, n] VMEM — k transposed outside
    bias_ref,  # [H, n, n] f32 VMEM (resident across the grid)
    *rest,  # [mask_ref [WT, n, n] f32 if has_mask], out_ref,
    #          head_buf [n, C] scratch (per-window head assembly)
    heads: int,
    has_mask: bool,
    scale: float,
):
    if has_mask:
        mask_ref, out_ref, head_buf = rest
    else:
        mask_ref = None
        out_ref, head_buf = rest
    wt, n, c3 = qkv_ref.shape
    c = c3 // 3
    d = c // heads
    cdtype = qkv_ref.dtype

    def body(wi, _):
        # one clean load per operand per window (dynamic index only on
        # the untiled leading dim); head splits are then STATIC slices
        # of in-VMEM arrays (q lanes [0, C), v lanes [2C, 3C))
        qkv_w = qkv_ref[wi]  # [n, 3C]
        kt_w = kt_ref[wi]  # [C, n]
        mask_w = mask_ref[wi] if mask_ref is not None else None
        for h in range(heads):
            q_h = jax.lax.slice(qkv_w, (0, h * d), (n, (h + 1) * d))
            kt_h = jax.lax.slice(kt_w, (h * d, 0), ((h + 1) * d, n))
            scores = jax.lax.dot_general(
                q_h, kt_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [n, n] f32; scale precedes the bias add, so
            #            scaling scores == scaling q (reference order)
            scores = scores + bias_ref[h]
            if mask_w is not None:
                scores = scores + mask_w
            p = jax.nn.softmax(scores, axis=-1).astype(cdtype)
            v_h = jax.lax.slice(
                qkv_w, (0, 2 * c + h * d), (n, 2 * c + (h + 1) * d)
            )
            out_h = jax.lax.dot_general(
                p, v_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cdtype)
            head_buf[:, h * d:(h + 1) * d] = out_h  # static lane store
        out_ref[wi] = head_buf[...]
        return 0

    jax.lax.fori_loop(0, wt, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "scale", "window_tile", "interpret"),
)
def fused_window_attention(
    qkv: jnp.ndarray,  # [N, n, 3C] — raw qkv Dense output (q|k|v lanes)
    bias: jnp.ndarray,  # [H, n, n] additive (relative position bias)
    mask: Optional[jnp.ndarray] = None,  # [nW, n, n] additive or None
    *,
    heads: int,
    scale: float,
    window_tile: int = 0,  # 0 = auto
    interpret: bool = False,
) -> jnp.ndarray:
    """Windowed MHA: softmax(scale * q @ k^T + bias [+ mask]) @ v, fused.

    ``mask`` rows map to windows as ``window_index % nW`` (the
    window_partition flattening is batch-major), matching the jnp
    path's ``attn.reshape(nb//nw, nw, ...) + mask[None, :, None]``.
    Returns [N, n, C].
    """
    N, n, C3 = qkv.shape
    if C3 % 3:
        raise ValueError(f"qkv lane dim {C3} not divisible by 3")
    C = C3 // 3
    H = heads
    if C % H:
        raise ValueError(f"C={C} not divisible by heads={H}")
    nw = None if mask is None else mask.shape[0]

    wt = window_tile
    if wt <= 0:
        # largest tile that divides N (and the mask period), bounded by
        # a VMEM budget: double-buffered qkv(3C)+kt(C)+out(C) blocks +
        # the resident bias + mask/scratch, under ~12 MB of the 16 MB
        # scoped limit
        for cand in (16, 8, 4, 2, 1):
            if N % cand:
                continue
            if nw is not None and (nw % cand and cand % nw):
                continue
            blocks = 5 * cand * n * C * qkv.dtype.itemsize * 2
            extra = H * n * n * 4 + (cand * n * n * 4 if nw else 0)
            if blocks + extra <= 12 * 1024 * 1024:
                wt = cand
                break
        else:
            raise ValueError(f"no window tile divides N={N}")
    if N % wt:
        raise ValueError(f"window_tile={wt} must divide N={N}")

    # the single relayout outside the kernel: k -> [N, C, n]
    kt = jnp.swapaxes(qkv[:, :, C:2 * C], 1, 2)

    in_specs = [
        pl.BlockSpec((wt, n, C3), lambda i: (i, 0, 0)),
        pl.BlockSpec((wt, C, n), lambda i: (i, 0, 0)),
        pl.BlockSpec((H, n, n), lambda i: (0, 0, 0)),
    ]
    args = [qkv, kt, bias.astype(jnp.float32)]
    if mask is not None:
        if nw % wt and wt % nw:
            raise ValueError(f"window_tile={wt} incompatible with nW={nw}")
        if wt <= nw:
            period = nw // wt
            in_specs.append(
                pl.BlockSpec((wt, n, n), lambda i: (i % period, 0, 0))
            )
            args.append(mask.astype(jnp.float32))
        else:
            # fewer mask rows than the tile: pre-tile to one period
            reps = wt // nw
            tiled = jnp.tile(mask.astype(jnp.float32), (reps, 1, 1))
            in_specs.append(
                pl.BlockSpec((wt, n, n), lambda i: (0, 0, 0))
            )
            args.append(tiled)

    kernel = functools.partial(
        _kernel, heads=H, has_mask=mask is not None, scale=float(scale)
    )

    return pl.pallas_call(
        kernel,
        grid=(N // wt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((wt, n, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, n, C), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((n, C), qkv.dtype)],
        interpret=interpret,
    )(*args)
