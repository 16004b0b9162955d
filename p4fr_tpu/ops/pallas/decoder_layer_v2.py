"""Pallas TPU kernel v2: flash-decode style fused decoder-layer AR step.

Fixes the two bandwidth flaws measured in v1 (``decoder_layer.py``):

1. the KV cache stays **resident in HBM** (``memory_space=ANY``); the
   kernel DMAs it in chunks and writes back ONLY the one updated slot
   (v1 round-tripped the whole [TB, L, 2H] block every step);
2. only chunks strictly before ``pos`` are fetched (prefix reads — the
   average read volume is half the padded length), with the current
   position's K/V taken straight from registers.

Mechanics:

- online softmax across chunks: ALL heads carried at once as (m, l, acc)
  VMEM scratch of shape [TB, heads] / [TB, H], seeded with the current
  position's contribution;
- per-head score/weighted-sum contractions are expressed lane-parallel:
  an elementwise q*k product over the full hidden dim followed by a
  segment-sum matmul against a constant [H, heads] head-indicator matrix
  (and its transpose to broadcast head scalars back to lanes). No
  python-level loop over heads exists anywhere — this is what makes the
  Mosaic MLIR small enough to compile in seconds (the round-1 version
  unrolled 8 heads x 4 chunks and took >10 min on the remote compiler);
- chunks walk through a ``fori_loop`` with ring-buffered async DMA
  (``chunk_bufs`` slots; the default 2 starts chunk c+1 before
  computing chunk c) and a dynamic trip count ``cdiv(pos, chunk)`` so
  steps early in decode read almost nothing;
- the future-slot K/V (reference parity: the layer OUTPUT's projection)
  is returned as a [B, 2H] output and scattered into the cache by ONE XLA
  dynamic_update_slice on the donated scan carry (a tiled HBM memref
  cannot be DMA-sliced at an arbitrary row, so the in-kernel slot write
  is not expressible; the XLA DUS writes only the slot, preserving the
  bandwidth win);
- grid over batch tiles; weights in VMEM (fetched once — their index map
  is constant across the grid); matmuls on the MXU in f32.

Numerics match ``fast_decode_step`` (softmax reassociation differences
are ~1e-6 in f32; argmax-identical in bf16); parity-tested in interpret
mode AND compiled in tests/test_pallas_decoder_layer.py.

Reference semantics: /root/reference/networks/EfficientSATRN.py:539-557
(attend including the current position, then the layer output's K/V
projection replaces the cache slot).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _head_indicator(hidden: int, head_num: int):
    """[H, heads] f32 with E[d, h] = 1 iff lane d belongs to head h.

    Built from iota (not a host constant) so Mosaic materializes it as a
    cheap vector comparison. ``x @ E`` segment-sums lanes into heads;
    ``y @ E.T`` broadcasts per-head scalars back onto their lanes.
    """
    dh = hidden // head_num
    row = jax.lax.broadcasted_iota(jnp.int32, (hidden, head_num), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (hidden, head_num), 1)
    return (row // dh == col).astype(jnp.float32)


def _kernel(
    # scalar prefetch
    pos_ref,  # [1] int32
    # inputs (``cache_scale_hbm`` / ``src_scale_ref`` present only when
    # ``cache_quant`` / ``src_quant``)
    x_ref,  # [TB, H] VMEM
    cache_hbm,  # [B, L, 2H] ANY (int8 [G, L, TB, 2H] when cache_quant)
    *rest,
    head_num: int,
    chunk: int,
    cache_outputs: bool,
    tiled: bool = False,
    src_hbm: bool = False,
    slot_write: bool = False,
    src_quant: bool = False,
    cache_quant: bool = False,
    chunk_bufs: int = 2,
):
    rest = list(rest)
    # [G, L, 2*TB] ANY when cache_quant: k-scales in lanes [:TB], v-scales
    # in [TB:]. The (2, TB) pair is MERGED into one minor dim because
    # Mosaic DMA slices require the minor dim to be 128-aligned — the
    # production tile (TB=64) gives exactly 128 lanes; a [..., 2, TB]
    # layout (TB=64 minor) fails to compile ("Slice shape along dimension
    # 3 must be aligned to tiling (128)").
    cache_scale_hbm = rest.pop(0) if cache_quant else None
    src_kv_ref = rest.pop(0)  # [TB, S, 2H] VMEM, or [B, S, 2H] ANY (src_hbm)
    src_scale_ref = rest.pop(0) if src_quant else None
    (w_qkv_ref, b_qkv_ref,
     w_out_ref, b_out_ref, ln1_ref,
     w_q2_ref, b_q2_ref, w_out2_ref, b_out2_ref, ln2_ref,
     w_ff0_ref, b_ff0_ref, w_ff1_ref, b_ff1_ref, ln3_ref,
     ) = rest[:15]
    n_out = 3 if cache_quant else 2
    # outputs:
    # - out_ref [TB, H] VMEM
    # - slot_ref [TB, 2H] VMEM slot for the XLA DUS — or, when
    #   ``slot_write``, the ANY-space cache OUTPUT aliased to
    #   ``cache_hbm`` (the kernel DMAs the slot row itself)
    # - slot_scale_ref [1, 1, 2*TB] (cache_quant only; k | v lane halves)
    out_ref, slot_ref = rest[15:17]
    slot_scale_ref = rest[17] if cache_quant else None
    # scratch (see ``scratch_shapes`` — composition depends on flags)
    scratch = rest[15 + n_out:]
    chunk_buf, m_buf, l_buf, acc_buf, chunk_sem = scratch[:5]
    del scratch[:5]
    cscale_buf = cscale_sem = None
    if cache_quant:
        cscale_buf, cscale_sem = scratch[:2]
        del scratch[:2]
    src_buf = src_sem = None
    src_scale_buf = src_scale_sem = None
    if src_hbm:
        src_buf, src_sem = scratch[:2]
        del scratch[:2]
        if src_quant:
            src_scale_buf, src_scale_sem = scratch[:2]
            del scratch[:2]
    slot_buf = slot_sem = None
    if slot_write:
        slot_buf, slot_sem = scratch[:2]
    pos = pos_ref[0]
    i = pl.program_id(0)
    # compute dtype: bf16 on TPU, f32 interpret (x carries the model
    # dtype; the cache may be int8 under quantization, so it no longer
    # defines the compute dtype)
    cdtype = x_ref.dtype
    x = x_ref[:].astype(cdtype)
    tb, hidden = x.shape
    temp = jnp.float32(hidden) ** 0.5
    rows = pl.ds(i * tb, tb)
    if src_hbm:
        # single-buffered manual DMA (vs the auto-pipeline's 2 buffers —
        # that double buffer is what blows the 16MB scoped-VMEM limit for
        # wide decoders); started first so the self-attention chunk walk
        # hides its latency, awaited right before cross attention
        src_copy = pltpu.make_async_copy(
            src_kv_ref.at[rows], src_buf, src_sem
        )
        src_copy.start()
        if src_quant:
            src_scale_copy = pltpu.make_async_copy(
                src_scale_ref.at[rows], src_scale_buf, src_scale_sem
            )
            src_scale_copy.start()
    seg = _head_indicator(hidden, head_num).astype(cdtype)  # [H, heads]
    seg_t = seg.T  # [heads, H]

    def ln(y, ref):
        y = y.astype(jnp.float32)
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
        out = (
            (y - mean) * jax.lax.rsqrt(var + 1e-5)
            * ref[0, :].astype(jnp.float32)
            + ref[1, :].astype(jnp.float32)
        )
        return out.astype(cdtype)

    def seg_scores(q, k):
        """Per-head dot products, lane-parallel. q [TB, H], k [TB, T, H]
        (both cdtype) -> [TB, T, heads] f32 (already temperature-scaled).
        """
        t = k.shape[1]
        e = q[:, None, :] * k  # [TB, T, H] cdtype
        s = jnp.dot(
            e.reshape(tb * t, hidden), seg,
            preferred_element_type=jnp.float32,
        )
        return s.reshape(tb, t, head_num) / temp

    def seg_weighted_sum(p, v):
        """sum_t p[tb,t,h] * v[tb,t,h*dh+d] -> [TB, H] f32; p f32, v cdtype."""
        t = v.shape[1]
        p_wide = jnp.dot(
            p.astype(cdtype).reshape(tb * t, head_num), seg_t,
            preferred_element_type=jnp.float32,
        ).astype(cdtype).reshape(tb, t, hidden)
        return jnp.sum((p_wide * v).astype(jnp.float32), axis=1)

    # ---- current token q/k/v ------------------------------------------
    w_qkv = w_qkv_ref[:].astype(cdtype)
    qkv = (
        jnp.dot(x, w_qkv, preferred_element_type=jnp.float32)
        + b_qkv_ref[0, :].astype(jnp.float32)
    )
    q = qkv[:, :hidden].astype(cdtype)
    kv_cur = qkv[:, hidden:]  # [TB, 2H] f32

    # seed the online softmax with the current position's contribution
    m_buf[:] = jnp.dot(
        q * kv_cur[:, :hidden].astype(cdtype), seg,
        preferred_element_type=jnp.float32,
    ) / temp  # [TB, heads]
    l_buf[:] = jnp.ones((tb, head_num), jnp.float32)
    acc_buf[:] = kv_cur[:, hidden:]

    def chunk_dma(slot, c):
        start = pl.multiple_of(c * chunk, chunk)
        if tiled:
            # tile-contiguous layout [G, L, TB, 2H]: one chunk is a single
            # CK*TB*2H contiguous HBM region (vs TB strided segments)
            return pltpu.make_async_copy(
                cache_hbm.at[i, pl.ds(start, chunk), :, :],
                chunk_buf.at[slot],
                chunk_sem.at[slot],
            )
        return pltpu.make_async_copy(
            cache_hbm.at[rows, pl.ds(start, chunk), :],
            chunk_buf.at[slot],
            chunk_sem.at[slot],
        )

    def cscale_dma(slot, c):
        start = pl.multiple_of(c * chunk, chunk)
        return pltpu.make_async_copy(
            cache_scale_hbm.at[i, pl.ds(start, chunk), :],
            cscale_buf.at[slot],
            cscale_sem.at[slot],
        )

    def start_chunk(slot, c):
        chunk_dma(slot, c).start()
        if cache_quant:
            cscale_dma(slot, c).start()

    def wait_chunk(slot, c):
        chunk_dma(slot, c).wait()
        if cache_quant:
            cscale_dma(slot, c).wait()

    num_chunks = pl.cdiv(pos, chunk)  # strictly-before-pos prefix

    # prologue: put the first ``chunk_bufs - 1`` prefix chunks in flight
    # (the classic double buffer is chunk_bufs=2 — start chunk 0 only);
    # deeper rings give the DMA engine more issue slack, the lever the
    # int8 experiments pointed at (decode is DMA-issue-bound, not
    # bandwidth-bound — docs/PERFORMANCE.md r4 kv-quant section)
    for j in range(chunk_bufs - 1):
        @pl.when(j < num_chunks)
        def _(j=j):
            start_chunk(j, j)

    def chunk_body(c, _):
        @pl.when(c + chunk_bufs - 1 < num_chunks)
        def _():
            start_chunk((c + chunk_bufs - 1) % chunk_bufs,
                        c + chunk_bufs - 1)

        slot = c % chunk_bufs
        wait_chunk(slot, c)
        m_old = m_buf[:]
        if tiled:
            # time-major compute: chunk axis leads, no transposes needed
            k = chunk_buf[slot, :, :, :hidden].astype(cdtype)  # [CK, TB, H]
            v = chunk_buf[slot, :, :, hidden:].astype(cdtype)
            e = q[None, :, :] * k  # [CK, TB, H]
            s = jnp.dot(
                e.reshape(chunk * tb, hidden), seg,
                preferred_element_type=jnp.float32,
            ).reshape(chunk, tb, head_num) / temp
            if cache_quant:
                # int8 cache rows: fold the per-(position, row) k-scale
                # into the scores, the v-scale into the probabilities
                # (AFTER the softmax-mass accumulation — l tracks the
                # true softmax weights)
                sk = cscale_buf[slot, :, :tb]  # [CK, TB] f32
                sv = cscale_buf[slot, :, tb:]
                s = s * sk[:, :, None]
            t_idx = jax.lax.broadcasted_iota(
                jnp.int32, (chunk, tb, head_num), 0
            )
            banned = (c * chunk + t_idx) >= pos
            s = jnp.where(banned, NEG_INF, s)
            m_new = jnp.maximum(m_old, jnp.max(s, axis=0))  # [TB, heads]
            corr = jnp.exp(m_old - m_new)
            p = jnp.exp(s - m_new[None, :, :])
            p = jnp.where(banned, 0.0, p)
            l_buf[:] = l_buf[:] * corr + jnp.sum(p, axis=0)
            if cache_quant:
                p = p * sv[:, :, None]
            p_wide = jnp.dot(
                p.astype(cdtype).reshape(chunk * tb, head_num), seg_t,
                preferred_element_type=jnp.float32,
            ).astype(cdtype).reshape(chunk, tb, hidden)
            ws = jnp.sum((p_wide * v).astype(jnp.float32), axis=0)
        else:
            k = chunk_buf[slot, :, :, :hidden]  # [TB, CK, H]
            v = chunk_buf[slot, :, :, hidden:]
            s = seg_scores(q, k)  # [TB, CK, heads] f32
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (tb, chunk, head_num), 1
            )
            banned = (c * chunk + lane) >= pos
            s = jnp.where(banned, NEG_INF, s)
            m_new = jnp.maximum(m_old, jnp.max(s, axis=1))  # [TB, heads]
            corr = jnp.exp(m_old - m_new)
            p = jnp.exp(s - m_new[:, None, :])
            p = jnp.where(banned, 0.0, p)
            l_buf[:] = l_buf[:] * corr + jnp.sum(p, axis=1)
            ws = seg_weighted_sum(p, v)
        corr_wide = jnp.dot(corr, seg_t.astype(jnp.float32),
                            preferred_element_type=jnp.float32)
        acc_buf[:] = acc_buf[:] * corr_wide + ws
        m_buf[:] = m_new
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)

    # normalize heads: divide each head's lanes by its softmax mass
    l_wide = jnp.dot(l_buf[:], seg_t.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    att = (acc_buf[:] / l_wide).astype(cdtype)
    att = (
        jnp.dot(att, w_out_ref[:].astype(cdtype),
                preferred_element_type=jnp.float32)
        + b_out_ref[0, :].astype(jnp.float32)
    )
    out = ln(att + x.astype(jnp.float32), ln1_ref)

    # ---- cross attention (src fits in VMEM, plain softmax) -------------
    q2 = (
        jnp.dot(out, w_q2_ref[:].astype(cdtype),
                preferred_element_type=jnp.float32)
        + b_q2_ref[0, :].astype(jnp.float32)
    ).astype(cdtype)
    if src_hbm:
        src_copy.wait()
        src = src_buf
        if src_quant:
            src_scale_copy.wait()
            scl = src_scale_buf
    else:
        src = src_kv_ref
        if src_quant:
            scl = src_scale_ref
    ck = src[:, :, :hidden].astype(cdtype)
    cv = src[:, :, hidden:].astype(cdtype)
    s2 = seg_scores(q2, ck)  # [TB, S, heads] f32
    if src_quant:
        # int8 src K/V with per-(row, position) scales [TB, 2, S]: the
        # k-scale folds into the scores AFTER the segment-sum (score =
        # sk * sum_d q_d*k8_d), the v-scale into the probabilities
        # BEFORE the weighted sum — both exact reassociations, so the
        # MXU contractions stay int8-fed bf16 and the dequantized K/V
        # never materializes
        s2 = s2 * scl[:, 0, :].astype(jnp.float32)[:, :, None]
    s2 = s2 - jnp.max(s2, axis=1, keepdims=True)
    p2 = jnp.exp(s2)
    p2 = p2 / jnp.sum(p2, axis=1, keepdims=True)
    if src_quant:
        p2 = p2 * scl[:, 1, :].astype(jnp.float32)[:, :, None]
    att2 = seg_weighted_sum(p2, cv).astype(cdtype)
    att2 = (
        jnp.dot(att2, w_out2_ref[:].astype(cdtype),
                preferred_element_type=jnp.float32)
        + b_out2_ref[0, :].astype(jnp.float32)
    )
    out = ln(att2 + out.astype(jnp.float32), ln2_ref)

    # ---- FF -------------------------------------------------------------
    ff = jnp.maximum(
        jnp.dot(out, w_ff0_ref[:].astype(cdtype),
                preferred_element_type=jnp.float32)
        + b_ff0_ref[0, :].astype(jnp.float32), 0.0,
    ).astype(cdtype)
    ff = jnp.maximum(
        jnp.dot(ff, w_ff1_ref[:].astype(cdtype),
                preferred_element_type=jnp.float32)
        + b_ff1_ref[0, :].astype(jnp.float32), 0.0,
    )
    out = ln(ff + out.astype(jnp.float32), ln3_ref)

    # ---- cache-slot write-back ------------------------------------------
    if cache_outputs:
        kv_slot = (
            jnp.dot(out, w_qkv[:, hidden:],
                    preferred_element_type=jnp.float32)
            + b_qkv_ref[0, hidden:].astype(jnp.float32)
        )
    else:
        kv_slot = kv_cur
    if cache_quant:
        # quantize the slot row per (row, half): int8 values out through
        # slot_ref, f32 scales through slot_scale_ref (both written back
        # by external DUSes on untiled leading dims — cheap on the tiled
        # layout, same as the bf16 path)
        k_half = kv_slot[:, :hidden]
        v_half = kv_slot[:, hidden:]
        sk_slot = jnp.maximum(jnp.max(jnp.abs(k_half), -1), 1e-8) / 127.0
        sv_slot = jnp.maximum(jnp.max(jnp.abs(v_half), -1), 1e-8) / 127.0
        k8 = jnp.clip(jnp.round(k_half / sk_slot[:, None]), -127, 127)
        v8 = jnp.clip(jnp.round(v_half / sv_slot[:, None]), -127, 127)
        slot_ref[:] = jnp.concatenate([k8, v8], axis=-1).astype(jnp.int8)
        slot_scale_ref[:] = jnp.concatenate([sk_slot, sv_slot])[None, None]
        out_ref[:] = out.astype(out_ref.dtype)
    elif slot_write:
        # in-kernel row DMA into the aliased cache output (r4 trace
        # finding: the external DUS costs 16.5us/layer/step — a
        # [B,1,2H] update has L on the SUBLANE dim of the T(8,128)
        # layout, so XLA read-modify-writes 8-row tiles and layout-
        # copies the slot first; the direct DMA writes only the row)
        slot_buf[:] = kv_slot.astype(slot_buf.dtype)
        dst = slot_ref.at[i, pos] if tiled else slot_ref.at[rows, pos, :]
        copy = pltpu.make_async_copy(slot_buf, dst, slot_sem)
        copy.start()
        out_ref[:] = out.astype(out_ref.dtype)
        copy.wait()
    else:
        slot_ref[:] = kv_slot.astype(slot_ref.dtype)
        out_ref[:] = out.astype(out_ref.dtype)


def scoped_vmem_estimate(
    *, batch_tile: int, chunk: int, hidden: int, s_len: int,
    filter_dim: int, itemsize: int, src_hbm: bool,
    src_quant: bool = False, cache_quant: bool = False,
    chunk_bufs: int = 2,
) -> int:
    """Conservative scoped-VMEM demand (bytes) of one kernel instance.

    Mirrors the allocator's accounting: grid-varying input/output blocks
    are double-buffered by the auto-pipeline; weight blocks (constant
    index map) are fetched once; scratch is single. Validated against a
    measured datapoint (SwinTRN dims tb=32/ck=64: estimate 31.9M vs the
    compiler's reported 28.6M — ~10% conservative)."""
    tb, two_h = batch_tile, 2 * hidden
    src_item = 1 if src_quant else itemsize
    src = tb * s_len * two_h * src_item * (1 if src_hbm else 2)
    if src_quant:
        # [TB, 2, S] f32 scales, sublane dim 2 padded to 8
        src += tb * 8 * s_len * 4 * (1 if src_hbm else 2)
    cache_item = 1 if cache_quant else itemsize
    chunk_buf = chunk_bufs * tb * chunk * two_h * cache_item
    if cache_quant:
        # [CK, 2*TB] f32 scale chunks, one per ring slot; lane 2*tb
        # padded to 128 (production tb=64 is exact)
        chunk_buf += chunk_bufs * chunk * (((2 * tb + 127) // 128) * 128) * 4
    weights = itemsize * (
        hidden * 3 * hidden + 3 * hidden          # w_qkv + b
        + 3 * (hidden * hidden + hidden)          # w_out, w_q2, w_out2 + b
        + 2 * hidden * filter_dim + filter_dim + hidden  # ff0, ff1 + b
        + 3 * 2 * hidden                          # ln scale/bias x3
    )
    blocks = 2 * (2 * tb * hidden + tb * two_h) * itemsize  # x, out, slot
    scratch = tb * hidden * 4 + 4 * tb * 64  # acc f32 + m/l (heads<=64)
    return src + chunk_buf + weights + blocks + scratch


# headroom under the default 16MB scoped-VMEM limit, given the estimator
# runs ~10% hot vs the real allocator
_VMEM_BUDGET = 15 * 1024 * 1024


def pick_v2_config(
    *, batch: int, hidden: int, s_len: int, filter_dim: int,
    itemsize: int = 2, batch_tile: int = 32, chunk: int = 64,
    max_len: int = 0, fixed_tile: bool = False, src_quant: bool = False,
    cache_quant: bool = False, vmem_limit_kib: int = 0,
):
    """Largest (batch_tile, chunk, src_hbm) fitting the scoped-VMEM budget.

    Prefers the measured-fastest default (tb=32/ck=64, pipelined src);
    engages the single-buffered HBM src path, then smaller tiles, only
    when the estimate overflows (wide decoders, e.g. SwinTRN's 512-hidden
    at multi-tile grids). ``fixed_tile`` pins tb to ``batch_tile`` (the
    tiled-cache layout bakes the tile into the allocation, so the kernel
    cannot shrink it). Returns None if nothing fits — callers should fall
    back to the jnp step.

    ``vmem_limit_kib``: the raised Mosaic scoped-VMEM limit the CALLER
    will ship with its jit (``jax.jit(compiler_options=
    xla_opts.tpu_compiler_options(default_kib=...))``). When set, the
    flagship special case upgrades to the auto-pipelined-src variant
    (tb=64/ck=32, src_hbm=False) — measured fastest e2e (r4 sweep:
    1808 vs 1799 img/s) but a compiler-reported 20.12M scoped VMEM in
    the full greedy program, over the 16MB default. NEVER set it
    without actually passing the matching compiler_options, or Mosaic
    rejects the compile."""
    forced = os.environ.get("P4FR_V2_FORCE")
    if forced:
        # EXPERIMENT OVERRIDE: "tb,ck,src_hbm" (e.g. "64,32,0") bypasses
        # the scoped-VMEM estimator entirely. Pair with
        # XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=N to probe configs
        # the default 16MB limit rejects (r3: the auto-pipelined-src
        # tb=64/ck=32 variant was 19us/step faster kernels-only but
        # compiled at 20.12M scoped VMEM). Never set in production.
        tb_f, ck_f, hbm_f = (int(v) for v in forced.split(","))
        return tb_f, ck_f, bool(hbm_f)
    if fixed_tile:
        tbs = [batch_tile]
    else:
        tbs = [t for t in (batch_tile, 32, 16) if t <= max(batch, 16)]
    cks = [c for c in (chunk, 64, 32) if max_len == 0 or max_len % c == 0]
    def est(tb, ck, src_hbm):
        return scoped_vmem_estimate(
            batch_tile=tb, chunk=ck, hidden=hidden, s_len=s_len,
            filter_dim=filter_dim, itemsize=itemsize, src_hbm=src_hbm,
            src_quant=src_quant, cache_quant=cache_quant,
        )

    if (not fixed_tile or batch_tile == 64) and batch % 64 == 0 \
            and 32 in cks and vmem_limit_kib and not cache_quant:
        # raised-limit flagship upgrade: auto-pipelined src (the r4
        # sweep's row B). Estimator reads 22.1M at flagship dims vs the
        # compiler's 20.12M (~10% conservative, consistent with the
        # SwinTRN calibration point), so gate directly on the raised
        # limit. Measured e2e: plain 1813 vs 1799, int8 cross-KV 1896
        # vs 1852; int8_cache measured WORSE pipelined (1871 vs 1887 —
        # the quantized chunk stream already hides the src re-read), so
        # the full-quant path keeps its src_hbm config.
        cand = (64, 32, False)
        if est(*cand) <= vmem_limit_kib * 1024:
            return cand
    if (not fixed_tile or batch_tile == 64) and batch % 64 == 0 \
            and 32 in cks:
        # measured fastest PRODUCTION config on v5e at flagship dims:
        # tb=64/ck=32/src_hbm e2e-benches 1746 img/s vs 1591 for
        # tb=32/ck=64 (+9.7%). The auto-pipelined-src variant
        # (src_hbm=False) is 19us/step faster in a kernels-only scan
        # (351 vs 370) but the FULL greedy program's while-loop context
        # pushes its scoped-VMEM demand to a compiler-reported 20.12M >
        # 16M — only the single-buffered src fits (15.9M est). Gate is
        # calibrated to that measurement rather than the conservative
        # default budget. Only for batches that fill 64-row tiles.
        cand = (64, 32, True)
        if est(*cand) <= 16 * 1024 * 1024:
            return cand
    for src_hbm in (False, True):
        for tb in dict.fromkeys(tbs):
            for ck in dict.fromkeys(cks):
                if est(tb, ck, src_hbm) <= _VMEM_BUDGET:
                    return tb, ck, src_hbm
    return None


@functools.partial(
    jax.jit,
    static_argnames=("head_num", "cache_outputs", "batch_tile", "chunk",
                     "interpret", "tiled_cache", "src_hbm",
                     "slot_in_kernel", "chunk_bufs"),
)
def decoder_layer_step_v2(
    x: jnp.ndarray,  # [B, H]
    pos: jnp.ndarray,  # scalar int32
    cache: jnp.ndarray,  # [B, L, 2H]; L must be a multiple of ``chunk``
    src_kv: jnp.ndarray,  # [B, S, 2H]
    weights: Tuple[jnp.ndarray, ...],
    src_scale: jnp.ndarray = None,  # [B, 2, S] f32 when src_kv is int8
    *,
    head_num: int,
    cache_outputs: bool = True,
    batch_tile: int = 32,
    chunk: int = 64,
    interpret: bool = False,
    tiled_cache: bool = False,
    src_hbm: bool = False,
    slot_in_kernel: bool = False,
    chunk_bufs: int = 2,
):
    """Flash-decode fused layer step -> (out [B, H], new cache).

    ``chunk_bufs``: depth of the prefix-chunk DMA ring (2 = the classic
    double buffer). Deeper rings keep more chunk DMAs in flight — each
    extra slot costs ``tb * chunk * 2H`` of scoped VMEM, so depths > 2
    generally need the raised per-compile limit
    (utils/xla_opts.decode_compiler_options).

    ``src_hbm``: keep the cross-attention src K/V in HBM and DMA the
    batch tile into a single scratch buffer inside the kernel (started
    before the self-attention chunk walk, awaited at cross attention).
    Halves the src VMEM footprint vs the auto-pipeline's double buffer —
    required for wide decoders (see pick_v2_config).

    ``src_scale``: enables the OPT-IN int8 cross-K/V path — ``src_kv``
    is then int8 quantized per (row, position) with f32 scales
    ``src_scale[:, 0/1, :]`` for K/V (see
    fast_step.precompute_cross_kv_int8). Halves the dominant decode HBM
    stream (the per-step cross-K/V re-read, 47% of traffic at flagship
    shapes — docs/PERFORMANCE.md r4 roofline); the scales fold into
    scores / probabilities, so numerics differ from bf16 by the
    quantization error only (a numerics change: opt-in, never default).

    Defaults tuned on v5e with bf16 compute (1-layer 230-step scan):
    tb=32/ck=64 199us/step vs tb=16/ck=64 203 and tb=16/ck=128 207;
    tb=64/ck=64 is fastest standalone (185) but exceeds the 16MB scoped
    VMEM limit inside the full greedy program (the auto-pipelined src_kv
    block costs a second buffer there). ``batch_tile`` falls back to the
    largest divisor of B when B is not a multiple of it — callers should
    pad the batch to a multiple of 16 instead of relying on that
    (make_fast_greedy_fn does; see its v2 padding).
    """
    b, hidden = x.shape
    # OPT-IN int8 self-cache: ``cache`` is then a
    # ([G, L, TB, 2H] int8, [G, L, 2*TB] f32 scales) pair — tiled
    # layout only (the scale chunks ride the same contiguous-leading-dim
    # DMA geometry as the cache chunks). The k/v scales share ONE merged
    # minor dim (k in lanes [:TB], v in [TB:]) because Mosaic DMA slices
    # need a 128-aligned minor dim — so the tile must satisfy
    # 2*TB % 128 == 0 (the production tb=64).
    cache_quant = isinstance(cache, tuple)
    cache_scale = None
    if cache_quant:
        cache, cache_scale = cache
        if not tiled_cache:
            raise ValueError("int8 cache_quant requires tiled_cache=True")
        if slot_in_kernel:
            raise ValueError("int8 cache_quant excludes slot_in_kernel")
    tb = _pick_batch_tile(b, batch_tile, sublane16=tiled_cache)
    if tiled_cache:
        # cache is [G, L, TB, 2H] (see tiled_cache_shape); the tile used
        # at allocation must equal the kernel's batch tile
        g, max_len, tb_c, twoh = cache.shape
        assert tb_c == tb and g * tb == b, (cache.shape, tb, b)
        if cache_quant:
            assert cache_scale.shape == (g, max_len, 2 * tb), (
                cache_scale.shape, cache.shape
            )
            if (2 * tb) % 128 != 0 and not interpret:
                raise ValueError(
                    "int8 cache_quant needs 2*batch_tile % 128 == 0 "
                    f"(got tile {tb}): the merged k|v scale minor dim "
                    "must be 128-aligned for the Mosaic chunk DMA"
                )
    else:
        max_len = cache.shape[1]
    assert max_len % chunk == 0, (max_len, chunk)
    s_len = src_kv.shape[1]
    grid = (b // tb,)

    (w_qkv, b_qkv, w_out, b_out, ln1, w_q2, b_q2, w_out2, b_out2, ln2,
     w_ff0, b_ff0, w_ff1, b_ff1, ln3) = weights
    filter_dim = w_ff0.shape[1]

    def batch_spec(shape):
        return pl.BlockSpec(
            (tb,) + shape, lambda i, *_: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    def full_spec(shape):
        return pl.BlockSpec(
            shape, lambda i, *_: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    if slot_in_kernel and not tiled_cache:
        # Mosaic rejects the in-kernel row DMA on the flat [B, L, 2H]
        # cache: a 1-row slice along L is unaligned to the (8, 128)
        # HBM tiling (L is the sublane dim) — the same layout fact that
        # makes the external XLA DUS cost ~16.5us. The tiled
        # [G, L, TB, 2H] layout slices only untiled leading dims.
        raise ValueError("slot_in_kernel requires tiled_cache=True")
    src_quant = src_scale is not None
    if not 2 <= chunk_bufs <= 8:
        raise ValueError(f"chunk_bufs must be in [2, 8], got {chunk_bufs}")
    kernel = functools.partial(
        _kernel, head_num=head_num, chunk=chunk,
        cache_outputs=cache_outputs, tiled=tiled_cache, src_hbm=src_hbm,
        slot_write=slot_in_kernel, src_quant=src_quant,
        cache_quant=cache_quant, chunk_bufs=chunk_bufs,
    )
    chunk_buf_shape = (
        (chunk_bufs, chunk, tb, 2 * hidden) if tiled_cache
        else (chunk_bufs, tb, chunk, 2 * hidden)
    )
    src_spec = (
        pl.BlockSpec(memory_space=pl.ANY) if src_hbm
        else batch_spec((s_len, 2 * hidden))
    )
    scratch = [
        pltpu.VMEM(chunk_buf_shape, cache.dtype),
        pltpu.VMEM((tb, head_num), jnp.float32),
        pltpu.VMEM((tb, head_num), jnp.float32),
        pltpu.VMEM((tb, hidden), jnp.float32),
        pltpu.SemaphoreType.DMA((chunk_bufs,)),
    ]
    if cache_quant:
        scratch += [
            pltpu.VMEM((chunk_bufs, chunk, 2 * tb), cache_scale.dtype),
            pltpu.SemaphoreType.DMA((chunk_bufs,)),
        ]
    if src_hbm:
        scratch += [
            pltpu.VMEM((tb, s_len, 2 * hidden), src_kv.dtype),
            pltpu.SemaphoreType.DMA,
        ]
        if src_quant:
            scratch += [
                pltpu.VMEM((tb, 2, s_len), src_scale.dtype),
                pltpu.SemaphoreType.DMA,
            ]
    if slot_in_kernel:
        scratch += [
            pltpu.VMEM((tb, 2 * hidden), cache.dtype),
            pltpu.SemaphoreType.DMA,
        ]
        # the second output IS the cache (aliased to input 2 — indices
        # count the pos scalar, as in fused_decode.py); the kernel DMAs
        # the slot row, so no XLA DUS (and no [B,2H]->[B,1,2H] layout
        # copy) runs outside
        out_specs_1 = pl.BlockSpec(memory_space=pl.ANY)
        out_shape_1 = jax.ShapeDtypeStruct(cache.shape, cache.dtype)
        aliases = {2: 1}
    else:
        out_specs_1 = batch_spec((2 * hidden,))
        out_shape_1 = jax.ShapeDtypeStruct((b, 2 * hidden), cache.dtype)
        aliases = {}
    extra_out_specs, extra_out_shapes = [], []
    if cache_quant:
        # 3-d [G, 1, 2*TB] (not [G, 2*TB]): the block's last two dims
        # must each be tile-divisible or equal the array dim — (1, 2*TB)
        # over a 2-d array fails the sublane rule, (1, 1, 2*TB) passes
        extra_out_specs = [pl.BlockSpec(
            (1, 1, 2 * tb), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )]
        extra_out_shapes = [
            jax.ShapeDtypeStruct((b // tb, 1, 2 * tb), cache_scale.dtype)
        ]
    results = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                batch_spec((hidden,)),
                pl.BlockSpec(memory_space=pl.ANY),  # cache stays in HBM
            ] + (
                # cache scales stay in HBM too (chunk-DMA'd with the cache)
                [pl.BlockSpec(memory_space=pl.ANY)] if cache_quant else []
            ) + [
                src_spec,
            ] + ([
                pl.BlockSpec(memory_space=pl.ANY) if src_hbm
                else batch_spec((2, s_len))
            ] if src_quant else []) + [
                full_spec(w_qkv.shape),
                full_spec((1, 3 * hidden)),
                full_spec(w_out.shape),
                full_spec((1, hidden)),
                full_spec((2, hidden)),
                full_spec(w_q2.shape),
                full_spec((1, hidden)),
                full_spec(w_out2.shape),
                full_spec((1, hidden)),
                full_spec((2, hidden)),
                full_spec(w_ff0.shape),
                full_spec((1, filter_dim)),
                full_spec(w_ff1.shape),
                full_spec((1, hidden)),
                full_spec((2, hidden)),
            ],
            out_specs=[
                batch_spec((hidden,)),
                out_specs_1,
            ] + extra_out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, hidden), x.dtype),
            out_shape_1,
        ] + extra_out_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
    )(
        pos.reshape(1).astype(jnp.int32),
        x,
        cache,
        *((cache_scale,) if cache_quant else ()),
        src_kv,
        *((src_scale,) if src_quant else ()),
        w_qkv,
        b_qkv.reshape(1, -1),
        w_out,
        b_out.reshape(1, -1),
        jnp.stack([ln1[0], ln1[1]]),
        w_q2,
        b_q2.reshape(1, -1),
        w_out2,
        b_out2.reshape(1, -1),
        jnp.stack([ln2[0], ln2[1]]),
        w_ff0,
        b_ff0.reshape(1, -1),
        w_ff1,
        b_ff1.reshape(1, -1),
        jnp.stack([ln3[0], ln3[1]]),
    )
    if cache_quant:
        out, kv_slot, slot_scales = results
        new_cache = jax.lax.dynamic_update_slice(
            cache,
            kv_slot.reshape(b // tb, 1, tb, 2 * hidden),
            (0, pos, 0, 0),
        )
        new_scale = jax.lax.dynamic_update_slice(
            cache_scale, slot_scales, (0, pos, 0)
        )
        return out, (new_cache, new_scale)
    out, kv_slot = results
    if slot_in_kernel:
        return out, kv_slot  # kv_slot IS the updated (aliased) cache
    if tiled_cache:
        new_cache = jax.lax.dynamic_update_slice(
            cache,
            kv_slot.reshape(b // tb, 1, tb, 2 * hidden),
            (0, pos, 0, 0),
        )
    else:
        new_cache = jax.lax.dynamic_update_slice(
            cache, kv_slot[:, None, :], (0, pos, 0)
        )
    return out, new_cache


def _pick_batch_tile(b: int, batch_tile: int, *, sublane16: bool) -> int:
    """Tile selection shared by the kernel and ``tiled_cache_shape``.

    An exactly-dividing ``batch_tile`` is the caller's explicit choice
    and is honored as-is (tiny interpret-mode tests use tb=2). Otherwise
    the largest divisor of ``b`` is the fallback — and for ``sublane16``
    (the tiled-cache layout) the fallback must be a multiple of the bf16
    sublane tile 16: the tiled kernel's (CK, TB, H) -> (CK*TB, H)
    reshape is only layout-free then, so a silent tb=24 (e.g. b=48 with
    the default tile 32) would fail Mosaic compile after the cache was
    already allocated. Raises with a padding hint when no such tile
    exists rather than baking a doomed allocation."""
    if batch_tile >= 1 and b % batch_tile == 0:
        return batch_tile  # implies batch_tile <= b
    tb = min(batch_tile, b)
    while tb >= 1 and (b % tb or (sublane16 and tb % 16)):
        tb -= 1
    if sublane16 and (tb < 1 or tb % 16):
        raise ValueError(
            f"tiled_cache: no batch tile <= {batch_tile} divides "
            f"batch {b} while keeping the bf16 sublane-16 constraint; "
            f"pad the batch to a multiple of 16 (make_fast_greedy_fn "
            f"does) or pass an exactly-dividing batch_tile"
        )
    return tb


def tiled_cache_shape(batch: int, max_len: int, hidden: int,
                      batch_tile: int = 32) -> Tuple[int, int, int, int]:
    """[G, L, TB, 2H] allocation shape for ``tiled_cache=True`` (one
    prefix chunk per grid tile is a single contiguous HBM region). Uses
    the same tile-fallback rule as ``decoder_layer_step_v2`` (sublane-16
    constrained — the tile is baked into the allocation)."""
    tb = _pick_batch_tile(batch, batch_tile, sublane16=True)
    return (batch // tb, max_len, tb, 2 * hidden)
