"""Pallas TPU kernel v3: the whole decoder STACK as one launch per step.

Round-3 marginal-slope probes (docs/PERFORMANCE.md, examples/
decode_decompose.py --fixed-probes) showed the v2 per-layer design's
cost is dominated by per-launch overhead when pallas_calls run
back-to-back: a lone layer kernel steps at 47us but each of three
adjacent launches costs ~100us, and removing the layer->layer data
dependency does NOT close the gap. The round-2 whole-step megakernel
(ops/pallas/fused_decode.py) already proved manual serialized DMAs
lose more than saved launches gain — so v3 keeps Pallas's AUTOMATIC
block pipelining and removes launches instead:

- ONE pallas_call per AR step with grid (batch_tiles, num_layers),
  layer innermost. Grid steps execute sequentially on the core, so
  layer l+1 of a tile follows layer l with the layer's activation
  carried in VMEM scratch — no HBM round trip, no launch boundary;
- per-layer weights are STACKED ([NL, ...]) inputs whose block index
  maps select layer l: the auto-pipeline double-buffers layer l+1's
  weights while layer l computes — the overlap the fused kernel lost;
- per-layer KV caches ([NL, B, L, 2H], ANY) keep v2's prefix-chunk
  double-buffered manual DMA; per-layer cross K/V ([NL, B, S, 2H],
  ANY) uses v2's src_hbm single-buffer manual copy (started at kernel
  top, awaited at cross-attention);
- all NL future-slot K/Vs come back as ONE [NL, B, 2H] output and are
  scattered into the stacked cache by a single XLA dynamic_update_slice
  (3 DUS -> 1).

The per-layer math is identical to v2 (lane-parallel head contractions
against an iota-built [H, heads] indicator, online softmax over prefix
chunks, bf16 compute with f32 stats) — see decoder_layer_v2.py for the
derivation and reference provenance (EfficientSATRN.py:539-557).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from p4fr_tpu.ops.pallas.decoder_layer_v2 import _head_indicator

NEG_INF = -1e9


def _kernel(
    # scalar prefetch
    pos_ref,  # [1] int32
    # inputs
    x_ref,  # [TB, H] VMEM (same block for every layer of a tile)
    cache_hbm,  # [NL, B, L, 2H] ANY
    src_hbm,  # [NL, B, S, 2H] ANY
    w_qkv_ref, b_qkv_ref,  # [1, H, 3H], [1, 1, 3H] VMEM blocks (layer l)
    w_out_ref, b_out_ref, ln1_ref,
    w_q2_ref, b_q2_ref, w_out2_ref, b_out2_ref, ln2_ref,
    w_ff0_ref, b_ff0_ref, w_ff1_ref, b_ff1_ref, ln3_ref,
    # outputs
    out_ref,  # [TB, H] VMEM (flushed after the tile's last layer)
    slot_ref,  # [1, TB, 2H] VMEM — layer l's K/V to scatter at ``pos``
    # scratch (persists across grid steps)
    x_buf,  # [TB, H] — the activation carried layer -> layer
    chunk_buf,  # [2, TB, CK, 2H]
    m_buf,  # [TB, HEADS] f32
    l_buf,  # [TB, HEADS] f32
    acc_buf,  # [TB, H] f32
    src_buf,  # [TB, S, 2H]
    chunk_sem,  # DMA sem [2]
    src_sem,  # DMA sem
    *,
    head_num: int,
    chunk: int,
    cache_outputs: bool,
    num_layers: int,
):
    pos = pos_ref[0]
    i = pl.program_id(0)
    layer = pl.program_id(1)
    cdtype = chunk_buf.dtype
    tb, hidden = x_buf.shape
    temp = jnp.float32(hidden) ** 0.5
    rows = pl.ds(i * tb, tb)

    # cross K/V for THIS layer: single-buffered manual DMA, started
    # before the chunk walk so the prefix reads hide its latency
    src_copy = pltpu.make_async_copy(
        src_hbm.at[layer, rows], src_buf, src_sem
    )
    src_copy.start()

    @pl.when(layer == 0)
    def _():
        x_buf[:] = x_ref[:]

    x = x_buf[:].astype(cdtype)
    seg = _head_indicator(hidden, head_num).astype(cdtype)  # [H, heads]
    seg_t = seg.T

    def ln(y, ref):
        y = y.astype(jnp.float32)
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
        out = (
            (y - mean) * jax.lax.rsqrt(var + 1e-5)
            * ref[0, 0, :].astype(jnp.float32)
            + ref[0, 1, :].astype(jnp.float32)
        )
        return out.astype(cdtype)

    def seg_scores(q, k):
        t = k.shape[1]
        e = q[:, None, :] * k
        s = jnp.dot(
            e.reshape(tb * t, hidden), seg,
            preferred_element_type=jnp.float32,
        )
        return s.reshape(tb, t, head_num) / temp

    def seg_weighted_sum(p, v):
        t = v.shape[1]
        p_wide = jnp.dot(
            p.astype(cdtype).reshape(tb * t, head_num), seg_t,
            preferred_element_type=jnp.float32,
        ).astype(cdtype).reshape(tb, t, hidden)
        return jnp.sum((p_wide * v).astype(jnp.float32), axis=1)

    # ---- current token q/k/v -------------------------------------------
    w_qkv = w_qkv_ref[0].astype(cdtype)
    qkv = (
        jnp.dot(x, w_qkv, preferred_element_type=jnp.float32)
        + b_qkv_ref[0, 0, :].astype(jnp.float32)
    )
    q = qkv[:, :hidden].astype(cdtype)
    kv_cur = qkv[:, hidden:]  # [TB, 2H] f32

    m_buf[:] = jnp.dot(
        q * kv_cur[:, :hidden].astype(cdtype), seg,
        preferred_element_type=jnp.float32,
    ) / temp
    l_buf[:] = jnp.ones((tb, head_num), jnp.float32)
    acc_buf[:] = kv_cur[:, hidden:]

    def chunk_dma(slot, c):
        start = pl.multiple_of(c * chunk, chunk)
        return pltpu.make_async_copy(
            cache_hbm.at[layer, rows, pl.ds(start, chunk), :],
            chunk_buf.at[slot],
            chunk_sem.at[slot],
        )

    num_chunks = pl.cdiv(pos, chunk)

    @pl.when(num_chunks > 0)
    def _():
        chunk_dma(0, 0).start()

    def chunk_body(c, _):
        @pl.when(c + 1 < num_chunks)
        def _():
            chunk_dma((c + 1) % 2, c + 1).start()

        slot = c % 2
        chunk_dma(slot, c).wait()
        m_old = m_buf[:]
        k = chunk_buf[slot, :, :, :hidden]
        v = chunk_buf[slot, :, :, hidden:]
        s = seg_scores(q, k)  # [TB, CK, heads] f32
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (tb, chunk, head_num), 1
        )
        banned = (c * chunk + lane) >= pos
        s = jnp.where(banned, NEG_INF, s)
        m_new = jnp.maximum(m_old, jnp.max(s, axis=1))
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

    l_wide = jnp.dot(l_buf[:], seg_t.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    att = (acc_buf[:] / l_wide).astype(cdtype)
    att = (
        jnp.dot(att, w_out_ref[0].astype(cdtype),
                preferred_element_type=jnp.float32)
        + b_out_ref[0, 0, :].astype(jnp.float32)
    )
    out = ln(att + x.astype(jnp.float32), ln1_ref)

    # ---- cross attention ------------------------------------------------
    q2 = (
        jnp.dot(out, w_q2_ref[0].astype(cdtype),
                preferred_element_type=jnp.float32)
        + b_q2_ref[0, 0, :].astype(jnp.float32)
    ).astype(cdtype)
    src_copy.wait()
    ck = src_buf[:, :, :hidden].astype(cdtype)
    cv = src_buf[:, :, hidden:].astype(cdtype)
    s2 = seg_scores(q2, ck)
    s2 = s2 - jnp.max(s2, axis=1, keepdims=True)
    p2 = jnp.exp(s2)
    p2 = p2 / jnp.sum(p2, axis=1, keepdims=True)
    att2 = seg_weighted_sum(p2, cv).astype(cdtype)
    att2 = (
        jnp.dot(att2, w_out2_ref[0].astype(cdtype),
                preferred_element_type=jnp.float32)
        + b_out2_ref[0, 0, :].astype(jnp.float32)
    )
    out = ln(att2 + out.astype(jnp.float32), ln2_ref)

    # ---- FF --------------------------------------------------------------
    ff = jnp.maximum(
        jnp.dot(out, w_ff0_ref[0].astype(cdtype),
                preferred_element_type=jnp.float32)
        + b_ff0_ref[0, 0, :].astype(jnp.float32), 0.0,
    ).astype(cdtype)
    ff = jnp.maximum(
        jnp.dot(ff, w_ff1_ref[0].astype(cdtype),
                preferred_element_type=jnp.float32)
        + b_ff1_ref[0, 0, :].astype(jnp.float32), 0.0,
    )
    out = ln(ff + out.astype(jnp.float32), ln3_ref)

    if cache_outputs:
        kv_slot = (
            jnp.dot(out, w_qkv[:, hidden:],
                    preferred_element_type=jnp.float32)
            + b_qkv_ref[0, 0, hidden:].astype(jnp.float32)
        )
    else:
        kv_slot = kv_cur
    slot_ref[0] = kv_slot.astype(slot_ref.dtype)
    x_buf[:] = out
    out_ref[:] = out.astype(out_ref.dtype)


def stack_fast_layers(layers) -> Tuple[jnp.ndarray, ...]:
    """Tuple of FastLayer -> stacked [NL, ...] arrays in kernel order.

    LayerNorm scale/bias pairs stack to [NL, 2, H]; biases to [NL, 1, D]
    so every block keeps a >=2D trailing shape for Mosaic.
    """
    def s(field):
        return jnp.stack([getattr(l, field) for l in layers])

    def s2(a_field, b_field):
        return jnp.stack([
            jnp.stack([getattr(l, a_field), getattr(l, b_field)])
            for l in layers
        ])

    def sb(field):
        return jnp.stack([getattr(l, field)[None, :] for l in layers])

    return (
        s("w_qkv"), sb("b_qkv"), s("w_out"), sb("b_out"),
        s2("ln1_scale", "ln1_bias"),
        s("w_q2"), sb("b_q2"), s("w_out2"), sb("b_out2"),
        s2("ln2_scale", "ln2_bias"),
        s("w_ff0"), sb("b_ff0"), s("w_ff1"), sb("b_ff1"),
        s2("ln3_scale", "ln3_bias"),
    )


@functools.partial(
    jax.jit,
    static_argnames=("head_num", "cache_outputs", "batch_tile", "chunk",
                     "interpret"),
)
def decoder_stack_step_v3(
    x: jnp.ndarray,  # [B, H]
    pos: jnp.ndarray,  # scalar int32
    caches: jnp.ndarray,  # [NL, B, L, 2H]; L a multiple of ``chunk``
    src_kv: jnp.ndarray,  # [NL, B, S, 2H]
    stacked: Tuple[jnp.ndarray, ...],  # from stack_fast_layers
    *,
    head_num: int,
    cache_outputs: bool = True,
    batch_tile: int = 32,
    chunk: int = 64,
    interpret: bool = False,
):
    """All-layers AR step -> (out [B, H], new stacked caches).

    One launch; grid (B/TB, NL) with layers innermost; x carried in VMEM
    scratch between layers; ONE dynamic_update_slice scatters every
    layer's future-slot K/V.
    """
    b, hidden = x.shape
    nl = caches.shape[0]
    tb = min(batch_tile, b)
    while b % tb:
        tb -= 1
    max_len = caches.shape[2]
    assert max_len % chunk == 0, (max_len, chunk)
    s_len = src_kv.shape[2]
    grid = (b // tb, nl)

    (w_qkv, b_qkv, w_out, b_out, ln1, w_q2, b_q2, w_out2, b_out2, ln2,
     w_ff0, b_ff0, w_ff1, b_ff1, ln3) = stacked
    filter_dim = w_ff0.shape[2]

    def tile_spec(shape):
        # same block for every layer of a tile (index constant in l)
        return pl.BlockSpec(
            (tb,) + shape, lambda i, l, *_: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    def layer_spec(shape):
        # one layer's slab; the auto-pipeline prefetches layer l+1
        return pl.BlockSpec(
            (1,) + shape, lambda i, l, *_: (l,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(
        _kernel, head_num=head_num, chunk=chunk,
        cache_outputs=cache_outputs, num_layers=nl,
    )
    cdtype = caches.dtype
    out, kv_slots = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                tile_spec((hidden,)),
                pl.BlockSpec(memory_space=pl.ANY),  # caches
                pl.BlockSpec(memory_space=pl.ANY),  # src K/V
                layer_spec(w_qkv.shape[1:]),
                layer_spec((1, 3 * hidden)),
                layer_spec(w_out.shape[1:]),
                layer_spec((1, hidden)),
                layer_spec((2, hidden)),
                layer_spec(w_q2.shape[1:]),
                layer_spec((1, hidden)),
                layer_spec(w_out2.shape[1:]),
                layer_spec((1, hidden)),
                layer_spec((2, hidden)),
                layer_spec(w_ff0.shape[1:]),
                layer_spec((1, filter_dim)),
                layer_spec(w_ff1.shape[1:]),
                layer_spec((1, hidden)),
                layer_spec((2, hidden)),
            ],
            out_specs=[
                tile_spec((hidden,)),
                pl.BlockSpec(
                    (1, tb, 2 * hidden),
                    lambda i, l, *_: (l, i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((tb, hidden), x.dtype),
                pltpu.VMEM((2, tb, chunk, 2 * hidden), cdtype),
                pltpu.VMEM((tb, head_num), jnp.float32),
                pltpu.VMEM((tb, head_num), jnp.float32),
                pltpu.VMEM((tb, hidden), jnp.float32),
                pltpu.VMEM((tb, s_len, 2 * hidden), src_kv.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, hidden), x.dtype),
            jax.ShapeDtypeStruct((nl, b, 2 * hidden), cdtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        pos.reshape(1).astype(jnp.int32),
        x,
        caches,
        src_kv,
        w_qkv, b_qkv, w_out, b_out, ln1,
        w_q2, b_q2, w_out2, b_out2, ln2,
        w_ff0, b_ff0, w_ff1, b_ff1, ln3,
    )
    new_caches = jax.lax.dynamic_update_slice(
        caches, kv_slots[:, :, None, :], (0, 0, pos, 0)
    )
    return out, new_caches
