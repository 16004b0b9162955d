"""Pallas TPU kernel v2: flash-decode style fused decoder-layer AR step.

Fixes the two bandwidth flaws measured in v1 (``decoder_layer.py``):

1. the KV cache stays **resident in HBM** (``memory_space=ANY``); the
   kernel DMAs it in chunks and writes back ONLY the one updated slot
   (v1 round-tripped the whole [TB, L, 2H] block every step);
2. only chunks strictly before ``pos`` are fetched (prefix reads — the
   average read volume is half the padded length), with the current
   position's K/V taken straight from registers.

Mechanics:

- online softmax across chunks: per head, carry (m, l, acc) in VMEM
  scratch, seeded with the current position's contribution;
- double-buffered chunk DMA (start chunk c+1 before computing chunk c);
- the future-slot K/V (reference parity: the layer OUTPUT's projection)
  is returned as a [B, 2H] output and scattered into the cache by ONE XLA
  dynamic_update_slice on the donated scan carry (a tiled HBM memref
  cannot be DMA-sliced at an arbitrary row, so the in-kernel slot write
  is not expressible; the XLA DUS writes only the slot, preserving the
  bandwidth win);
- grid over batch tiles; weights in VMEM; matmuls on the MXU in f32.

Numerics match ``fast_decode_step`` (softmax reassociation differences
are ~1e-6 in f32; argmax-identical in bf16); parity-tested in interpret
mode in tests/test_pallas_decoder_layer.py.

STATUS: EXPERIMENTAL — on this environment's axon remote-compile service
the Mosaic compile of this kernel at production dims (H=256, 4 chunks x
8 heads unrolled, predicated DMA regions) takes >10 minutes for a single
layer step, which makes it unusable in practice here even though the
design removes v1's bandwidth flaws. Next iterations: collapse the
per-head python unrolls into lane-parallel [TB, heads*CK] contractions
to shrink the MLIR, or a fori_loop over chunks with ref-carried online
softmax state. The jnp fast path (decoding/fast_step.py) remains the
production decode.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _kernel(
    # scalar prefetch
    pos_ref,  # [1] int32
    # inputs
    x_ref,  # [TB, H] VMEM
    cache_hbm,  # [B, L, 2H] ANY (aliased to output 1)
    src_kv_ref,  # [TB, S, 2H] VMEM
    w_qkv_ref, b_qkv_ref,
    w_out_ref, b_out_ref, ln1_ref,
    w_q2_ref, b_q2_ref, w_out2_ref, b_out2_ref, ln2_ref,
    w_ff0_ref, b_ff0_ref, w_ff1_ref, b_ff1_ref, ln3_ref,
    # outputs
    out_ref,  # [TB, H] VMEM
    slot_ref,  # [TB, 2H] VMEM — K/V to scatter at ``pos`` (XLA DUS)
    # scratch
    chunk_buf,  # [2, TB, CK, 2H] VMEM
    m_buf,  # [TB, HEADS] f32
    l_buf,  # [TB, HEADS] f32
    acc_buf,  # [TB, H] f32
    chunk_sem,  # DMA sem [2]
    *,
    head_num: int,
    chunk: int,
    cache_outputs: bool,
):
    pos = pos_ref[0]
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)
    tb, hidden = x.shape
    max_len = cache_hbm.shape[1]
    num_chunks = max_len // chunk
    head_dim = hidden // head_num
    temp = jnp.float32(hidden) ** 0.5
    rows = pl.ds(i * tb, tb)

    def ln(y, ref):
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
        return (
            (y - mean) * jax.lax.rsqrt(var + 1e-5)
            * ref[0, :].astype(jnp.float32)
            + ref[1, :].astype(jnp.float32)
        )

    # ---- current token q/k/v ------------------------------------------
    w_qkv = w_qkv_ref[:].astype(jnp.float32)
    qkv = (
        jnp.dot(x, w_qkv, preferred_element_type=jnp.float32)
        + b_qkv_ref[0, :].astype(jnp.float32)
    )
    q = qkv[:, :hidden]
    kv_cur = qkv[:, hidden:]  # [TB, 2H]

    # seed the online softmax with the current position's contribution
    for h in range(head_num):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        vsl = slice(hidden + h * head_dim, hidden + (h + 1) * head_dim)
        s_self = jnp.sum(q[:, sl] * kv_cur[:, sl], axis=-1) / temp  # [TB]
        m_buf[:, h] = s_self
        l_buf[:, h] = jnp.ones_like(s_self)
        acc_buf[:, sl] = kv_cur[:, vsl]

    def chunk_dma(slot, c):
        return pltpu.make_async_copy(
            cache_hbm.at[rows, pl.ds(c * chunk, chunk), :],
            chunk_buf.at[slot],
            chunk_sem.at[slot],
        )

    # start first chunk DMA if any prefix exists
    @pl.when(pos > 0)
    def _():
        chunk_dma(0, 0).start()

    # unrolled prefix chunks with double buffering
    for c in range(num_chunks):
        start = c * chunk

        @pl.when(start < pos)
        def _(c=c, start=start):
            # prefetch next needed chunk (static bound keeps slices legal)
            if c + 1 < num_chunks:
                @pl.when((c + 1) * chunk < pos)
                def _():
                    chunk_dma((c + 1) % 2, c + 1).start()

            chunk_dma(c % 2, c).wait()
            lane = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)[:, 0]
            banned = (start + lane) >= pos  # strictly-before prefix
            for h in range(head_num):
                sl = slice(h * head_dim, (h + 1) * head_dim)
                vsl = slice(
                    hidden + h * head_dim, hidden + (h + 1) * head_dim
                )
                # slice per head straight from the ref: only [TB, CK, dh]
                # tiles hit the VMEM stack
                k_h = chunk_buf[c % 2, :, :, sl].astype(jnp.float32)
                v_h = chunk_buf[c % 2, :, :, vsl].astype(jnp.float32)
                s = jnp.sum(q[:, sl][:, None, :] * k_h, axis=-1) / temp
                s = jnp.where(banned[None, :], NEG_INF, s)
                m_old = m_buf[:, h]
                m_new = jnp.maximum(m_old, jnp.max(s, axis=-1))
                corr = jnp.exp(m_old - m_new)
                p = jnp.exp(s - m_new[:, None])
                l_buf[:, h] = l_buf[:, h] * corr + jnp.sum(p, axis=-1)
                acc_buf[:, sl] = (
                    acc_buf[:, sl] * corr[:, None]
                    + jnp.sum(p[:, :, None] * v_h, axis=1)
                )
                m_buf[:, h] = m_new

    # normalize heads
    att_heads = []
    for h in range(head_num):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        att_heads.append(acc_buf[:, sl] / l_buf[:, h][:, None])
    att = jnp.concatenate(att_heads, axis=-1)
    att = (
        jnp.dot(att, w_out_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
        + b_out_ref[0, :].astype(jnp.float32)
    )
    out = ln(att + x, ln1_ref)

    # ---- cross attention (src fits in VMEM, plain softmax) -------------
    q2 = (
        jnp.dot(out, w_q2_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
        + b_q2_ref[0, :].astype(jnp.float32)
    )
    ctx_heads = []
    for h in range(head_num):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        vsl = slice(hidden + h * head_dim, hidden + (h + 1) * head_dim)
        k_h = src_kv_ref[:, :, sl].astype(jnp.float32)
        v_h = src_kv_ref[:, :, vsl].astype(jnp.float32)
        s = jnp.sum(q2[:, sl][:, None, :] * k_h, axis=-1) / temp
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        ctx_heads.append(jnp.sum(p[:, :, None] * v_h, axis=1))
    att2 = jnp.concatenate(ctx_heads, axis=-1)
    att2 = (
        jnp.dot(att2, w_out2_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
        + b_out2_ref[0, :].astype(jnp.float32)
    )
    out = ln(att2 + out, ln2_ref)

    # ---- FF -------------------------------------------------------------
    ff = jnp.maximum(
        jnp.dot(out, w_ff0_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
        + b_ff0_ref[0, :].astype(jnp.float32), 0.0,
    )
    ff = jnp.maximum(
        jnp.dot(ff, w_ff1_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
        + b_ff1_ref[0, :].astype(jnp.float32), 0.0,
    )
    out = ln(ff + out, ln3_ref)

    # ---- slot to scatter (XLA applies the dynamic_update_slice) ----------
    if cache_outputs:
        kv_slot = (
            jnp.dot(out, w_qkv[:, hidden:],
                    preferred_element_type=jnp.float32)
            + b_qkv_ref[0, hidden:].astype(jnp.float32)
        )
    else:
        kv_slot = kv_cur
    slot_ref[:] = kv_slot.astype(slot_ref.dtype)
    out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("head_num", "cache_outputs", "batch_tile", "chunk",
                     "interpret"),
)
def decoder_layer_step_v2(
    x: jnp.ndarray,  # [B, H]
    pos: jnp.ndarray,  # scalar int32
    cache: jnp.ndarray,  # [B, L, 2H]; L must be a multiple of ``chunk``
    src_kv: jnp.ndarray,  # [B, S, 2H]
    weights: Tuple[jnp.ndarray, ...],
    *,
    head_num: int,
    cache_outputs: bool = True,
    batch_tile: int = 16,
    chunk: int = 64,
    interpret: bool = False,
):
    """Flash-decode fused layer step -> (out [B, H], new cache)."""
    b, hidden = x.shape
    tb = min(batch_tile, b)
    assert b % tb == 0, (b, tb)
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

    kernel = functools.partial(
        _kernel, head_num=head_num, chunk=chunk, cache_outputs=cache_outputs
    )
    out, kv_slot = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                batch_spec((hidden,)),
                pl.BlockSpec(memory_space=pltpu.ANY),  # cache stays in HBM
                batch_spec((s_len, 2 * hidden)),
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
                batch_spec((2 * hidden,)),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, tb, chunk, 2 * hidden), cache.dtype),
                pltpu.VMEM((tb, head_num), jnp.float32),
                pltpu.VMEM((tb, head_num), jnp.float32),
                pltpu.VMEM((tb, hidden), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, hidden), x.dtype),
            jax.ShapeDtypeStruct((b, 2 * hidden), cache.dtype),
        ],
        interpret=interpret,
    )(
        pos.reshape(1).astype(jnp.int32),
        x,
        cache,
        src_kv,
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
    new_cache = jax.lax.dynamic_update_slice(
        cache, kv_slot[:, None, :], (0, pos, 0)
    )
    return out, new_cache
