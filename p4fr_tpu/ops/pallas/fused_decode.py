"""Pallas TPU kernel: the ENTIRE greedy AR decode step in one launch.

The v2 flash-decode layer kernel (decoder_layer_v2.py) left ~200us/step of
pure dispatch on the table: 3 pallas launches + 3 XLA dynamic_update_slices
+ ~10 glue ops (embedding gather, logits matmul, argmax, DecodingManager
sift) per generated token. This kernel fuses ALL of it:

- embedding lookup + sinusoid positional add (one-hot matmuls — exact);
- all ``layer_num`` decoder layers in a ``fori_loop`` over stacked weight
  tensors ([NL, ...] leading dim, dynamically indexed);
- self-attention over a TIME-MAJOR HBM-resident cache [NL, L, B, 2H]:
  prefix chunks DMA'd with double buffering + online softmax (the same
  lane-parallel head contractions as v2), and the new K/V slot written
  back IN-KERNEL with a DMA to ``cache[l, pos, rows]`` — legal because
  ``L`` is an untiled leading dim, unlike the batch-major layout where
  the row scatter needed an XLA DUS per layer per step;
- cross-attention K/V streamed per layer from HBM (read-only);
- generator matmul -> masked argmax implementing DecodingManager.sift
  semantics (decoding/manager.py): always-ban, bracket balance,
  cannot-initial after <SOS>, repeat limits — as [TB, Vp] vector ops on
  manager state carried as a [B, 4] int32 array;
- next token + updated state returned; caches aliased input->output so
  the scan carry never copies.

Per step the only XLA-level work left is the scan bookkeeping: one launch
instead of ~16 ops. Matmuls run in the model dtype (bf16 on TPU) with f32
accumulation — same numeric class as the production jnp fast path; online
softmax stats and LayerNorm in f32.

Reference semantics: /root/reference/networks/EfficientSATRN.py:539-557
(attend including current position, layer-OUTPUT K/V write-back quirk) and
/root/reference/postprocessing/postprocessing.py:192-231 (sift).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _head_indicator(hidden: int, head_num: int, dtype):
    dh = hidden // head_num
    row = jax.lax.broadcasted_iota(jnp.int32, (hidden, head_num), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (hidden, head_num), 1)
    return (row // dh == col).astype(dtype)


def _kernel(
    # scalar prefetch
    pos_ref,  # [1] int32
    # inputs
    token_ref,  # [TB, 1] int32
    cache_hbm,  # [NL, L, B, 2H] ANY (aliased to output)
    cross_hbm,  # [NL, B, S, 2H] ANY
    w_qkv_ref,  # [NL, H, 3H]
    b_qkv_ref,  # [NL, 1, 3H]
    w_out_ref, b_out_ref, ln1_ref,  # [NL,H,H] [NL,1,H] [NL,2,H]
    w_q2_ref, b_q2_ref, w_out2_ref, b_out2_ref, ln2_ref,
    w_ff0_ref, b_ff0_ref, w_ff1_ref, b_ff1_ref, ln3_ref,
    embed_ref,  # [Vp, H]  (embed * sqrt(H), zero-padded rows)
    pe_ref,  # [Lp, H]
    w_gen_ref,  # [H, Vp]
    b_gen_ref,  # [1, Vp]  (NEG_INF on pad lanes)
    man_ref,  # [3, Vp] f32: always_ban | cannot_initial | repeat_limit
    mstate_ref,  # [TB, 4] int32: last, run, lbrackets, rbrackets
    # outputs
    tok_out_ref,  # [TB, 1] int32
    mstate_out_ref,  # [TB, 4] int32
    logits_out_ref,  # [TB, Vp] f32
    cache_out_hbm,  # [NL, L, B, 2H] ANY — aliased to cache_hbm
    # scratch
    chunk_buf,  # [2, CK, TB, 2H]
    cross_buf,  # [TB, S, 2H]
    slot_buf,  # [NL, TB, 2H]
    chunk_sem,  # DMA [2]
    cross_sem,  # DMA []
    slot_sem,  # DMA [NL]
    *,
    layer_num: int,
    head_num: int,
    chunk: int,
    cache_outputs: bool,
    use_manager: bool,
    sos_id: int,
    eos_id: int,
    lbrace_id: int,
    rbrace_id: int,
    vocab_size: int,
):
    pos = pos_ref[0]
    i = pl.program_id(0)
    tb = token_ref.shape[0]
    hidden = embed_ref.shape[1]
    vp = embed_ref.shape[0]
    s_len = cross_buf.shape[1]
    cdtype = chunk_buf.dtype  # compute dtype (bf16 on TPU, f32 interp)
    temp = jnp.float32(hidden) ** 0.5
    rows = pl.ds(i * tb, tb)
    seg = _head_indicator(hidden, head_num, cdtype)  # [H, heads]
    seg_t = seg.T

    def ln(y, ref, l):
        y = y.astype(jnp.float32)
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
        out = (
            (y - mean) * jax.lax.rsqrt(var + 1e-5)
            * ref[l, 0, :].astype(jnp.float32)
            + ref[l, 1, :].astype(jnp.float32)
        )
        return out.astype(cdtype)

    # ---- embedding + positional encoding (one-hot matmuls, exact) ------
    lane_v = jax.lax.broadcasted_iota(jnp.int32, (tb, vp), 1)
    onehot_tok = (lane_v == token_ref[:, 0][:, None]).astype(cdtype)
    x = jnp.dot(onehot_tok, embed_ref[:], preferred_element_type=jnp.float32)
    lp = pe_ref.shape[0]
    onehot_pos = (
        jax.lax.broadcasted_iota(jnp.int32, (1, lp), 1) == pos
    ).astype(cdtype)
    pe_row = jnp.dot(onehot_pos, pe_ref[:],
                     preferred_element_type=jnp.float32)
    x = (x + pe_row).astype(cdtype)  # [TB, H]

    num_chunks = pl.cdiv(pos, chunk)

    def chunk_dma(slot, l, c):
        start = pl.multiple_of(c * chunk, chunk)
        return pltpu.make_async_copy(
            cache_hbm.at[l, pl.ds(start, chunk), rows, :],
            chunk_buf.at[slot],
            chunk_sem.at[slot],
        )

    def cross_dma(l):
        return pltpu.make_async_copy(
            cross_hbm.at[l, rows, :, :], cross_buf, cross_sem
        )

    def layer_body(l, x):
        # stream this layer's cross K/V while self-attention runs
        cross_dma(l).start()

        w_qkv = w_qkv_ref[l]  # [H, 3H]
        qkv = (
            jnp.dot(x, w_qkv, preferred_element_type=jnp.float32)
            + b_qkv_ref[l, 0, :].astype(jnp.float32)
        )
        q = qkv[:, :hidden].astype(cdtype)
        kv_cur = qkv[:, hidden:]  # [TB, 2H] f32

        # online softmax seeded with the current position
        m = (
            jnp.dot(q * kv_cur[:, :hidden].astype(cdtype), seg,
                    preferred_element_type=jnp.float32) / temp
        )  # [TB, heads]
        lsum = jnp.ones((tb, head_num), jnp.float32)
        acc = kv_cur[:, hidden:]  # [TB, H] f32

        @pl.when(num_chunks > 0)
        def _():
            chunk_dma(0, l, 0).start()

        def chunk_body(c, carry):
            m, lsum, acc = carry

            @pl.when(c + 1 < num_chunks)
            def _():
                chunk_dma((c + 1) % 2, l, c + 1).start()

            slot = c % 2
            chunk_dma(slot, l, c).wait()
            k = chunk_buf[slot, :, :, :hidden]  # [CK, TB, H] cdtype
            v = chunk_buf[slot, :, :, hidden:]
            e = q[None, :, :] * k  # [CK, TB, H]
            s = jnp.dot(
                e.reshape(chunk * tb, hidden), seg,
                preferred_element_type=jnp.float32,
            ).reshape(chunk, tb, head_num) / temp
            t_idx = jax.lax.broadcasted_iota(
                jnp.int32, (chunk, tb, head_num), 0
            )
            banned = (c * chunk + t_idx) >= pos
            s = jnp.where(banned, NEG_INF, s)
            m_new = jnp.maximum(m, jnp.max(s, axis=0))  # [TB, heads]
            corr = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new[None, :, :])
            p = jnp.where(banned, 0.0, p)
            lsum_new = lsum * corr + jnp.sum(p, axis=0)
            p_wide = jnp.dot(
                p.astype(cdtype).reshape(chunk * tb, head_num), seg_t,
                preferred_element_type=jnp.float32,
            ).reshape(chunk, tb, hidden).astype(cdtype)
            acc_new = (
                acc * jnp.dot(corr, seg_t,
                              preferred_element_type=jnp.float32)
                + jnp.sum((p_wide * v).astype(jnp.float32), axis=0)
            )
            return m_new, lsum_new, acc_new

        m, lsum, acc = jax.lax.fori_loop(
            0, num_chunks, chunk_body, (m, lsum, acc)
        )
        l_wide = jnp.dot(lsum, seg_t, preferred_element_type=jnp.float32)
        att = (acc / l_wide).astype(cdtype)
        att = (
            jnp.dot(att, w_out_ref[l], preferred_element_type=jnp.float32)
            + b_out_ref[l, 0, :].astype(jnp.float32)
        )
        out = ln(att + x.astype(jnp.float32), ln1_ref, l)

        # ---- cross attention over the streamed src K/V -----------------
        q2 = (
            jnp.dot(out, w_q2_ref[l], preferred_element_type=jnp.float32)
            + b_q2_ref[l, 0, :].astype(jnp.float32)
        ).astype(cdtype)
        cross_dma(l).wait()
        ck_ = cross_buf[:, :, :hidden]  # [TB, S, H]
        cv_ = cross_buf[:, :, hidden:]
        e2 = q2[:, None, :] * ck_  # [TB, S, H]
        s2 = jnp.dot(
            e2.reshape(tb * s_len, hidden), seg,
            preferred_element_type=jnp.float32,
        ).reshape(tb, s_len, head_num) / temp
        s2 = s2 - jnp.max(s2, axis=1, keepdims=True)
        p2 = jnp.exp(s2)
        p2 = p2 / jnp.sum(p2, axis=1, keepdims=True)
        p2_wide = jnp.dot(
            p2.astype(cdtype).reshape(tb * s_len, head_num), seg_t,
            preferred_element_type=jnp.float32,
        ).reshape(tb, s_len, hidden).astype(cdtype)
        att2 = jnp.sum((p2_wide * cv_).astype(jnp.float32), axis=1)
        att2 = (
            jnp.dot(att2.astype(cdtype), w_out2_ref[l],
                    preferred_element_type=jnp.float32)
            + b_out2_ref[l, 0, :].astype(jnp.float32)
        )
        out = ln(att2 + out.astype(jnp.float32), ln2_ref, l)

        # ---- FF (double ReLU, reference quirk) --------------------------
        ff = jnp.maximum(
            jnp.dot(out, w_ff0_ref[l], preferred_element_type=jnp.float32)
            + b_ff0_ref[l, 0, :].astype(jnp.float32), 0.0,
        ).astype(cdtype)
        ff = jnp.maximum(
            jnp.dot(ff, w_ff1_ref[l], preferred_element_type=jnp.float32)
            + b_ff1_ref[l, 0, :].astype(jnp.float32), 0.0,
        )
        out = ln(ff + out.astype(jnp.float32), ln3_ref, l)

        # ---- K/V slot write-back (in-kernel, time-major row DMA) --------
        if cache_outputs:
            kv_slot = (
                jnp.dot(out, w_qkv[:, hidden:],
                        preferred_element_type=jnp.float32)
                + b_qkv_ref[l, 0, hidden:].astype(jnp.float32)
            )
        else:
            kv_slot = kv_cur
        slot_buf[l] = kv_slot.astype(slot_buf.dtype)
        pltpu.make_async_copy(
            slot_buf.at[l],
            cache_out_hbm.at[l, pos, rows, :],
            slot_sem.at[l],
        ).start()
        return out

    for l in range(layer_num):
        x = layer_body(l, x)

    # ---- generator + DecodingManager sift ------------------------------
    logits = (
        jnp.dot(x, w_gen_ref[:], preferred_element_type=jnp.float32)
        + b_gen_ref[0, :].astype(jnp.float32)
    )  # [TB, Vp]; pad lanes already at NEG_INF via b_gen
    logits_out_ref[:] = logits

    last = mstate_ref[:, 0][:, None]  # [TB, 1]
    run = mstate_ref[:, 1][:, None]
    lb = mstate_ref[:, 2][:, None]
    rb = mstate_ref[:, 3][:, None]

    ban = lane_v >= vocab_size  # [TB, Vp] pad lanes
    if use_manager:
        ban = ban | (man_ref[0, :] > 0.5)[None, :]
        balanced = lb == rb
        ban = ban | (balanced & (lane_v == rbrace_id))
        is_sos = last == sos_id
        is_eos = last == eos_id
        ban = ban | (is_sos & (man_ref[1, :] > 0.5)[None, :])
        last_onehot = lane_v == last
        limit = jnp.sum(
            jnp.where(last_onehot, man_ref[2, :][None, :], 0.0),
            axis=-1, keepdims=True,
        )
        over = (
            jnp.logical_not(is_sos) & jnp.logical_not(is_eos)
            & (run.astype(jnp.float32) >= limit)
        )
        ban = ban | (over & last_onehot)

    masked = jnp.where(ban, NEG_INF, logits)
    # manual argmax: first index attaining the max (XLA tie semantics)
    mx = jnp.max(masked, axis=-1, keepdims=True)
    target = jnp.min(
        jnp.where(masked == mx, lane_v, vp), axis=-1, keepdims=True
    )  # [TB, 1] int32

    same = target == last
    run_new = jnp.where(same, run + 1, 1)
    lb_new = lb + (target == lbrace_id).astype(jnp.int32)
    rb_new = rb + (target == rbrace_id).astype(jnp.int32)

    tok_out_ref[:, 0] = target[:, 0]
    mstate_out_ref[:, 0] = target[:, 0]
    mstate_out_ref[:, 1] = run_new[:, 0]
    mstate_out_ref[:, 2] = lb_new[:, 0]
    mstate_out_ref[:, 3] = rb_new[:, 0]

    for l in range(layer_num):
        pltpu.make_async_copy(
            slot_buf.at[l], cache_out_hbm.at[l, pos, rows, :],
            slot_sem.at[l],
        ).wait()


class FusedDecodeParams(NamedTuple):
    """Stacked device arrays consumed by the fused step kernel."""

    w_qkv: jnp.ndarray  # [NL, H, 3H]
    b_qkv: jnp.ndarray  # [NL, 1, 3H]
    w_out: jnp.ndarray
    b_out: jnp.ndarray
    ln1: jnp.ndarray  # [NL, 2, H]
    w_q2: jnp.ndarray
    b_q2: jnp.ndarray
    w_out2: jnp.ndarray
    b_out2: jnp.ndarray
    ln2: jnp.ndarray
    w_ff0: jnp.ndarray
    b_ff0: jnp.ndarray
    w_ff1: jnp.ndarray
    b_ff1: jnp.ndarray
    ln3: jnp.ndarray
    embed: jnp.ndarray  # [Vp, H]
    pe: jnp.ndarray  # [Lp, H]
    w_gen: jnp.ndarray  # [H, Vp]
    b_gen: jnp.ndarray  # [1, Vp]
    man: jnp.ndarray  # [3, Vp] f32
    head_num: int
    cache_outputs: bool
    vocab_size: int
    sos_id: int
    eos_id: int
    lbrace_id: int
    rbrace_id: int


def _pad_lanes(x, vp, fill=0.0):
    pad = vp - x.shape[-1]
    if pad == 0:
        return x
    widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, widths, constant_values=fill)


def build_fused_params(
    fast, tables=None, *, max_steps: int, vocab_size: int,
    sos_id: int, eos_id: int,
) -> FusedDecodeParams:
    """Stack a FastDecoder (decoding/fast_step.py) + RuleTables into the
    fused kernel's layout. ``tables=None`` disables grammar masking (plain
    greedy argmax)."""
    ls = fast.layers
    dt = fast.w_gen.dtype
    vp = max(256, int(np.ceil((vocab_size + 1) / 128.0)) * 128)
    lp = int(np.ceil(max(max_steps, 1) / 8.0)) * 8

    def stack(field):
        return jnp.stack([getattr(l, field) for l in ls])

    embed = jnp.zeros((vp, fast.embed_scaled.shape[1]), dt)
    embed = embed.at[: fast.embed_scaled.shape[0]].set(fast.embed_scaled)
    pe = jnp.asarray(fast.pos_encoding[:lp], dt)
    if pe.shape[0] < lp:
        pe = jnp.pad(pe, ((0, lp - pe.shape[0]), (0, 0)))
    w_gen = _pad_lanes(jnp.asarray(fast.w_gen, dt), vp)
    b_gen = _pad_lanes(
        jnp.asarray(fast.b_gen, jnp.float32)[None, :], vp, NEG_INF
    )

    if tables is not None:
        man = np.zeros((3, vp), np.float32)
        man[0, : len(tables.always_ban)] = tables.always_ban
        man[1, : len(tables.cannot_initial)] = tables.cannot_initial
        man[2, : len(tables.repeat_limit)] = np.minimum(
            tables.repeat_limit, 1e9
        )
        lbrace, rbrace = tables.lbrace_id, tables.rbrace_id
    else:
        man = np.zeros((3, vp), np.float32)
        lbrace = rbrace = 0
    return FusedDecodeParams(
        w_qkv=stack("w_qkv"),
        b_qkv=stack("b_qkv")[:, None, :],
        w_out=stack("w_out"),
        b_out=stack("b_out")[:, None, :],
        ln1=jnp.stack(
            [jnp.stack([l.ln1_scale, l.ln1_bias]) for l in ls]
        ),
        w_q2=stack("w_q2"),
        b_q2=stack("b_q2")[:, None, :],
        w_out2=stack("w_out2"),
        b_out2=stack("b_out2")[:, None, :],
        ln2=jnp.stack(
            [jnp.stack([l.ln2_scale, l.ln2_bias]) for l in ls]
        ),
        w_ff0=stack("w_ff0"),
        b_ff0=stack("b_ff0")[:, None, :],
        w_ff1=stack("w_ff1"),
        b_ff1=stack("b_ff1")[:, None, :],
        ln3=jnp.stack(
            [jnp.stack([l.ln3_scale, l.ln3_bias]) for l in ls]
        ),
        embed=embed,
        pe=pe,
        w_gen=w_gen,
        b_gen=b_gen,
        man=jnp.asarray(man),
        head_num=fast.head_num,
        cache_outputs=fast.cache_outputs,
        vocab_size=vocab_size,
        sos_id=sos_id,
        eos_id=eos_id,
        lbrace_id=lbrace,
        rbrace_id=rbrace,
    )


@functools.partial(
    jax.jit,
    static_argnames=("head_num", "cache_outputs", "use_manager",
                     "batch_tile", "chunk", "interpret", "sos_id",
                     "eos_id", "lbrace_id", "rbrace_id", "vocab_size"),
)
def fused_greedy_step(
    token: jnp.ndarray,  # [B] int32
    pos: jnp.ndarray,  # scalar int32
    caches: jnp.ndarray,  # [NL, L, B, 2H] TIME-MAJOR; L % chunk == 0
    cross: jnp.ndarray,  # [NL, B, S, 2H]
    mstate: jnp.ndarray,  # [B, 4] int32
    params: Tuple[jnp.ndarray, ...],  # FusedDecodeParams arrays in order
    *,
    head_num: int,
    cache_outputs: bool,
    use_manager: bool,
    sos_id: int,
    eos_id: int,
    lbrace_id: int,
    rbrace_id: int,
    vocab_size: int,
    batch_tile: int = 16,
    chunk: int = 128,
    interpret: bool = False,
):
    """One fused greedy step -> (next_token [B], caches, mstate, logits)."""
    (w_qkv, b_qkv, w_out, b_out, ln1, w_q2, b_q2, w_out2, b_out2, ln2,
     w_ff0, b_ff0, w_ff1, b_ff1, ln3, embed, pe, w_gen, b_gen, man) = params
    nl, max_len, b, two_h = caches.shape
    hidden = two_h // 2
    vp = embed.shape[0]
    s_len = cross.shape[2]
    tb = min(batch_tile, b)
    while b % tb:
        tb -= 1
    assert max_len % chunk == 0, (max_len, chunk)
    grid = (b // tb,)

    def full_spec(shape):
        return pl.BlockSpec(
            shape, lambda i, *_: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    kernel = functools.partial(
        _kernel,
        layer_num=nl,
        head_num=head_num,
        chunk=chunk,
        cache_outputs=cache_outputs,
        use_manager=use_manager,
        sos_id=sos_id,
        eos_id=eos_id,
        lbrace_id=lbrace_id,
        rbrace_id=rbrace_id,
        vocab_size=vocab_size,
    )
    tok_out, mstate_out, logits, caches_out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tb, 1), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # caches (aliased)
                pl.BlockSpec(memory_space=pl.ANY),  # cross
                full_spec(w_qkv.shape),
                full_spec(b_qkv.shape),
                full_spec(w_out.shape),
                full_spec(b_out.shape),
                full_spec(ln1.shape),
                full_spec(w_q2.shape),
                full_spec(b_q2.shape),
                full_spec(w_out2.shape),
                full_spec(b_out2.shape),
                full_spec(ln2.shape),
                full_spec(w_ff0.shape),
                full_spec(b_ff0.shape),
                full_spec(w_ff1.shape),
                full_spec(b_ff1.shape),
                full_spec(ln3.shape),
                full_spec(embed.shape),
                full_spec(pe.shape),
                full_spec(w_gen.shape),
                full_spec(b_gen.shape),
                full_spec(man.shape),
                pl.BlockSpec((tb, 4), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tb, 1), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, 4), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, vp), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # caches out
            ],
            scratch_shapes=[
                pltpu.VMEM((2, chunk, tb, two_h), caches.dtype),
                pltpu.VMEM((tb, s_len, two_h), cross.dtype),
                pltpu.VMEM((nl, tb, two_h), caches.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA((nl,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, 4), jnp.int32),
            jax.ShapeDtypeStruct((b, vp), jnp.float32),
            jax.ShapeDtypeStruct(caches.shape, caches.dtype),
        ],
        # flattened input index of ``caches`` (after the pos scalar and
        # token): 2 -> output index 3
        input_output_aliases={2: 3},
        interpret=interpret,
    )(
        pos.reshape(1).astype(jnp.int32),
        token.reshape(-1, 1).astype(jnp.int32),
        caches,
        cross,
        w_qkv, b_qkv, w_out, b_out, ln1,
        w_q2, b_q2, w_out2, b_out2, ln2,
        w_ff0, b_ff0, w_ff1, b_ff1, ln3,
        embed, pe, w_gen, b_gen, man,
        mstate,
    )
    return tok_out[:, 0], caches_out, mstate_out, logits
