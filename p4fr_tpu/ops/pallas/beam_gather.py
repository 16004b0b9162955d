"""Pallas TPU kernel: in-place parent-beam KV-cache gather for beam search.

The lockstep beam search (decoding/beam.py) reorders every per-layer KV
cache by parent beam each step. The r4 traces attributed ~50% of the
beam step to this reorder; the bounded fori_loop-of-jnp.take fix cut it
2.4x but still (a) round-trips every written chunk through XLA take+DUS
buffers (~2x over the pure copy roofline) and (b) cannot skip the
traffic once beams stabilize — the measured lax.cond skip REGRESSED
because conditional outputs cannot alias the loop carry
(docs/PERFORMANCE.md, beam section). This kernel puts the skip where it
belongs: inside the kernel's dataflow.

Three structural facts make a tile-local in-place kernel correct:

1. parent indices are **block-diagonal**: beam ``parent_flat`` only ever
   maps a row to a row of the same sample's W-row group (top-k runs per
   sample), so a row tile that is a multiple of W rows never reads
   outside itself — permuting each tile independently, entirely in VMEM,
   has no cross-tile hazard and the cache can alias in place
   (``input_output_aliases``), eliminating XLA's take+DUS double buffer;
2. only slots ``0..pos`` are written (decode masks positions > pos), so
   the chunk walk is prefix-bounded exactly like the jnp path;
3. a tile whose parents are all identity needs NO traffic at all — the
   aliased buffer already holds the answer. The kernel tests the tile's
   group-local parents against an iota and skips every DMA under
   ``pl.when``: once a sample's beams stabilize (always true after its
   beams finish — pad-only continuations preserve sorted score order),
   its tile stops paying, with no conditional-output copies.

The permutation itself is W-1 vectorized selects over the group-split
view ``[groups, W, chunk, feat]`` (group-local parent indices are
prefetched per tile) — no matmul, exact for every dtype, and the
leading-dim reshape is layout-free in Mosaic.

Reference analog: the reference's best-first beam deep-copies decoder
state per expansion (/root/reference/networks/EfficientSATRN.py:708-867);
this is the TPU replacement for that state movement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    pos_ref,   # [1] int32 scalar prefetch: last written slot (inclusive)
    lp_ref,    # [1, RT, 1] int32 VMEM: group-local parent in 0..W-1
    cache_hbm,  # [BW, L, F] ANY (aliased to the output)
    out_hbm,   # [BW, L, F] ANY (the same buffer)
    in_buf,    # [2, RT, CK, F] VMEM scratch
    out_buf,   # [2, RT, CK, F] VMEM scratch
    in_sem,    # DMA sems (2,)
    out_sem,   # DMA sems (2,)
    *,
    group: int,
    rt: int,
    chunk: int,
):
    g = pl.program_id(0)
    pos = pos_ref[0]
    nchunks = cache_hbm.shape[1] // chunk
    nc = jnp.minimum(pos // chunk + 1, nchunks)  # chunks covering 0..pos
    rows = pl.ds(g * rt, rt)
    gpt = rt // group  # groups per tile

    lp = lp_ref[0].reshape(gpt, group, 1, 1)  # [gpt, W, 1, 1] int32
    wiota = jax.lax.broadcasted_iota(jnp.int32, (gpt, group, 1, 1), 1)
    identity = jnp.all(lp == wiota)

    def in_dma(slot, c):
        start = pl.multiple_of(c * chunk, chunk)
        return pltpu.make_async_copy(
            cache_hbm.at[rows, pl.ds(start, chunk), :],
            in_buf.at[slot],
            in_sem.at[slot],
        )

    def out_dma(slot, c):
        start = pl.multiple_of(c * chunk, chunk)
        return pltpu.make_async_copy(
            out_buf.at[slot],
            out_hbm.at[rows, pl.ds(start, chunk), :],
            out_sem.at[slot],
        )

    @pl.when(~identity)
    def _():
        in_dma(0, 0).start()

        def body(c, carry):
            # prefetch the next chunk while permuting this one; chunk
            # regions are disjoint, so the in-flight read of c+1 never
            # overlaps the write-back of c on the aliased buffer
            @pl.when(c + 1 < nc)
            def _():
                in_dma((c + 1) % 2, c + 1).start()

            slot = c % 2
            in_dma(slot, c).wait()
            feat = in_buf.shape[-1]
            x4 = in_buf[slot].reshape(gpt, group, chunk, feat)
            y = x4[:, group - 1][:, None]
            for k in range(group - 2, -1, -1):
                y = jnp.where(lp == k, x4[:, k][:, None], y)

            # the write-back double buffer: chunk c reuses slot c%2,
            # so the DMA from chunk c-2 must have drained first
            @pl.when(c >= 2)
            def _():
                out_dma(slot, c - 2).wait()

            out_buf[slot] = y.reshape(rt, chunk, feat)
            out_dma(slot, c).start()
            return carry

        jax.lax.fori_loop(0, nc, body, 0)

        @pl.when(nc >= 2)
        def _():
            out_dma((nc - 2) % 2, nc - 2).wait()

        out_dma((nc - 1) % 2, nc - 1).wait()


def gather_supported(
    shape, dtype, group: int, *, interpret: bool = False
) -> bool:
    """Whether ``beam_parent_gather`` can run on this cache leaf.

    Compiled Mosaic needs sublane-aligned row tiles (16*W rows), a
    128-aligned feature minor dim, and chunk-divisible slot dim; the
    interpret-mode tests only need the group structure itself.
    """
    if len(shape) != 3:
        return False
    bw, slots, feat = shape
    rt = 16 * group if not interpret else group
    if bw % rt or bw < rt:
        return False
    if interpret:
        return slots >= 1
    return (
        slots % 64 == 0
        and feat % 128 == 0
        and dtype in (jnp.bfloat16, jnp.float32)
    )


def beam_parent_gather(
    cache: jnp.ndarray,
    parent_flat: jnp.ndarray,
    pos,
    *,
    group: int,
    chunk: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """cache[parent_flat] over slots 0..pos, in place, tile-skipping.

    ``cache``: [B*W, L, F]; ``parent_flat``: [B*W] int32 with the
    block-diagonal beam property parent_flat[i] // W == i // W (top-k
    parents stay within each sample's W-row group — decoding/beam.py
    guarantees this by construction); ``pos``: the last written slot
    (the gather covers chunks up to and including the one holding it).
    Slots beyond ``pos`` keep whatever the aliased buffer held — decode
    masks them and overwrites slot pos+1 before reading it, matching the
    bounded jnp path's semantics.
    """
    bw, slots, feat = cache.shape
    rt = 16 * group if not interpret else group
    if bw % rt:
        raise ValueError(f"B*W={bw} not divisible by row tile {rt}")
    if not chunk:
        # size the double buffers to ~12.6 MB of VMEM scratch at the
        # flagship [16*3, chunk, 512] tile regardless of cache dtype
        # (the beam caches are f32 on the f32 inference path): 4 buffers
        # x rt x chunk x feat x itemsize must clear the 16 MB default
        # scoped-VMEM limit — the beam jit does not ship the raised one
        chunk = 64 if cache.dtype.itemsize <= 2 else 32
    if slots % chunk:
        # shrink to a divisor so tiny interpret-mode shapes still run
        if interpret:
            chunk = slots
        else:
            raise ValueError(f"slot dim {slots} not divisible by {chunk}")
    ngroups = bw // group
    local = parent_flat.astype(jnp.int32) - (
        jnp.arange(ngroups, dtype=jnp.int32) * group
    ).repeat(group)
    lp = local.reshape(bw // rt, rt, 1)

    kernel = functools.partial(_kernel, group=group, rt=rt, chunk=chunk)
    grid = (bw // rt,)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, rt, 1), lambda g, *_: (g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),  # cache stays in HBM
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, rt, chunk, feat), cache.dtype),
                pltpu.VMEM((2, rt, chunk, feat), cache.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        # aliases count the scalar-prefetch arg: input 2 is the cache
        input_output_aliases={2: 0},
        interpret=interpret,
    )(
        jnp.asarray(pos).reshape(1).astype(jnp.int32),
        lp,
        cache,
    )
