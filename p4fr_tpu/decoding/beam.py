"""Batched fixed-width beam search as a single ``lax.scan``.

The reference implements beam search as a per-sample Python priority queue
with deep-copied decoder state per expansion (reference:
networks/EfficientSATRN.py:708-867, postprocessing/decoding.py:56-91) — a
best-first search, one sample at a time, entirely host-orchestrated. That
design cannot batch and spends most of its time in Python/copies.

This is the TPU-native equivalent: all B*W hypotheses advance in lockstep
through one decode step per token, with

- per-step top-k over the W*V candidate expansions per sample,
- KV caches gathered by parent beam with one indexed take,
- finished (post-<EOS>) beams frozen by forcing a zero-cost <PAD>
  continuation,
- the reference's length normalization (cumulative logp / length) applied
  at the end to pick the winning hypothesis.

Known deviation (documented): the reference's queue-based best-first
expansion order can visit a different hypothesis set than lockstep beam
search; scores/length-normalization semantics match, and at beam_width=1
both reduce to greedy.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9

# Slot granularity of the prefix-bounded cache reorder (must divide the
# KV cache's slot dim for the bounded path to engage; tests patch it to
# force either path). 64 slots x 64-row tile x 2H bf16 = one ~4 MB
# chunk at flagship dims.
SLOT_CHUNK = 64


def make_beam_fn(
    model,
    *,
    max_steps: int,
    beam_width: int,
    eos_id: int,
    pad_id: Optional[int] = None,
    from_memory: bool = False,
    kernel: str = "auto",
    early_stop: bool = False,
    stop_override=None,
    vmem_limit_kib: int = 0,
    gather_kernel: str = "auto",
) -> Callable:
    """Build fn(variables, images_or_src) -> tokens [B, max_steps].

    ``kernel``: transformer-decoder models advance hypotheses through the
    fused-weight fast step ("jnp", token-identical to the generic flax
    step) or the flash-decode Pallas kernel ("pallas_v2"); "auto" picks
    pallas_v2 on TPU. ASTER advances hypotheses through its fused-LSTM
    fast step (decoding/fast_aster.py) unless kernel="generic".

    ``early_stop``: run the step loop as a ``lax.while_loop`` that exits
    once EVERY beam of EVERY sample has emitted <EOS> (the beam mirror of
    greedy's ``early_stop_eos``; the reference's best-first queue stops
    per sample when enough end nodes are found,
    EfficientSATRN.py:758-764). Token-identical to the full scan —
    finished beams only ever extend with zero-cost <PAD>, which is
    exactly what the unfilled tail of the preallocated buffers holds.

    ``gather_kernel``: how the per-step parent-beam cache reorder runs.
    "jnp" is the bounded fori_loop-of-take path; "pallas" is the
    in-place tile-skipping kernel (ops/pallas/beam_gather.py — skips
    all traffic for row tiles whose parents are identity, the thing the
    measured-regressive lax.cond wrapper could not do); "auto" picks
    pallas on TPU for cache leaves whose shapes satisfy
    ``gather_supported``. Token-identical either way.

    ``stop_override`` (requires ``early_stop``): benchmarking hook
    mirroring the greedy one (fast_step.py): every beam of sample ``i``
    is force-finished once ``t >= stops[i]``, so the all-finished exit
    fires on a synthetic length distribution even with random weights
    (which never emit <EOS>). Pass the string ``"arg"`` to take the
    per-sample stop vector as the fn's LAST positional argument (one
    compiled program serves many length distributions).
    """
    sos_id = model.sos_id
    pad_id = model.pad_id if pad_id is None else pad_id
    W = beam_width
    if stop_override is not None and not early_stop:
        raise ValueError(
            "stop_override requires early_stop=True (the fixed-length "
            "scan would silently ignore the injected stop steps)"
        )
    stops_as_arg = isinstance(stop_override, str) and stop_override == "arg"
    from p4fr_tpu.decoding.fast_step import resolve_kernel

    kernel = resolve_kernel(kernel)
    if gather_kernel not in ("auto", "pallas", "jnp"):
        raise ValueError(f"unknown gather_kernel {gather_kernel!r}")
    use_fast = kernel != "generic" and getattr(
        model, "supports_fast_decode", False
    )

    def fn(variables, inputs, *rest):
        stops = stop_override
        if stops_as_arg:
            (stops,) = rest
        elif rest:
            raise TypeError("unexpected extra positional arguments")
        if from_memory:
            src = inputs
        else:
            src = model.apply(variables, inputs, method="encode")
        B, S, C = src.shape
        BW = B * W
        # tile memory per beam: [B, S, C] -> [B*W, S, C]
        src_tiled = jnp.repeat(src, W, axis=0)
        if use_fast:
            from p4fr_tpu.decoding.fast_step import (
                build_fast_decoder,
                fast_decode_step,
                init_fast_cache,
                pallas_decode_step_v2,
                precompute_cross_kv,
            )

            fast = build_fast_decoder(model, variables)
            cache_len = max_steps
            if kernel == "pallas_v2" and cache_len % 128:
                cache_len = ((cache_len + 127) // 128) * 128
            src_kv = precompute_cross_kv(
                fast, src_tiled.astype(fast.w_gen.dtype)
            )
            cache = init_fast_cache(fast, BW, cache_len)
            # the Pallas kernel wants full 16-row batch tiles; a ragged
            # B*W would degrade its divisor fallback to tiny tiles, so
            # use the (token-identical-class) jnp step instead
            hidden = int(fast.w_gen.shape[0])
            use_v2 = (kernel == "pallas_v2" and BW % 16 == 0
                      and hidden % 128 == 0)
            # vmem_limit_kib (the raised scoped-VMEM limit the caller's
            # jit ships) lets B*W row counts that fill 64-row tiles take
            # the auto-pipelined-src kernel config, same as greedy
            step_kw = {"vmem_limit_kib": vmem_limit_kib} if use_v2 else {}
            raw_step = pallas_decode_step_v2 if use_v2 else fast_decode_step

            def step(token, t, cache):
                return raw_step(fast, token, t, src_kv, cache, **step_kw)
        elif kernel != "generic" and getattr(
            model, "supports_fast_lstm_decode", False
        ):
            # ASTER: fused-LSTM fast step (decoding/fast_aster.py), the
            # same numeric class as the generic decode_step — the cache
            # (LSTM h/c + attention src projections) gathers by parent
            # exactly like the transformer cache below
            from p4fr_tpu.decoding.fast_aster import (
                build_fast_aster,
                fast_aster_step,
                init_fast_aster_cache,
                precompute_aster_src,
            )

            fa = build_fast_aster(model, variables)
            src_proj = precompute_aster_src(
                fa, src_tiled.astype(fa.w_gen.dtype)
            )
            cache = init_fast_aster_cache(fa, BW)

            def step(token, t, cache):
                return fast_aster_step(fa, token, src_proj[0], src_proj[1],
                                       cache)
        else:
            src_kv = model.apply(
                variables, src_tiled, method="precompute_src"
            )
            cache = model.init_decode_cache(BW, max_steps)

            def step(token, t, cache):
                return model.apply(
                    variables, token, t, src_kv, cache,
                    method="decode_step",
                )

        token0 = jnp.full((BW,), sos_id, jnp.int32)
        # beam 0 active, others silenced so step 0 doesn't duplicate
        scores0 = jnp.tile(
            jnp.asarray([0.0] + [NEG_INF] * (W - 1), jnp.float32), (B,)
        ).reshape(B, W)
        lengths0 = jnp.zeros((B, W), jnp.float32)
        finished0 = jnp.zeros((B, W), bool)

        def body(carry, t):
            token, cache, scores, lengths, finished = carry
            logits, cache = step(token, t, cache)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            V = logp.shape[-1]
            logp = logp.reshape(B, W, V)

            # finished beams: only <PAD> at zero cost
            pad_only = jnp.full((V,), NEG_INF).at[pad_id].set(0.0)
            logp = jnp.where(finished[..., None], pad_only[None, None, :], logp)

            cand = scores[..., None] + logp  # [B, W, V]
            flat = cand.reshape(B, W * V)
            new_scores, idx = jax.lax.top_k(flat, W)  # [B, W]
            parent = idx // V  # [B, W] in 0..W-1
            new_token = (idx % V).astype(jnp.int32)

            # gather beam state by parent. The r4 device trace attributed
            # ~50% of the beam step to this reorder when done as one
            # whole-cache jnp.take: each KV cache is [B*W, cache_len, 2H]
            # (~100 MB at flagship B=256) but only slots 0..t are
            # written. Reorder those in place, chunk by chunk, under a
            # fori_loop whose trip count grows with t — and skip the
            # traffic entirely when every parent is its own beam (common
            # once beams stabilize; always true after a sample's beams
            # all finish, since pad-only continuations preserve the
            # already-sorted score order).
            parent_flat = (
                parent + jnp.arange(B, dtype=parent.dtype)[:, None] * W
            ).reshape(BW)
            identity = jnp.all(
                parent_flat == jnp.arange(BW, dtype=parent_flat.dtype)
            )

            slot_chunk = SLOT_CHUNK

            def gather_leaf(a):
                if not (a.ndim >= 2 and a.shape[0] == BW):
                    return a
                if gather_kernel != "jnp" and a.ndim == 3:
                    from p4fr_tpu.ops.pallas.beam_gather import (
                        beam_parent_gather,
                        gather_supported,
                    )

                    interp = jax.default_backend() != "tpu"
                    fits = gather_supported(
                        a.shape, a.dtype, W, interpret=interp
                    )
                    if gather_kernel == "pallas" and not fits:
                        raise ValueError(
                            "gather_kernel='pallas' forced but cache leaf "
                            f"{a.shape}/{a.dtype} fails gather_supported"
                        )
                    if fits and (gather_kernel == "pallas"
                                 or not interp):
                        return beam_parent_gather(
                            a, parent_flat, t, group=W, interpret=interp
                        )
                slot_len = a.shape[1] if a.ndim == 3 else 0
                if slot_len >= 2 * slot_chunk and slot_len % slot_chunk == 0:
                    n = t // slot_chunk + 1  # chunks covering slots 0..t

                    def chunk_body(i, acc):
                        ch = jax.lax.dynamic_slice_in_dim(
                            acc, i * slot_chunk, slot_chunk, axis=1
                        )
                        ch = jnp.take(ch, parent_flat, axis=0)
                        return jax.lax.dynamic_update_slice_in_dim(
                            acc, ch, i * slot_chunk, axis=1
                        )

                    return jax.lax.fori_loop(0, n, chunk_body, a)
                return jnp.take(a, parent_flat, axis=0)

            del identity  # measured: a lax.cond skip forces whole-cache
            # copies through the conditional's output buffers — costlier
            # than the gather it avoids
            cache = jax.tree_util.tree_map(gather_leaf, cache)
            was_finished = jnp.take_along_axis(finished, parent, axis=1)
            new_finished = was_finished | (new_token == eos_id)
            new_lengths = (
                jnp.take_along_axis(lengths, parent, axis=1)
                + (~was_finished).astype(jnp.float32)
            )
            return (
                (new_token.reshape(BW), cache, new_scores, new_lengths,
                 new_finished),
                (new_token, parent),
            )

        carry0 = (token0, cache, scores0, lengths0, finished0)
        if early_stop:
            # preallocated trace buffers; the unfilled tail (<PAD> tokens,
            # identity parents) is exactly the frozen-beam continuation,
            # so the backtrace below needs no step count
            tokens_buf0 = jnp.full((max_steps, B, W), pad_id, jnp.int32)
            parents_buf0 = jnp.broadcast_to(
                jnp.arange(W, dtype=jnp.int32)[None, None, :],
                (max_steps, B, W),
            ).astype(jnp.int32)

            def cond(c):
                t, _, _, _, _, finished, _, _ = c
                return (t < max_steps) & ~jnp.all(finished)

            def wbody(c):
                t, token, cache, scores, lengths, finished, tbuf, pbuf = c
                (token, cache, scores, lengths, finished), (tk, pr) = body(
                    (token, cache, scores, lengths, finished), t
                )
                if stops is not None:
                    # benchmarking hook: force-finish every beam of
                    # sample i at t >= stops[i] (see docstring)
                    finished = finished | (
                        t >= jnp.asarray(stops)
                    )[:, None]
                tbuf = jax.lax.dynamic_update_slice(
                    tbuf, tk[None], (t, 0, 0)
                )
                pbuf = jax.lax.dynamic_update_slice(
                    pbuf, pr.astype(jnp.int32)[None], (t, 0, 0)
                )
                return (t + 1, token, cache, scores, lengths, finished,
                        tbuf, pbuf)

            (_, _, _, scores, lengths, _, tokens, parents) = (
                jax.lax.while_loop(
                    cond,
                    wbody,
                    (jnp.asarray(0), *carry0, tokens_buf0, parents_buf0),
                )
            )
        else:
            (_, _, scores, lengths, _), (tokens, parents) = jax.lax.scan(
                body, carry0, jnp.arange(max_steps)
            )
        # pick best beam by length-normalized score (reference
        # BeamSearchNode.eval: logp / length; decoding.py:64-80)
        norm = scores / jnp.maximum(lengths, 1.0)
        best = jnp.argmax(norm, axis=1)  # [B]

        # backtrace: follow parents from the last step
        def back(carry, xs):
            beam = carry  # [B]
            step_tokens, step_parents = xs  # [B, W] each
            tok = jnp.take_along_axis(step_tokens, beam[:, None], axis=1)[:, 0]
            beam = jnp.take_along_axis(step_parents, beam[:, None], axis=1)[:, 0]
            return beam, tok

        _, rev_tokens = jax.lax.scan(
            back, best, (tokens, parents), reverse=True
        )
        return jnp.transpose(rev_tokens)  # [B, max_steps]

    return fn
