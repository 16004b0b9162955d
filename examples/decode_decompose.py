#!/usr/bin/env python
"""Decode-step cost decomposition by program variants (TPU).

docs/PERFORMANCE.md r2 put the v2 decode ~2.5x above a computed DMA
floor, but the floor overcounted (it assumed S=512; the real flagship
encoder emits S=128, so the true per-step traffic at B=256 is ~72 MB
~= 90 us — the kernel is mostly NOT DMA-bound). This script attributes
the per-step time by measuring scan programs that differ in ONE knob:

- layers 1 vs 3          -> per-layer cost + fixed step cost
- src length 128 vs 8    -> cross-attention (DMA + compute) share
- pos 0-230 vs pinned 8  -> self-attention prefix share
- chunk 64 vs 128, tb 32 vs 16 -> tiling sensitivity

Each variant runs the REAL v2 kernel in a lax.scan with a constant
token (no embedding/generator/manager glue), bench-style pipelined
timing. Run on the real chip:  python examples/decode_decompose.py
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--steps", type=int, default=230)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--filter", type=int, default=1024)
    p.add_argument("--src-len", type=int, default=128)
    p.add_argument("--quick", action="store_true")
    p.add_argument("--fixed-probes", action="store_true",
                   help="attribute the layer-independent fixed per-step "
                   "cost instead of the knob sweep: empty scan, DUS-only, "
                   "1/3/6-layer linearity")
    p.add_argument("--slot-probe", action="store_true",
                   help="head-to-head: external cache-slot DUS vs the "
                        "in-kernel slot DMA (slot_in_kernel=True)")
    p.add_argument("--v3", action="store_true",
                   help="A/B the single-launch stacked-layer v3 kernel "
                   "(grid over tiles x layers) against the 3-launch v2 "
                   "baseline at several tile configs")
    args = p.parse_args(argv)

    import jax

    if args.quick:
        jax.config.update("jax_platforms", "cpu")
        args.batch, args.steps, args.iters = 8, 8, 2
        args.hidden, args.heads, args.filter = 128, 4, 256
    else:
        try:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get("JAX_CACHE_DIR", "/tmp/p4fr_jax_cache"),
            )
        except Exception:
            pass

    import jax.numpy as jnp

    from p4fr_tpu.ops.pallas.decoder_layer_v2 import decoder_layer_step_v2

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    H, F = args.hidden, args.filter
    rng = np.random.default_rng(0)

    def w(*shape):
        return jnp.asarray(
            rng.normal(size=shape, scale=0.02).astype(np.float32), dtype
        )

    def layer_weights():
        return (
            w(H, 3 * H), w(3 * H), w(H, H), w(H),
            jnp.stack([w(H), w(H)]),
            w(H, H), w(H), w(H, H), w(H), jnp.stack([w(H), w(H)]),
            w(H, F), w(F), w(F, H), w(H), jnp.stack([w(H), w(H)]),
        )

    def build(layers, src_len, *, chunk=64, tb=32, fixed_pos=None,
              tiled=False, max_len=None, src_hbm=False, steps=None,
              chain=True, slot_in_kernel=False):
        steps = steps or args.steps
        max_len = max_len or ((steps + chunk - 1) // chunk) * chunk
        weights = [layer_weights() for _ in range(layers)]
        x0 = w(args.batch, H)
        src_kv = w(args.batch, src_len, 2 * H)

        if tiled:
            from p4fr_tpu.ops.pallas.decoder_layer_v2 import (
                tiled_cache_shape,
            )

            cshape = tiled_cache_shape(args.batch, max_len, H, tb)
        else:
            cshape = (args.batch, max_len, 2 * H)
        caches0 = tuple(jnp.zeros(cshape, dtype) for _ in range(layers))

        step = functools.partial(
            decoder_layer_step_v2, head_num=args.heads, cache_outputs=True,
            batch_tile=tb, chunk=chunk, interpret=not on_tpu,
            tiled_cache=tiled, src_hbm=src_hbm,
            slot_in_kernel=slot_in_kernel,
            # experiment knob: prefix-chunk DMA ring depth (default 2)
            chunk_bufs=int(os.environ.get("P4FR_CHUNK_BUFS", "2")),
        )

        def body(carry, t):
            x, caches = carry
            pos = jnp.asarray(fixed_pos, jnp.int32) if fixed_pos is not None else t
            new_caches = []
            out = x0  # constant re-injection: isolates the kernels
            acc = None
            for wts, cache in zip(weights, caches):
                o, cache = step(out if chain else x0, pos, cache,
                                src_kv, wts)
                if chain:
                    out = o
                else:
                    # keep every launch's output live without creating a
                    # layer->layer dependency: measures launch cost alone
                    acc = o if acc is None else acc + o
                new_caches.append(cache)
            return (out if chain else acc, tuple(new_caches)), ()

        @jax.jit
        def run():
            (xf, _), _ = jax.lax.scan(
                body, (x0, caches0), jnp.arange(steps)
            )
            return xf

        return run

    def timeit(label, fn, steps=None):
        steps = steps or args.steps
        t0 = time.perf_counter()
        np.asarray(fn())
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [fn() for _ in range(args.iters)]
        for o in outs:
            np.asarray(o)
        per_step = (time.perf_counter() - t0) / args.iters / steps
        print(json.dumps({
            "variant": label,
            "us_per_step": round(per_step * 1e6, 1),
            "compile_s": round(compile_s, 1),
        }), flush=True)
        return per_step

    if args.v3:
        from p4fr_tpu.ops.pallas.decoder_stack_v3 import (
            decoder_stack_step_v3,
        )

        def build_v3(tb, ck, steps=None):
            steps = steps or args.steps
            max_len = ((steps + 63) // 64) * 64
            layers_w = [layer_weights() for _ in range(3)]
            stacked = []
            for idx in range(15):
                a = jnp.stack([lw[idx] for lw in layers_w])
                if a.ndim == 2:  # biases -> [NL, 1, D]
                    a = a[:, None, :]
                stacked.append(a)
            stacked = tuple(stacked)
            x0 = w(args.batch, H)
            src_kv = jnp.stack(
                [w(args.batch, args.src_len, 2 * H) for _ in range(3)]
            )
            caches0 = jnp.zeros(
                (3, args.batch, max_len, 2 * H), dtype
            )

            def body(carry, t):
                caches = carry
                out, caches = decoder_stack_step_v3(
                    x0, t, caches, src_kv, stacked,
                    head_num=args.heads, cache_outputs=True,
                    batch_tile=tb, chunk=ck, interpret=not on_tpu,
                )
                return caches, out[0, 0]

            @jax.jit
            def run():
                _, outs = jax.lax.scan(
                    body, caches0, jnp.arange(steps)
                )
                return outs

            return run

        base = timeit("3L v2 chained (tb=32 ck=64)",
                      build(3, args.src_len))
        for tb, ck in ((32, 64), (32, 32), (64, 16), (16, 64)):
            try:
                timeit(f"3L v3 single-launch (tb={tb} ck={ck})",
                       build_v3(tb, ck))
            except Exception as e:  # VMEM overflow etc: record and go on
                print(json.dumps({
                    "variant": f"3L v3 single-launch (tb={tb} ck={ck})",
                    "error": str(e)[:200],
                }), flush=True)
        return

    if args.fixed_probes:
        # Attribute the ~208us/step layer-independent cost seen in the
        # knob sweep (fixed = (3*oneL - threeL)/2). Each probe strips
        # one suspect: kernels, the cache DUS, or the scan itself.
        # Confound control: a whole-program measurement folds the rig's
        # per-dispatch/fetch cost (tens of ms through the axon tunnel)
        # into tiny programs, so every probe is timed at S and 3S steps
        # and reported as the MARGINAL slope (t3 - t1)/(2S) — dispatch
        # constants cancel.
        H2 = 2 * H
        x0 = w(args.batch, H)
        slot = w(args.batch, 1, H2)

        def empty_run(steps):
            def body(carry, t):
                x = carry
                return x + jnp.asarray(1e-6, x.dtype), ()

            @jax.jit
            def run():
                xf, _ = jax.lax.scan(body, x0, jnp.arange(steps))
                return xf

            return run

        def dus_run(steps):
            max_len = ((steps + 63) // 64) * 64
            caches0 = tuple(
                jnp.zeros((args.batch, max_len, H2), dtype)
                for _ in range(3)
            )

            def body(carry, t):
                caches = carry
                return tuple(
                    jax.lax.dynamic_update_slice(c, slot, (0, t, 0))
                    for c in caches
                ), ()

            @jax.jit
            def run():
                caches, _ = jax.lax.scan(body, caches0, jnp.arange(steps))
                return caches[0][:1, :1, :1]

            return run

        def layers_run(n, chain=True):
            # pos pinned to 8: per-step work is then step-stationary
            # (the growing prefix walk would otherwise make the slope
            # overestimate the 230-step program's average)
            def make(steps):
                return build(
                    n, args.src_len, fixed_pos=8, max_len=256,
                    steps=steps, chain=chain,
                )
            return make

        def marginal(label, make):
            s1, s3 = args.steps, 3 * args.steps
            t1 = timeit(f"{label} ({s1} steps)", make(s1), steps=s1)
            t3 = timeit(f"{label} ({s3} steps)", make(s3), steps=s3)
            us = (t3 * s3 - t1 * s1) / (s3 - s1) * 1e6
            print(json.dumps(
                {"probe": label, "marginal_us_per_step": round(us, 1)}
            ), flush=True)
            return us

        empty = marginal("scan-only (1 elementwise op)", empty_run)
        dus = marginal("DUS-only x3 (no kernels)", dus_run)
        one = marginal("1L full", layers_run(1))
        three = marginal("3L full", layers_run(3))
        six = marginal("6L full", layers_run(6))
        indep = marginal("3L independent (no x chain)",
                         layers_run(3, chain=False))
        b = (six - one) / 5
        print(json.dumps({
            "metric": "fixed-cost probes, marginal us/step (B=%d)"
                      % args.batch,
            "scan_floor": round(empty, 1),
            "dus_x3": round(dus, 1),
            "per_layer_1to6_fit": round(b, 1),
            "fixed_1to6_fit": round(one - b, 1),
            "linearity_3L_pred": round(one + 2 * b, 1),
            "linearity_3L_meas": round(three, 1),
            "indep_3L_meas": round(indep, 1),
        }))
        return

    if args.slot_probe:
        # r4 trace finding: the external cache-slot DUS costs
        # ~16.5us/layer/step. The flat [B, L, 2H] cache CANNOT take the
        # in-kernel row DMA (Mosaic: 1-row slice along the sublane-tiled
        # L dim is unaligned — the same tiling fact that makes the XLA
        # DUS expensive). The tiled [G, L, TB, 2H] layout slices only
        # untiled leading dims, so the slot write is tile-aligned there.
        prod = timeit("3L tb=64 ck=32 src_hbm (ext DUS, flat)",
                      build(3, args.src_len, tb=64, chunk=32,
                            src_hbm=True))
        tprod = timeit("3L tb=64 ck=32 src_hbm tiled (ext DUS)",
                       build(3, args.src_len, tb=64, chunk=32,
                             src_hbm=True, tiled=True))
        tslot = timeit("3L tb=64 ck=32 src_hbm tiled slot-in-kernel",
                       build(3, args.src_len, tb=64, chunk=32,
                             src_hbm=True, tiled=True,
                             slot_in_kernel=True))
        print(json.dumps({
            "metric": "slot-in-kernel probe (B=%d)" % args.batch,
            "prod_flat_us": round(prod * 1e6, 1),
            "prod_tiled_us": round(tprod * 1e6, 1),
            "prod_tiled_slot_us": round(tslot * 1e6, 1),
            "slot_delta_us": round((tprod - tslot) * 1e6, 1),
            "vs_flat_us": round((prod - tslot) * 1e6, 1),
        }))
        return

    base = timeit("3L full (pos=t, S=%d)" % args.src_len,
                  build(3, args.src_len))
    one = timeit("1L full", build(1, args.src_len))
    nosrc = timeit("3L tiny-cross (S=8)", build(3, 8))
    nopre = timeit("3L no-prefix (pos=8 pinned)",
                   build(3, args.src_len, fixed_pos=8))
    tiled = timeit("3L tiled-cache", build(3, args.src_len, tiled=True))
    ck128 = timeit("3L chunk=128", build(3, args.src_len, chunk=128))
    tb16 = timeit("3L tb=16", build(3, args.src_len, tb=16))
    # src_hbm single-buffers the cross K/V -> VMEM headroom for tb=64,
    # which was the fastest standalone tile in r2 but could not fit
    shbm = timeit("3L src_hbm (tb=32 ck=64)",
                  build(3, args.src_len, src_hbm=True))
    tb64 = timeit("3L tb=64 ck=32 src_hbm",
                  build(3, args.src_len, tb=64, chunk=32, src_hbm=True))

    print(json.dumps({
        "metric": "v2 decode decomposition (B=%d)" % args.batch,
        "per_layer_us": round((base - one) / 2 * 1e6, 1),
        "fixed_step_us": round((3 * one - base) / 2 * 1e6, 1),
        "cross_share_us": round((base - nosrc) * 1e6, 1),
        "self_prefix_share_us": round((base - nopre) * 1e6, 1),
        "tiled_delta_us": round((tiled - base) * 1e6, 1),
        "chunk128_delta_us": round((ck128 - base) * 1e6, 1),
        "tb16_delta_us": round((tb16 - base) * 1e6, 1),
        "src_hbm_delta_us": round((shbm - base) * 1e6, 1),
        "tb64_src_hbm_delta_us": round((tb64 - base) * 1e6, 1),
    }))


if __name__ == "__main__":
    main()
