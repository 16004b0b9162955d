#!/usr/bin/env python
"""A/B the squeeze-excite global-average-pool implementation on TPU.

The r4 device trace (docs/PERFORMANCE.md round-4 section) attributed
11.7 ms of the 53.9 ms flagship encoder batch (B=256) to seven
``convert_reduce_fusion`` ops — the SE blocks' ``jnp.mean(x, (1, 2))``
global pools on large bf16 NHWC tensors. A bf16 reduce first converts
to f32 on the VPU; a ones-vector matmul contraction performs the same
sum on the MXU with f32 accumulation.

This probe times both forms standalone at the real stage shapes, plus
the full encoder with each pooling implementation (models/
efficientnetv2.py:SE_POOL toggles), so the decision is measured, not
guessed. Shapes: EfficientNetV2-S stages 3/4/5 mid-channel maps at the
flagship 256x512 input, B=256.

MEASURED (v5e, B=256, 20 iters, scalar-checksum outputs): full encoder
55.3 ms with the jnp.mean reduce vs 55.9 ms with the matmul pool — a
WASH. The convert_reduce_fusion trace lines carry fused neighbouring
work, not an avoidable convert; SE_POOL stays "reduce" (see
docs/PERFORMANCE.md round-4 section).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--encoder", action="store_true",
                   help="also time the FULL flagship encoder with each "
                   "SE pool implementation")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    rng = np.random.default_rng(0)

    def timeit(name, fn, *xs):
        np.asarray(fn(*xs))  # compile + warm
        t0 = time.perf_counter()
        outs = [fn(*xs) for _ in range(args.iters)]
        for o in outs:
            np.asarray(o)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:55s} {dt*1e6:10.1f} us")
        return dt

    # (H, W, C) of the SE inputs (mid channels) at 256x512 input:
    # stage 3 (s2 -> 16x64 at /16... stem s2 + s1 + s2 + s2 + s2 = /16):
    # feature maps: stem 128x256; st0 128x256; st1 64x128; st2 32x64;
    # st3 16x32 mid 256; st4 16x32 mid 768/960; st5 8x16 mid 960/1536.
    shapes = [
        ("stage3 mid", (16, 32, 512)),
        ("stage4 mid", (16, 32, 960)),
        ("stage5 mid", (8, 16, 1536)),
    ]
    for name, (h, w, c) in shapes:
        x = jnp.asarray(
            rng.normal(size=(args.batch, h, w, c)).astype(np.float32)
        ).astype(dtype)

        @jax.jit
        def pool_reduce(x):
            return jnp.mean(x, axis=(1, 2), keepdims=True)

        @jax.jit
        def pool_matmul(x):
            b, hh, ww, cc = x.shape
            flat = x.reshape(b, hh * ww, cc)
            ones = jnp.full((hh * ww,), 1.0 / (hh * ww), x.dtype)
            out = jax.lax.dot_general(
                ones, flat, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [B, C]
            return out.astype(x.dtype)[:, None, None, :]

        a = timeit(f"{name} {x.shape} jnp.mean reduce", pool_reduce, x)
        b = timeit(f"{name} {x.shape} MXU matmul pool", pool_matmul, x)
        ref = np.asarray(pool_reduce(x), np.float32)
        got = np.asarray(pool_matmul(x), np.float32)
        err = np.max(np.abs(ref - got))
        print(f"  speedup x{a/b:.2f} | max|diff| {err:.2e}")

    if args.encoder:
        from p4fr_tpu.data.vocab import Vocab
        from p4fr_tpu.models import efficientnetv2 as effv2
        from p4fr_tpu.models.registry import get_network
        from p4fr_tpu.utils.flags import Flags

        vocab = Vocab.from_files(["p4fr_tpu/configs/tokens.txt"])
        options = Flags("p4fr_tpu/configs/EfficientSATRN.yaml").get()
        h, w = options.input_size.height, options.input_size.width
        images = jnp.asarray(
            rng.normal(size=(args.batch, h, w, 3)).astype(np.float32)
        )
        text = jnp.full((1, 8), vocab.pad_id, jnp.int32)
        saved = effv2.SE_POOL
        for mode in ("reduce", "matmul"):
            effv2.SE_POOL = mode
            model = get_network(options.network, options, vocab,
                                dtype=dtype)
            variables = model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                images[:1], text, train=False,
            )
            # fetch only a scalar checksum: the [B, S, H] src tensor is
            # ~17 MB and this dev rig's device->host hop is a ~35 MB/s
            # tunnel — fetching it would time the tunnel, not the chip
            enc = jax.jit(
                lambda v, im: model.apply(
                    v, im, method="encode"
                ).astype(jnp.float32).sum()
            )
            timeit(f"FULL encoder B={args.batch} SE_POOL={mode}",
                   enc, variables, images)
        effv2.SE_POOL = saved


if __name__ == "__main__":
    main()
