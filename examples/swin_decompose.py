#!/usr/bin/env python
"""SwinTRN throughput decomposition: encoder vs decode vs floor.

VERDICT r2 weak #8: the 271 img/s SwinTRN number had no accountability.
This script splits the pipeline on real hardware and compares the
encoder against its compute floor:

- times the Swin-B/384 encoder forward alone (pipelined),
- times the full greedy decode (encoder + AR scan) the bench way,
- derives the decode share,
- pulls the encoder's FLOP count from XLA's cost analysis and divides by
  the chip's peak MXU rate for an ideal-time floor.

Usage: python examples/swin_decompose.py [--batch 32] [--steps 230]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_TFLOPS = 197.0  # peak MXU, TPU v5e (public spec)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--steps", type=int, default=230)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--quick", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.quick:
        jax.config.update("jax_platforms", "cpu")
        args.batch, args.steps, args.iters = 2, 8, 2
    else:
        try:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get("JAX_CACHE_DIR", "/tmp/p4fr_jax_cache"),
            )
        except Exception:
            pass

    import jax.numpy as jnp

    from p4fr_tpu.data.vocab import Vocab
    from p4fr_tpu.decoding.fast_step import make_fast_greedy_fn
    from p4fr_tpu.decoding.manager import RuleTables
    from p4fr_tpu.models.registry import get_network
    from p4fr_tpu.utils.flags import Flags

    vocab = Vocab.from_files(["p4fr_tpu/configs/tokens.txt"])
    options = Flags("p4fr_tpu/configs/SWIN.yaml").get()
    if args.quick:
        options.input_size.height = 64
        options.input_size.width = 64
        options.SWIN = {
            "embed_dim": 32, "depths": [1, 1], "num_heads": [2, 2],
            "window": 8,
        }
        options.SATRN.decoder.layer_num = 1
        options.SATRN.decoder.src_dim = 64  # embed_dim * 2 after 1 merge

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = get_network(options.network, options, vocab, dtype=dtype)
    h, w = options.input_size.height, options.input_size.width
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(args.batch, h, w, 3)).astype(np.float32)
    )
    text = jnp.full((args.batch, 8), vocab.pad_id, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images[:1], text[:1], train=False,
    )

    # ---- encoder alone ---------------------------------------------------
    enc = jax.jit(lambda v, im: model.apply(v, im, method="encode"))
    lowered = enc.lower(variables, images)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else (cost or {})
    enc_flops = float(cost.get("flops", 0.0))

    np.asarray(enc(variables, images))  # warm
    t0 = time.perf_counter()
    outs = [enc(variables, images) for _ in range(args.iters)]
    for o in outs:
        np.asarray(o)
    enc_s = (time.perf_counter() - t0) / args.iters

    # ---- full greedy (bench methodology) ---------------------------------
    tables = RuleTables.build(vocab)
    decode_fn = make_fast_greedy_fn(
        model, variables, max_steps=args.steps, tables=tables,
        use_pallas_v2=on_tpu,
    )
    fn = jax.jit(decode_fn)  # Swin-B exceeds the closure param limit
    np.asarray(fn(variables, images))
    t0 = time.perf_counter()
    outs = [fn(variables, images) for _ in range(args.iters)]
    for o in outs:
        np.asarray(o)
    full_s = (time.perf_counter() - t0) / args.iters

    dec_s = max(full_s - enc_s, 0.0)
    floor_s = enc_flops / (V5E_BF16_TFLOPS * 1e12) if on_tpu else None
    result = {
        "metric": f"SwinTRN decomposition (batch {args.batch}, "
                  f"{args.steps} steps, {jax.default_backend()})",
        "img_per_sec": round(args.batch / full_s, 2),
        "encoder_ms_per_batch": round(enc_s * 1e3, 1),
        "decode_ms_per_batch": round(dec_s * 1e3, 1),
        "encoder_share_pct": round(100 * enc_s / full_s, 1),
        "encoder_gflops_per_batch": round(enc_flops / 1e9, 1),
        "encoder_mxu_floor_ms": (
            round(floor_s * 1e3, 1) if floor_s is not None else None
        ),
        "encoder_mxu_utilization_pct": (
            round(100 * floor_s / enc_s, 1) if floor_s else None
        ),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
