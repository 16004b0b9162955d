#!/usr/bin/env python
"""MFU / roofline anchors for the flagship train and decode programs.

VERDICT r3 weak #5 / next-item #7: the decode path has a computed DMA
floor and per-knob attribution, but "is train actually fast" had no
FLOPs/MFU statement against the v5e hardware ceiling. This script
produces those anchors.

Method
------
FLOPs come from XLA's compiled-HLO cost analysis
(``jit(fn).lower(...).compile().cost_analysis()["flops"]``) of the SAME
compute graphs bench.py times:

- **train**: ``make_train_step`` (fwd + bwd + AdamW, teacher-forced) at
  the bench shapes (B=64, labels 64, 256x512 input).
- **decode**: the full greedy program (encoder + 230-step AR scan +
  DecodingManager) through the **jnp fast path**
  (``use_pallas_v2=False``), which is FLOP-identical to the production
  Pallas path (same fused-weight projections and attention
  contractions) — Pallas kernel interiors are invisible to HLO cost
  analysis, the jnp twin is not.

FLOP counts are shape-derived and platform-independent, so the analysis
compiles on CPU (default; pass --tpu to lower for the real chip — same
counts, slower remote compile). Measured step times default to the
bench.py captures recorded in docs/PERFORMANCE.md; pass --train-ms /
--decode-ms to recompute after a new bench run.

Ceilings (public v5e spec): 197 TFLOP/s bf16, 819 GB/s HBM, 16 GB.

Usage:
    python examples/mfu.py                   # both anchors, CPU lowering
    python examples/mfu.py --decode-ms 142.5 --train-ms 89.6
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_TFLOPS = 197.0  # per chip, dense bf16
V5E_HBM_GBPS = 819.0


def _flops(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0]
    return float(ca["flops"])


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--network", default="EfficientSATRN")
    p.add_argument("--batch", type=int, default=256,
                   help="decode batch (bench default)")
    p.add_argument("--train-batch", type=int, default=64)
    p.add_argument("--label-len", type=int, default=64)
    p.add_argument("--steps", type=int, default=230)
    p.add_argument("--decode-ms", type=float, default=None,
                   help="measured ms per decode batch (default: derived "
                   "from the docs/PERFORMANCE.md headline img/s)")
    p.add_argument("--headline", type=float, default=1796.0,
                   help="flagship device-side serving img/s used to "
                   "derive --decode-ms when not given")
    p.add_argument("--train-ms", type=float, default=89.6,
                   help="measured ms per train step (bench.py --train, "
                   "B=64, steady-state)")
    p.add_argument("--tpu", action="store_true",
                   help="lower for the real TPU backend instead of CPU "
                   "(same FLOP counts, slower remote compile)")
    p.add_argument("--skip-train", action="store_true")
    p.add_argument("--skip-decode", action="store_true")
    args = p.parse_args(argv)

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from p4fr_tpu.data.vocab import Vocab
    from p4fr_tpu.decoding.manager import RuleTables
    from p4fr_tpu.models.registry import get_network
    from p4fr_tpu.utils.flags import Flags

    vocab = Vocab.from_files(["p4fr_tpu/configs/tokens.txt"])
    options = Flags(f"p4fr_tpu/configs/{args.network}.yaml").get()
    dtype = jnp.bfloat16  # bench dtype on TPU; counts don't depend on it
    model = get_network(options.network, options, vocab, dtype=dtype)
    h, w = options.input_size.height, options.input_size.width

    rng = np.random.default_rng(0)
    text = jnp.full((1, 8), vocab.pad_id, jnp.int32)
    img1 = jnp.asarray(rng.normal(size=(1, h, w, 3)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        img1, text, train=False,
    )
    out = {"chip": "v5e", "bf16_peak_tflops": V5E_BF16_TFLOPS,
           "hbm_gbps": V5E_HBM_GBPS}

    if not args.skip_decode:
        from p4fr_tpu.decoding.fast_step import make_fast_greedy_fn

        decode_fn = make_fast_greedy_fn(
            model, variables, max_steps=args.steps,
            tables=RuleTables.build(vocab), use_pallas_v2=False,
        )
        images = jax.ShapeDtypeStruct((args.batch, h, w, 3), jnp.float32)
        lowered = jax.jit(decode_fn).lower(variables, images)
        dec_flops = _flops(lowered.compile())
        ms = args.decode_ms
        if ms is None:
            ms = args.batch / args.headline * 1e3
        mfu = dec_flops / (ms * 1e-3) / (V5E_BF16_TFLOPS * 1e12)
        out["decode"] = {
            "batch": args.batch, "steps": args.steps,
            "flops_per_batch": dec_flops,
            "tflops_per_batch": round(dec_flops / 1e12, 3),
            "ms_per_batch": round(ms, 1),
            "img_per_s": round(args.batch / ms * 1e3, 1),
            "mfu_pct": round(100 * mfu, 2),
        }

    if not args.skip_train:
        from p4fr_tpu.train.steps import (
            TrainState, build_optimizer, make_train_step,
        )

        optimizer = build_optimizer("AdamW", 5e-4, weight_decay=1e-6,
                                    max_grad_norm=2.0)
        state = TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=optimizer.init(variables["params"]),
            step=jnp.asarray(0, jnp.int32),
        )
        train_step = make_train_step(model, optimizer, vocab.pad_id)
        imgs = jax.ShapeDtypeStruct(
            (args.train_batch, h, w, 3), jnp.float32)
        labels = jax.ShapeDtypeStruct(
            (args.train_batch, args.label_len), jnp.int32)
        lowered = jax.jit(
            train_step, static_argnames=("teacher_forced",)
        ).lower(state, imgs, labels, jax.random.PRNGKey(0),
                teacher_forced=True)
        tr_flops = _flops(lowered.compile())
        # CAVEAT (measured, r4): XLA's HLO cost analysis counts the
        # EfficientNetV2 depthwise-conv WEIGHT gradients as if they were
        # dense convs — a [3,3,1,C] wgrad counts ~61x its real FLOPs
        # (micro-test in docs/PERFORMANCE.md). The device trace shows
        # those fusions execute in 5.35 ms of the 82.4 ms step, so the
        # phantom FLOPs are counted, not run. Report both the raw HLO
        # number and a useful-FLOP estimate (3x the single forward: one
        # fwd + ~2x fwd for the backward; optimizer is negligible).
        fwd_flops = _flops(jax.jit(
            lambda v, im, tx: model.apply(v, im, tx, train=False)
        ).lower(variables, imgs,
                jax.ShapeDtypeStruct((args.train_batch, args.label_len),
                                     jnp.int32)).compile())
        useful = 3.0 * fwd_flops
        t_s = args.train_ms * 1e-3
        out["train"] = {
            "batch": args.train_batch, "label_len": args.label_len,
            "hlo_flops_per_step": tr_flops,
            "useful_flops_per_step_est": useful,
            "fwd_flops": fwd_flops,
            "ms_per_step": args.train_ms,
            "img_per_s": round(args.train_batch / args.train_ms * 1e3, 1),
            "hlo_mfu_pct": round(
                100 * tr_flops / t_s / (V5E_BF16_TFLOPS * 1e12), 2),
            "useful_mfu_pct": round(
                100 * useful / t_s / (V5E_BF16_TFLOPS * 1e12), 2),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
