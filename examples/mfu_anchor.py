"""MFU / roofline anchors for the headline benchmarks (VERDICT r3 #7).

Extracts analytic FLOPs from the XLA cost model for the two headline
programs — the flagship teacher-forced train step and the B=256 greedy
decode — and states them against the v5e ceilings, so "fast" is
quantified against the hardware, not only against the reference GPU
estimate.

The FLOP counts come from ``jit(...).lower(...).cost_analysis()`` (the
HLO-level cost model, backend-independent), so this runs fine on CPU;
pair the counts with the measured step times from docs/PERFORMANCE.md.

    python examples/mfu_anchor.py [--train-ms 90 --decode-img-s 1746]

v5e single-chip ceilings (public spec): 197 TFLOP/s bf16, 819 GB/s HBM.
"""

from __future__ import annotations

import argparse

import numpy as np

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def _flops(lowered):
    cost = lowered.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost["flops"])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--train-ms", type=float, default=90.0,
                        help="measured train step time (B=64), ms")
    parser.add_argument("--decode-img-s", type=float, default=1746.0,
                        help="measured greedy decode throughput (B=256)")
    parser.add_argument("--batch-train", type=int, default=64)
    parser.add_argument("--batch-decode", type=int, default=256)
    parser.add_argument("--steps", type=int, default=230)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from p4fr_tpu.data.vocab import Vocab
    from p4fr_tpu.models.registry import get_network
    from p4fr_tpu.utils.flags import Flags

    vocab = Vocab.from_files(["p4fr_tpu/configs/tokens.txt"])
    options = Flags("p4fr_tpu/configs/EfficientSATRN.yaml").get()
    model = get_network(options.network, options, vocab, dtype=jnp.bfloat16)
    h, w = options.input_size.height, options.input_size.width

    images = jnp.zeros((args.batch_train, h, w, 3), jnp.float32)
    text = jnp.full((args.batch_train, 64), vocab.pad_id, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images[:1], text[:1, :8], train=False,
    )

    # ---- train step (fwd + bwd + AdamW) --------------------------------
    import optax

    from p4fr_tpu.train.steps import cross_entropy_ignore_pad

    optimizer = optax.chain(
        optax.clip_by_global_norm(2.0), optax.adamw(5e-4, weight_decay=1e-6)
    )
    opt_state = optimizer.init(variables["params"])

    def train_step(params, batch_stats, opt_state, images, text, rng):
        def loss_fn(p):
            logits, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                images, text[:, :-1], train=True,
                mutable=["batch_stats"], rngs={"dropout": rng},
            )
            return cross_entropy_ignore_pad(
                logits, text[:, 1:], vocab.pad_id
            ), updates["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state2 = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), stats, opt_state2, loss

    lowered = jax.jit(train_step).lower(
        variables["params"], variables.get("batch_stats", {}), opt_state,
        images, text, jax.random.PRNGKey(2),
    )
    train_flops = _flops(lowered)
    train_s = args.train_ms / 1e3
    train_mfu = train_flops / train_s / (V5E_BF16_TFLOPS * 1e12)
    print(f"train step B={args.batch_train}: {train_flops/1e12:.3f} TFLOP "
          f"-> at {args.train_ms:.0f} ms/step = "
          f"{train_flops/train_s/1e12:.1f} TFLOP/s = "
          f"{100*train_mfu:.1f}% of v5e bf16 peak")

    # ---- greedy decode program (encoder + 230-step fused scan) ---------
    from p4fr_tpu.decoding.fast_step import make_fast_greedy_fn
    from p4fr_tpu.decoding.manager import RuleTables

    images_d = jnp.zeros((args.batch_decode, h, w, 3), jnp.float32)
    tables = RuleTables.build(vocab)
    decode = make_fast_greedy_fn(
        model, variables, max_steps=args.steps, tables=tables,
        use_pallas_v2=False,  # jnp path: the cost model can see its HLO
    )
    lowered_d = jax.jit(decode).lower(images_d)
    dec_flops = _flops(lowered_d)
    dec_s = args.batch_decode / args.decode_img_s  # s per batch
    dec_mfu = dec_flops / dec_s / (V5E_BF16_TFLOPS * 1e12)
    print(f"greedy decode B={args.batch_decode} x {args.steps} steps: "
          f"{dec_flops/1e12:.3f} TFLOP -> at {args.decode_img_s:.0f} img/s "
          f"({dec_s*1e3:.0f} ms/batch) = {dec_flops/dec_s/1e12:.2f} TFLOP/s "
          f"= {100*dec_mfu:.2f}% of v5e bf16 peak")

    # ---- decode HBM-bandwidth roofline ----------------------------------
    # AR decode is bandwidth-bound: per step each layer re-reads the
    # growing KV prefix + the cross-attention src KV from HBM/VMEM.
    n_layers = options.SATRN.decoder.layer_num
    hidden = options.SATRN.decoder.hidden_dim
    s_len = (h // 32) * (w // 32)
    bytes_per_step = args.batch_decode * n_layers * 2 * hidden * 2 * (
        args.steps / 2 + s_len
    )  # bf16: 2 bytes; avg prefix length = steps/2; src read every step
    total_bytes = bytes_per_step * args.steps
    bw = total_bytes / dec_s
    print(f"decode KV+src traffic ~{total_bytes/1e9:.1f} GB/batch -> "
          f"{bw/1e9:.0f} GB/s = {100*bw/(V5E_HBM_GBPS*1e9):.0f}% of v5e "
          f"HBM bandwidth (the binding roofline; matches the DMA-floor "
          f"analysis in docs/PERFORMANCE.md)")


if __name__ == "__main__":
    main()
