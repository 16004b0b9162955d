#!/usr/bin/env python
"""CPU-to-CPU throughput ratio: REAL reference code vs this framework.

No CUDA GPU exists in this environment, so BASELINE_MEASUREMENT.md's
reference number is a documented estimate. What CAN be measured on
identical hardware is the reference's actual torch code against this
framework's XLA-CPU path: the same LiteSATRN architecture at its
production dims, identical random weights (converted through the .pth
rule table), identical inputs, same greedy decode length, one CPU.

This pins the *structural* speedup (fused scan + XLA compilation vs a
Python-per-step torch loop) independent of any accelerator, and
sanity-checks the shape of the GPU estimate. Run on a quiet machine:

    python examples/measure_cpu_ratio.py [--batch 8] [--steps 64]

The reference decode loop executed here is the real code:
/root/reference/networks/LiteSATRN.py:505-545 (is_train=False branch)
via /root/reference/postprocessing/decoding.py:6-53.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=64,
                   help="decode steps both sides (230 is production; 64 "
                   "keeps the torch side tolerable)")
    p.add_argument("--repeat", type=int, default=3)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import torch

    from reference_loader import (
        cpu_get_device,
        load_reference,
        make_dataset_stub,
        make_flags,
    )

    from p4fr_tpu.data.vocab import Vocab
    from p4fr_tpu.decoding.fast_step import make_fast_greedy_fn
    from p4fr_tpu.models.satrn import SATRN
    from p4fr_tpu.utils.convert_pth import convert_state_dict

    torch.set_num_threads(os.cpu_count() or 1)
    vocab = Vocab.from_files([os.path.join(REPO, "p4fr_tpu/configs/tokens.txt")])
    ns = load_reference()

    # production LiteSATRN dims (configs/LiteSATRN.yaml)
    H_IMG, W_IMG = 128, 256
    torch.manual_seed(0)
    flags = make_flags(
        height=H_IMG, width=W_IMG, enc_hidden=256, enc_filter=256,
        enc_heads=4, enc_layers=1, dec_src=256, dec_hidden=128,
        dec_filter=512, dec_heads=4, dec_layers=2,
    )
    tmodel = ns.lite_satrn.LiteSATRN(flags, make_dataset_stub(vocab))
    tmodel.eval()

    rng = np.random.default_rng(0)
    images = rng.normal(size=(args.batch, H_IMG, W_IMG, 3)).astype(np.float32)
    expected = np.full((args.batch, args.steps + 1), vocab.pad_id, np.int64)
    expected[:, 0] = vocab.sos_id

    # ---- real reference decode (greedy, manager off) ---------------------
    t_in = torch.tensor(images).permute(0, 3, 1, 2)
    t_exp = torch.tensor(expected)
    with cpu_get_device(), torch.no_grad():
        ns.decoding.decode(tmodel, t_in, expected=t_exp, method="greedy")
        t0 = time.perf_counter()
        for _ in range(args.repeat):
            want = ns.decoding.decode(
                tmodel, t_in, expected=t_exp, method="greedy"
            )
        ref_s = (time.perf_counter() - t0) / args.repeat
    ref_ips = args.batch / ref_s

    # ---- this framework, same weights, XLA CPU ---------------------------
    params, stats, unmatched = convert_state_dict("LiteSATRN", tmodel.state_dict())
    assert unmatched == [], unmatched[:5]
    variables = {"params": params, "batch_stats": stats}
    jmodel = SATRN(
        num_classes=len(vocab), pad_id=vocab.pad_id, sos_id=vocab.sos_id,
        input_height=H_IMG, input_width=W_IMG,
        enc_hidden_dim=256, enc_filter_dim=256, enc_layer_num=1,
        enc_head_num=4, dec_src_dim=256, dec_hidden_dim=128,
        dec_filter_dim=512, dec_layer_num=2, dec_head_num=4,
        dropout=0.1, dtype=jnp.float32, backbone="shallow",
        reference_parity=True,
    )
    fn = jax.jit(
        make_fast_greedy_fn(jmodel, variables, max_steps=args.steps)
    )
    got = np.asarray(fn(variables, jnp.asarray(images)))  # compile+warm
    np.testing.assert_array_equal(got, want.numpy())  # same tokens!
    t0 = time.perf_counter()
    for _ in range(args.repeat):
        out = fn(variables, jnp.asarray(images))
    np.asarray(out)
    mine_s = (time.perf_counter() - t0) / args.repeat
    mine_ips = args.batch / mine_s

    result = {
        "metric": "LiteSATRN greedy decode CPU-to-CPU ratio "
                  f"(batch {args.batch}, {args.steps} steps, identical "
                  "weights+tokens, 1 host CPU)",
        "reference_img_per_sec": round(ref_ips, 2),
        "p4fr_tpu_img_per_sec": round(mine_ips, 2),
        "ratio": round(mine_ips / ref_ips, 2),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
