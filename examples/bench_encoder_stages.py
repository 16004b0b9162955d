#!/usr/bin/env python
"""Per-stage timing of the flagship EfficientSATRN encoder on TPU.

The r4 device trace put the encoder at 53.9 ms of the 141 ms flagship
batch (B=256) but attributed it only at whole-fusion granularity
(the SE pools' convert_reduce_fusions, measured a wash to replace —
examples/bench_se_pool.py). This harness times each encoder SEGMENT as
its own jitted program at the real intermediate shapes so optimization
targets are ranked by measured ms, not FLOP guesses:

  stem            [B,256,512,3]  -> [B,127,255,24]   (3x3 s2 VALID)
  stage0          [B,127,255,24] -> [B,127,255,24]   FusedMBConv x2
  stage1          [B,127,255,24] -> [B,64,128,48]    FusedMBConv x4
  stage2          [B,64,128,48]  -> [B,32,64,64]     FusedMBConv x4
  stage3          [B,32,64,64]   -> [B,16,32,128]    MBConv+SE  x6
  stage4          [B,16,32,128]  -> [B,16,32,160]    MBConv+SE  x9
  stage5          [B,16,32,160]  -> [B,8,16,256]     MBConv+SE  x15
  proj            [B,8,16,256]   -> [B,8,16,512]     1x1 + BN + SiLU
  pe+transformer  [B,8,16,512]   -> [B,128,512]      2D PE + 2 layers

Segment sums over-count slightly vs the fused full program (each
segment pays its own output materialization); the full encode is timed
alongside as the cross-check. Timing per CLAUDE.md: np.asarray sync,
pipelined iters, scalar checksums (never fetch feature maps through
the tunnel).

Reference provenance: the backbone mirrors
/root/reference/networks/EfficientSATRN.py:63-87 (custom stem + timm
V2-S blocks + 1x1 projection); stage topology in
p4fr_tpu/models/efficientnetv2.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--repeat", type=int, default=9,
                   help="K for the per-segment (t_K - t_1)/(K-1) slope")
    p.add_argument("--quick", action="store_true",
                   help="CPU sanity: tiny batch/input")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    if args.quick:
        jax.config.update("jax_platforms", "cpu")
        args.batch, args.iters, args.repeat = 2, 2, 2
    else:
        try:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get("JAX_CACHE_DIR", "/tmp/p4fr_jax_cache"),
            )
        except Exception:
            pass

    from p4fr_tpu.models.efficientnetv2 import (
        V2_S_STAGES, FusedMBConv, MBConv, _bn,
    )
    from p4fr_tpu.models.satrn import (
        AdaptivePositionalEncoding2D, SATRNEncoderLayer,
    )

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    rng = np.random.default_rng(0)
    B = args.batch
    H_IN, W_IN = (64, 128) if args.quick else (256, 512)

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(24, (3, 3), strides=2, padding="VALID",
                        use_bias=False, dtype=dtype, name="conv_stem")(x)
            x = _bn(False, "bn1", dtype)(x)
            return nn.silu(x)

    class Stage(nn.Module):
        idx: int

        @nn.compact
        def __call__(self, x):
            repeats, kernel, stride, expand, _in, out, use_se, fused = (
                V2_S_STAGES[self.idx]
            )
            for bi in range(repeats):
                s = stride if bi == 0 else 1
                cls = FusedMBConv if fused else MBConv
                kw = {} if fused else {"se_ratio": 0.25 if use_se else 0.0}
                x = cls(out_chs=out, kernel=kernel, stride=s,
                        expand_ratio=expand, dtype=dtype,
                        name=f"b{bi}", **kw)(x, False)
            return x

    class Proj(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(512, (1, 1), use_bias=False, dtype=dtype,
                        name="conv_last")(x)
            x = _bn(False, "bn2", dtype)(x)
            return nn.silu(x)

    class PETransformer(nn.Module):
        @nn.compact
        def __call__(self, x):
            b, h, w, c = x.shape
            x = AdaptivePositionalEncoding2D(
                hidden_size=512, height=h, width=w, dropout=0.1,
                dtype=dtype, name="pe",
            )(x, deterministic=True)
            for i in range(2):
                x = SATRNEncoderLayer(
                    hidden_dim=512, filter_dim=512, head_num=8,
                    dropout=0.1, dtype=dtype, name=f"layer{i}",
                )(x, deterministic=True)
            return x.reshape(b, h * w, c)

    def timeit(name, module, in_shape):
        """Per-apply device time via a two-point slope: run the segment
        k=1 and k=K times INSIDE one jit (serialized by a 0*sum(y) data
        dependency XLA's float algsimp cannot fold away) and report
        (t_K - t_1)/(K - 1). A single-apply measurement through the axon
        tunnel is dominated by ~25 ms of fixed per-dispatch RPC cost
        (measured r5: nine segments 'sum' to 241 ms vs 56.5 ms fused);
        the slope differences that out exactly."""
        x = jnp.asarray(
            rng.normal(size=(B,) + in_shape).astype(np.float32), dtype
        )
        variables = module.init(jax.random.PRNGKey(0), x)

        def make(k):
            @jax.jit
            def f(v, x):
                s = jnp.float32(0)
                xi = x
                for _ in range(k):
                    y = module.apply(v, xi)
                    s = s + jnp.sum(y.astype(jnp.float32))
                    # serialize the next apply on s without changing
                    # shape; float mul-by-zero is not simplified away
                    xi = (x.astype(jnp.float32) * (1.0 + 0.0 * s)).astype(
                        x.dtype
                    )
                return s
            return f

        K = args.repeat
        times = {}
        for k in (1, K):
            f = make(k)
            np.asarray(f(variables, x))  # compile + warm
            t0 = time.perf_counter()
            outs = [f(variables, x) for _ in range(args.iters)]
            for o in outs:
                np.asarray(o)
            times[k] = (time.perf_counter() - t0) / args.iters
        dt = max((times[K] - times[1]) / (K - 1), 0.0)
        out_shape = jax.eval_shape(
            lambda v, x: module.apply(v, x), variables, x
        ).shape
        print(f"{name:16s} in {str((B,) + in_shape):22s} "
              f"-> {str(out_shape):22s} {dt*1e3:9.2f} ms "
              f"(1x {times[1]*1e3:.2f} | {K}x {times[K]*1e3:.2f})",
              flush=True)
        return dt

    # real intermediate shapes at the flagship input (VALID stem -> odd
    # dims; SAME stage strides ceil-divide)
    def shapes():
        h = (H_IN - 3) // 2 + 1
        w = (W_IN - 3) // 2 + 1
        out = [("stem", (H_IN, W_IN, 3))]
        c = 24
        for i, (_, _, stride, _, _in, oc, _, _) in enumerate(V2_S_STAGES):
            out.append((f"stage{i}", (h, w, c)))
            h = -(-h // stride)
            w = -(-w // stride)
            c = oc
        out.append(("proj", (h, w, c)))
        out.append(("pe+transformer", (h, w, 512)))
        return out

    segs = shapes()
    results = {}
    for name, in_shape in segs:
        if name == "stem":
            mod = Stem()
        elif name.startswith("stage"):
            mod = Stage(idx=int(name[5:]))
        elif name == "proj":
            mod = Proj()
        else:
            mod = PETransformer()
        results[name] = timeit(name, mod, in_shape)

    # full-encoder cross-check (the fused program the bench actually runs)
    from p4fr_tpu.data.vocab import Vocab
    from p4fr_tpu.models.registry import get_network
    from p4fr_tpu.utils.flags import Flags

    vocab = Vocab.from_files(["p4fr_tpu/configs/tokens.txt"])
    options = Flags("p4fr_tpu/configs/EfficientSATRN.yaml").get()
    if args.quick:
        options.input_size.height, options.input_size.width = H_IN, W_IN
    model = get_network(options.network, options, vocab, dtype=dtype)
    images = jnp.asarray(
        rng.normal(size=(B, H_IN, W_IN, 3)).astype(np.float32)
    )
    text = jnp.full((1, 8), vocab.pad_id, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images[:1], text, train=False,
    )

    def make_full(k):
        @jax.jit
        def full(v, im):
            s = jnp.float32(0)
            xi = im
            for _ in range(k):
                y = model.apply(v, xi, method="encode")
                s = s + jnp.sum(y.astype(jnp.float32))
                xi = (im.astype(jnp.float32) * (1.0 + 0.0 * s)).astype(
                    im.dtype
                )
            return s
        return full

    K = max(2, args.repeat // 2)  # the full program is the big compile
    fdt = {}
    for k in (1, K):
        full = make_full(k)
        np.asarray(full(variables, images))
        t0 = time.perf_counter()
        outs = [full(variables, images) for _ in range(args.iters)]
        for o in outs:
            np.asarray(o)
        fdt[k] = (time.perf_counter() - t0) / args.iters
    full_dt = max((fdt[K] - fdt[1]) / (K - 1), 0.0)
    seg_sum = sum(results.values())
    print(f"{'segment sum':16s} {'':47s} {seg_sum*1e3:9.2f} ms")
    print(f"{'full encode':16s} {'':47s} {full_dt*1e3:9.2f} ms")
    print(json.dumps({
        "metric": "encoder stage attribution (ms, B=%d)" % B,
        "segments": {k: round(v * 1e3, 2) for k, v in results.items()},
        "segment_sum_ms": round(seg_sum * 1e3, 2),
        "full_encode_ms": round(full_dt * 1e3, 2),
        "backend": jax.default_backend(),
    }), flush=True)


if __name__ == "__main__":
    main()
