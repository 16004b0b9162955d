#!/usr/bin/env python
"""Per-stage timing of the SwinTRN (Swin-B/384) encoder on TPU.

VERDICT r4 #9: SwinTRN gates the 3-model ensemble (181 img/s) and the
fused window-attention kernel's +7.7% (r3) may or may not have
exhausted the headroom — no stage-level attribution existed. This is
the Swin sibling of examples/bench_encoder_stages.py: each stage —
patch embed, the four block stages (with their trailing patch-merge),
final norm — timed as its own jitted program at the real intermediate
resolutions, using the same two-point in-jit repetition slope that
defeats the ~25 ms per-dispatch tunnel cost.

Segments (Swin-B/384: embed 128, depths 2/2/18/2, heads 4/8/16/32,
window 12; reference /root/reference/networks/SWIN.py:84-430):

  patch_embed  [B,384,384,3] -> [B,9216,128]   4x4 conv + LN
  stage0       96x96 x128, 2 blocks + merge -> 48x48 x256
  stage1       48x48 x256, 2 blocks + merge -> 24x24 x512
  stage2       24x24 x512, 18 blocks + merge -> 12x12 x1024
  stage3       12x12 x1024, 2 blocks + final LN

Usage: python examples/bench_swin_stages.py [--batch 64] [--iters 6]
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
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--repeat", type=int, default=5,
                   help="K for the per-segment (t_K - t_1)/(K-1) slope")
    p.add_argument("--quick", action="store_true",
                   help="CPU sanity: tiny dims")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    if args.quick:
        jax.config.update("jax_platforms", "cpu")
        args.batch, args.iters, args.repeat = 1, 2, 2
    else:
        try:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get("JAX_CACHE_DIR", "/tmp/p4fr_jax_cache"),
            )
        except Exception:
            pass

    from p4fr_tpu.models.swin import PatchMerging, SwinBlock

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    rng = np.random.default_rng(0)
    B = args.batch

    if args.quick:
        img, embed, depths, heads, window = 64, 32, (1, 1), (2, 4), 4
    else:
        img, embed, depths, heads, window = (
            384, 128, (2, 2, 18, 2), (4, 8, 16, 32), 12
        )

    class PatchEmbed(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(embed, (4, 4), strides=4, padding="VALID",
                        dtype=dtype, name="patch_embed")(x)
            b, h, w, c = x.shape
            x = x.reshape(b, h * w, c)
            return nn.LayerNorm(epsilon=1e-5, dtype=dtype,
                                name="patch_norm")(x)

    class Stage(nn.Module):
        idx: int
        res: tuple
        dim: int
        last: bool

        @nn.compact
        def __call__(self, x):
            win = min(window, *self.res)
            for i in range(depths[self.idx]):
                shift = 0 if i % 2 == 0 else (
                    0 if min(self.res) <= win else win // 2
                )
                x = SwinBlock(
                    dim=self.dim, resolution=self.res,
                    num_heads=heads[self.idx], window=win, shift=shift,
                    drop_path=0.0, dtype=dtype, name=f"b{i}",
                )(x, True)
            if not self.last:
                x = PatchMerging(dim=self.dim, resolution=self.res,
                                 dtype=dtype, name="merge")(x)
            else:
                x = nn.LayerNorm(epsilon=1e-5, dtype=dtype, name="norm")(x)
            return x

    def timeit(name, module, in_shape):
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
                    xi = (x.astype(jnp.float32) * (1.0 + 0.0 * s)).astype(
                        x.dtype
                    )
                return s
            return f

        K = args.repeat
        times = {}
        for k in (1, K):
            f = make(k)
            np.asarray(f(variables, x))
            t0 = time.perf_counter()
            outs = [f(variables, x) for _ in range(args.iters)]
            for o in outs:
                np.asarray(o)
            times[k] = (time.perf_counter() - t0) / args.iters
        dt = max((times[K] - times[1]) / (K - 1), 0.0)
        print(f"{name:12s} in {str((B,) + in_shape):20s} "
              f"{dt*1e3:9.2f} ms (1x {times[1]*1e3:.2f} | "
              f"{K}x {times[K]*1e3:.2f})", flush=True)
        return dt

    res0 = img // 4
    results = {"patch_embed": timeit("patch_embed", PatchEmbed(),
                                     (img, img, 3))}
    res, dim = (res0, res0), embed
    for i in range(len(depths)):
        last = i == len(depths) - 1
        results[f"stage{i}"] = timeit(
            f"stage{i}", Stage(idx=i, res=res, dim=dim, last=last),
            (res[0] * res[1], dim),
        )
        if not last:
            res = (res[0] // 2, res[1] // 2)
            dim *= 2

    seg_sum = sum(results.values())
    print(f"{'segment sum':12s} {'':20s} {seg_sum*1e3:9.2f} ms")
    print(json.dumps({
        "metric": "swin encoder stage attribution (ms, B=%d)" % B,
        "segments": {k: round(v * 1e3, 2) for k, v in results.items()},
        "segment_sum_ms": round(seg_sum * 1e3, 2),
        "backend": jax.default_backend(),
    }), flush=True)


if __name__ == "__main__":
    main()
