#!/usr/bin/env python
"""Attribute the ~100us/adjacent-launch decode cost with a device trace.

VERDICT r3 weak #2: decode_decompose's marginal-slope probes showed a
lone v2 kernel launch costs ~47us/step while each of 3 back-to-back
launches costs ~100us — independent of the layer->layer data dependency
— and both fewer-launch designs (r2 fused megakernel, r3
grid-over-layers v3) measured SLOWER. That left "the cost lives in
Mosaic per-grid-step machinery" as inference-by-elimination. This
script replaces the inference with evidence: capture a
``jax.profiler`` device trace of (a) a lone-kernel scan window and
(b) a 3-adjacent-launch window, parse the xplane with
``jax.profiler.ProfileData`` (no TensorBoard needed), and report where
the 100us actually sits — inside the kernel events themselves, in
inter-kernel gaps (scheduling/semaphores), or in non-kernel ops.

Probe programs mirror examples/decode_decompose.py --fixed-probes
(pos pinned to 8 so per-step work is stationary; production tile
config tb=64/ck=32/src_hbm at B=256).

Run on the real chip:
    python examples/trace_launch.py            # trace + parse + report
    python examples/trace_launch.py --dump     # just dump plane/line names
"""

from __future__ import annotations

import argparse
import functools
import glob
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_probe(args, layers, *, chain=True, steps=None):
    import jax
    import jax.numpy as jnp

    from p4fr_tpu.ops.pallas.decoder_layer_v2 import decoder_layer_step_v2

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    H, F = args.hidden, args.filter
    rng = np.random.default_rng(0)
    steps = steps or args.steps

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

    weights = [layer_weights() for _ in range(layers)]
    x0 = w(args.batch, H)
    src_kv = w(args.batch, args.src_len, 2 * H)
    max_len = 256
    caches0 = tuple(
        jnp.zeros((args.batch, max_len, 2 * H), dtype) for _ in range(layers)
    )
    step = functools.partial(
        decoder_layer_step_v2, head_num=args.heads, cache_outputs=True,
        batch_tile=args.tb, chunk=args.chunk, interpret=not on_tpu,
        src_hbm=args.src_hbm,
    )

    def body(carry, t):
        x, caches = carry
        pos = jnp.asarray(8, jnp.int32)
        new_caches = []
        out = x0
        acc = None
        for wts, cache in zip(weights, caches):
            o, cache = step(out if chain else x0, pos, cache, src_kv, wts)
            if chain:
                out = o
            else:
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


def build_e2e(args):
    """The bench headline program: flagship EfficientSATRN greedy decode
    (encoder + 230-step pallas_v2 AR scan + manager sift), f(vars, imgs).
    Plus the encoder alone, for the encode/decode split."""
    import jax
    import jax.numpy as jnp

    from p4fr_tpu.data.vocab import Vocab
    from p4fr_tpu.decoding.fast_step import make_fast_greedy_fn
    from p4fr_tpu.decoding.manager import RuleTables
    from p4fr_tpu.models.registry import get_network
    from p4fr_tpu.utils.flags import Flags

    vocab = Vocab.from_files(["p4fr_tpu/configs/tokens.txt"])
    options = Flags(f"p4fr_tpu/configs/{args.network}.yaml").get()
    if args.quick:
        options.input_size.height = 64
        options.input_size.width = 128
        options.SATRN.encoder.layer_num = 1
        options.SATRN.decoder.layer_num = 1
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = get_network(options.network, options, vocab, dtype=dtype)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(
        args.batch, options.input_size.height, options.input_size.width, 3
    )).astype(np.float32))
    text = jnp.full((1, 8), vocab.pad_id, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images[:1], text, train=False,
    )
    # mirror the production jit exactly (raised scoped-VMEM limit +
    # the pipelined-src kernel it unlocks) so the trace attributes the
    # program users actually run
    from p4fr_tpu.utils.xla_opts import (
        decode_compiler_options,
        scoped_vmem_kib,
    )

    opts = decode_compiler_options()
    decode_fn = make_fast_greedy_fn(
        model, variables, max_steps=args.steps,
        tables=RuleTables.build(vocab), use_pallas_v2=on_tpu,
        vmem_limit_kib=scoped_vmem_kib(opts) or 0,
    )
    fn = jax.jit(decode_fn, compiler_options=opts)
    enc = jax.jit(
        lambda v, im: model.apply(v, im, method="encode")
    )

    def run_full():
        return fn(variables, images)

    def run_enc():
        return enc(variables, images)

    return run_full, run_enc


def build_beam(args):
    """The beam bench program: flagship EfficientSATRN lockstep beam
    (W=3) at production batch — r4 measured it 8.5 ms/step at B=256
    (156 img/s), ~4x over a rough floor; this trace attributes where
    the step goes (kernels vs the whole-cache parent gather vs top-k)."""
    import jax
    import jax.numpy as jnp

    from p4fr_tpu.data.vocab import Vocab
    from p4fr_tpu.decoding.beam import make_beam_fn
    from p4fr_tpu.models.registry import get_network
    from p4fr_tpu.utils.flags import Flags

    vocab = Vocab.from_files(["p4fr_tpu/configs/tokens.txt"])
    options = Flags("p4fr_tpu/configs/EfficientSATRN.yaml").get()
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = get_network(options.network, options, vocab, dtype=dtype)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(
        args.batch, options.input_size.height, options.input_size.width, 3
    )).astype(np.float32))
    text = jnp.full((1, 8), vocab.pad_id, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images[:1], text, train=False,
    )
    beam_fn = make_beam_fn(
        model, max_steps=args.steps, beam_width=3, eos_id=vocab.eos_id,
        kernel="pallas_v2" if on_tpu else "jnp",
    )
    fn = jax.jit(beam_fn)

    def run():
        return fn(variables, images)

    return run


def build_train(args):
    """The bench train program: flagship teacher-forced fwd+bwd+AdamW at
    B=64 (bench.py --train). Used to attribute the 89.6 ms step — in
    particular whether XLA executes the EfficientNetV2 depthwise-conv
    weight gradients as dense convs (cost_analysis counts them 61x the
    forward in the CPU micro-test)."""
    import jax
    import jax.numpy as jnp

    from p4fr_tpu.data.vocab import Vocab
    from p4fr_tpu.models.registry import get_network
    from p4fr_tpu.train.steps import (
        TrainState, build_optimizer, make_train_step,
    )
    from p4fr_tpu.utils.flags import Flags

    vocab = Vocab.from_files(["p4fr_tpu/configs/tokens.txt"])
    options = Flags("p4fr_tpu/configs/EfficientSATRN.yaml").get()
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = get_network(options.network, options, vocab, dtype=dtype)
    rng = np.random.default_rng(0)
    tb = 64
    images = jnp.asarray(rng.normal(size=(
        tb, options.input_size.height, options.input_size.width, 3
    )).astype(np.float32))
    labels = jnp.asarray(
        rng.integers(0, 200, size=(tb, 64)).astype(np.int32))
    text = jnp.full((1, 8), vocab.pad_id, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images[:1], text, train=False,
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
    key = jax.random.PRNGKey(0)

    holder = {"state": state}

    def run():
        new_state, metrics, _ = train_step(
            holder["state"], images, labels, key, teacher_forced=True
        )
        holder["state"] = new_state
        return metrics["loss"]

    return run


def capture(label, run, log_root):
    """Warm up, then trace exactly one jitted invocation."""
    import jax

    np.asarray(run())  # compile + warm
    np.asarray(run())
    log_dir = os.path.join(log_root, label)
    jax.profiler.start_trace(log_dir)
    out = run()
    np.asarray(out)  # real sync (block_until_ready lies through the tunnel)
    jax.profiler.stop_trace()
    paths = glob.glob(
        os.path.join(log_dir, "plugins/profile/*/*.xplane.pb")
    )
    assert paths, f"no xplane under {log_dir}"
    return max(paths, key=os.path.getmtime)


def load_planes(xplane_path):
    from jax.profiler import ProfileData

    data = ProfileData.from_file(xplane_path)
    return list(data.planes)


def dump(xplane_path):
    for plane in load_planes(xplane_path):
        print(f"PLANE {plane.name!r}")
        for line in plane.lines:
            events = list(line.events)
            names = defaultdict(int)
            for e in events:
                names[e.name] += 1
            top = sorted(names.items(), key=lambda kv: -kv[1])[:8]
            print(f"  LINE {line.name!r}: {len(events)} events; top {top}")


def device_plane(planes):
    # prefer a real device plane ('/device:TPU:0'-style); otherwise fall
    # back to whichever plane carries the most events (on CPU that is
    # the XLA thunk-executor line under /host:CPU)
    def n_events(p):
        return sum(len(list(line.events)) for line in p.lines)

    devs = [
        p for p in planes
        if ("TPU" in p.name or "device" in p.name.lower())
        and "host" not in p.name.lower()
    ]
    cands = devs or list(planes)
    cands = [p for p in cands if n_events(p)]
    return max(cands, key=n_events) if cands else None


def analyze(label, xplane_path, steps, layers):
    """Per-step attribution: kernel-event time vs inter-event gaps."""
    planes = load_planes(xplane_path)
    plane = device_plane(planes)
    if plane is None:
        print(json.dumps({"label": label, "error": "no device plane",
                          "planes": [p.name for p in planes]}))
        return None

    per_line = {}
    for line in plane.lines:
        evs = []
        for e in line.events:
            try:
                if e.name.startswith("end: "):
                    continue  # CPU-backend region-end markers
                evs.append((e.start_ns, e.duration_ns, e.name))
            except Exception:
                continue
        if evs:
            per_line[line.name] = sorted(evs)

    if not per_line:
        print(json.dumps({"label": label, "error": "no events",
                          "plane": plane.name}))
        return None

    # the XLA-ops line carries one event per executed op; the per-step
    # kernel events are the pallas_call fusions (name contains 'fusion'
    # or the kernel symbol). Pick the busiest line.
    line_name, evs = max(per_line.items(), key=lambda kv: len(kv[1]))
    total_span = max(s + d for s, d, _ in evs) - evs[0][0]
    # merged busy intervals (events may nest/overlap)
    merged = []
    for s, d, _ in evs:
        if merged and s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], s + d)
        else:
            merged.append([s, s + d])
    busy = sum(e - s for s, e in merged)

    by_name = defaultdict(lambda: [0, 0])
    for _, d, n in evs:
        by_name[n][0] += 1
        by_name[n][1] += d
    top = sorted(by_name.items(), key=lambda kv: -kv[1][1])[:12]

    # gap structure between merged busy intervals on the busiest line
    gaps = np.asarray(
        [s1 - e0 for (_, e0), (s1, _) in zip(merged, merged[1:])], np.int64
    )

    report = {
        "label": label,
        "line": line_name,
        "events": len(evs),
        "span_us_total": round(total_span / 1e3, 1),
        "busy_us_total": round(busy / 1e3, 1),
        "idle_us_total": round((total_span - busy) / 1e3, 1),
        "per_step_span_us": round(total_span / steps / 1e3, 2),
        "per_step_busy_us": round(busy / steps / 1e3, 2),
        "per_step_idle_us": round((total_span - busy) / steps / 1e3, 2),
        "gap_p50_us": round(float(np.percentile(gaps, 50)) / 1e3, 2)
        if len(gaps) else 0.0,
        "gap_p90_us": round(float(np.percentile(gaps, 90)) / 1e3, 2)
        if len(gaps) else 0.0,
        "top_events": [
            {"name": n[:80], "count": c, "total_us": round(t / 1e3, 1),
             "mean_us": round(t / c / 1e3, 2)}
            for n, (c, t) in top
        ],
        "xplane": xplane_path,
    }
    print(json.dumps(report), flush=True)
    return report


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--network", default="EfficientSATRN",
                   help="config for --e2e (e.g. SWIN at --batch 32)")
    p.add_argument("--steps", type=int, default=120)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--filter", type=int, default=1024)
    p.add_argument("--src-len", type=int, default=128)
    p.add_argument("--tb", type=int, default=64)
    p.add_argument("--chunk", type=int, default=32)
    p.add_argument("--src-hbm", action="store_true", default=True)
    p.add_argument("--no-src-hbm", dest="src_hbm", action="store_false")
    p.add_argument("--log-root", default="/tmp/p4fr_trace")
    p.add_argument("--dump", action="store_true",
                   help="dump plane/line/event names of the 1L trace only")
    p.add_argument("--e2e", action="store_true",
                   help="trace the FULL flagship greedy program (and the "
                   "encoder alone) instead of the launch probes")
    p.add_argument("--beam", action="store_true",
                   help="trace the flagship beam-W3 program (beam.py) "
                   "and attribute the per-step cost")
    p.add_argument("--train", action="store_true",
                   help="trace the flagship B=64 teacher-forced train "
                   "step (fwd+bwd+AdamW) and attribute it")
    p.add_argument("--quick", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.quick:
        jax.config.update("jax_platforms", "cpu")
        args.batch, args.steps = 8, 8
        args.hidden, args.heads, args.filter = 128, 4, 256
        args.tb, args.chunk, args.src_hbm = 8, 8, False
    else:
        try:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get("JAX_CACHE_DIR", "/tmp/p4fr_jax_cache"),
            )
        except Exception:
            pass

    if args.train:
        run = build_train(args)
        xp = capture("train_step", run, args.log_root)
        if args.dump:
            dump(xp)
        else:
            analyze("train_step", xp, 1, 3)
        return

    if args.beam:
        run = build_beam(args)
        xp = capture("beam_w3", run, args.log_root)
        if args.dump:
            dump(xp)
        else:
            analyze("beam_w3", xp, args.steps, 3)
        return

    if args.e2e:
        run_full, run_enc = build_e2e(args)
        for label, run in (("e2e_full", run_full), ("e2e_encoder", run_enc)):
            xp = capture(label, run, args.log_root)
            if args.dump:
                dump(xp)
            else:
                analyze(label, xp, args.steps, 3)
        return

    probes = [
        ("oneL", 1, True),
        ("threeL_chained", 3, True),
        ("threeL_indep", 3, False),
    ]
    if args.dump:
        probes = probes[:1]

    reports = []
    for label, layers, chain in probes:
        run = build_probe(args, layers, chain=chain)
        xp = capture(label, run, args.log_root)
        if args.dump:
            dump(xp)
            return
        r = analyze(label, xp, args.steps, layers)
        if r:
            reports.append(r)

    if len(reports) >= 2:
        one, three = reports[0], reports[1]
        print(json.dumps({
            "metric": "launch-cost attribution (per step)",
            "oneL_busy_us": one["per_step_busy_us"],
            "oneL_idle_us": one["per_step_idle_us"],
            "threeL_busy_us": three["per_step_busy_us"],
            "threeL_idle_us": three["per_step_idle_us"],
            "delta_busy_us": round(
                three["per_step_busy_us"] - 3 * one["per_step_busy_us"], 2),
            "delta_idle_us": round(
                three["per_step_idle_us"] - one["per_step_idle_us"], 2),
        }), flush=True)


if __name__ == "__main__":
    main()
