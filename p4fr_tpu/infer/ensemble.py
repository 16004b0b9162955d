"""Multi-model ensemble inference: per-step softmax averaging on device.

The reference ensembles heterogeneous architectures with a 2-phase
disk-staged pipeline — encoders run first and pickle their outputs to
``./tmp_enc_results`` in chunks of ``--max_cache`` batches, then encoders
are freed and decoder-only models step jointly token-by-token, averaging
per-step softmax across models with an optional DecodingManager sift
(reference: inference_modules/inference_ensemble.py:46-248,
utils/ensemble_utils.py:45-120). That staging exists only because one
2080-class GPU cannot hold all encoders+decoders at once.

On TPU everything stays resident in HBM: each model's encoder runs on its
own resolution-specific image batch, then ONE fused ``lax.scan`` steps all
decoders jointly, averaging softmax per token step, with the vectorized
grammar masking inline. ``--max_cache`` is accepted as a no-op compat shim.

Per-model input resolutions follow each checkpoint's embedded config, like
the reference's per-architecture dataloaders (inference_ensemble.py:72-109).
With ``--preprocess device_resize`` the host loads each image ONCE onto a
shared raw-u8 canvas and every member's encoder resizes to its own
resolution on device (ops/pallas/preprocess.resize_standardize): one PNG
decode and one H2D transfer per image instead of len(models) of each.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from p4fr_tpu.data.augment import get_valid_transforms
from p4fr_tpu.data.dataset import load_image
from p4fr_tpu.data.vocab import Vocab, id_to_string
from p4fr_tpu.decoding import manager as dm
from p4fr_tpu.infer.single import load_model_from_checkpoint


def make_ensemble_decode_fn(
    models: Sequence,
    *,
    max_steps: int,
    tables: Optional[dm.RuleTables] = None,
    early_stop_eos: Optional[int] = None,
    kernel: str = "auto",
):
    """fn(variables_list, memories_list) -> tokens [B, T].

    All models must share the vocabulary (reference asserts the same).
    Softmax is averaged across models each step (ensemble_utils.py:93-98);
    the manager's additional softmax is monotonic so the argmax matches the
    reference's double-softmax behavior exactly.

    ``kernel``: transformer-decoder members step through the fused-weight
    fast path ("jnp", numerically identical to the generic flax step) or
    the flash-decode Pallas kernel ("pallas_v2"); "auto" picks pallas_v2
    on TPU and jnp elsewhere; "generic" forces the modular flax step.
    Members without a fast decode contract (e.g. ASTER's LSTM decoder)
    always use their generic ``decode_step``.
    """
    from p4fr_tpu.decoding.fast_step import resolve_kernel

    sos_id = models[0].sos_id
    if kernel == "fused":
        # the single-launch fused kernel argmaxes internally — ensemble
        # averaging needs per-model probs, so use the per-layer kernel
        kernel = "pallas_v2"
    kernel = resolve_kernel(kernel)

    def fn(variables_list, memories):
        from p4fr_tpu.decoding.fast_step import (
            build_fast_decoder,
            fast_decode_step,
            init_fast_cache,
            pallas_decode_step_v2,
            precompute_cross_kv,
        )

        batch = memories[0].shape[0]
        # the Pallas kernel wants full 16-row batch tiles (e.g. a small
        # per-shard batch under data parallelism); the jnp fast step is
        # the same numeric class, so degrade rather than tile raggedly
        kern = "jnp" if (kernel == "pallas_v2" and batch % 16) else kernel
        model_fast = [
            kern != "generic"
            and getattr(m, "supports_fast_decode", False)
            for m in models
        ]
        src_kvs, caches, steps = [], [], []
        for m, v, mem, is_fast in zip(
            models, variables_list, memories, model_fast
        ):
            if is_fast:
                fast = build_fast_decoder(m, v)
                cache_len = max_steps
                if kern == "pallas_v2" and cache_len % 128:
                    cache_len = ((cache_len + 127) // 128) * 128
                src_kvs.append(
                    precompute_cross_kv(fast, mem.astype(fast.w_gen.dtype))
                )
                caches.append(init_fast_cache(fast, batch, cache_len))
                step = (
                    pallas_decode_step_v2
                    if kern == "pallas_v2"
                    and int(fast.w_gen.shape[0]) % 128 == 0
                    else fast_decode_step
                )
                steps.append(
                    lambda tok, t, ckv, c, fast=fast, step=step: step(
                        fast, tok, t, ckv, c
                    )
                )
            elif kern != "generic" and getattr(
                m, "supports_fast_lstm_decode", False
            ):
                from p4fr_tpu.decoding.fast_aster import (
                    build_fast_aster,
                    fast_aster_step,
                    init_fast_aster_cache,
                    precompute_aster_src,
                )

                fa = build_fast_aster(m, v)
                src_kvs.append(
                    precompute_aster_src(fa, mem.astype(fa.w_gen.dtype))
                )
                caches.append(init_fast_aster_cache(fa, batch))
                steps.append(
                    lambda tok, t, ckv, c, fa=fa: fast_aster_step(
                        fa, tok, ckv[0], ckv[1], c
                    )
                )
            else:
                src_kvs.append(m.apply(v, mem, method="precompute_src"))
                caches.append(m.init_decode_cache(batch, max_steps))
                steps.append(
                    lambda tok, t, ckv, c, m=m, v=v: m.apply(
                        v, tok, t, ckv, c, method="decode_step"
                    )
                )
        token0 = jnp.full((batch,), sos_id, jnp.int32)
        mstate0 = dm.init_state(batch, tables) if tables is not None else None

        def body(carry, t):
            token, caches, mstate = carry
            probs_sum = None
            new_caches = []
            for step, src_kv, cache in zip(steps, src_kvs, caches):
                logits, cache = step(token, t, src_kv, cache)
                p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                probs_sum = p if probs_sum is None else probs_sum + p
                new_caches.append(cache)
            mean = probs_sum / len(models)
            if tables is not None:
                target, _, mstate = dm.sift(mstate, mean, tables)
            else:
                target = jnp.argmax(mean, axis=-1).astype(jnp.int32)
            return (target, tuple(new_caches), mstate), target

        if early_stop_eos is not None:
            out_buf = jnp.full((batch, max_steps), early_stop_eos, jnp.int32)
            done0 = jnp.zeros((batch,), bool)

            def cond(c):
                return (c[0] < max_steps) & ~jnp.all(c[4])

            def wbody(c):
                t, token, caches, mstate, done, buf = c
                (token, caches, mstate), target = body(
                    (token, caches, mstate), t
                )
                buf = buf.at[:, t].set(
                    jnp.where(done, early_stop_eos, target)
                )
                done = done | (target == early_stop_eos)
                return t + 1, token, caches, mstate, done, buf

            carry = (jnp.asarray(0), token0, tuple(caches), mstate0, done0,
                     out_buf)
            *_, out_buf = jax.lax.while_loop(cond, wbody, carry)
            return out_buf

        carry0 = (token0, tuple(caches), mstate0)
        _, tokens = jax.lax.scan(body, carry0, jnp.arange(max_steps))
        return tokens.T

    return fn


def run_ensemble(
    checkpoint_paths: Sequence[str],
    file_path: str,
    output_dir: str,
    *,
    batch_size: int = 32,
    max_sequence: int = 230,
    decoding_manager: bool = True,
    max_cache: int = 50,  # compat no-op
    early_stop: bool = False,
    mesh=None,
    kernel: str = "auto",
    preprocess: str = "device",
) -> List[Tuple[str, str]]:
    del max_cache
    loaded = [load_model_from_checkpoint(p) for p in checkpoint_paths]
    models = [l[0] for l in loaded]
    variables_list = [l[1] for l in loaded]
    options_list = [l[2] for l in loaded]
    vocab: Vocab = loaded[0][3]
    if preprocess not in ("device", "device_resize", "host"):
        raise ValueError(f"preprocess {preprocess!r}")
    device_preprocess = preprocess != "host"
    device_resize = preprocess == "device_resize"
    if device_resize and len({o.data.rgb for o in options_list}) > 1:
        raise ValueError(
            "--preprocess device_resize shares ONE raw canvas batch "
            "across members; members must agree on data.rgb"
        )

    # per-model eval transform at its own resolution; with device
    # preprocessing the host only resizes uint8 and each encoder fuses the
    # standardization into its compiled program (preprocess.standardize).
    # device_resize goes further: the host loads each image ONCE onto a
    # shared edge-replicated canvas and every member's encoder resizes to
    # its own resolution on device (preprocess.resize_standardize) — one
    # H2D transfer and one PNG decode instead of len(models) of each
    transforms = None if device_resize else [
        get_valid_transforms(
            o.input_size.height, o.input_size.width, o.data.rgb,
            normalize=not device_preprocess,
        )
        for o in options_list
    ]

    root = os.path.join(os.path.dirname(file_path), "images")
    with open(file_path, "r") as fd:
        rows = [r for r in csv.reader(fd, delimiter="\t") if r]
    names = [r[0] for r in rows]
    if device_resize:
        from p4fr_tpu.infer.single import canvas_for

        canvas_hw = canvas_for(os.path.join(root, n) for n in names)

    tables = dm.RuleTables.build(vocab) if decoding_manager else None
    num_steps = max_sequence + 1  # reference ensemble num_steps
    decode_fn = make_ensemble_decode_fn(
        models, max_steps=num_steps, tables=tables,
        early_stop_eos=vocab.eos_id if early_stop else None,
        kernel=kernel,
    )
    def encode_fn(model, options):
        if device_resize:
            from p4fr_tpu.ops.pallas.preprocess import resize_standardize

            th = options.input_size.height
            tw = options.input_size.width

            def enc(v, im, m=model, th=th, tw=tw):
                canvas_u8, orig_hw = im
                return m.apply(
                    v,
                    resize_standardize(
                        canvas_u8, orig_hw, th, tw, out_dtype=m.dtype
                    ),
                    method="encode",
                )

            return enc
        if device_preprocess:
            from p4fr_tpu.ops.pallas.preprocess import standardize

            return lambda v, im, m=model: m.apply(
                v, standardize(im, out_dtype=m.dtype), method="encode"
            )
        return lambda v, im, m=model: m.apply(v, im, method="encode")

    if mesh is not None:
        # DP ensemble (BASELINE north star): every model replicates, the
        # image batch and all per-model encoder memories shard over `data`.
        # BOTH the joint decode AND the encoders go through shard_map
        # (manual SPMD): GSPMD cannot partition a pallas_call, and the
        # encoders embed two of them on TPU (the fused standardize feed
        # and SWIN's fused window attention, models/swin.py:145-157) —
        # under shard_map each device runs the full per-shard program,
        # so the kernels apply per batch shard with zero collectives,
        # exactly like make_sharded_infer_fn's decode path.
        from p4fr_tpu.parallel.sharding import make_sharded_infer_fn

        decode = make_sharded_infer_fn(decode_fn, mesh)
        encoders = [
            make_sharded_infer_fn(encode_fn(model, options), mesh)
            for model, options in zip(models, options_list)
        ]
    else:
        decode = jax.jit(decode_fn)
        encoders = [
            jax.jit(encode_fn(model, options))
            for model, options in zip(models, options_list)
        ]

    results: List[Tuple[str, str]] = []
    start = time.perf_counter()

    def flush(pending):
        tokens, chunk = pending
        strs = id_to_string(
            np.asarray(tokens)[: len(chunk)],
            vocab.id_to_token,
            sos_id=vocab.sos_id,
            eos_id=vocab.eos_id,
            pad_id=vocab.pad_id,
            do_eval=True,
        )
        results.extend(zip(chunk, strs))

    # double-buffered like run_inference: the next chunk's host-side
    # image loading + device decode overlap the previous chunk's fetch
    pending = None
    for chunk_start in range(0, len(names), batch_size):
        chunk = names[chunk_start : chunk_start + batch_size]
        count = len(chunk)
        padded = chunk + [chunk[-1]] * (batch_size - count)
        if device_resize:
            # ONE canvas batch serves every member: each encoder's
            # program resizes to its own resolution on device
            from p4fr_tpu.data.augment import to_canvas

            rgb = options_list[0].data.rgb
            pairs = [
                to_canvas(
                    load_image(os.path.join(root, n), rgb), *canvas_hw
                )
                for n in padded
            ]
            shared = (
                jnp.asarray(np.stack([c for c, _ in pairs])),
                jnp.asarray(np.array([d for _, d in pairs], np.int32)),
            )
            memories = [
                enc(v, shared)
                for enc, v in zip(encoders, variables_list)
            ]
        else:
            # each model encodes its own resolution-specific batch
            memories = []
            for model, variables, transform, options in zip(
                models, variables_list, transforms, options_list
            ):
                imgs = np.stack(
                    [
                        transform(
                            load_image(
                                os.path.join(root, n), options.data.rgb
                            )
                        )
                        for n in padded
                    ]
                )
                if imgs.dtype != np.uint8:
                    imgs = imgs.astype(np.float32)
                memories.append(
                    encoders[len(memories)](variables, jnp.asarray(imgs))
                )
        tokens = decode(variables_list, memories)
        if pending is not None:
            flush(pending)
        pending = (tokens, chunk)
    if pending is not None:
        flush(pending)
    elapsed = time.perf_counter() - start

    os.makedirs(output_dir, exist_ok=True)
    out_path = os.path.join(output_dir, "output.csv")
    with open(out_path, "w") as w:
        for path, predicted in results:
            w.write(path + "\t" + predicted + "\n")
    print(
        f"[+] ensemble of {len(models)} wrote {len(results)} predictions -> "
        f"{out_path} ({len(results) / max(elapsed, 1e-9):.1f} img/s)"
    )
    return results


def main(parser):
    mesh = None
    if getattr(parser, "data_parallel", False):
        from p4fr_tpu.infer.single import default_mesh

        mesh = default_mesh(parser.batch_size)
    return run_ensemble(
        parser.checkpoint,
        parser.file_path,
        parser.output_dir,
        batch_size=parser.batch_size,
        max_sequence=parser.max_sequence,
        decoding_manager=parser.decoding_manager,
        max_cache=parser.max_cache,
        early_stop=getattr(parser, "early_stop", False),
        mesh=mesh,
        kernel=getattr(parser, "kernel", "auto"),
        preprocess=getattr(parser, "preprocess", "device"),
    )
