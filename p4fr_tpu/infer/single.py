"""Single-model inference: greedy or beam, checkpoint-driven.

TPU-native rebuild of the reference single inference
(reference: inference_modules/inference_single.py:31-120):

- the checkpoint is self-describing (config + vocab embedded), so only
  ``--checkpoint`` and an ``input.txt`` TSV of image names are needed;
- decode length is fixed to ``max_sequence + 1`` steps like the
  reference's ``"\\sin " * max_sequence`` dummy-GT trick implies;
- the whole decode (encode -> scan AR steps -> grammar masking) is one
  XLA program; batches are padded to a static batch size and the tail
  masked out on host;
- output: ``{output_dir}/output.csv`` with ``file_path\\tprediction`` rows.
"""

from __future__ import annotations

import csv
import os
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from p4fr_tpu.data.augment import get_valid_transforms
from p4fr_tpu.data.dataset import LoadEvalDataset
from p4fr_tpu.data.loader import DataLoader
from p4fr_tpu.data.vocab import Vocab, id_to_string
from p4fr_tpu.decoding.greedy import make_greedy_fn
from p4fr_tpu.decoding.manager import RuleTables
from p4fr_tpu.models.registry import get_network
from p4fr_tpu.utils.checkpoint import load_checkpoint
from p4fr_tpu.utils.flags import Flags


def load_model_from_checkpoint(checkpoint_path: str, dtype=None):
    """(model, variables, options, vocab) from a self-describing ckpt."""
    from flax import serialization as ser

    ckpt = load_checkpoint(checkpoint_path)
    options = Flags(ckpt["configs"]).get()
    vocab = Vocab.from_maps(ckpt["token_to_id"], ckpt["id_to_token"])
    if dtype is None:
        dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = get_network(ckpt["network"], options, vocab, dtype=dtype)
    variables = {"params": ckpt["params"]}
    if ckpt.get("batch_stats"):
        variables["batch_stats"] = ckpt["batch_stats"]
    return model, variables, options, vocab, ckpt


def canvas_for(paths, round_to: int = 8):
    """Fixed canvas (Hc, Wc) covering every image: max dims from the PNG
    headers (no pixel decode), after the reference's rotate-if-h/w>2
    quirk (data.dataset.load_image), rounded up for tidy device tiling."""
    from PIL import Image

    max_h = max_w = 1
    for p in paths:
        with Image.open(p) as im:
            w, h = im.size
        if h / w > 2:
            h, w = w, h
        max_h, max_w = max(max_h, h), max(max_w, w)
    up = lambda v: -(-v // round_to) * round_to  # noqa: E731
    return up(max_h), up(max_w)


def build_eval_loader(
    file_path: str, options, vocab: Vocab, batch_size: int, max_sequence: int,
    *, host_normalize: bool = True, sort_by_size: bool = False,
    device_resize: bool = False,
):
    dummy_gt = "\\sin " * max_sequence  # fixes decode length, reference trick
    root = os.path.join(os.path.dirname(file_path), "images")
    with open(file_path, "r") as fd:
        rows = [r for r in csv.reader(fd, delimiter="\t") if r]
    test_data = [
        (os.path.join(root, r[0]), r[0], dummy_gt.strip()) for r in rows
    ]
    transform = get_valid_transforms(
        options.input_size.height, options.input_size.width, options.data.rgb,
        normalize=host_normalize,
        canvas=canvas_for(p for p, _, _ in test_data)
        if device_resize else None,
    )
    dataset = LoadEvalDataset(
        test_data,
        vocab.token_to_id,
        vocab.id_to_token,
        crop=False,
        transform=transform,
        rgb=options.data.rgb,
    )
    loader = DataLoader(
        dataset,
        batch_size,
        max_label_len=max_sequence + 2,
        shuffle=False,
        pad_last=True,
        sort_key=dataset.size_proxy if sort_by_size else None,
    )
    return loader, dataset


def run_inference(
    checkpoint_path: str,
    file_path: str,
    output_dir: str,
    *,
    batch_size: int = 32,
    max_sequence: int = 230,
    decode_type: str = "greedy",
    beam_width: int = 3,
    decoding_manager: bool = True,
    tokens_path: Optional[str] = None,  # kept for CLI parity (vocab is in ckpt)
    mesh=None,
    early_stop: bool = False,
    kernel: str = "auto",
    preprocess: str = "device",
    kv_quant: str = "none",
    beam_gather: str = "auto",
) -> List[Tuple[str, str]]:
    """``kernel`` selects the greedy decode implementation: "auto" picks
    "pallas_v2" on TPU (measured fastest: the flash-decode fused-layer
    kernel) and "jnp" elsewhere (fused weights, plain XLA); "fused" is the
    experimental whole-step single-launch kernel. The Pallas paths match
    the jnp path up to bf16 near-tie argmax flips (all computations are
    at-or-above the jnp path's precision — see ops/pallas/ docstrings).

    ``preprocess``: "device" (default) ships resized uint8 batches and
    fuses the ImageNet standardization into the compiled program
    (ops/pallas/preprocess.standardize — 4x less H2D bandwidth than the
    reference's host-normalized float feed,
    inference_modules/inference_single.py:52-74); "device_resize" also
    moves the bilinear resize on-device (host ships raw u8 images on an
    edge-replicated fixed canvas + per-image extents; cv2-convention
    resize + standardize compile into the decode program — frees the
    host CPU of all pixel math, at the cost of canvas-sized transfers;
    see ops/pallas/preprocess.resize_standardize); "host" is the legacy
    cv2-normalized float32 path (bit-exact albumentations parity).

    ``kv_quant``: OPT-IN decode KV quantization on the fast greedy path
    ("int8" = int8 cross-K/V, "int8_cache" = + int8 self-cache; see
    decoding/fast_step.make_fast_greedy_fn). A numerics change (bounded
    by int8 rounding) — never a default; rejected on paths that would
    silently ignore it.

    ``beam_gather``: the per-step parent-beam cache reorder for
    decode_type="beam" — "auto" (Pallas tile-skipping in-place kernel
    on TPU when shapes fit, ops/pallas/beam_gather.py), "pallas", or
    "jnp" (bounded fori_loop-of-take). Token-identical either way."""
    model, variables, options, vocab, _ = load_model_from_checkpoint(
        checkpoint_path
    )
    if preprocess not in ("device", "device_resize", "host"):
        raise ValueError(f"preprocess {preprocess!r}")
    device_preprocess = preprocess != "host"
    # early-exit decode runs each batch's while_loop to the BATCH max
    # length: grouping similar-length images (wide aspect ~ long formula)
    # turns per-batch maxima into the actual length distribution
    loader, _ = build_eval_loader(
        file_path, options, vocab, batch_size, max_sequence,
        host_normalize=not device_preprocess,
        sort_by_size=early_stop and decode_type == "greedy",
        device_resize=preprocess == "device_resize",
    )

    tables = RuleTables.build(vocab) if decoding_manager else None
    num_steps = max_sequence + 1  # reference: len(dummy encoded) - 1

    dual_sig = False
    if kv_quant != "none" and not (
        decode_type == "greedy"
        and getattr(model, "supports_fast_decode", False)
        and kernel != "fused"
    ):
        raise ValueError(
            "--kv_quant is only supported on the fast greedy decode "
            "path (transformer families, greedy, non-fused kernel)"
        )
    if decode_type == "greedy":
        if getattr(model, "supports_fast_decode", False):
            from p4fr_tpu.decoding.fast_step import resolve_kernel

            if kernel != "fused":
                kernel = resolve_kernel(kernel)
            if kernel == "fused":
                from p4fr_tpu.decoding.fused_greedy import (
                    make_fused_greedy_fn,
                )

                fused = make_fused_greedy_fn(
                    model, variables, max_steps=num_steps, tables=tables,
                    early_stop_eos=vocab.eos_id if early_stop else None,
                )
            else:
                from p4fr_tpu.decoding.fast_step import make_fast_greedy_fn
                from p4fr_tpu.utils.xla_opts import (
                    decode_compiler_options,
                    scoped_vmem_kib,
                )

                fused = make_fast_greedy_fn(
                    model, variables, max_steps=num_steps, tables=tables,
                    early_stop_eos=vocab.eos_id if early_stop else None,
                    use_pallas_v2=(kernel == "pallas_v2"),
                    kv_quant=kv_quant,
                    # coupled to the compiler_options the jit below
                    # ships (raised scoped-VMEM limit unlocks the
                    # auto-pipelined-src flagship kernel config)
                    vmem_limit_kib=scoped_vmem_kib(
                        decode_compiler_options()) or 0,
                )
            decode_fn = fused  # dual signature
            dual_sig = True
        elif (
            kernel != "generic"
            and getattr(model, "supports_fast_lstm_decode", False)
        ):
            from p4fr_tpu.decoding.fast_aster import (
                make_fast_aster_greedy_fn,
            )

            fused = make_fast_aster_greedy_fn(
                model, variables, max_steps=num_steps, tables=tables,
                early_stop_eos=vocab.eos_id if early_stop else None,
            )
            decode_fn = fused  # dual signature
            dual_sig = True
        else:
            decode_fn = make_greedy_fn(
                model, max_steps=num_steps, tables=tables,
                return_outputs=False,
                early_stop_eos=vocab.eos_id if early_stop else None,
            )
    elif decode_type == "beam":
        from p4fr_tpu.decoding.beam import make_beam_fn
        from p4fr_tpu.utils.xla_opts import (
            decode_compiler_options,
            scoped_vmem_kib,
        )

        decode_fn = make_beam_fn(
            model, max_steps=num_steps, beam_width=beam_width,
            eos_id=vocab.eos_id,
            kernel="generic" if kernel == "fused" else kernel,
            early_stop=early_stop,
            vmem_limit_kib=scoped_vmem_kib(decode_compiler_options()) or 0,
            gather_kernel=beam_gather,
        )
    else:
        raise ValueError(f"decode_type {decode_type}")

    # weights baked as constants for small models (fastest dispatch),
    # passed as jit arguments for large ones (closure constants inline
    # into the HLO — Swin-B/384 overflows the compile service otherwise)
    from p4fr_tpu.decoding.fast_step import CLOSURE_PARAM_LIMIT

    n_params = sum(
        int(x.size) for x in jax.tree_util.tree_leaves(variables)
    )
    if n_params <= CLOSURE_PARAM_LIMIT and dual_sig:
        inner = decode_fn
        decode_fn = lambda v, im: inner(im)  # noqa: E731

    if preprocess == "device_resize":
        from p4fr_tpu.ops.pallas.preprocess import resize_standardize

        inner_pre = decode_fn
        in_dtype = model.dtype
        th = options.input_size.height
        tw = options.input_size.width

        def decode_fn(v, images):  # noqa: F811
            canvas_u8, orig_hw = images
            return inner_pre(
                v,
                resize_standardize(
                    canvas_u8, orig_hw, th, tw, out_dtype=in_dtype
                ),
            )
    elif device_preprocess:
        from p4fr_tpu.ops.pallas.preprocess import standardize

        inner_pre = decode_fn
        in_dtype = model.dtype

        def decode_fn(v, images_u8):  # noqa: F811
            return inner_pre(v, standardize(images_u8, out_dtype=in_dtype))

    # the raised scoped-VMEM limit rides the TOP-LEVEL jit (inner jits
    # are inlined); off-TPU this is None and jit takes its default path
    from p4fr_tpu.utils.xla_opts import decode_compiler_options

    if mesh is not None:
        from p4fr_tpu.parallel.sharding import make_sharded_infer_fn

        fn = make_sharded_infer_fn(
            decode_fn, mesh, compiler_options=decode_compiler_options()
        )
    else:
        fn = jax.jit(decode_fn, compiler_options=decode_compiler_options())

    results: List[Tuple[str, str]] = []
    start = time.perf_counter()
    n_images = 0

    def flush(pending):
        tokens, count, paths = pending
        tokens = np.asarray(tokens)  # device->host sync happens here
        strs = id_to_string(
            tokens[:count],
            vocab.id_to_token,
            sos_id=vocab.sos_id,
            eos_id=vocab.eos_id,
            pad_id=vocab.pad_id,
            do_eval=True,
        )
        results.extend(zip(paths, strs))

    # double-buffered: enqueue batch k+1's decode (async dispatch)
    # before fetching batch k's tokens, so host image loading and the
    # device->host sync overlap with device compute
    pending = None
    for batch in loader:
        images = jnp.asarray(batch["image"])
        if preprocess == "device_resize":
            # (canvas, extents) pytree: shard_map's prefix in_spec
            # applies P("data") to both leaves under --data_parallel
            images = (images, jnp.asarray(batch["orig_hw"]))
        tokens = fn(variables, images)
        if pending is not None:
            flush(pending)
        count = batch["count"]
        pending = (tokens, count, batch["file_path"][:count])
        n_images += count
    if pending is not None:
        flush(pending)
    elapsed = time.perf_counter() - start

    if early_stop and decode_type == "greedy":
        # size-sorted batching permuted the rows; restore input.txt order
        with open(file_path, "r") as fd:
            order = {
                r[0]: i
                for i, r in enumerate(csv.reader(fd, delimiter="\t"))
                if r
            }
        results.sort(key=lambda pr: order.get(pr[0], len(order)))

    os.makedirs(output_dir, exist_ok=True)
    out_path = os.path.join(output_dir, "output.csv")
    with open(out_path, "w") as w:
        for path, predicted in results:
            w.write(path + "\t" + predicted + "\n")
    print(
        f"[+] wrote {len(results)} predictions -> {out_path} "
        f"({n_images / max(elapsed, 1e-9):.1f} img/s incl. host IO)"
    )
    return results


def default_mesh(batch_size: int):
    """All-device data-parallel mesh for the CLIs (BASELINE north star:
    DP inference over a v5e-8). Validates batch divisibility up front."""
    from p4fr_tpu.parallel.mesh import make_mesh

    n = len(jax.devices())
    if batch_size % n != 0:
        raise ValueError(
            f"--data_parallel: batch_size {batch_size} must be divisible "
            f"by the {n} visible devices"
        )
    return make_mesh(n_data=n, n_model=1)


def main(parser):
    """CLI-args entry, reference inference_single.main parity."""
    ckpts = parser.checkpoint
    if isinstance(ckpts, (list, tuple)):
        ckpts = ckpts[0]
    mesh = (
        default_mesh(parser.batch_size)
        if getattr(parser, "data_parallel", False)
        else None
    )
    return run_inference(
        ckpts,
        parser.file_path,
        parser.output_dir,
        batch_size=parser.batch_size,
        max_sequence=parser.max_sequence,
        decode_type=parser.decode_type,
        beam_width=parser.beam_width,
        decoding_manager=parser.decoding_manager,
        tokens_path=parser.tokens_path,
        early_stop=getattr(parser, "early_stop", False),
        kernel=getattr(parser, "kernel", "auto"),
        preprocess=getattr(parser, "preprocess", "device"),
        kv_quant=getattr(parser, "kv_quant", "none"),
        beam_gather=getattr(parser, "beam_gather", "auto"),
        mesh=mesh,
    )
