#!/usr/bin/env python
"""Inference CLI — single-model or multi-model ensemble.

API parity with the reference ``inference.py`` (reference: inference.py:5-97):

    python inference.py --inference_type single --checkpoint ckpt \
        --file_path input.txt --output_dir ./outputs \
        [--decode_type {greedy,beam}] [--beam_width 3] [--batch_size 32] \
        [--max_sequence 230] [--decoding_manager] [--max_cache 50]
"""

import argparse
import importlib
import sys


def str2bool(v):
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("yes", "true", "t", "1")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="p4fr_tpu inference")
    parser.add_argument(
        "--inference_type", default="single", choices=["single", "ensemble"]
    )
    parser.add_argument(
        "--checkpoint", nargs="*", default=[], help="checkpoint path(s)"
    )
    parser.add_argument("--max_sequence", type=int, default=230)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument(
        "--decode_type", default="greedy", choices=["greedy", "beam"]
    )
    parser.add_argument("--beam_width", type=int, default=3)
    parser.add_argument(
        "--decoding_manager", type=str2bool, default=True,
        help="grammar-constrained decoding",
    )
    parser.add_argument(
        "--tokens_path", default="p4fr_tpu/configs/tokens.txt",
        help="token file (manager rules); vocab itself comes from the ckpt",
    )
    parser.add_argument(
        "--max_cache", type=int, default=50,
        help="compat shim: the reference staged encoder outputs to disk in "
        "chunks of this many batches; on TPU everything stays in HBM",
    )
    parser.add_argument(
        "--kernel", default="auto",
        choices=["auto", "jnp", "pallas_v2", "fused", "generic"],
        help="greedy decode implementation (single + ensemble): auto "
        "picks the flash-decode Pallas kernel on TPU and the jnp fast "
        "path elsewhere; fused = the experimental one-launch-per-step "
        "kernel (single inference only); generic = modular flax step "
        "(ensemble only)",
    )
    parser.add_argument(
        "--kv_quant", default="none",
        choices=["none", "int8", "int8_cache"],
        help="OPT-IN decode KV quantization (single inference, fast "
        "greedy path only): int8 = int8 cross-K/V (halves the dominant "
        "decode HBM stream), int8_cache = + int8 self-attention cache. "
        "Numerics change bounded by int8 rounding — never a default",
    )
    parser.add_argument(
        "--beam_gather", default="auto",
        choices=["auto", "pallas", "jnp"],
        help="beam-search parent cache reorder (decode_type=beam only): "
        "auto picks the in-place tile-skipping Pallas kernel on TPU "
        "when shapes fit (ops/pallas/beam_gather.py), jnp is the "
        "bounded fori_loop-of-take path. Token-identical either way",
    )
    parser.add_argument(
        "--early_stop", type=str2bool, default=False,
        help="exit the decode loop once every sequence emits <EOS> "
        "(output-equivalent; the reference always runs all steps)",
    )
    parser.add_argument(
        "--data_parallel", type=str2bool, default=False,
        help="shard each batch over every visible device "
        "(jax.sharding data-parallel mesh); batch_size must divide evenly",
    )
    parser.add_argument(
        "--preprocess", default="device",
        choices=["device", "device_resize", "host"],
        help="device = ship resized uint8 and standardize on-device "
        "(Pallas fused normalize, 4x less H2D bandwidth; default); "
        "device_resize = ship RAW uint8 on an edge-replicated canvas "
        "and run the cv2-convention bilinear resize + standardize "
        "on-device too (frees the host of all pixel math; for "
        "ensembles ONE canvas batch serves every member's resolution); "
        "host = legacy cv2-normalized float32 feed (bit-exact "
        "albumentations parity)",
    )
    parser.add_argument("--file_path", required=True, help="input.txt TSV")
    parser.add_argument("--output_dir", default="./outputs")
    return parser


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)

    if not args.checkpoint:
        parser.error("--checkpoint is required")
    if args.inference_type == "single" and len(args.checkpoint) > 1:
        parser.error("single inference takes exactly one --checkpoint")
    if args.inference_type == "ensemble" and args.decode_type != "greedy":
        # reference forces greedy for ensembles (inference.py:81-84)
        print("[!] ensemble inference supports greedy only; forcing greedy")
        args.decode_type = "greedy"
    if args.inference_type == "ensemble" and args.kv_quant != "none":
        parser.error("--kv_quant is single-inference only")
    if args.beam_gather != "auto" and args.decode_type != "beam":
        # mirror the --kv_quant honesty rule: never silently ignore a
        # performance knob the selected path cannot honor
        parser.error("--beam_gather applies to --decode_type beam only")

    module = importlib.import_module(
        f"p4fr_tpu.infer.{args.inference_type}"
    )
    return module.main(args)


if __name__ == "__main__":
    out = main()
    sys.exit(0 if out is not None else 1)
