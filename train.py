#!/usr/bin/env python
"""Train CLI — dispatches to the selected training regime.

API-parity with the reference ``train.py`` (reference: train.py:7-71):

    python train.py --train_type {single_opt,dual_opt,distillation} \
        --config_file p4fr_tpu/configs/LiteSATRN.yaml \
        [--teacher_ckpt ckpt]  [--project_name p --exp_name e]
"""

import argparse
import importlib
import sys


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="p4fr_tpu trainer")
    parser.add_argument(
        "--train_type",
        required=True,
        choices=["single_opt", "dual_opt", "distillation"],
        help="training regime",
    )
    parser.add_argument(
        "--config_file",
        default="p4fr_tpu/configs/LiteSATRN.yaml",
        help="YAML model/config file",
    )
    parser.add_argument(
        "--teacher_ckpt",
        default=None,
        help="teacher checkpoint (required for --train_type distillation)",
    )
    parser.add_argument("--project_name", default=None, help="W&B project")
    parser.add_argument("--exp_name", default=None, help="W&B experiment name")
    parser.add_argument(
        "--max_label_len", type=int, default=232,
        help="fixed label padding length (static XLA shapes)",
    )
    return parser


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.train_type == "distillation" and not args.teacher_ckpt:
        parser.error("--train_type distillation requires --teacher_ckpt")
    if args.train_type != "distillation" and args.teacher_ckpt:
        parser.error("--teacher_ckpt is only valid with --train_type distillation")

    module = importlib.import_module(f"p4fr_tpu.train.{args.train_type}")
    kwargs = {"max_label_len": args.max_label_len}
    if args.train_type == "distillation":
        kwargs["teacher_ckpt"] = args.teacher_ckpt
    if args.project_name or args.exp_name:
        kwargs["wandb_kwargs"] = {
            "project": args.project_name,
            "name": args.exp_name,
        }
    return module.main(args.config_file, **kwargs)


if __name__ == "__main__":
    sys.exit(0 if main() is not None else 1)
