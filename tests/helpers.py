"""Shared test helpers: tiny model configs + synthetic data."""

import numpy as np

from p4fr_tpu.models.satrn import SATRN


def tiny_satrn(num_classes=245, pad_id=2, sos_id=0, parity=True, dtype=None):
    """A LiteSATRN-shaped model small enough for CPU tests."""
    import jax.numpy as jnp

    return SATRN(
        num_classes=num_classes,
        pad_id=pad_id,
        sos_id=sos_id,
        input_height=32,
        input_width=64,
        enc_hidden_dim=32,
        enc_filter_dim=32,
        enc_layer_num=1,
        enc_head_num=4,
        dec_src_dim=32,
        dec_hidden_dim=32,
        dec_filter_dim=64,
        dec_layer_num=2,
        dec_head_num=4,
        dropout=0.1,
        dtype=dtype or jnp.float32,
        backbone="shallow",
        reference_parity=parity,
    )


def synth_images(batch, h=32, w=64, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(batch, h, w, c)).astype(np.float32)


def make_synth_dataset(root, n=12, folds=2, height=48, width=96, seed=0):
    """Write a tiny on-disk dataset in the reference layout:
    root/gt.txt (tsv), root/data_info.txt (csv), root/images/*.png."""
    import os

    from PIL import Image

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    formulas = [
        "1 + 2",
        "\\frac { 1 } { 2 }",
        "a ^ { 2 } + b ^ { 2 }",
        "\\sqrt { x }",
        "\\sum _ { i } x _ { i }",
        "x = y",
    ]
    gt_lines, info_lines = [], ["image_name,fold"]
    for i in range(n):
        name = f"img_{i:03d}.png"
        arr = (rng.random((height, width, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, name))
        # class advances every `folds` items and fold cycles within each
        # class, so folds and classes stay independent for ANY n (a fold
        # confounded with class would starve train or val of whole classes)
        gt_lines.append(f"{name}\t{formulas[(i // folds) % len(formulas)]}")
        info_lines.append(f"{name},{i % folds}")
    with open(os.path.join(root, "gt.txt"), "w") as f:
        f.write("\n".join(gt_lines) + "\n")
    with open(os.path.join(root, "data_info.txt"), "w") as f:
        f.write("\n".join(info_lines) + "\n")
    return os.path.join(root, "gt.txt")


def tiny_train_options(gt_path, tokens_path, *, network="LiteSATRN", epochs=1,
                       batch_size=2, height=32, width=64):
    """A minimal reference-schema config dict for end-to-end train tests."""
    from p4fr_tpu.utils.flags import Flags

    return Flags(
        {
            "network": network,
            "input_size": {"height": height, "width": width},
            "SATRN": {
                "encoder": {"hidden_dim": 32, "filter_dim": 32,
                            "layer_num": 1, "head_num": 4},
                "decoder": {"src_dim": 32, "hidden_dim": 32, "filter_dim": 64,
                            "layer_num": 2, "head_num": 4},
            },
            "checkpoint": "",
            "prefix": gt_path.rsplit("/", 1)[0] + "/run",
            "data": {
                "train": [gt_path],
                "test": [""],
                "token_paths": [tokens_path],
                "fold": 0,
                "crop": False,
                "rgb": 3,
            },
            "batch_size": batch_size,
            "num_workers": 0,
            "num_epochs": epochs,
            "print_epochs": 1,
            "dropout_rate": 0.1,
            "teacher_forcing_ratio": {"tf_max": 0.8, "tf_min": 0.3},
            "max_grad_norm": 2.0,
            "seed": 21,
            "scheduler": {"scheduler": "CustomCosine", "cycle": 1,
                          "warmup_ratio": 0.1},
            "optimizer": {"optimizer": "AdamW", "lr": 5e-4,
                          "weight_decay": 1e-6, "is_cycle": True,
                          "enc_lr": 5e-4, "dec_lr": 5e-4},
            "tpu": {"compute_dtype": "float32",
                    "mesh": {"data": -1, "model": 1},
                    "reference_parity": True},
        }
    ).get()


def synth_labels(batch, length, vocab_size=245, pad_id=2, sos_id=0, eos_id=1, seed=1):
    """[B, length] int32: <SOS> body <EOS> <PAD>*"""
    rng = np.random.default_rng(seed)
    out = np.full((batch, length), pad_id, np.int32)
    out[:, 0] = sos_id
    for b in range(batch):
        n = int(rng.integers(1, length - 1))
        out[b, 1 : 1 + n] = rng.integers(3, vocab_size, size=n)
        out[b, 1 + n if 1 + n < length else length - 1] = eos_id
    return out
