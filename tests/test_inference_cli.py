"""Train -> checkpoint -> inference CLI round trip (tiny, CPU)."""

import os

import pytest

from helpers import make_synth_dataset, tiny_train_options


def test_train_then_infer_cli(tmp_path, tokens_path):
    import inference as infer_cli
    from p4fr_tpu.train import single_opt

    gt = make_synth_dataset(str(tmp_path), n=4, folds=2)
    options = tiny_train_options(gt, tokens_path, epochs=1, batch_size=2)
    single_opt.main(options, max_label_len=10)
    ckpt = os.path.join(
        options.prefix, "checkpoints", "LiteSATRN_best_model.ckpt"
    )
    assert os.path.exists(ckpt)

    inp = tmp_path / "input.txt"
    names = sorted(os.listdir(tmp_path / "images"))
    inp.write_text("".join(n + "\t\n" for n in names))

    out_dir = tmp_path / "out"
    results = infer_cli.main(
        [
            "--inference_type", "single",
            "--checkpoint", ckpt,
            "--file_path", str(inp),
            "--output_dir", str(out_dir),
            "--max_sequence", "6",
            "--batch_size", "4",
        ]
    )
    assert len(results) == len(names)
    lines = (out_dir / "output.csv").read_text().splitlines()
    assert len(lines) == len(names)
    assert all("\t" in line for line in lines)

    # --data_parallel: same predictions through the 8-device CPU mesh
    # (CPU f32 is exact, so outputs must match bit-for-bit)
    dp_dir = tmp_path / "out_dp"
    dp_results = infer_cli.main(
        [
            "--inference_type", "single",
            "--checkpoint", ckpt,
            "--file_path", str(inp),
            "--output_dir", str(dp_dir),
            "--max_sequence", "6",
            "--batch_size", "8",
            "--data_parallel", "true",
        ]
    )
    assert dict(dp_results) == dict(results)

    # --preprocess host (legacy cv2-normalized f32 feed) must agree with
    # the default device path: on CPU both standardize in f32 with the
    # same op order, so predictions match exactly
    host_dir = tmp_path / "out_host"
    host_results = infer_cli.main(
        [
            "--inference_type", "single",
            "--checkpoint", ckpt,
            "--file_path", str(inp),
            "--output_dir", str(host_dir),
            "--max_sequence", "6",
            "--batch_size", "4",
            "--preprocess", "host",
        ]
    )
    assert dict(host_results) == dict(results)


def test_early_stop_sorted_batching_preserves_outputs(tmp_path, tokens_path):
    """--early_stop sorts eval batches by image aspect (size_proxy); the
    predictions and the output.csv row ORDER must match the unsorted
    run (rows are restored to input.txt order)."""
    import inference as infer_cli
    from p4fr_tpu.train import single_opt

    gt = make_synth_dataset(str(tmp_path), n=6, folds=2, height=40,
                            width=80)
    # vary image sizes so the sort actually permutes
    import numpy as np
    from PIL import Image

    img_dir = tmp_path / "images"
    rng = np.random.default_rng(3)
    for i, name in enumerate(sorted(os.listdir(img_dir))):
        h = int(rng.integers(30, 60))
        w = int(rng.integers(40, 160))
        arr = (rng.random((h, w, 3)) * 255).astype("uint8")
        Image.fromarray(arr).save(img_dir / name)

    options = tiny_train_options(gt, tokens_path, epochs=1, batch_size=2)
    single_opt.main(options, max_label_len=10)
    ckpt = os.path.join(
        options.prefix, "checkpoints", "LiteSATRN_best_model.ckpt"
    )
    inp = tmp_path / "input.txt"
    names = sorted(os.listdir(img_dir))
    inp.write_text("".join(n + "\t\n" for n in names))

    base_args = [
        "--inference_type", "single", "--checkpoint", ckpt,
        "--file_path", str(inp), "--max_sequence", "6",
        "--batch_size", "2",
    ]
    plain = infer_cli.main(
        base_args + ["--output_dir", str(tmp_path / "o1")]
    )
    sorted_run = infer_cli.main(
        base_args + ["--output_dir", str(tmp_path / "o2"),
                     "--early_stop", "true"]
    )
    assert dict(sorted_run) == dict(plain)
    # file row order restored to input order
    rows = (tmp_path / "o2" / "output.csv").read_text().splitlines()
    assert [r.split("\t")[0] for r in rows] == names

    # device-side resize feed: raw-canvas batches + on-device cv2-style
    # bilinear resize reproduce the host-preprocessed predictions
    resize_run = infer_cli.main(
        base_args + ["--output_dir", str(tmp_path / "o3"),
                     "--preprocess", "device_resize"]
    )
    assert dict(resize_run) == dict(plain)


def test_kv_quant_cli_runs_and_guards(tmp_path, tokens_path):
    """--kv_quant int8 runs end-to-end through the CLI (CPU reproduces
    the quantization numerics via dequantized cross-KV) and is rejected
    on decode paths that would silently ignore it (beam, ensemble)."""
    import inference as infer_cli
    from p4fr_tpu.train import single_opt

    gt = make_synth_dataset(str(tmp_path), n=4, folds=2)
    options = tiny_train_options(gt, tokens_path, epochs=1, batch_size=2)
    single_opt.main(options, max_label_len=10)
    ckpt = os.path.join(
        options.prefix, "checkpoints", "LiteSATRN_best_model.ckpt"
    )
    inp = tmp_path / "input.txt"
    names = sorted(os.listdir(tmp_path / "images"))
    inp.write_text("".join(n + "\t\n" for n in names))

    base_args = [
        "--inference_type", "single", "--checkpoint", ckpt,
        "--file_path", str(inp), "--max_sequence", "6",
        "--batch_size", "4",
    ]
    results = infer_cli.main(
        base_args + ["--output_dir", str(tmp_path / "oq"),
                     "--kv_quant", "int8"]
    )
    assert len(results) == len(names)
    assert all(isinstance(p, str) for _, p in results)

    # beam decode does not consume kv_quant -> hard error, not silence
    with pytest.raises(ValueError, match="kv_quant"):
        infer_cli.main(
            base_args + ["--output_dir", str(tmp_path / "ob"),
                         "--kv_quant", "int8", "--decode_type", "beam"]
        )
    # ensemble path: rejected at the argparse layer
    with pytest.raises(SystemExit):
        infer_cli.main(
            ["--inference_type", "ensemble", "--checkpoint", ckpt, ckpt,
             "--file_path", str(inp),
             "--output_dir", str(tmp_path / "oe"),
             "--kv_quant", "int8"]
        )


def test_beam_cli_and_gather_guard(tmp_path, tokens_path):
    """--decode_type beam runs end-to-end through the CLI with an
    explicit --beam_gather selection, and the knob hard-errors on
    decode paths that would silently ignore it (greedy)."""
    import inference as infer_cli
    from p4fr_tpu.train import single_opt

    gt = make_synth_dataset(str(tmp_path), n=4, folds=2)
    options = tiny_train_options(gt, tokens_path, epochs=1, batch_size=2)
    single_opt.main(options, max_label_len=10)
    ckpt = os.path.join(
        options.prefix, "checkpoints", "LiteSATRN_best_model.ckpt"
    )
    inp = tmp_path / "input.txt"
    names = sorted(os.listdir(tmp_path / "images"))
    inp.write_text("".join(n + "\t\n" for n in names))

    base_args = [
        "--inference_type", "single", "--checkpoint", ckpt,
        "--file_path", str(inp), "--max_sequence", "6",
        "--batch_size", "4", "--decode_type", "beam",
    ]
    auto = infer_cli.main(
        base_args + ["--output_dir", str(tmp_path / "ba")]
    )
    forced = infer_cli.main(
        base_args + ["--output_dir", str(tmp_path / "bj"),
                     "--beam_gather", "jnp"]
    )
    assert len(auto) == len(names)
    assert dict(forced) == dict(auto)

    # greedy decode does not consume beam_gather -> argparse-layer error
    with pytest.raises(SystemExit):
        infer_cli.main(
            ["--inference_type", "single", "--checkpoint", ckpt,
             "--file_path", str(inp),
             "--output_dir", str(tmp_path / "bg"),
             "--beam_gather", "jnp"]
        )


def test_data_parallel_rejects_indivisible_batch(tmp_path, tokens_path):
    from p4fr_tpu.infer.single import default_mesh

    with pytest.raises(ValueError, match="divisible"):
        default_mesh(3)
