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


def test_data_parallel_rejects_indivisible_batch(tmp_path, tokens_path):
    from p4fr_tpu.infer.single import default_mesh

    with pytest.raises(ValueError, match="divisible"):
        default_mesh(3)
