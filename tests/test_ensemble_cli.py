"""Ensemble inference CLI round trip with two trained checkpoints."""

import os
import shutil

import numpy as np

from helpers import make_synth_dataset, tiny_train_options


def test_ensemble_cli_two_models(tmp_path, tokens_path):
    import inference as infer_cli
    from p4fr_tpu.train import single_opt

    gt = make_synth_dataset(str(tmp_path), n=4, folds=2)

    ckpts = []
    for i, seed in enumerate((21, 22)):
        options = tiny_train_options(gt, tokens_path, epochs=1, batch_size=2)
        options.prefix = str(tmp_path / f"m{i}")
        options.seed = seed
        single_opt.main(options, max_label_len=10)
        src = os.path.join(
            options.prefix, "checkpoints", "LiteSATRN_best_model.ckpt"
        )
        dst = str(tmp_path / f"model{i}.ckpt")
        shutil.copy(src, dst)
        ckpts.append(dst)

    inp = tmp_path / "input.txt"
    names = sorted(os.listdir(tmp_path / "images"))
    inp.write_text("".join(n + "\t\n" for n in names))

    out_dir = tmp_path / "out"
    results = infer_cli.main(
        [
            "--inference_type", "ensemble",
            "--checkpoint", *ckpts,
            "--file_path", str(inp),
            "--output_dir", str(out_dir),
            "--max_sequence", "6",
            "--batch_size", "4",
            # beam is forced back to greedy for ensembles (reference rule)
            "--decode_type", "beam",
        ]
    )
    assert len(results) == len(names)
    lines = (out_dir / "output.csv").read_text().splitlines()
    assert len(lines) == len(names)

    # DP ensemble over the virtual 8-device mesh: same predictions
    dp_results = infer_cli.main(
        [
            "--inference_type", "ensemble",
            "--checkpoint", *ckpts,
            "--file_path", str(inp),
            "--output_dir", str(tmp_path / "out_dp"),
            "--max_sequence", "6",
            "--batch_size", "8",
            "--data_parallel", "true",
        ]
    )
    assert dict(dp_results) == dict(results)

    # shared raw-canvas feed: ONE u8 canvas batch, each member resizes
    # to its own resolution on device — same predictions again
    dr_results = infer_cli.main(
        [
            "--inference_type", "ensemble",
            "--checkpoint", *ckpts,
            "--file_path", str(inp),
            "--output_dir", str(tmp_path / "out_dr"),
            "--max_sequence", "6",
            "--batch_size", "4",
            "--preprocess", "device_resize",
        ]
    )
    assert dict(dr_results) == dict(results)


def test_aster_beam_decode():
    """Beam search must work for the LSTM family too (reference parity:
    EfficientASTER.py:368-519 ships beam_search)."""
    import jax
    import jax.numpy as jnp

    from p4fr_tpu.decoding.beam import make_beam_fn
    from test_aster_swin import tiny_aster

    model = tiny_aster()
    images = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 64, 256, 3)).astype(np.float32)
    )
    text = jnp.zeros((2, 6), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    fn = jax.jit(make_beam_fn(model, max_steps=5, beam_width=2, eos_id=1))
    tokens = np.asarray(fn(variables, images))
    assert tokens.shape == (2, 5)
    assert (tokens >= 0).all() and (tokens < 245).all()
