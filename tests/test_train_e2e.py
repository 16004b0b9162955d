"""End-to-end single-optimizer training on a tiny synthetic dataset."""

import os

import numpy as np
import pytest

from helpers import make_synth_dataset, tiny_train_options


def test_single_opt_end_to_end(tmp_path, tokens_path):
    from p4fr_tpu.train import single_opt
    from p4fr_tpu.utils.checkpoint import load_checkpoint

    gt = make_synth_dataset(str(tmp_path), n=8, folds=2)
    options = tiny_train_options(gt, tokens_path, epochs=2, batch_size=2)
    result = single_opt.main(options, max_label_len=16)

    assert np.isfinite(result["best_metric"])
    assert len(result["histories"]["train_losses"]) == 2
    # checkpoint written, self-describing, loadable
    ckpt_path = os.path.join(
        options.prefix, "checkpoints", "LiteSATRN_best_model.ckpt"
    )
    assert os.path.exists(ckpt_path)
    ckpt = load_checkpoint(ckpt_path)
    assert ckpt["network"] == "LiteSATRN"
    assert ckpt["configs"]["SATRN"]["decoder"]["layer_num"] == 2
    assert len(ckpt["token_to_id"]) == 245
    assert ckpt["params"]  # non-empty param tree
    # logs written
    log_dir = os.path.join(options.prefix, "logs")
    assert os.path.exists(os.path.join(log_dir, "log.txt"))
    assert os.path.exists(os.path.join(log_dir, "metrics.jsonl"))


def test_single_opt_cycle_scheduler_end_to_end(tmp_path, tokens_path):
    """The reference "Cycle" branch: CircularLRBeta LR + the [0.95, 0.85]
    beta1 counter-cycle injected into Adam via inject_hyperparams
    (train_modules/train_single_opt.py:381-387). Covers train, the
    InjectHyperparamsState checkpoint round trip, and resume."""
    from p4fr_tpu.train import single_opt

    gt = make_synth_dataset(str(tmp_path), n=8, folds=2)
    options = tiny_train_options(gt, tokens_path, epochs=1, batch_size=2)
    options.scheduler.scheduler = "Cycle"
    options.optimizer.optimizer = "Adam"
    result = single_opt.main(options, max_label_len=16)
    assert np.isfinite(result["best_metric"])
    ckpt_path = os.path.join(
        options.prefix, "checkpoints", "LiteSATRN_best_model.ckpt"
    )
    options2 = tiny_train_options(gt, tokens_path, epochs=2, batch_size=2)
    options2.scheduler.scheduler = "Cycle"
    options2.optimizer.optimizer = "Adam"
    options2.checkpoint = ckpt_path
    options2.prefix = str(tmp_path / "resume")
    result = single_opt.main(options2, max_label_len=16)
    assert len(result["histories"]["train_losses"]) >= 2


def test_resume_from_checkpoint(tmp_path, tokens_path):
    from p4fr_tpu.train import single_opt

    gt = make_synth_dataset(str(tmp_path), n=8, folds=2)
    options = tiny_train_options(gt, tokens_path, epochs=1, batch_size=2)
    single_opt.main(options, max_label_len=16)
    ckpt_path = os.path.join(
        options.prefix, "checkpoints", "LiteSATRN_best_model.ckpt"
    )
    options2 = tiny_train_options(gt, tokens_path, epochs=2, batch_size=2)
    options2.checkpoint = ckpt_path
    result = single_opt.main(options2, max_label_len=16)
    # resumed at epoch 1, ran one more epoch
    assert len(result["histories"]["train_losses"]) >= 2
