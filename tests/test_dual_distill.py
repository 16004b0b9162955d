"""Dual-optimizer and distillation regimes end-to-end (tiny, CPU)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import make_synth_dataset, tiny_train_options


def test_kd_loss_matches_torch_semantics():
    """Oracle: compute the reference formula with torch (CPU)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from p4fr_tpu.train.distillation import kd_loss

    rng = np.random.default_rng(0)
    B, L, V = 3, 5, 11
    s = rng.normal(size=(B, L, V)).astype(np.float32)
    t = rng.normal(size=(B, L, V)).astype(np.float32)
    labels = rng.integers(0, V, size=(B, L))

    got = float(kd_loss(jnp.asarray(s), jnp.asarray(labels), jnp.asarray(t)))

    st = torch.tensor(s).permute(0, 2, 1)  # [B, V, L] like the reference
    tt = torch.tensor(t).permute(0, 2, 1)
    lab = torch.tensor(labels)
    T, alpha = 10.0, 0.1
    want = float(
        torch.nn.KLDivLoss(reduction="batchmean")(
            F.log_softmax(st / T, dim=1), F.softmax(tt / T, dim=1)
        )
        * (alpha * T * T)
        + F.cross_entropy(st, lab) * (1.0 - alpha)
    )
    assert abs(got - want) < 1e-4, (got, want)


def test_dual_opt_end_to_end(tmp_path, tokens_path):
    import json

    from p4fr_tpu.train import dual_opt

    gt = make_synth_dataset(str(tmp_path), n=6, folds=2)
    options = tiny_train_options(gt, tokens_path, epochs=1, batch_size=2)
    result = dual_opt.main(options, max_label_len=12)
    assert np.isfinite(result["best_metric"])
    assert os.path.exists(
        os.path.join(options.prefix, "checkpoints", "LiteSATRN_best_model.ckpt")
    )
    # per-step records carry both real LRs (not 0.0), epoch records too
    records = [
        json.loads(line)
        for line in open(os.path.join(options.prefix, "logs", "metrics.jsonl"))
    ]
    steps = [r for r in records if r.get("record") == "step"]
    epochs = [r for r in records if "epoch" in r]
    assert steps and epochs
    assert all("learning_rate" in r and "dec_learning_rate" in r for r in steps)
    assert any(r["learning_rate"] > 0.0 for r in steps)
    assert epochs[-1]["learning_rate"] > 0.0
    assert epochs[-1]["dec_learning_rate"] > 0.0


def test_distillation_end_to_end(tmp_path, tokens_path):
    from p4fr_tpu.train import distillation, single_opt

    gt = make_synth_dataset(str(tmp_path), n=6, folds=2)
    teacher_options = tiny_train_options(gt, tokens_path, epochs=1, batch_size=2)
    single_opt.main(teacher_options, max_label_len=12)
    teacher_ckpt = os.path.join(
        teacher_options.prefix, "checkpoints", "LiteSATRN_best_model.ckpt"
    )

    student_options = tiny_train_options(gt, tokens_path, epochs=1, batch_size=2)
    student_options.prefix = str(tmp_path / "student")
    result = distillation.main(
        student_options, teacher_ckpt=teacher_ckpt, max_label_len=12
    )
    assert np.isfinite(result["best_metric"])
    student_ckpt = os.path.join(
        student_options.prefix, "checkpoints", "LiteSATRN_best_model.ckpt"
    )
    assert os.path.exists(student_ckpt)

    # resume: restart distillation from the student checkpoint for one
    # more epoch (reference trainers all restore from options.checkpoint)
    resume_options = tiny_train_options(gt, tokens_path, epochs=2, batch_size=2)
    resume_options.prefix = str(tmp_path / "student_resume")
    resume_options.checkpoint = student_ckpt
    result2 = distillation.main(
        resume_options, teacher_ckpt=teacher_ckpt, max_label_len=12
    )
    assert np.isfinite(result2["best_metric"])
    # started at epoch 1: exactly one more epoch of step records
    import json

    records = [
        json.loads(line)
        for line in open(
            os.path.join(resume_options.prefix, "logs", "metrics.jsonl")
        )
    ]
    epochs = [r for r in records if "epoch" in r]
    assert [r["epoch"] for r in epochs] == [1]
    steps = [r for r in records if r.get("record") == "step"]
    assert steps and all("tf_ratio" in r for r in steps)
