"""Opt-in learning-convergence test (RUN_SLOW=1): the full train loop must
generalize on a learnable synthetic dataset (distinct glyph patterns per
formula, class-independent folds). Guards against silent optimizer/decode
regressions that shape tests cannot catch."""

import os

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"), reason="set RUN_SLOW=1 (several minutes)"
)


def test_litesatrn_learns_synthetic_formulas(tmp_path, tokens_path):
    import numpy as np
    from PIL import Image, ImageDraw

    from helpers import tiny_train_options
    from p4fr_tpu.train import single_opt

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    formulas = ["1 + 2", "\\frac { 1 } { 2 }", "a ^ { 2 }", "\\sqrt { x }"]
    gt, info = [], ["image_name,fold"]
    for i in range(32):
        f = i % len(formulas)
        img = Image.new("RGB", (96, 48), "white")
        d = ImageDraw.Draw(img)
        for k in range(f + 1):
            d.rectangle([8 + k * 20, 10, 20 + k * 20, 38], fill="black")
        name = f"img_{i:03d}.png"
        img.save(img_dir / name)
        gt.append(f"{name}\t{formulas[f]}")
        info.append(f"{name},{(i // len(formulas)) % 4}")
    (tmp_path / "gt.txt").write_text("\n".join(gt) + "\n")
    (tmp_path / "data_info.txt").write_text("\n".join(info) + "\n")

    options = tiny_train_options(
        str(tmp_path / "gt.txt"), tokens_path, epochs=40, batch_size=8
    )
    options.optimizer.lr = 2e-3
    options.teacher_forcing_ratio.tf_max = 1.0
    options.teacher_forcing_ratio.tf_min = 0.9
    result = single_opt.main(options, max_label_len=12)
    accs = result["histories"]["validation_sentence_accuracy"]
    # measured trajectory reaches 0.5 by epoch ~30; require real learning
    assert max(accs) >= 0.4, accs
