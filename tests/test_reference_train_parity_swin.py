"""Trained-model end-to-end parity for the SwinTRN family.

Completes the trained-parity matrix (SATRN r4, ASTER r5, SWIN here):
trains the REAL reference ``SWIN`` (networks/SWIN.py:1024) at tiny dims
through the real ``train_single_opt`` loop on rendered formulas,
converts, and asserts identical greedy predictions + equal
sent-acc/WER through both inference paths.

Tiny-fication keeps every line of the real model: the hardcoded
Swin-B/384 ctor args (SWIN.py:1028-1031) are overridden by wrapping the
module's ``SwinTransformer`` symbol (the real class runs, at
64px/embed32/depths[1,1]/window4), and the torch.hub download at
:1033 is stubbed with an empty state_dict (``strict=False`` — exactly
what a download failure leaves the reference with).

This family test exists because of a bug it would have caught: the
reference builds its encoder with **ape=True** — a LEARNED absolute
position embedding (the hub checkpoint has no such key, so it trains
from its trunc-normal init) — which our converter DROPPED until r5,
silently corrupting any trained SWIN import.
"""

import os
import random
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from p4fr_tpu.data.augment import normalize as cv_norm  # noqa: E402
from p4fr_tpu.data.augment import resize as cv_resize  # noqa: E402
from p4fr_tpu.data.vocab import Vocab  # noqa: E402
from p4fr_tpu.utils.convert_pth import convert_state_dict  # noqa: E402
from p4fr_tpu.utils.flags import Flags  # noqa: E402

from reference_loader import (  # noqa: E402
    cpu_get_device,
    load_reference_trainer,
)
from test_reference_train_parity import (  # noqa: E402
    TOKENS,
    _real_data_modules,
    _render_dataset,
)

IMG = 64  # square input (patch 4 -> 16x16 tokens; window 4 tiles both stages)
DIM = 32
DEC = dict(src_dim=64, hidden_dim=32, filter_dim=64, head_num=4,
           layer_num=1)


def _transform(image):
    x = cv_norm(cv_resize(image, IMG, IMG), rgb=3)
    return {"image": torch.from_numpy(np.transpose(x, (2, 0, 1)))}


def _tiny_real_swin(ref, vocab, seed=9):
    sn = types.SimpleNamespace
    flags = sn(
        dropout_rate=0.1,
        SATRN=sn(decoder=sn(**DEC)),
    )
    dataset_stub = sn(
        id_to_token=dict(vocab.id_to_token),
        token_to_id=dict(vocab.token_to_id),
    )
    swin_mod = ref.swin
    orig_cls = swin_mod.SwinTransformer
    orig_hub = torch.hub.load_state_dict_from_url

    def tiny_ctor(**kw):
        kw.update(
            img_size=IMG, embed_dim=DIM, depths=[1, 1], num_heads=[2, 4],
            window_size=4, drop_path_rate=0.0, num_classes=5, ape=True,
        )
        return orig_cls(**kw)

    swin_mod.SwinTransformer = tiny_ctor
    torch.hub.load_state_dict_from_url = lambda *a, **k: {"model": {}}
    try:
        torch.manual_seed(seed)
        return swin_mod.SWIN(flags, dataset_stub, checkpoint=None)
    finally:
        swin_mod.SwinTransformer = orig_cls
        torch.hub.load_state_dict_from_url = orig_hub


def _ckpt_options(gt_path):
    return Flags({
        "network": "SwinTRN",
        "input_size": {"height": IMG, "width": IMG},
        "SWIN": {"embed_dim": DIM, "depths": [1, 1], "num_heads": [2, 4],
                 "window": 4, "drop_path_rate": 0.0, "ape": True},
        "SATRN": {"decoder": dict(DEC)},
        "checkpoint": "",
        "prefix": gt_path.rsplit("/", 1)[0] + "/run",
        "data": {
            "train": [gt_path], "test": [""], "token_paths": [TOKENS],
            "fold": 0, "crop": False, "rgb": 3,
        },
        "batch_size": 4,
        "num_workers": 0,
        "num_epochs": 1,
        "dropout_rate": 0.1,
    }).get()


def test_trained_swin_end_to_end_parity(tmp_path):
    from torch.utils.data import DataLoader

    ref = load_reference_trainer()
    vocab = Vocab.from_files([TOKENS])
    rds, rloader = _real_data_modules(ref)
    gt_path = _render_dataset(str(tmp_path), n_per=8)
    random.seed(11)
    train_gt, valid_gt = ref.data_utils.split_gt(gt_path, fold=0)
    assert len(train_gt) == len(valid_gt) == 24

    train_ds = rds.LoadDataset(train_gt, [TOKENS], crop=False,
                               transform=_transform)
    g = torch.Generator()
    g.manual_seed(7)
    loader = DataLoader(train_ds, batch_size=4, shuffle=True,
                        collate_fn=rloader.collate_batch, generator=g)

    # --- train the REAL SWIN through the REAL loop ----------------------
    tmodel = _tiny_real_swin(ref, vocab)
    tmodel.train()
    epochs = 400
    total = len(loader) * epochs
    opt_t = torch.optim.Adam(
        [p for p in tmodel.parameters() if p.requires_grad], lr=0
    )
    sched_t = ref.cosine.CustomCosineAnnealingWarmUpRestarts(
        opt_t, T_0=total, T_mult=1, eta_max=2e-3,
        T_up=int(total * 0.1), gamma=0.8,
    )
    tf_t = ref.tf_sched.TeacherForcingScheduler(
        num_steps=total, tf_max=1.0, tf_min=0.8
    )
    with cpu_get_device():
        for _ in range(epochs):
            res = ref.trainer._train_one_epoch(
                loader, tmodel, "E", tmodel.criterion, opt_t, sched_t,
                2.0, torch.device("cpu"), None, tf_t, False,
            )
    assert res["loss"] < 0.5, f"real SWIN failed to fit: {res['loss']}"

    # --- REAL inference path on the held-out fold -----------------------
    max_sequence = 12
    dummy = "\\sin " * max_sequence
    eval_gt = [(p, os.path.basename(p), dummy) for p, _ in valid_gt]
    eval_ds = rds.LoadEvalDataset(eval_gt, vocab.token_to_id,
                                  vocab.id_to_token, crop=False,
                                  transform=_transform)
    eval_loader = DataLoader(eval_ds, batch_size=4, shuffle=False,
                             collate_fn=rloader.collate_eval_batch)
    tmodel.eval()
    real_preds = {}
    with cpu_get_device(), torch.no_grad():
        for d in eval_loader:
            out = ref.decoding.decode(
                tmodel, d["image"].float(),
                expected=d["truth"]["encoded"], method="greedy",
            )
            strs = ref.utils_utils.id_to_string(out, eval_loader, do_eval=1)
            for p, s in zip(d["file_path"], strs):
                real_preds[os.path.basename(p)] = s
    gt_map = {os.path.basename(p): t for p, t in valid_gt}
    names = sorted(gt_map)
    real_sent = ref.metrics.sentence_acc(
        [real_preds[n].strip() for n in names],
        [gt_map[n].strip() for n in names],
    )
    real_wer = ref.metrics.word_error_rate(
        [real_preds[n].strip() for n in names],
        [gt_map[n].strip() for n in names],
    )
    assert real_sent >= 0.5, (
        f"real trained SWIN only reached {real_sent} held-out sent acc"
    )

    # --- OUR inference path on the converted checkpoint -----------------
    from p4fr_tpu.infer.single import run_inference
    from p4fr_tpu.utils import checkpoint as ckpt_io
    from p4fr_tpu.utils.metrics import sentence_acc, word_error_rate

    params, stats, unmatched = convert_state_dict(
        "SWIN", tmodel.state_dict()
    )
    assert unmatched == []
    options = _ckpt_options(gt_path)
    ckpt = ckpt_io.make_checkpoint(
        network="SwinTRN", epoch=1, params=params, batch_stats=stats,
        opt_state=None, configs=options.to_dict(),
        token_to_id=dict(vocab.token_to_id),
        id_to_token=dict(vocab.id_to_token),
    )
    ckpt_path = ckpt_io.save_checkpoint(ckpt, dir=str(tmp_path / "ckpt"))

    inp = tmp_path / "input.txt"
    inp.write_text("".join(n + "\t\n" for n in names))
    results = run_inference(
        ckpt_path, str(inp), str(tmp_path / "out"),
        batch_size=4, max_sequence=max_sequence,
        decoding_manager=False, preprocess="host",
    )
    my_preds = dict(results)
    assert set(my_preds) == set(names)

    assert {n: real_preds[n] for n in names} == my_preds
    my_sent = sentence_acc(
        [my_preds[n].strip() for n in names],
        [gt_map[n].strip() for n in names],
    )
    my_wer = word_error_rate(
        [my_preds[n].strip() for n in names],
        [gt_map[n].strip() for n in names],
    )
    assert my_sent == real_sent
    assert np.isclose(my_wer, real_wer)
