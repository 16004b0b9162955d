"""Trained-model end-to-end parity for the EfficientASTER family.

Round-4 verdict: only the SATRN family had trained-then-converted-then-
matched coverage; EfficientASTER's LSTM-attention decode path
(/root/reference/networks/EfficientASTER.py:211-330, AttentionCell
:78-155) was verified only by module-level logits oracles, so a
converter or recurrent-state bug specific to the trained LSTM path could
slip through. This mirrors
test_reference_train_parity.py::test_trained_model_end_to_end_parity for
ASTER:

- builds the REAL reference ``ASTER`` (networks/EfficientASTER.py:333)
  at tiny dims — the timm V2-S backbone is swapped for a single
  timm-structured FusedMBConv stage (same module names the converter's
  index-generic ``blocks.{s}.{b}`` rules map), everything else (DeepCNN
  stem + convRelu tail, BiLSTM encoder, additive-attention LSTM decoder)
  is the real reference code;
- trains it through the REAL ``train_single_opt._train_one_epoch`` loop
  with the REAL datasets/collate/split_gt/schedulers on rendered
  formulas to non-trivial held-out accuracy;
- converts the trained state_dict and asserts IDENTICAL greedy
  predictions + equal sentence-acc/WER through both inference paths
  (reference inference_single.py:52-120 vs our infer.single
  fast-LSTM path).

This is also the first construction of the real ``DeepCNN`` tail in any
test (timm's absence previously limited oracles to the decoder) — it
caught the conv1_bn/conv3_bn eps=1e-5 torch-default parity bug.
"""

import os
import random
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch import nn  # noqa: E402
from torch.nn import functional as F  # noqa: E402

import jax  # noqa: E402

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
    _transform,
)

H, W = 32, 64
DIM = 48  # src/hidden/embedding dim of the tiny decoder
LAYERS = 2  # production EfficientASTER.yaml layer_num

# one FusedMBConv stage replacing timm V2-S: 24ch -> 256ch (the convRelu
# tail's conv1 is hardcoded to 256 in, EfficientASTER.py:34,61), stride 2
# (so the tail's pool/pool/k2-conv chain collapses height 15 -> 1)
TINY_STAGES = ((1, 3, 2, 4, 24, 256, False, True),)


class _TimmFusedBlock(nn.Module):
    """timm-structured FusedMBConv (expand>1): conv_exp/bn1/conv_pwl/bn2
    with timm's effnet BN settings (eps=1e-3) — the module names the
    converter's _efficientnet_rules map."""

    def __init__(self, in_chs, out_chs, expand, stride):
        super().__init__()
        mid = in_chs * expand
        self.conv_exp = nn.Conv2d(in_chs, mid, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid, eps=1e-3, momentum=0.1)
        self.conv_pwl = nn.Conv2d(mid, out_chs, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_chs, eps=1e-3, momentum=0.1)
        self._skip = stride == 1 and in_chs == out_chs

    def forward(self, x):
        out = F.silu(self.bn1(self.conv_exp(x)))
        out = self.bn2(self.conv_pwl(out))
        return out + x if self._skip else out


def _tiny_timm_blocks():
    stages = []
    for repeats, _k, stride, expand, in_chs, out_chs, _se, fused in (
        TINY_STAGES
    ):
        assert fused, "tiny stand-in only implements the fused block"
        blocks = []
        for bi in range(repeats):
            blocks.append(_TimmFusedBlock(
                in_chs if bi == 0 else out_chs, out_chs, expand,
                stride if bi == 0 else 1,
            ))
        stages.append(nn.Sequential(*blocks))
    return nn.Sequential(*stages)


def _tiny_real_aster(ref, vocab, seed=5):
    """The REAL reference ASTER with the tiny timm-structured backbone."""
    sn = types.SimpleNamespace
    flags = sn(
        input_size=sn(height=H, width=W),
        data=sn(rgb=3),
        dropout_rate=0.1,
        ASTER=sn(src_dim=DIM, hidden_dim=DIM, embedding_dim=DIM,
                 layer_num=LAYERS),
    )
    dataset_stub = sn(
        id_to_token=dict(vocab.id_to_token),
        token_to_id=dict(vocab.token_to_id),
    )
    timm_stub = sys.modules["timm"]
    orig = timm_stub.create_model
    timm_stub.create_model = (
        lambda *a, **k: types.SimpleNamespace(blocks=_tiny_timm_blocks())
    )
    try:
        torch.manual_seed(seed)
        return ref.aster.ASTER(flags, dataset_stub, decoding_manager=None)
    finally:
        timm_stub.create_model = orig


def _ckpt_options(gt_path):
    """Reference-schema config for the converted checkpoint (the ASTER
    analog of helpers.tiny_train_options)."""
    return Flags({
        "network": "EfficientASTER",
        "input_size": {"height": H, "width": W},
        "ASTER": {
            "src_dim": DIM, "hidden_dim": DIM, "embedding_dim": DIM,
            "layer_num": LAYERS,
            "backbone_stages": [list(r) for r in TINY_STAGES],
        },
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


def test_trained_aster_end_to_end_parity(tmp_path):
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

    # --- train the REAL ASTER through the REAL loop ---------------------
    tmodel = _tiny_real_aster(ref, vocab)
    tmodel.train()
    epochs = 500  # the LSTM-attention decoder fits slower than SATRN's
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
    assert res["loss"] < 0.5, f"real ASTER failed to fit: {res['loss']}"

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
        f"real trained ASTER only reached {real_sent} held-out sent acc"
    )

    # --- OUR inference path on the converted checkpoint -----------------
    from p4fr_tpu.infer.single import run_inference
    from p4fr_tpu.utils import checkpoint as ckpt_io
    from p4fr_tpu.utils.metrics import sentence_acc, word_error_rate

    params, stats, unmatched = convert_state_dict(
        "EfficientASTER", tmodel.state_dict()
    )
    assert unmatched == []
    options = _ckpt_options(gt_path)
    ckpt = ckpt_io.make_checkpoint(
        network="EfficientASTER", epoch=1, params=params, batch_stats=stats,
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
