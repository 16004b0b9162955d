"""Trajectory oracles against the REAL dual-opt and distillation trainers.

Round-4 verdict #5: ``train_single_opt._train_one_epoch`` got a real-code
trajectory oracle in r4, but the two other training regimes were verified
only against mirrors/formula oracles. These tests execute the actual
reference loops (loaded unmodified via reference_loader):

1. ``test_dual_opt_trajectory_vs_real_trainer`` — steps the REAL
   ``train_dual_opt._train_one_epoch`` (two torch Adam optimizers,
   per-group clip_grad_norm_ at
   /root/reference/train_modules/train_dual_opt.py:101-106, encoder
   CustomCosine at :348-355 and transformers'
   get_constant_schedule_with_warmup decoder schedule at :357-359 — the
   REAL transformers function, installed here) and our
   ``dual_opt.build_dual_optimizer`` + ``make_train_step`` from identical
   converted weights/batches; asserts matching loss trajectories and
   final weights.

2. ``test_distillation_step_vs_real_trainer`` — steps the REAL
   ``train_distillation._train_one_epoch`` (teacher un-TF'd no_grad AR
   forward + ``loss_fn_kd`` with the pads-in-KL/pads-in-CE quirks,
   /root/reference/train_modules/train_distillation.py:49-55,107-128)
   and our ``distillation.make_distill_step`` from identical converted
   teacher/student weights; asserts matching KD-loss trajectories and
   final student weights.

Determinism: every torch Dropout is zeroed (the ff_dropout=0.1 quirk is
the loop's only stochastic element) and tf is pinned to 1.0 so both
sides run the teacher-forced branch.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from p4fr_tpu.data.vocab import Vocab  # noqa: E402
from p4fr_tpu.train.dual_opt import build_dual_optimizer  # noqa: E402
from p4fr_tpu.train.schedules import cosine_warmup_restarts  # noqa: E402
from p4fr_tpu.train.steps import (  # noqa: E402
    TrainState,
    build_optimizer,
    make_train_step,
)
from p4fr_tpu.utils.convert_pth import convert_state_dict  # noqa: E402

from reference_loader import (  # noqa: E402
    cpu_get_device,
    load_reference_trainer_distill,
    load_reference_trainer_dual,
)
from test_reference_train_parity import (  # noqa: E402
    B,
    H,
    L,
    TOKENS,
    _DictDataset,
    _ListLoader,
    _tiny_jmodel,
    _tiny_tmodel,
)


@pytest.fixture(scope="module")
def vocab():
    return Vocab.from_files([TOKENS])


def _zero_dropout(tmodel):
    for m in tmodel.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0


def _make_batches(vocab, n_steps, seed=1):
    rng = np.random.default_rng(seed)
    imgs, labs = [], []
    for _ in range(n_steps):
        imgs.append(rng.normal(size=(B, H, 64, 3)).astype(np.float32))
        lab = np.full((B, L), -1, np.int64)  # -1 = the collate pad value
        lab[:, 0] = vocab.sos_id
        for b in range(B):
            n = int(rng.integers(4, L - 2))
            lab[b, 1 : 1 + n] = rng.integers(3, len(vocab) - 1, size=n)
            lab[b, 1 + n] = vocab.eos_id
        labs.append(lab)
    return imgs, labs


def _torch_dict(i, imgs, labs):
    return {
        "image": torch.tensor(imgs[i]).permute(0, 3, 1, 2),
        "truth": {"encoded": torch.tensor(labs[i])},
    }


def _weight_drift(network, tmodel, params):
    pt, _, _ = convert_state_dict(network, tmodel.state_dict())
    mine = dict(jax.tree_util.tree_leaves_with_path(params))
    return max(
        float(np.max(np.abs(np.asarray(mine[k]) - v)))
        for k, v in jax.tree_util.tree_leaves_with_path(pt)
    )


def test_dual_opt_trajectory_vs_real_trainer(vocab):
    ref = load_reference_trainer_dual()
    from transformers import get_constant_schedule_with_warmup

    n_steps, enc_lr, dec_lr = 6, 5e-4, 4e-4
    warmup = 2  # int(t_0 * warmup_ratio) with t_0=n_steps, ratio=1/3
    tmodel = _tiny_tmodel(ref, vocab, dropout=0.0)
    _zero_dropout(tmodel)
    tmodel.train()
    params0, stats0, unmatched = convert_state_dict(
        "LiteSATRN", tmodel.state_dict()
    )
    assert unmatched == []
    imgs, labs = _make_batches(vocab, n_steps)

    # --- the REAL dual-opt loop (train_dual_opt.py:309-359) -------------
    enc_params = [p for p in tmodel.encoder.parameters() if p.requires_grad]
    dec_params = [p for p in tmodel.decoder.parameters() if p.requires_grad]
    enc_opt = torch.optim.Adam(enc_params, lr=0)
    dec_opt = torch.optim.Adam(dec_params, lr=dec_lr)
    enc_sched = ref.cosine.CustomCosineAnnealingWarmUpRestarts(
        enc_opt, T_0=n_steps, T_mult=1, eta_max=enc_lr, T_up=warmup,
        gamma=0.8,
    )
    dec_sched = get_constant_schedule_with_warmup(
        optimizer=dec_opt, num_warmup_steps=warmup
    )
    tf_t = ref.tf_sched.TeacherForcingScheduler(
        num_steps=n_steps, tf_max=1.0, tf_min=1.0
    )
    real_losses = []
    with cpu_get_device():
        for i in range(n_steps):
            res = ref.trainer_dual._train_one_epoch(
                _ListLoader([_torch_dict(i, imgs, labs)],
                            _DictDataset(vocab, B)),
                tmodel, "E", tmodel.criterion, enc_opt, dec_opt,
                enc_sched, dec_sched, 2.0, torch.device("cpu"), tf_t,
                False,
            )
            real_losses.append(float(res["loss"]))

    # --- ours: multi_transform enc/dec groups from the same init --------
    jmodel = _tiny_jmodel(vocab, dropout=0.0, ff_dropout=0.0)
    optimizer = build_dual_optimizer(
        enc_lr, dec_lr, total_steps=n_steps, warmup_ratio=warmup / n_steps,
        max_grad_norm=2.0,
    )
    state = TrainState(params=params0, batch_stats=stats0,
                       opt_state=optimizer.init(params0),
                       step=jnp.asarray(0, jnp.int32))
    step_fn = make_train_step(jmodel, optimizer, vocab.pad_id)
    my_losses = []
    for i in range(n_steps):
        text = np.where(labs[i] == -1, vocab.pad_id, labs[i]).astype(np.int32)
        state, metrics, _ = step_fn(
            state, jnp.asarray(imgs[i]), jnp.asarray(text),
            jax.random.PRNGKey(i), teacher_forced=True,
        )
        my_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(
        my_losses, real_losses, rtol=2e-5, atol=2e-6,
        err_msg="dual-opt loss trajectory diverged from the real trainer",
    )
    worst = _weight_drift("LiteSATRN", tmodel, state.params)
    assert worst < 2e-3, f"weights drifted {worst} from the torch trajectory"


def test_distillation_step_vs_real_trainer(vocab):
    ref = load_reference_trainer_distill()

    n_steps, lr = 5, 5e-4
    teacher_t = _tiny_tmodel(ref, vocab, dropout=0.0, seed=1)
    _zero_dropout(teacher_t)
    teacher_t.eval()
    student_t = _tiny_tmodel(ref, vocab, dropout=0.0, seed=2)
    _zero_dropout(student_t)
    student_t.train()
    t_params, t_stats, um1 = convert_state_dict(
        "LiteSATRN", teacher_t.state_dict()
    )
    s_params, s_stats, um2 = convert_state_dict(
        "LiteSATRN", student_t.state_dict()
    )
    assert um1 == um2 == []
    imgs, labs = _make_batches(vocab, n_steps, seed=3)

    class _DistillLoader(_ListLoader):
        pass

    # --- the REAL distillation loop -------------------------------------
    opt_t = torch.optim.Adam(
        [p for p in student_t.parameters() if p.requires_grad], lr=0
    )
    sched_t = ref.cosine.CustomCosineAnnealingWarmUpRestarts(
        opt_t, T_0=n_steps, T_mult=1, eta_max=lr,
        T_up=1, gamma=0.8,
    )
    tf_t = ref.tf_sched.TeacherForcingScheduler(
        num_steps=n_steps, tf_max=1.0, tf_min=1.0
    )
    real_losses = []
    with cpu_get_device():
        for i in range(n_steps):
            d = {
                "student_image": torch.tensor(imgs[i]).permute(0, 3, 1, 2),
                "teacher_image": torch.tensor(imgs[i]).permute(0, 3, 1, 2),
                "truth": {"encoded": torch.tensor(labs[i])},
            }
            res = ref.trainer_distill._train_one_epoch(
                _DistillLoader([d], _DictDataset(vocab, B)),
                student_t, teacher_t, "E", opt_t, sched_t, 2.0,
                torch.device("cpu"), tf_t, False,
            )
            real_losses.append(float(res["loss"]))

    # --- ours: make_distill_step from the same converted weights --------
    from p4fr_tpu.train.distillation import make_distill_step

    teacher_j = _tiny_jmodel(vocab, dropout=0.0, ff_dropout=0.0)
    student_j = _tiny_jmodel(vocab, dropout=0.0, ff_dropout=0.0)
    teacher_vars = {"params": t_params, "batch_stats": t_stats}
    optimizer = build_optimizer(
        "adam",
        cosine_warmup_restarts(lr, n_steps, warmup_ratio=1 / n_steps,
                               gamma=0.8, cycles=1),
        max_grad_norm=2.0,
    )
    state = TrainState(params=s_params, batch_stats=s_stats,
                       opt_state=optimizer.init(s_params),
                       step=jnp.asarray(0, jnp.int32))
    step_fn = make_distill_step(student_j, teacher_j, teacher_vars,
                                optimizer)
    my_losses = []
    for i in range(n_steps):
        text = np.where(labs[i] == -1, vocab.pad_id, labs[i]).astype(np.int32)
        state, metrics, _ = step_fn(
            state, jnp.asarray(imgs[i]), jnp.asarray(imgs[i]),
            jnp.asarray(text), jax.random.PRNGKey(i), teacher_forced=True,
        )
        my_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(
        my_losses, real_losses, rtol=5e-5, atol=5e-6,
        err_msg="KD loss trajectory diverged from the real trainer",
    )
    worst = _weight_drift("LiteSATRN", student_t, state.params)
    assert worst < 2e-3, (
        f"student weights drifted {worst} from the torch trajectory"
    )
