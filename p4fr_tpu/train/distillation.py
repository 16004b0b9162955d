"""Knowledge-distillation training: LiteSATRN student from a frozen teacher.

Reference semantics (train_modules/train_distillation.py:49-134):

- ``loss = KLDiv_batchmean(log_softmax(student/T), softmax(teacher/T))
  * alpha * T^2 + CE(student, labels) * (1 - alpha)`` with T=10,
  alpha=0.1;
- the KL term sums over ALL (vocab, position) elements / batch size, pads
  included, and the CE term does NOT ignore the pad id (both reference
  quirks, reproduced);
- the teacher runs un-teacher-forced (AR greedy) under no-grad on its own
  input resolution (train_distillation.py:107-112), each image augmented
  once and resized per model (dataset.py:152-210).
"""

from __future__ import annotations

import functools
import os
import random
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from p4fr_tpu.data.augment import get_train_transforms, get_valid_transforms
from p4fr_tpu.data.dataset import DistillationDataset, split_gt
from p4fr_tpu.data.loader import DataLoader
from p4fr_tpu.infer.single import load_model_from_checkpoint
from p4fr_tpu.models.registry import get_network
from p4fr_tpu.train import single_opt as so
from p4fr_tpu.train.schedules import (
    TeacherForcingScheduler,
    circular_lr,
    circular_momentum,
    cosine_warmup_restarts,
)
from p4fr_tpu.train.steps import (
    TrainState,
    ar_sampled_logits,
    build_optimizer,
    make_eval_step,
    teacher_forced_logits,
)
from p4fr_tpu.utils import checkpoint as ckpt_io
from p4fr_tpu.utils.flags import Flags
from p4fr_tpu.utils.logging import (
    ExperimentLogger,
    write_epoch_log,
    write_step_log,
)
from p4fr_tpu.utils.metrics import final_metric


def kd_loss(
    student_logits: jnp.ndarray,  # [B, L, V]
    labels: jnp.ndarray,  # [B, L]
    teacher_logits: jnp.ndarray,  # [B, L, V]
    temperature: float = 10.0,
    alpha: float = 0.1,
) -> jnp.ndarray:
    """Reference loss_fn_kd semantics (train_distillation.py:49-55)."""
    s = student_logits.astype(jnp.float32)
    t = teacher_logits.astype(jnp.float32)
    log_p_s = jax.nn.log_softmax(s / temperature, axis=-1)
    p_t = jax.nn.softmax(t / temperature, axis=-1)
    log_p_t = jax.nn.log_softmax(t / temperature, axis=-1)
    # KLDivLoss(batchmean): sum over every element / batch size
    kl = jnp.sum(p_t * (log_p_t - log_p_s)) / s.shape[0]
    # plain CE, mean over B*L, pads NOT ignored (reference F.cross_entropy)
    log_p = jax.nn.log_softmax(s, axis=-1)
    ce = -jnp.mean(
        jnp.take_along_axis(log_p, labels[..., None], axis=-1)[..., 0]
    )
    return kl * (alpha * temperature * temperature) + ce * (1.0 - alpha)


def make_distill_step(student, teacher, teacher_variables, optimizer):
    """Jitted step: teacher AR logits (no-grad) + student TF/AR + KD loss."""

    @functools.partial(jax.jit, static_argnames=("teacher_forced",),
                       donate_argnums=(0,))
    def step(state, student_images, teacher_images, text, rng,
             teacher_forced=True):
        num_steps = text.shape[1] - 1
        teacher_logits, _ = ar_sampled_logits(
            teacher, teacher_variables, teacher_images, num_steps, None,
            train=False,
        )
        teacher_logits = jax.lax.stop_gradient(teacher_logits)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            if teacher_forced:
                logits, new_stats = teacher_forced_logits(
                    student, variables, student_images, text[:, :-1], rng,
                    train=True,
                )
            else:
                logits, new_stats = ar_sampled_logits(
                    student, variables, student_images, num_steps, rng,
                    train=True,
                )
            return kd_loss(logits, text[:, 1:], teacher_logits), (
                logits, new_stats,
            )

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        sequences = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (
            TrainState(new_params, new_stats, new_opt, state.step + 1),
            {"loss": loss, "grad_norm": optax.global_norm(grads)},
            sequences,
        )

    return step


def get_distillation_loaders(options, teacher_options, max_label_len: int):
    """Student/teacher dual-transform loaders (reference loader.py:129-181)."""
    train_data, valid_data = [], []
    for path in options.data.train:
        t, v = split_gt(path, options.data.fold)
        train_data += t
        valid_data += v
    student_train_tf = get_train_transforms(
        options.input_size.height, options.input_size.width, options.data.rgb,
        seed=options.seed,
    )
    teacher_train_tf = get_train_transforms(
        teacher_options.input_size.height, teacher_options.input_size.width,
        teacher_options.data.rgb, seed=options.seed + 1,
    )
    student_valid_tf = get_valid_transforms(
        options.input_size.height, options.input_size.width, options.data.rgb
    )
    train_dataset = DistillationDataset(
        train_data, options.data.token_paths, crop=options.data.crop,
        student_transform=student_train_tf, teacher_transform=teacher_train_tf,
        rgb=options.data.rgb,
    )
    from p4fr_tpu.data.dataset import LoadDataset

    valid_dataset = LoadDataset(
        valid_data, options.data.token_paths, crop=options.data.crop,
        transform=student_valid_tf, rgb=options.data.rgb,
    )
    train_loader = DataLoader(
        train_dataset, options.batch_size, max_label_len=max_label_len,
        shuffle=True, drop_last=True, seed=options.seed,
        image_keys=("student_image", "teacher_image"),
    )
    valid_loader = DataLoader(
        valid_dataset, options.batch_size, max_label_len=max_label_len,
        shuffle=False, pad_last=True,
    )
    return train_loader, train_dataset, valid_loader, valid_dataset


def main(options_or_path, *, teacher_ckpt: str, max_label_len: int = 232,
         log_dir: Optional[str] = None, wandb_kwargs: Optional[Dict] = None):
    options = (
        Flags(options_or_path).get()
        if not hasattr(options_or_path, "to_dict")
        else options_or_path
    )
    so.set_seed(options.seed)
    dtype = so.compute_dtype(options)

    teacher, teacher_variables, teacher_options, teacher_vocab, _ = (
        load_model_from_checkpoint(teacher_ckpt, dtype=dtype)
    )

    train_loader, train_dataset, valid_loader, _ = get_distillation_loaders(
        options, teacher_options, max_label_len
    )
    vocab = train_dataset.vocab
    pad_id = vocab.pad_id
    assert len(vocab) == len(teacher_vocab), "student/teacher vocab mismatch"

    student = get_network(options.network, options, vocab, dtype=dtype)
    total_steps = len(train_loader) * options.num_epochs
    # scheduler selection mirrors the reference student trainer
    # (train_modules/train_distillation.py:422-438): CustomCosine or the
    # "Cycle" CircularLRBeta with its [0.95, 0.85] beta1 counter-cycle
    if options.scheduler.scheduler == "Cycle":
        schedule = circular_lr(options.optimizer.lr, total_steps)
        b1_schedule = circular_momentum(total_steps)
    else:
        schedule = cosine_warmup_restarts(
            options.optimizer.lr, total_steps,
            warmup_ratio=options.scheduler.warmup_ratio, gamma=0.8,
            cycles=options.scheduler.get("cycle", 1),
        )
        b1_schedule = None
    optimizer = build_optimizer(
        options.optimizer.optimizer, schedule,
        weight_decay=options.optimizer.weight_decay,
        max_grad_norm=options.max_grad_norm,
        b1_schedule=b1_schedule,
    )
    tf_scheduler = TeacherForcingScheduler(
        total_steps, options.teacher_forcing_ratio.tf_max,
        options.teacher_forcing_ratio.tf_min,
    )

    rng = jax.random.PRNGKey(options.seed)
    sample = next(iter(train_loader))
    init_images = jnp.asarray(sample["student_image"][:1])
    init_text = jnp.asarray(
        np.where(sample["truth"]["encoded"][:1] == -1, pad_id,
                 sample["truth"]["encoded"][:1])
    )
    variables = student.init(
        {"params": rng, "dropout": jax.random.PRNGKey(options.seed + 1)},
        init_images, init_text[:, :-1], train=False,
    )
    if options.get("pretrained") is not None:
        from p4fr_tpu.utils.convert_pth import bootstrap_pretrained

        variables = bootstrap_pretrained(
            variables, options.network, options.pretrained
        )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    start_epoch = 0

    # resume from a student checkpoint (reference trainers all restore
    # from options.checkpoint, train_single_opt.py:232-237)
    if options.checkpoint:
        from flax import serialization as ser

        loaded = ckpt_io.load_checkpoint(options.checkpoint)
        params = ser.from_state_dict(params, loaded["params"])
        if loaded.get("batch_stats"):
            batch_stats = ser.from_state_dict(batch_stats, loaded["batch_stats"])
        if loaded.get("opt_state"):
            opt_state = ckpt_io.restore_opt_state(opt_state, loaded["opt_state"])
        start_epoch = int(loaded.get("epoch", 0))
        if loaded.get("tf_scheduler"):
            tf_scheduler.load_state_dict(loaded["tf_scheduler"])

    state = TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        step=jnp.asarray(start_epoch * len(train_loader), jnp.int32),
    )
    step_fn = make_distill_step(student, teacher, teacher_variables, optimizer)
    eval_step = make_eval_step(student, pad_id)

    logger = ExperimentLogger(
        log_dir or os.path.join(options.prefix, "logs"),
        use_wandb=wandb_kwargs is not None,
        wandb_kwargs=wandb_kwargs,
    )
    logger.text(
        f"[+] Distillation: student {options.network} <- teacher "
        f"{teacher_options.network} (T=10, alpha=0.1)"
    )

    best_metric = -1.0
    py_rng = random.Random(options.seed)
    tf_ratio = options.teacher_forcing_ratio.tf_max

    for epoch in range(start_epoch, options.num_epochs):
        agg = dict(loss=0.0, wer=0.0, num_wer=0, sent_acc=0.0, num_sent=0,
                   correct=0, total=0, batches=0)
        for batch in train_loader:
            tf_ratio = tf_scheduler.step()
            teacher_forced = py_rng.random() < tf_ratio
            s_images = jnp.asarray(batch["student_image"])
            t_images = jnp.asarray(batch["teacher_image"])
            text = jnp.asarray(
                np.where(batch["truth"]["encoded"] == -1, pad_id,
                         batch["truth"]["encoded"])
            )
            rng, step_rng = jax.random.split(rng)
            state, metrics, sequences = step_fn(
                state, s_images, t_images, text, step_rng,
                teacher_forced=teacher_forced,
            )
            wer, acc, correct, total = so._batch_metrics(
                sequences, text, train_dataset, pad_id
            )
            step_idx = int(state.step) - 1
            write_step_log(
                logger, step_idx, float(jnp.asarray(schedule(step_idx))),
                tf_ratio, loss=float(metrics["loss"]),
            )
            agg["loss"] += float(metrics["loss"]); agg["batches"] += 1
            agg["wer"] += wer; agg["num_wer"] += 1
            agg["sent_acc"] += acc; agg["num_sent"] += 1
            agg["correct"] += correct; agg["total"] += total
        train_metrics = so.run_epoch_metrics(agg)

        vagg = dict(loss=0.0, wer=0.0, num_wer=0, sent_acc=0.0, num_sent=0,
                    correct=0, total=0, batches=0)
        for batch in valid_loader:
            images = jnp.asarray(batch["image"])
            text = jnp.asarray(
                np.where(batch["truth"]["encoded"] == -1, pad_id,
                         batch["truth"]["encoded"])
            )
            loss, sequences = eval_step(
                state.params, state.batch_stats, images, text
            )
            count = batch["count"]
            wer, acc, correct, total = so._batch_metrics(
                sequences[:count], text[:count], train_dataset, pad_id
            )
            vagg["loss"] += float(loss); vagg["batches"] += 1
            vagg["wer"] += wer; vagg["num_wer"] += 1
            vagg["sent_acc"] += acc; vagg["num_sent"] += 1
            vagg["correct"] += correct; vagg["total"] += total
        valid_metrics = so.run_epoch_metrics(vagg)

        lr_now = float(jnp.asarray(schedule(state.step)))
        write_epoch_log(logger, epoch, train_metrics, valid_metrics, lr_now, tf_ratio)
        score = final_metric(
            valid_metrics["sentence_accuracy"], valid_metrics["wer"]
        )
        if score > best_metric:
            best_metric = score
            ckpt = ckpt_io.make_checkpoint(
                network=options.network,
                epoch=epoch + 1,
                params=state.params,
                batch_stats=state.batch_stats,
                opt_state=state.opt_state,
                configs=options.to_dict(),
                token_to_id=vocab.token_to_id,
                id_to_token=vocab.id_to_token,
                tf_scheduler=tf_scheduler.state_dict(),
            )
            path = ckpt_io.save_checkpoint(ckpt, prefix=options.prefix)
            logger.text(f"[+] new best {score:.4f} -> {path}")

    return {"best_metric": best_metric, "state": state}
