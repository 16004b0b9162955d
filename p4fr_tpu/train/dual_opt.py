"""Dual-optimizer training: separate encoder/decoder optimizers.

Reference semantics (train_modules/train_dual_opt.py):

- encoder: Adam with base lr 0 + CustomCosineAnnealingWarmUpRestarts to
  ``optimizer.enc_lr`` (gamma 0.8, 10% warmup) (train_dual_opt.py:330,348);
- decoder: Adam at ``dec_lr`` with transformers'
  constant-schedule-with-warmup (train_dual_opt.py:331,357-359);
- gradients clipped per parameter group (train_dual_opt.py:101-106).

Implemented as one ``optax.multi_transform`` keyed on the top-level
``encoder`` / ``decoder`` param names (our models expose exactly those
submodules), so the whole update stays a single fused XLA step.
"""

from __future__ import annotations

import os
import random
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from p4fr_tpu.data.augment import get_train_transforms, get_valid_transforms
from p4fr_tpu.data.loader import dataset_loader
from p4fr_tpu.models.registry import get_network
from p4fr_tpu.train import single_opt as so
from p4fr_tpu.train.schedules import (
    TeacherForcingScheduler,
    constant_with_warmup,
    cosine_warmup_restarts,
)
from p4fr_tpu.train.steps import TrainState, make_eval_step, make_train_step
from p4fr_tpu.utils import checkpoint as ckpt_io
from p4fr_tpu.utils.flags import Flags
from p4fr_tpu.utils.logging import (
    ExperimentLogger,
    write_epoch_log,
    write_step_log,
)
from p4fr_tpu.utils.metrics import final_metric


def dual_schedules(
    enc_lr: float,
    dec_lr: float,
    total_steps: int,
    *,
    warmup_ratio: float = 0.1,
    cycles: int = 1,
):
    """(enc, dec) LR schedules — shared by the optimizer and the logger."""
    t_0 = max(1, total_steps // max(1, cycles))
    warmup = int(t_0 * warmup_ratio)
    enc_sched = cosine_warmup_restarts(
        enc_lr, total_steps, warmup_ratio=warmup_ratio, gamma=0.8,
        cycles=cycles,
    )
    dec_sched = constant_with_warmup(dec_lr, warmup)
    return enc_sched, dec_sched


def build_dual_optimizer(
    enc_lr: float,
    dec_lr: float,
    total_steps: int,
    *,
    warmup_ratio: float = 0.1,
    cycles: int = 1,
    max_grad_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    enc_sched, dec_sched = dual_schedules(
        enc_lr, dec_lr, total_steps, warmup_ratio=warmup_ratio, cycles=cycles
    )

    def group(schedule):
        chain = [optax.adam(schedule)]
        if max_grad_norm is not None:
            chain.insert(0, optax.clip_by_global_norm(max_grad_norm))
        return optax.chain(*chain)

    def label_fn(params):
        return {k: ("encoder" if k == "encoder" else "decoder") for k in params}

    return optax.multi_transform(
        {"encoder": group(enc_sched), "decoder": group(dec_sched)}, label_fn
    )


def main(options_or_path, *, max_label_len: int = 232, log_dir: Optional[str] = None,
         wandb_kwargs: Optional[Dict] = None):
    options = (
        Flags(options_or_path).get()
        if not hasattr(options_or_path, "to_dict")
        else options_or_path
    )
    so.set_seed(options.seed)
    dtype = so.compute_dtype(options)

    train_transform = get_train_transforms(
        options.input_size.height, options.input_size.width, options.data.rgb,
        seed=options.seed,
    )
    valid_transform = get_valid_transforms(
        options.input_size.height, options.input_size.width, options.data.rgb
    )
    train_loader, train_dataset, valid_loader, _ = dataset_loader(
        options, train_transform, valid_transform, max_label_len=max_label_len
    )
    vocab = train_dataset.vocab
    pad_id = vocab.pad_id
    model = get_network(options.network, options, vocab, dtype=dtype)

    total_steps = len(train_loader) * options.num_epochs
    optimizer = build_dual_optimizer(
        options.optimizer.enc_lr,
        options.optimizer.dec_lr,
        total_steps,
        warmup_ratio=options.scheduler.warmup_ratio,
        cycles=options.scheduler.get("cycle", 1),
        max_grad_norm=options.max_grad_norm,
    )
    enc_sched, dec_sched = dual_schedules(
        options.optimizer.enc_lr,
        options.optimizer.dec_lr,
        total_steps,
        warmup_ratio=options.scheduler.warmup_ratio,
        cycles=options.scheduler.get("cycle", 1),
    )
    tf_scheduler = TeacherForcingScheduler(
        total_steps,
        options.teacher_forcing_ratio.tf_max,
        options.teacher_forcing_ratio.tf_min,
    )

    rng = jax.random.PRNGKey(options.seed)
    sample = next(iter(valid_loader)) if len(valid_loader) else next(iter(train_loader))
    init_images = jnp.asarray(sample["image"][:1])
    init_text = jnp.asarray(
        np.where(sample["truth"]["encoded"][:1] == -1, pad_id,
                 sample["truth"]["encoded"][:1])
    )
    variables = model.init(
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
        params=params, batch_stats=batch_stats, opt_state=opt_state,
        step=jnp.asarray(start_epoch * len(train_loader), jnp.int32),
    )
    train_step = make_train_step(model, optimizer, pad_id)
    eval_step = make_eval_step(model, pad_id)

    logger = ExperimentLogger(
        log_dir or os.path.join(options.prefix, "logs"),
        use_wandb=wandb_kwargs is not None,
        wandb_kwargs=wandb_kwargs,
    )
    logger.text(
        f"[+] Dual-opt {options.network}: enc_lr {options.optimizer.enc_lr} "
        f"dec_lr {options.optimizer.dec_lr} | total steps {total_steps}"
    )

    best_metric = -1.0
    py_rng = random.Random(options.seed)
    histories: Dict = {
        k: [] for k in (
            "train_losses", "train_symbol_accuracy", "train_sentence_accuracy",
            "train_wer", "validation_losses", "validation_symbol_accuracy",
            "validation_sentence_accuracy", "validation_wer", "lr",
        )
    }
    if options.checkpoint:
        for k in histories:
            if loaded.get(k):
                histories[k] = list(loaded[k])
    tf_ratio = options.teacher_forcing_ratio.tf_max

    for epoch in range(start_epoch, options.num_epochs):
        agg = dict(loss=0.0, wer=0.0, num_wer=0, sent_acc=0.0, num_sent=0,
                   correct=0, total=0, batches=0)
        for batch in train_loader:
            tf_ratio = tf_scheduler.step()
            teacher_forced = py_rng.random() < tf_ratio
            images = jnp.asarray(batch["image"])
            text = jnp.asarray(
                np.where(batch["truth"]["encoded"] == -1, pad_id,
                         batch["truth"]["encoded"])
            )
            rng, step_rng = jax.random.split(rng)
            state, metrics, sequences = train_step(
                state, images, text, step_rng, teacher_forced=teacher_forced
            )
            wer, acc, correct, total = so._batch_metrics(
                sequences, text, train_dataset, pad_id
            )
            step_idx = int(state.step) - 1
            write_step_log(
                logger, step_idx,
                float(jnp.asarray(enc_sched(step_idx))), tf_ratio,
                loss=float(metrics["loss"]),
                extra={"dec_learning_rate": float(jnp.asarray(dec_sched(step_idx)))},
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

        enc_lr_now = float(jnp.asarray(enc_sched(state.step)))
        dec_lr_now = float(jnp.asarray(dec_sched(state.step)))
        for key, val in (
            ("train_losses", train_metrics["loss"]),
            ("train_symbol_accuracy", train_metrics["symbol_accuracy"]),
            ("train_sentence_accuracy", train_metrics["sentence_accuracy"]),
            ("train_wer", train_metrics["wer"]),
            ("validation_losses", valid_metrics["loss"]),
            ("validation_symbol_accuracy", valid_metrics["symbol_accuracy"]),
            ("validation_sentence_accuracy", valid_metrics["sentence_accuracy"]),
            ("validation_wer", valid_metrics["wer"]),
            ("lr", enc_lr_now),
        ):
            histories[key].append(val)
        write_epoch_log(
            logger, epoch, train_metrics, valid_metrics, enc_lr_now, tf_ratio,
            extra={"dec_learning_rate": dec_lr_now},
        )
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
                histories=histories,
                tf_scheduler=tf_scheduler.state_dict(),
            )
            path = ckpt_io.save_checkpoint(ckpt, prefix=options.prefix)
            logger.text(f"[+] new best {score:.4f} -> {path}")

    return {"best_metric": best_metric, "state": state}
