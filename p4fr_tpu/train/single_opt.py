"""Single-optimizer training regime.

TPU-native rebuild of the reference trainer
(reference: train_modules/train_single_opt.py): seeding, fold-split data,
model construction, AdamW/Adam/Adadelta + cosine-warmup-restart (or
circular) LR as an optax schedule, arctan teacher-forcing schedule, epoch
loop with train + AR-greedy validation, best-checkpoint gating on the
competition metric 0.9*sentAcc + 0.1*(1-WER), and log.txt/JSONL metrics.

Differences by design (TPU-first):

- the whole train step (incl. the AR-sampled branch) is one jitted XLA
  program; metric strings are computed host-side from the step's argmax
  sequences, off the device critical path;
- labels are padded to a fixed length so XLA compiles exactly two step
  variants (teacher-forced / AR);
- checkpoints are the self-describing native msgpack format.
"""

from __future__ import annotations

import os
import random
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from p4fr_tpu.data.augment import get_train_transforms, get_valid_transforms
from p4fr_tpu.data.loader import dataset_loader
from p4fr_tpu.data.vocab import id_to_string
from p4fr_tpu.models.registry import get_network
from p4fr_tpu.train.schedules import (
    TeacherForcingScheduler,
    circular_lr,
    circular_momentum,
    cosine_warmup_restarts,
)
from p4fr_tpu.train.steps import (
    TrainState,
    build_optimizer,
    make_eval_step,
    make_train_step,
)
from p4fr_tpu.utils import checkpoint as ckpt_io
from p4fr_tpu.utils.flags import Flags
from p4fr_tpu.utils.logging import (
    ExperimentLogger,
    write_epoch_log,
    write_step_log,
)
from p4fr_tpu.utils.metrics import (
    final_metric,
    sentence_acc,
    symbol_accuracy,
    word_error_rate,
)


def set_seed(seed: int = 21) -> None:
    random.seed(seed)
    np.random.seed(seed)


def compute_dtype(options):
    tpu = options.get("tpu")
    name = tpu.get("compute_dtype", "float32") if tpu is not None else "float32"
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[str(name)]


def _batch_metrics(sequences, expected, dataset, pad_id):
    """Host-side WER / sentence-acc / symbol counts for one batch."""
    vocab = dataset.vocab
    exp = np.asarray(expected).copy()
    seq = np.asarray(sequences)
    exp_masked = np.where(exp == pad_id, -1, exp)
    expected_str = id_to_string(
        exp_masked,
        vocab.id_to_token,
        sos_id=vocab.sos_id,
        eos_id=vocab.eos_id,
        pad_id=vocab.pad_id,
        do_eval=True,
    )
    sequence_str = id_to_string(
        seq,
        vocab.id_to_token,
        sos_id=vocab.sos_id,
        eos_id=vocab.eos_id,
        pad_id=vocab.pad_id,
        do_eval=True,
    )
    wer = word_error_rate(sequence_str, expected_str)
    acc = sentence_acc(sequence_str, expected_str)
    correct, total = symbol_accuracy(seq, exp_masked[:, 1:], -1)
    return wer, acc, correct, total


def run_epoch_metrics(agg: Dict[str, float]) -> Dict[str, float]:
    return {
        "loss": agg["loss"] / max(agg["batches"], 1),
        "wer": agg["wer"] / max(agg["num_wer"], 1),
        "sentence_accuracy": agg["sent_acc"] / max(agg["num_sent"], 1),
        "symbol_accuracy": agg["correct"] / max(agg["total"], 1),
    }


def main(options_or_path, *, max_label_len: int = 232, log_dir: Optional[str] = None,
         wandb_kwargs: Optional[Dict] = None):
    options = (
        Flags(options_or_path).get()
        if not hasattr(options_or_path, "to_dict")
        else options_or_path
    )
    set_seed(options.seed)
    dtype = compute_dtype(options)

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
    if options.scheduler.scheduler == "CustomCosine":
        schedule = cosine_warmup_restarts(
            options.optimizer.lr,
            total_steps,
            warmup_ratio=options.scheduler.warmup_ratio,
            gamma=0.8,
            cycles=options.scheduler.get("cycle", 1),
        )
        b1_schedule = None
    else:
        # reference "Cycle": CircularLRBeta(opt, lr, 10, 10, cycle,
        # momentum=[0.95, 0.85]) — the beta1 counter-cycle rides along
        # (train_modules/train_single_opt.py:385)
        schedule = circular_lr(options.optimizer.lr, total_steps)
        b1_schedule = circular_momentum(total_steps)
    optimizer = build_optimizer(
        options.optimizer.optimizer,
        schedule,
        weight_decay=options.optimizer.weight_decay,
        max_grad_norm=options.max_grad_norm,
        b1_schedule=b1_schedule,
    )
    tf_scheduler = TeacherForcingScheduler(
        num_steps=total_steps,
        tf_max=options.teacher_forcing_ratio.tf_max,
        tf_min=options.teacher_forcing_ratio.tf_min,
    )

    # init or resume
    rng = jax.random.PRNGKey(options.seed)
    sample = next(iter(valid_loader)) if len(valid_loader) else next(iter(train_loader))
    init_images = jnp.asarray(sample["image"][:1])
    init_text = jnp.asarray(
        np.where(sample["truth"]["encoded"][:1] == -1, pad_id,
                 sample["truth"]["encoded"][:1])
    )
    variables = model.init(
        {"params": rng, "dropout": jax.random.PRNGKey(options.seed + 1)},
        init_images,
        init_text[:, :-1],
        train=False,
    )
    # offline pretrained-backbone bootstrap (reference loads timm/hub
    # weights at model construction; see convert_pth.bootstrap_pretrained)
    if options.get("pretrained") is not None:
        from p4fr_tpu.utils.convert_pth import bootstrap_pretrained

        variables = bootstrap_pretrained(
            variables, options.network, options.pretrained
        )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    start_epoch = 0
    histories: Dict = {
        k: [] for k in (
            "train_losses", "train_symbol_accuracy", "train_sentence_accuracy",
            "train_wer", "validation_losses", "validation_symbol_accuracy",
            "validation_sentence_accuracy", "validation_wer", "lr", "grad_norm",
        )
    }

    if options.checkpoint:
        loaded = ckpt_io.load_checkpoint(options.checkpoint)
        from flax import serialization as ser

        params = ser.from_state_dict(params, loaded["params"])
        if loaded.get("batch_stats"):
            batch_stats = ser.from_state_dict(batch_stats, loaded["batch_stats"])
        if loaded.get("opt_state"):
            opt_state = ckpt_io.restore_opt_state(opt_state, loaded["opt_state"])
        start_epoch = int(loaded.get("epoch", 0))
        for k in histories:
            if loaded.get(k):
                histories[k] = list(loaded[k])
        if loaded.get("tf_scheduler"):
            tf_scheduler.load_state_dict(loaded["tf_scheduler"])

    state = TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
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
        f"[+] Network: {options.network} | steps/epoch: {len(train_loader)} "
        f"| total steps: {total_steps} | dtype: {dtype.__name__}"
    )

    best_metric = -1.0
    py_rng = random.Random(options.seed)
    tf_ratio = options.teacher_forcing_ratio.tf_max

    for epoch in range(start_epoch, options.num_epochs):
        # ---- train ----
        agg = dict(loss=0.0, wer=0.0, num_wer=0, sent_acc=0.0, num_sent=0,
                   correct=0, total=0, batches=0, grad_norm=0.0)
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
            wer, acc, correct, total = _batch_metrics(
                sequences, text, train_dataset, pad_id
            )
            step_idx = int(state.step) - 1  # step used for this update
            write_step_log(
                logger, step_idx, float(jnp.asarray(schedule(step_idx))),
                tf_ratio, loss=float(metrics["loss"]),
            )
            agg["loss"] += float(metrics["loss"])
            agg["grad_norm"] += float(metrics["grad_norm"])
            agg["wer"] += wer
            agg["num_wer"] += 1
            agg["sent_acc"] += acc
            agg["num_sent"] += 1
            agg["correct"] += correct
            agg["total"] += total
            agg["batches"] += 1
        train_metrics = run_epoch_metrics(agg)

        # ---- validate (AR, TF=0) ----
        vagg = dict(loss=0.0, wer=0.0, num_wer=0, sent_acc=0.0, num_sent=0,
                    correct=0, total=0, batches=0)
        for batch in valid_loader:
            images = jnp.asarray(batch["image"])
            text = jnp.asarray(
                np.where(batch["truth"]["encoded"] == -1, pad_id,
                         batch["truth"]["encoded"])
            )
            loss, sequences = eval_step(state.params, state.batch_stats, images, text)
            count = batch["count"]
            wer, acc, correct, total = _batch_metrics(
                sequences[:count], text[:count], train_dataset, pad_id
            )
            vagg["loss"] += float(loss)
            vagg["wer"] += wer
            vagg["num_wer"] += 1
            vagg["sent_acc"] += acc
            vagg["num_sent"] += 1
            vagg["correct"] += correct
            vagg["total"] += total
            vagg["batches"] += 1
        valid_metrics = run_epoch_metrics(vagg)

        lr_now = float(jnp.asarray(schedule(state.step)))
        for key, val in (
            ("train_losses", train_metrics["loss"]),
            ("train_symbol_accuracy", train_metrics["symbol_accuracy"]),
            ("train_sentence_accuracy", train_metrics["sentence_accuracy"]),
            ("train_wer", train_metrics["wer"]),
            ("validation_losses", valid_metrics["loss"]),
            ("validation_symbol_accuracy", valid_metrics["symbol_accuracy"]),
            ("validation_sentence_accuracy", valid_metrics["sentence_accuracy"]),
            ("validation_wer", valid_metrics["wer"]),
            ("lr", lr_now),
        ):
            histories[key].append(val)

        write_epoch_log(logger, epoch, train_metrics, valid_metrics, lr_now, tf_ratio)

        # ---- best-checkpoint gating (reference metric) ----
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

    return {"best_metric": best_metric, "state": state, "histories": histories}
