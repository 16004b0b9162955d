"""Parity against the REAL reference code, executed as the oracle.

Unlike the mirror-based tests (test_encoder_parity.py etc.), these load
the actual source from /root/reference (see reference_loader.py) and
assert bit-level / tolerance-level agreement on:

- teacher-forced logits through a reference-format ``.pth`` round trip
  (real LiteSATRN state_dict -> convert_pth rules -> flax apply),
- greedy AR decode token sequences, manager off AND on
  (reference decode(): postprocessing/decoding.py:6-53, AR loop:
  networks/LiteSATRN.py:505-545),
- DecodingManager.sift masking on a shared random logit stream
  (postprocessing/postprocessing.py:183-404),
- all three schedulers stepped via real torch optimizers
  (schedulers/cosineannealing.py:7-81, circular_lr.py:6-70,
  tf_scheduler.py:6-63).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from p4fr_tpu.decoding import manager as dm  # noqa: E402
from p4fr_tpu.decoding.greedy import make_greedy_fn  # noqa: E402
from p4fr_tpu.utils.convert_pth import convert_state_dict  # noqa: E402

from helpers import tiny_satrn  # noqa: E402
from reference_loader import (  # noqa: E402
    cpu_get_device,
    load_reference,
    make_dataset_stub,
    make_flags,
)

B, H, W, L = 3, 32, 64, 12


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _ref_lite_satrn(ref, vocab, manager=None, seed=0):
    torch.manual_seed(seed)
    flags = make_flags(
        height=H, width=W, enc_hidden=32, enc_filter=32, enc_heads=4,
        enc_layers=1, dec_src=32, dec_hidden=32, dec_filter=64,
        dec_heads=4, dec_layers=2,
    )
    model = ref.lite_satrn.LiteSATRN(
        flags, make_dataset_stub(vocab), decoding_manager=manager
    )
    model.eval()
    return model


def _converted_pair(ref, vocab, seed=0):
    """(real torch LiteSATRN, my SATRN, converted flax variables)."""
    tmodel = _ref_lite_satrn(ref, vocab, seed=seed)
    params, stats, unmatched = convert_state_dict(
        "LiteSATRN", tmodel.state_dict()
    )
    assert unmatched == [], unmatched[:10]
    jmodel = tiny_satrn(num_classes=len(vocab), pad_id=vocab.pad_id,
                        sos_id=vocab.sos_id)
    variables = {"params": params, "batch_stats": stats}
    return tmodel, jmodel, variables


def _inputs(seed=1):
    rng = np.random.default_rng(seed)
    images = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    return images


def _labels(vocab, seed=2):
    """[SOS, body..., EOS, PAD...] like the padded collator output."""
    rng = np.random.default_rng(seed)
    out = np.full((B, L), vocab.pad_id, np.int64)
    out[:, 0] = vocab.sos_id
    for b in range(B):
        n = int(rng.integers(4, L - 2))
        body = rng.integers(3, len(vocab) - 1, size=n)
        out[b, 1 : 1 + n] = body
        out[b, 1 + n] = vocab.eos_id
    return out


def test_pth_roundtrip_teacher_forced_logits(ref, vocab):
    tmodel, jmodel, variables = _converted_pair(ref, vocab)
    images = _inputs()
    labels = _labels(vocab)

    with cpu_get_device(), torch.no_grad():
        want = tmodel(
            torch.tensor(images).permute(0, 3, 1, 2),
            torch.tensor(labels),
            True,  # is_train -> teacher-forced branch
            1.0,
        ).numpy()

    got = np.asarray(
        jmodel.apply(variables, jnp.asarray(images), jnp.asarray(labels[:, :-1]))
    )
    assert got.shape == want.shape == (B, L - 1, len(vocab))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("managed", [False, True])
def test_greedy_tokens_match_reference_decode(ref, vocab, tokens_path, managed):
    manager = None
    if managed:
        manager = ref.postprocessing.get_decoding_manager(
            tokens_path, batch_size=B
        )
        # Latent reference bug: networks/LiteSATRN.py:543 calls
        # manager.reset() with no args but the signature requires
        # sequence_length (postprocessing.py:233) — the reference would
        # crash AFTER computing the output. Shim a default so the real
        # decode loop (whose result is already built) can return.
        orig_reset = manager.reset
        manager.reset = (
            lambda sequence_length=None: orig_reset(
                sequence_length if sequence_length is not None else L - 1
            )
        )
    tmodel = _ref_lite_satrn(ref, vocab, manager=manager)
    params, stats, unmatched = convert_state_dict("LiteSATRN", tmodel.state_dict())
    assert unmatched == []
    jmodel = tiny_satrn(num_classes=len(vocab), pad_id=vocab.pad_id,
                        sos_id=vocab.sos_id)
    variables = {"params": params, "batch_stats": stats}

    images = _inputs()
    labels = _labels(vocab)

    with cpu_get_device(), torch.no_grad():
        want = (
            ref.decoding.decode(
                tmodel,
                torch.tensor(images).permute(0, 3, 1, 2),
                expected=torch.tensor(labels),
                method="greedy",
            )
            .numpy()
        )

    tables = dm.RuleTables.build(vocab) if managed else None
    fn = jax.jit(make_greedy_fn(jmodel, max_steps=L - 1, tables=tables))
    got_tokens, _ = fn(variables, jnp.asarray(images))
    got_tokens = np.asarray(got_tokens)

    assert got_tokens.shape == want.shape == (B, L - 1)
    np.testing.assert_array_equal(got_tokens, want)


def test_manager_sift_stream_parity(ref, vocab, tokens_path):
    """Real DecodingManager vs the jnp manager on one shared logit stream."""
    steps = 24
    manager = ref.postprocessing.get_decoding_manager(tokens_path, batch_size=B)
    assert manager.tokens[: 3] == ["<SOS>", "<EOS>", "<PAD>"]
    # the real manager and my vocab must index tokens identically
    for i, tok in enumerate(manager.tokens[:-1]):
        assert vocab.id_to_token[i] == tok, (i, tok)

    rng = np.random.default_rng(7)
    stream = rng.normal(size=(steps, B, len(vocab))).astype(np.float32) * 3

    manager.reset(sequence_length=steps)
    tables = dm.RuleTables.build(vocab)
    state = dm.init_state(B, tables)

    with cpu_get_device():
        for t in range(steps):
            tgt_ref, probs_ref = manager.sift(
                torch.tensor(stream[t]).unsqueeze(1)
            )
            tgt_mine, probs_mine, state = dm.sift(
                state, jnp.asarray(stream[t]), tables
            )
            np.testing.assert_array_equal(
                np.asarray(tgt_mine), tgt_ref.numpy().reshape(-1), err_msg=f"t={t}"
            )
            np.testing.assert_allclose(
                np.asarray(probs_mine),
                probs_ref.numpy().reshape(B, -1),
                atol=1e-6,
                err_msg=f"t={t}",
            )
    manager.reset(sequence_length=steps)


def test_pth_file_roundtrip_end_to_end(ref, vocab, tokens_path, tmp_path):
    """torch.save a reference-format .pth -> convert_pth -> my loader ->
    identical greedy tokens. Exercises the whole conversion pipeline at
    the file level, not just the rule tables."""
    from p4fr_tpu.infer.single import load_model_from_checkpoint
    from p4fr_tpu.utils.convert_pth import convert_pth

    tmodel = _ref_lite_satrn(ref, vocab, seed=5)
    cfg = {
        "network": "LiteSATRN",
        "input_size": {"height": H, "width": W},
        "SATRN": {
            "encoder": {"hidden_dim": 32, "filter_dim": 32,
                        "layer_num": 1, "head_num": 4},
            "decoder": {"src_dim": 32, "hidden_dim": 32, "filter_dim": 64,
                        "layer_num": 2, "head_num": 4},
        },
        "dropout_rate": 0.1,
        "data": {"rgb": 3, "token_paths": [tokens_path]},
    }
    pth = tmp_path / "ref.pth"
    torch.save(
        {
            "network": "LiteSATRN",
            "model": tmodel.state_dict(),
            "configs": cfg,
            "token_to_id": dict(vocab.token_to_id),
            "id_to_token": dict(vocab.id_to_token),
            "epoch": 3,
        },
        str(pth),
    )
    out = str(tmp_path / "native.ckpt")
    convert_pth(str(pth), out)

    jmodel, variables, options, vocab2, ckpt = load_model_from_checkpoint(
        out, dtype=jnp.float32
    )
    assert ckpt["epoch"] == 3
    assert len(vocab2) == len(vocab)

    images = _inputs(seed=9)
    labels = _labels(vocab, seed=10)
    with cpu_get_device(), torch.no_grad():
        want = ref.decoding.decode(
            tmodel,
            torch.tensor(images).permute(0, 3, 1, 2),
            expected=torch.tensor(labels),
            method="greedy",
        ).numpy()
    fn = jax.jit(make_greedy_fn(jmodel, max_steps=L - 1))
    got, _ = fn(variables, jnp.asarray(images))
    np.testing.assert_array_equal(np.asarray(got), want)


def _dummy_optimizer(lr=0.0):
    p = torch.nn.Parameter(torch.zeros(1))
    return torch.optim.SGD([p], lr=lr)


def test_cosine_scheduler_vs_real_reference(ref):
    from p4fr_tpu.train.schedules import cosine_warmup_restarts

    total, eta_max, gamma = 120, 5e-4, 0.8
    for cycles, t_mult in [(1, 1), (2, 1), (3, 2)]:
        t_0 = total // cycles
        opt = _dummy_optimizer()
        real = ref.cosine.CustomCosineAnnealingWarmUpRestarts(
            opt, T_0=t_0, T_mult=t_mult, eta_max=eta_max,
            T_up=int(t_0 * 0.1), gamma=gamma,
        )
        mine = cosine_warmup_restarts(
            eta_max, total, warmup_ratio=0.1, gamma=gamma,
            cycles=cycles, t_mult=t_mult,
        )
        for step in range(total):
            # torch convention: lr for step N is in the param group after
            # N scheduler.step() calls (construction performs the first).
            want = opt.param_groups[0]["lr"]
            got = float(mine(step))
            assert abs(got - want) < 1e-9, (cycles, t_mult, step, got, want)
            real.step()


def test_circular_lr_vs_real_reference(ref):
    from p4fr_tpu.train.schedules import circular_lr

    lr_max, step_size = 1e-3, 50
    opt = _dummy_optimizer()
    real = ref.circular.CircularLRBeta(
        opt, lr_max=lr_max, lr_divider=10, cut_point=10, step_size=step_size
    )
    mine = circular_lr(lr_max, step_size)
    for it in range(2 * step_size + 5):
        want = real.step()  # returns the lr used at this iteration
        got = float(mine(it))
        assert abs(got - want) < 1e-9, (it, got, want)


def test_circular_momentum_vs_real_reference(ref):
    """The Adam beta1 counter-cycle: the reference constructs
    CircularLRBeta with momentum=[0.95, 0.85] on a REAL torch Adam
    (train_modules/train_single_opt.py:385) and rewrites group["betas"]
    every step (circular_lr.py:62-66). Track both the lr and beta1 the
    torch optimizer actually sees across two full cycles."""
    from p4fr_tpu.train.schedules import circular_lr, circular_momentum

    lr_max, step_size = 1e-3, 50
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=lr_max)
    real = ref.circular.CircularLRBeta(
        opt, lr_max=lr_max, lr_divider=10, cut_point=10,
        step_size=step_size, momentum=[0.95, 0.85],
    )
    mine_lr = circular_lr(lr_max, step_size)
    mine_b1 = circular_momentum(step_size)
    for it in range(2 * step_size + 5):
        real.step()
        want_lr = opt.param_groups[0]["lr"]
        want_b1, want_b2 = opt.param_groups[0]["betas"]
        assert abs(float(mine_lr(it)) - want_lr) < 1e-9, (it, want_lr)
        assert abs(float(mine_b1(it)) - want_b1) < 1e-7, (it, want_b1)
        assert want_b2 == 0.999  # beta2 untouched, like inject_hyperparams


def test_teacher_forcing_vs_real_reference(ref):
    from p4fr_tpu.train.schedules import TeacherForcingScheduler

    num_steps, tf_max, tf_min = 80, 0.9, 0.4
    real = ref.tf_sched.TeacherForcingScheduler(num_steps, tf_max, tf_min)
    mine = TeacherForcingScheduler(num_steps, tf_max, tf_min)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # reference warns after exhaustion
        for i in range(num_steps + 5):  # run past the trimmed end
            want = float(real.step())
            got = mine.step()
            assert abs(got - want) < 1e-12, (i, got, want)


def test_beam_vs_real_best_first_beam(ref, vocab):
    """Quantified comparison against the REAL best-first beam search
    (EfficientSATRN.beam_search run unbound with the real LiteSATRN as
    ``self`` — it only touches .encoder/.decoder, which LiteSATRN shares).

    The rebuild's lockstep batched beam is a documented deviation
    (decoding/beam.py:19-22); this test measures how often the two
    disagree on peaked ("real-ish") logit streams and pins a floor on
    the agreement rate.
    """
    import types as _types

    from p4fr_tpu.data.vocab import id_to_string
    from p4fr_tpu.decoding.beam import make_beam_fn

    nb, steps, width = 6, 12, 3
    # A random-init model never emits <EOS>, which makes the comparison
    # degenerate (best-first stops on the first popped EOS node, lockstep
    # runs the full length). Briefly overfit the tiny model on synthetic
    # formulas so EOS/token probabilities are trained-model-shaped, then
    # inverse-convert the SAME weights into the real torch LiteSATRN.
    from helpers import synth_images, synth_labels
    from test_convert_pth import _inverse_state_dict_litesatrn

    from p4fr_tpu.train.steps import (
        TrainState, build_optimizer, make_train_step,
    )

    jmodel = tiny_satrn(num_classes=len(vocab), pad_id=vocab.pad_id,
                        sos_id=vocab.sos_id)
    images = synth_images(nb, seed=13)
    labels = jnp.asarray(synth_labels(nb, steps + 1, seed=14))
    variables = jmodel.init(
        {"params": jax.random.PRNGKey(11), "dropout": jax.random.PRNGKey(12)},
        jnp.asarray(images), labels, train=False,
    )
    optimizer = build_optimizer("AdamW", 3e-3, weight_decay=0.0,
                                max_grad_norm=2.0)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(variables["params"]),
        step=jnp.asarray(0, jnp.int32),
    )
    step = make_train_step(jmodel, optimizer, vocab.pad_id)
    rng_key = jax.random.PRNGKey(0)
    for _ in range(50):
        state, metrics, _ = step(state, jnp.asarray(images), labels,
                                 rng_key, teacher_forced=True)
    assert float(metrics["loss"]) < 1.0, float(metrics["loss"])
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # same weights into the REAL torch LiteSATRN via the inverse key map
    params_np = jax.tree_util.tree_map(np.asarray, state.params)
    stats_np = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    sd = _inverse_state_dict_litesatrn(params_np, stats_np)
    tmodel = _ref_lite_satrn(ref, vocab, seed=11)
    tmodel.load_state_dict(sd, strict=True)
    tmodel.eval()
    dl_stub = _types.SimpleNamespace(
        dataset=_types.SimpleNamespace(token_to_id=dict(vocab.token_to_id))
    )

    with cpu_get_device(), torch.no_grad():
        want = ref.efficient_satrn.EfficientSATRN.beam_search(
            tmodel,
            torch.tensor(images).permute(0, 3, 1, 2),
            dl_stub,
            topk=1,
            beam_width=width,
            max_sequence=steps,
        ).numpy()

    fn = jax.jit(
        make_beam_fn(jmodel, max_steps=steps, beam_width=width,
                     eos_id=vocab.eos_id)
    )
    got = np.asarray(fn(variables, jnp.asarray(images)))

    def strings(tok):
        return id_to_string(
            tok, vocab.id_to_token, sos_id=vocab.sos_id,
            eos_id=vocab.eos_id, pad_id=vocab.pad_id, do_eval=True,
        )

    want_s = strings(want)  # reference rows include the leading <SOS>
    got_s = strings(got)
    agree = sum(a == b for a, b in zip(want_s, got_s))
    print(f"[beam-vs-best-first] agreement {agree}/{nb}: "
          f"{list(zip(want_s, got_s))}")
    # both searches maximize the same length-normalized score; on peaked
    # distributions they should usually find the same argmax sequence
    assert agree >= nb - 2, (want_s, got_s)
