"""Parity against MORE real reference code (see test_reference_oracle.py).

These tests execute the reference's ensemble joint-decode loop, data
utilities, metrics, and detokenizer as the oracle — the real sources
loaded from /root/reference by reference_loader.load_reference_full():

- ``utils/ensemble_utils.py::make_decoder_values`` (the per-step softmax
  averaging + manager sift loop, ensemble_utils.py:45-120) stepping the
  real ``EfficientSATRN_decoder.step_forward`` (EfficientSATRN.py:897-952)
  vs infer/ensemble.py's fused joint-decode scan;
- ``utils/data_utils.py`` load_vocab/encode_truth/split_gt (:6-81);
- ``utils/metrics.py`` WER / sentence acc / final metric (:5-34), with
  ``editdistance.eval`` backed by p4fr_tpu.native so the reference's own
  splitting/averaging logic runs unmodified;
- ``utils/utils.py::id_to_string`` (:134-164) incl. the do_eval modes.
"""

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from p4fr_tpu.data.vocab import id_to_string as my_id_to_string  # noqa: E402
from p4fr_tpu.decoding import manager as dm  # noqa: E402
from p4fr_tpu.infer.ensemble import make_ensemble_decode_fn  # noqa: E402
from p4fr_tpu.utils import metrics as my_metrics  # noqa: E402
from p4fr_tpu.utils.convert_pth import convert_state_dict  # noqa: E402

from helpers import tiny_satrn  # noqa: E402
from reference_loader import (  # noqa: E402
    cpu_get_device,
    load_reference_full,
    make_dataset_stub,
    make_flags,
)

B, H, W, MAX_SEQ = 3, 32, 64, 11  # num_steps = MAX_SEQ + 1 like the reference


@pytest.fixture(scope="module")
def ref():
    return load_reference_full()


def _tiny_flags():
    return make_flags(
        height=H, width=W, enc_hidden=32, enc_filter=32, enc_heads=4,
        enc_layers=1, dec_src=32, dec_hidden=32, dec_filter=64,
        dec_heads=4, dec_layers=2,
    )


def _member(ref, vocab, seed):
    """One ensemble member: (real decoder-split wrapper, real encoder
    memory fn, my flax model, converted variables)."""
    torch.manual_seed(seed)
    full = ref.lite_satrn.LiteSATRN(_tiny_flags(), make_dataset_stub(vocab))
    full.eval()

    wrapper = ref.efficient_satrn.EfficientSATRN_decoder(
        _tiny_flags(), make_dataset_stub(vocab)
    )
    # LiteSATRN's SATRNDecoder is structurally identical to
    # EfficientSATRN's (SURVEY §2.2; LiteSATRN.py:408-545) — strict
    # load_state_dict is itself an assertion of that.
    wrapper.decoder.load_state_dict(full.decoder.state_dict(), strict=True)
    wrapper.eval()

    params, stats, unmatched = convert_state_dict(
        "LiteSATRN", full.state_dict()
    )
    assert unmatched == []
    jmodel = tiny_satrn(num_classes=len(vocab), pad_id=vocab.pad_id,
                        sos_id=vocab.sos_id)
    variables = {"params": params, "batch_stats": stats}
    return full, wrapper, jmodel, variables


@pytest.mark.parametrize("managed", [False, True])
def test_ensemble_joint_decode_vs_real_make_decoder_values(
    ref, vocab, tokens_path, managed
):
    members = [_member(ref, vocab, seed) for seed in (0, 1)]
    rng = np.random.default_rng(3)
    images = rng.normal(size=(B, H, W, 3)).astype(np.float32)

    # identical encoder memories feed both sides: the comparison isolates
    # the joint token-stepping loop (encoder parity is covered elsewhere)
    with cpu_get_device(), torch.no_grad():
        memories_t = [
            full.encoder(torch.tensor(images).permute(0, 3, 1, 2))
            for full, _, _, _ in members
        ]

    manager = None
    if managed:
        manager = ref.postprocessing.get_decoding_manager(
            tokens_path, batch_size=B
        )

    paths = [f"img_{i}.png" for i in range(B)]
    parser = types.SimpleNamespace(max_sequence=MAX_SEQ)
    enc_dl_stub = types.SimpleNamespace(dataset=make_dataset_stub(vocab))
    dec_dataloader = [(paths, [m.detach() for m in memories_t])]

    with cpu_get_device(), torch.no_grad():
        want = ref.ensemble_utils.make_decoder_values(
            models=[w for _, w, _, _ in members],
            parser=parser,
            enc_dataloader=enc_dl_stub,
            dec_dataloader=dec_dataloader,
            manager=manager,
            device="cpu",
        )

    tables = dm.RuleTables.build(vocab) if managed else None
    decode_fn = jax.jit(
        make_ensemble_decode_fn(
            [jm for _, _, jm, _ in members],
            max_steps=MAX_SEQ + 1,
            tables=tables,
        )
    )
    tokens = decode_fn(
        [v for _, _, _, v in members],
        [jnp.asarray(m.numpy()) for m in memories_t],
    )
    got_strs = my_id_to_string(
        np.asarray(tokens), vocab.id_to_token, sos_id=vocab.sos_id,
        eos_id=vocab.eos_id, pad_id=vocab.pad_id, do_eval=True,
    )
    got = list(zip(paths, got_strs))
    assert got == want


def test_real_load_vocab_and_encode_truth(ref, tokens_path, vocab):
    want_t2i, want_i2t = ref.data_utils.load_vocab([tokens_path])
    assert want_t2i == dict(vocab.token_to_id)
    assert want_i2t == dict(vocab.id_to_token)
    assert len(want_t2i) == 245  # trailing-empty-token quirk preserved

    for truth in ["1 + 2", "\\frac { 1 } { 2 }", "a ^ { 2 } + b ^ { 2 }"]:
        assert ref.data_utils.encode_truth(truth, want_t2i) == vocab.encode(
            truth
        )
    with pytest.raises(Exception):
        ref.data_utils.encode_truth("\\notatoken", want_t2i)
    with pytest.raises(Exception):
        vocab.encode("\\notatoken")


def test_real_split_gt(ref, tmp_path):
    from helpers import make_synth_dataset

    from p4fr_tpu.data.dataset import split_gt as my_split_gt

    gt = make_synth_dataset(str(tmp_path), n=10, folds=3)
    for fold in range(3):
        ref_train, ref_val = ref.data_utils.split_gt(gt, fold)
        my_train, my_val = my_split_gt(gt, fold)
        # both shuffle internally; compare as sets of (path, latex)
        assert {tuple(x) for x in ref_train} == {tuple(x) for x in my_train}
        assert {tuple(x) for x in ref_val} == {tuple(x) for x in my_val}
        assert len(ref_train) + len(ref_val) == 10


def test_real_metrics(ref):
    preds = [
        "1 + 2",
        "\\frac { 1 } { 2 }",
        "a ^ { 2 }",
        "x = y ",  # trailing space — the reference splits it into a token
        "",
    ]
    gts = [
        "1 + 2",
        "\\frac { 1 } { 3 }",
        "a ^ { 2 } + b",
        "x = y",
        "\\sqrt { x }",
    ]
    want_wer = ref.metrics.word_error_rate(preds, gts)
    want_sacc = ref.metrics.sentence_acc(preds, gts)
    got_wer = my_metrics.word_error_rate(preds, gts)
    got_sacc = my_metrics.sentence_acc(preds, gts)
    assert abs(want_wer - got_wer) < 1e-12
    assert want_sacc == got_sacc
    assert (
        abs(
            ref.metrics.final_metric(want_sacc, want_wer)
            - my_metrics.final_metric(got_sacc, got_wer)
        )
        < 1e-12
    )


def test_real_id_to_string(ref, vocab):
    rng = np.random.default_rng(5)
    tokens = rng.integers(0, len(vocab) - 1, size=(4, 9))
    # realistic rows: start with <SOS>, one row hits <EOS> mid-sequence
    tokens[:, 0] = vocab.sos_id
    tokens[1, 4] = vocab.eos_id
    tokens[2, 1] = vocab.pad_id
    dl_stub = types.SimpleNamespace(dataset=make_dataset_stub(vocab))

    for do_eval in (0, 1):
        want = ref.utils_utils.id_to_string(
            torch.tensor(tokens), dl_stub, do_eval=do_eval
        )
        got = my_id_to_string(
            tokens, vocab.id_to_token, sos_id=vocab.sos_id,
            eos_id=vocab.eos_id, pad_id=vocab.pad_id, do_eval=bool(do_eval),
        )
        assert got == want, do_eval


def test_training_loss_matches_real_criterion(vocab):
    """The reference trains with nn.CrossEntropyLoss(ignore_index=PAD)
    on [B, V, L] logits after replacing the collate's -1 padding with
    PAD (networks/LiteSATRN.py:574-576, train_modules/
    train_single_opt.py:78-86). Our cross_entropy_ignore_pad must equal
    it bit-for-bit on the same logits/targets."""
    import jax.numpy as jnp
    from torch import nn as tnn

    from p4fr_tpu.train.steps import cross_entropy_ignore_pad

    pad = vocab.pad_id
    rng = np.random.default_rng(9)
    B, L, V = 4, 11, len(vocab)
    logits = rng.standard_normal((B, L, V)).astype(np.float32)
    encoded = rng.integers(0, V, size=(B, L + 1)).astype(np.int64)
    # collate pads with -1; the trainer replaces -1 -> PAD before loss
    encoded[0, 7:] = -1
    encoded[3, 3:] = -1
    encoded[encoded == -1] = pad
    targets = encoded[:, 1:]  # "[SOS] 이후부터"

    criterion = tnn.CrossEntropyLoss(ignore_index=pad)
    want = criterion(
        torch.from_numpy(logits).transpose(1, 2),  # [B, V, L]
        torch.from_numpy(targets),
    ).item()
    got = float(
        cross_entropy_ignore_pad(
            jnp.asarray(logits), jnp.asarray(targets), pad
        )
    )
    assert abs(want - got) < 1e-6


def test_flags_parity_with_real_reference(ref):
    """Real utils/flags.py (namedtuple + eval coercion) vs our Flags on
    every shipped YAML config: identical leaf values and nesting. Pins
    the eval-vs-literal_eval coercion choice against the real code on
    the actual config surface."""
    import importlib

    real_flags_mod = importlib.import_module("utils.flags")

    def nt_leaves(nt, prefix=""):
        out = {}
        for k in nt._fields:
            v = getattr(nt, k)
            path = f"{prefix}.{k}" if prefix else k
            if hasattr(v, "_fields"):
                out.update(nt_leaves(v, path))
            else:
                out[path] = v
        return out

    def my_leaves(obj, prefix=""):
        out = {}
        for k in obj.keys():
            v = getattr(obj, k)
            path = f"{prefix}.{k}" if prefix else k
            if hasattr(v, "keys") and not isinstance(v, (str, dict)):
                out.update(my_leaves(v, path))
            else:
                out[path] = v
        return out

    from p4fr_tpu.utils.flags import Flags as MyFlags

    for name in ("LiteSATRN", "EfficientSATRN", "EfficientASTER", "SWIN"):
        cfg = f"p4fr_tpu/configs/{name}.yaml"
        want = nt_leaves(real_flags_mod.Flags(cfg).get())
        got = my_leaves(MyFlags(cfg).get())
        # the real loader prefixes "prefix" with ./ — normalize
        for leaves in (want, got):
            if "prefix" in leaves:
                leaves["prefix"] = leaves["prefix"].lstrip("./")
        assert want == got, (name, set(want) ^ set(got),
                            {k: (want.get(k), got.get(k))
                             for k in want if want.get(k) != got.get(k)})
