"""Vocab, detokenization, and metric behavior (reference-parity contracts)."""

import numpy as np
import pytest

from p4fr_tpu.data.vocab import (
    END,
    PAD,
    START,
    Vocab,
    id_to_string,
)
from p4fr_tpu.native import (
    _edit_distance_py,
    _intern_ids,
    edit_distance,
    edit_distance_batch,
    native_available,
)
from p4fr_tpu.utils.metrics import final_metric, sentence_acc, word_error_rate


def test_vocab_size_245(vocab):
    # 241 tokens + 3 specials + 1 empty token from the trailing newline
    # (reference asserts 245 at postprocessing/postprocessing.py:172).
    assert len(vocab) == 245
    assert vocab.id_to_token[0] == START
    assert vocab.id_to_token[1] == END
    assert vocab.id_to_token[2] == PAD
    assert "" in vocab.token_to_id  # the empty-token quirk


def test_encode_roundtrip(vocab):
    truth = "\\frac { 1 } { 2 } + \\sqrt { x }"
    ids = vocab.encode(truth)
    assert all(isinstance(i, int) for i in ids)
    decoded = " ".join(vocab.id_to_token[i] for i in ids)
    assert decoded == truth


def test_encode_unknown_raises(vocab):
    with pytest.raises(ValueError):
        vocab.encode("\\notarealtoken")


def test_id_to_string_eval_mode(vocab):
    sos, eos, pad = vocab.sos_id, vocab.eos_id, vocab.pad_id
    a = vocab.token_to_id["a"]
    b = vocab.token_to_id["b"]
    seqs = [[sos, a, b, eos, b, b], [a, pad, b, eos], [eos, a]]
    out = id_to_string(
        seqs, vocab.id_to_token, sos_id=sos, eos_id=eos, pad_id=pad, do_eval=True
    )
    assert out == ["a b ", "a b ", ""]


def test_id_to_string_plain_mode(vocab):
    a = vocab.token_to_id["a"]
    out = id_to_string(
        [[a, -1, a]],
        vocab.id_to_token,
        sos_id=vocab.sos_id,
        eos_id=vocab.eos_id,
        pad_id=vocab.pad_id,
        do_eval=False,
    )
    # plain mode keeps specials; here only 'a' tokens present
    assert out == ["a a "]


def test_edit_distance_basic():
    assert edit_distance([], []) == 0
    assert edit_distance(["a"], []) == 1
    assert edit_distance([], ["a", "b"]) == 2
    assert edit_distance(list("kitten"), list("sitting")) == 3
    assert edit_distance(["x", "y"], ["x", "y"]) == 0


def test_edit_distance_py_matches_native():
    rng = np.random.default_rng(0)
    for _ in range(25):
        n, m = rng.integers(0, 40, size=2)
        a = list(rng.integers(0, 8, size=n))
        b = list(rng.integers(0, 8, size=m))
        ia, ib = _intern_ids(a, b)
        py = _edit_distance_py(ia, ib)
        # brute-force DP oracle
        dp = np.zeros((n + 1, m + 1), dtype=int)
        dp[:, 0] = np.arange(n + 1)
        dp[0, :] = np.arange(m + 1)
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                dp[i, j] = min(
                    dp[i - 1, j] + 1,
                    dp[i, j - 1] + 1,
                    dp[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
                )
        assert py == dp[n, m]
        if native_available():
            assert edit_distance(a, b) == dp[n, m]


def test_edit_distance_batch():
    pairs = [(list("abc"), list("adc")), (list("ab"), list("ab")), ([], list("q"))]
    out = edit_distance_batch(pairs)
    assert out.tolist() == [1, 0, 1]


def test_wer_trailing_space_quirk():
    # Reference splits "a b " -> ['a','b',''] so the denominator includes the
    # empty tail token; verify we reproduce the same numbers.
    pred, gt = ["a b "], ["a c "]
    # tokens ['a','b',''] vs ['a','c','']: distance 1, max len 3
    assert word_error_rate(pred, gt) == pytest.approx(1 / 3)


def test_sentence_acc_and_final_metric():
    preds = ["a b ", "c ", "x "]
    gts = ["a b ", "c ", "y "]
    acc = sentence_acc(preds, gts)
    assert acc == pytest.approx(2 / 3)
    wer = word_error_rate(preds, gts)
    score = final_metric(acc, wer)
    assert score == pytest.approx(0.9 * acc + 0.1 * (1 - wer))


def test_native_build_worked():
    # The environment ships g++; the session fixture builds the library.
    assert native_available()
