"""Host-side evaluation metrics.

Reference semantics (``/root/reference/utils/metrics.py``):

- ``word_error_rate``: batch mean of editdistance / max(len) over
  space-split token lists. NOTE the reference splits with ``"," .split(" ")``
  on strings carrying a trailing space, so non-empty sequences gain a
  trailing empty token that inflates the length denominator by one; our
  ``id_to_string`` reproduces the trailing space so numbers match exactly.
- ``sentence_acc``: exact string match rate.
- ``final_metric``: 0.9 * sentence_acc + 0.1 * (1 - WER), the competition
  score (reference README.md:41).

Metrics stay off the TPU step: predictions are pulled to host once per batch
and scored with the native C++ editdistance (p4fr_tpu.native).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from p4fr_tpu.native import edit_distance_batch


def final_metric(sentence_acc: float, word_error_rate: float) -> float:
    return 0.9 * sentence_acc + 0.1 * (1 - word_error_rate)


def word_error_rate(
    predicted_outputs: Sequence[str], ground_truths: Sequence[str]
) -> float:
    """Mean normalized token edit distance over the batch."""
    pairs = []
    lengths = []
    for output, truth in zip(predicted_outputs, ground_truths):
        out_tokens = output.split(" ")
        gt_tokens = truth.split(" ")
        pairs.append((out_tokens, gt_tokens))
        lengths.append(max(len(out_tokens), len(gt_tokens)))
    if not pairs:
        return 0.0
    distances = edit_distance_batch(pairs)
    return float(np.mean(distances / np.asarray(lengths, dtype=np.float64)))


def sentence_acc(
    predicted_outputs: Sequence[str], ground_truths: Sequence[str]
) -> float:
    """Exact-match rate over the batch."""
    if len(predicted_outputs) == 0:
        return 0.0
    correct = sum(
        1 for o, g in zip(predicted_outputs, ground_truths) if o == g
    )
    return correct / len(predicted_outputs)


def symbol_accuracy(
    sequences: np.ndarray, expected: np.ndarray, pad_value: int = -1
) -> tuple:
    """(correct, total) symbol counts, reference train-loop style.

    ``expected`` carries ``pad_value`` at padded slots; correctness is
    counted as elementwise equality against non-padded targets
    (reference: train_modules/train_single_opt.py:106-108).
    """
    correct = int(np.sum(sequences == expected))
    total = int(np.sum(expected != pad_value))
    return correct, total
