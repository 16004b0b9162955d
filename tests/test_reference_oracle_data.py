"""REAL reference ``data/dataset.py`` as the dataset-pipeline oracle.

The real ``LoadDataset`` (/root/reference/data/dataset.py:18-83) is
importable once the real ``utils`` package is up (load_reference_full):
PIL loading, RGB/greyscale conversion, invert-bbox crop, the
rotate-if-h/w>2 rule and the <SOS> + encode_truth + <EOS> framing all
run unmodified. Our ``p4fr_tpu.data.dataset.LoadDataset`` must produce
byte-identical images and identical encoded sequences on the same
on-disk files.

Behavioral note pinned here: the reference only applies the rotate rule
inside its ``if self.transform`` branch (its real loaders always pass
one), so the oracle drives the reference WITH a pass-through transform
— the configuration its training/eval pipelines actually use.
"""

import importlib.util
import pathlib
import sys

import numpy as np
import pytest
from PIL import Image

from reference_loader import load_reference_full

from p4fr_tpu.data.dataset import LoadDataset

TOKENS = "p4fr_tpu/configs/tokens.txt"


@pytest.fixture(scope="module")
def ref_dataset_mod():
    load_reference_full()  # real `utils` package (encode_truth/load_vocab)
    path = pathlib.Path("/root/reference/data/dataset.py")
    spec = importlib.util.spec_from_file_location("_ref_data_dataset", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_data_dataset"] = mod
    spec.loader.exec_module(mod)
    return mod


def _write_images(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    # normal landscape image with white margins (crop must shrink it)
    a = np.full((40, 80, 3), 255, np.uint8)
    a[10:30, 20:60] = rng.integers(0, 200, (20, 40, 3), dtype=np.uint8)
    # tall image: h/w > 2 after crop -> rotate branch
    b = np.full((90, 30, 3), 255, np.uint8)
    b[5:85, 8:22] = rng.integers(0, 200, (80, 14, 3), dtype=np.uint8)
    for name, arr in (("wide.png", a), ("tall.png", b)):
        p = tmp_path / name
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    return paths


@pytest.mark.parametrize("crop", [False, True])
def test_dataset_images_and_encoding_match_real_reference(
    ref_dataset_mod, tmp_path, crop
):
    paths = _write_images(tmp_path)
    gt = [(paths[0], "1 + 2"), (paths[1], "\\frac { a } { b }")]

    real = ref_dataset_mod.LoadDataset(
        gt, [TOKENS], crop=crop,  # real load_vocab takes a path LIST
        transform=lambda image: {"image": image},  # pass-through: the
        # reference rotate rule only runs inside the transform branch
    )
    ours = LoadDataset(gt, [TOKENS], crop=crop)

    assert len(real) == len(ours) == 2
    for i in range(2):
        r, o = real[i], ours[i]
        assert r["truth"]["encoded"] == o["truth"]["encoded"]
        assert r["truth"]["text"] == o["truth"]["text"]
        np.testing.assert_array_equal(np.asarray(r["image"]), o["image"])


def test_collate_padding_matches_real_reference(ref_dataset_mod, tmp_path):
    """Real collate_batch (/root/reference/data/loader.py:10-25) pads the
    encoded labels with -1 to the BATCH max; ours pads to a fixed
    max_label_len (static XLA shapes). With max_label_len >= batch max
    the overlap must be identical and the tail all -1."""
    import importlib.util as ilu

    import torch

    from p4fr_tpu.data.loader import collate

    # loader.py does `from .dataset import ...`; load it AS data.loader
    # with the real dataset module aliased in, so the relative import
    # resolves (the `data` package stub exists from load_reference)
    sys.modules["data.dataset"] = ref_dataset_mod
    spec = ilu.spec_from_file_location(
        "data.loader", "/root/reference/data/loader.py"
    )
    ref_loader = ilu.module_from_spec(spec)
    sys.modules["data.loader"] = ref_loader
    spec.loader.exec_module(ref_loader)

    # same-size images: real collate torch.stacks them (the reference's
    # albumentations Resize normally equalizes shapes)
    rng = np.random.default_rng(1)
    paths = []
    for name in ("c0.png", "c1.png"):
        p = tmp_path / name
        Image.fromarray(
            rng.integers(0, 255, (40, 80, 3), dtype=np.uint8)
        ).save(p)
        paths.append(str(p))
    gt = [(paths[0], "1 + 2"), (paths[1], "\\frac { a } { b } + 1")]
    real_ds = ref_dataset_mod.LoadDataset(
        gt, [TOKENS], crop=False,
        transform=lambda image: {"image": torch.from_numpy(image)},
    )
    items = [real_ds[i] for i in range(2)]
    want = ref_loader.collate_batch(items)
    enc_want = want["truth"]["encoded"].numpy()

    got = collate(items, max_label_len=12)
    enc_got = got["truth"]["encoded"]
    np.testing.assert_array_equal(enc_got[:, : enc_want.shape[1]], enc_want)
    assert (enc_got[:, enc_want.shape[1]:] == -1).all()
    assert got["path"] == want["path"]
    assert got["truth"]["text"] == want["truth"]["text"]


def test_eval_dataset_matches_real_reference(ref_dataset_mod, tmp_path):
    from p4fr_tpu.data.dataset import LoadEvalDataset
    from p4fr_tpu.data.vocab import Vocab

    paths = _write_images(tmp_path)
    vocab = Vocab.from_files([TOKENS])
    gt3 = [(p, p, "a + b") for p in paths]

    real = ref_dataset_mod.LoadEvalDataset(
        gt3, vocab.token_to_id, vocab.id_to_token, crop=True,
        transform=lambda image: {"image": image},
    )
    ours = LoadEvalDataset(
        gt3, vocab.token_to_id, vocab.id_to_token, crop=True
    )
    for i in range(2):
        r, o = real[i], ours[i]
        assert r["truth"]["encoded"] == o["truth"]["encoded"]
        assert r["file_path"] == o["file_path"]
        np.testing.assert_array_equal(np.asarray(r["image"]), o["image"])
