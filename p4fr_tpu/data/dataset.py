"""Host-side datasets: ground-truth parsing, fold split, image loading.

Reference semantics (reference: data/dataset.py, utils/data_utils.py:45-81):

- ground truth is a TSV of ``image_name\\tlatex tokens``;
- ``split_gt`` joins against ``data_info.txt`` (CSV with image_name,fold
  columns): validation = rows whose fold == k, train = the rest;
- images: RGB/greyscale select, optional invert-bbox crop, rotate 90° when
  h/w > 2, then the transform pipeline;
- labels are pre-encoded ``<SOS> ... <EOS>`` at construction time.
"""

from __future__ import annotations

import os
import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from PIL import Image, ImageOps

from p4fr_tpu.data.vocab import END, PAD, START, Vocab


def split_gt(
    groundtruth: str, fold: int
) -> Tuple[List[Tuple[str, str]], List[Tuple[str, str]]]:
    """(train, valid) lists of (image_path, latex) via the fold column."""
    root = os.path.join(os.path.dirname(groundtruth), "images")
    df = pd.read_csv(os.path.join(os.path.dirname(groundtruth), "data_info.txt"))
    val_names = set(df[df["fold"] == fold]["image_name"].values)
    train_names = set(df[df["fold"] != fold]["image_name"].values)
    data = []
    with open(groundtruth, "r") as fd:
        for line in fd:
            parts = line.strip().split("\t")
            if len(parts) >= 2:
                data.append(parts[:2])
    random.shuffle(data)
    train = [(os.path.join(root, n), t) for n, t in data if n in train_names]
    valid = [(os.path.join(root, n), t) for n, t in data if n in val_names]
    return train, valid


def load_image(
    path: str, rgb: int = 3, crop: bool = False
) -> np.ndarray:
    """PIL load -> uint8 array with the reference's crop/rotate rules."""
    image = Image.open(path)
    if rgb == 3:
        image = image.convert("RGB")
    elif rgb == 1:
        image = image.convert("L")
    else:
        raise NotImplementedError(f"rgb={rgb}")
    if crop:
        bbox = ImageOps.invert(image.convert("RGB") if rgb == 1 else image).getbbox()
        if bbox is not None:
            image = image.crop(bbox)
    w, h = image.size
    if h / w > 2:
        image = image.rotate(90, expand=True)
    return np.array(image)


class LoadDataset:
    """Training/validation dataset (reference LoadDataset)."""

    def __init__(
        self,
        groundtruth: Sequence[Tuple[str, str]],
        token_paths: Sequence[str],
        *,
        crop: bool = False,
        transform=None,
        rgb: int = 3,
    ):
        self.crop = crop
        self.transform = transform
        self.rgb = rgb
        self.vocab = Vocab.from_files(token_paths)
        self.token_to_id = self.vocab.token_to_id
        self.id_to_token = self.vocab.id_to_token
        self.data = [
            {
                "path": p,
                "truth": {
                    "text": truth,
                    "encoded": [
                        self.vocab.sos_id,
                        *self.vocab.encode(truth),
                        self.vocab.eos_id,
                    ],
                },
            }
            for p, truth in groundtruth
        ]

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, i: int) -> Dict:
        item = self.data[i]
        image = load_image(item["path"], self.rgb, self.crop)
        if self.transform is not None:
            image = self.transform(image)
        out = {"path": item["path"], "truth": item["truth"], "image": image}
        if isinstance(image, tuple):
            # canvas transform: (canvas_u8, (h, w)) — the device resize
            # needs each image's valid extent (augment.to_canvas)
            out["image"], (h, w) = image
            out["orig_hw"] = np.array([h, w], np.int32)
        return out


class LoadEvalDataset(LoadDataset):
    """Eval dataset carrying the original file path column
    (reference LoadEvalDataset, dataset.py:86-150)."""

    def __init__(
        self,
        groundtruth: Sequence[Tuple[str, str, str]],  # (path, file_path, truth)
        token_to_id: Dict[str, int],
        id_to_token: Dict[int, str],
        *,
        crop: bool = False,
        transform=None,
        rgb: int = 3,
    ):
        self.crop = crop
        self.transform = transform
        self.rgb = rgb
        self.vocab = Vocab.from_maps(token_to_id, id_to_token)
        self.token_to_id = self.vocab.token_to_id
        self.id_to_token = self.vocab.id_to_token
        self.data = [
            {
                "path": p,
                "file_path": fp,
                "truth": {
                    "text": truth,
                    "encoded": [
                        self.vocab.sos_id,
                        *self.vocab.encode(truth),
                        self.vocab.eos_id,
                    ],
                },
            }
            for p, fp, truth in groundtruth
        ]

    def __getitem__(self, i: int) -> Dict:
        out = super().__getitem__(i)
        out["file_path"] = self.data[i]["file_path"]
        return out

    def size_proxy(self, i: int) -> float:
        """Aspect ratio from the PNG header (no pixel decode): wide images
        hold long formulas, so sorting eval batches by this groups
        similar decode lengths for the early-exit while_loop."""
        from PIL import Image

        with Image.open(self.data[i]["path"]) as im:
            w, h = im.size
        return w / max(h, 1)


class DistillationDataset(LoadDataset):
    """Yields the same image under student & teacher transforms
    (reference dataset.py:152-210)."""

    def __init__(
        self,
        groundtruth,
        token_paths,
        *,
        crop=False,
        student_transform=None,
        teacher_transform=None,
        rgb=3,
    ):
        super().__init__(
            groundtruth, token_paths, crop=crop, transform=None, rgb=rgb
        )
        self.student_transform = student_transform
        self.teacher_transform = teacher_transform

    def __getitem__(self, i: int) -> Dict:
        item = self.data[i]
        image = load_image(item["path"], self.rgb, self.crop)
        return {
            "path": item["path"],
            "truth": item["truth"],
            "student_image": self.student_transform(image)
            if self.student_transform
            else image,
            "teacher_image": self.teacher_transform(image)
            if self.teacher_transform
            else image,
        }
