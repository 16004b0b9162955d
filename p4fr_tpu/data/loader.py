"""Batching & device-feed pipeline (host side).

Replaces torch ``DataLoader`` (reference: data/loader.py) with a thin
thread-prefetched batcher tuned for a TPU feed:

- labels are padded with ``-1`` to a FIXED ``max_label_len`` (the reference
  pads to the per-batch max, which would retrigger XLA compilation per
  length; trainers remap -1 -> pad_id exactly like the reference does);
- images stack to one [B, H, W, C] float32 array;
- ``drop_last=True`` for training (reference loader.py:84-92), and the last
  short batch is padded up to full size for eval so shapes stay static
  (extras are masked out by callers via ``batch["count"]``);
- a background thread keeps ``prefetch`` batches ready so host image
  decode/augment overlaps device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


def collate(
    items: List[Dict], max_label_len: int, image_keys=("image",)
) -> Dict:
    """Stack a list of dataset items into fixed-shape arrays."""
    batch: Dict = {
        "path": [d["path"] for d in items],
        "truth": {"text": [d["truth"]["text"] for d in items]},
        "count": len(items),
    }
    if "file_path" in items[0]:
        batch["file_path"] = [d["file_path"] for d in items]
    encoded = np.full((len(items), max_label_len), -1, np.int32)
    for i, d in enumerate(items):
        ids = d["truth"]["encoded"][:max_label_len]
        encoded[i, : len(ids)] = ids
    batch["truth"]["encoded"] = encoded
    for key in image_keys:
        stacked = np.stack([d[key] for d in items])
        # uint8 stays uint8 (device-side normalization path: 4x less H2D
        # traffic); anything else goes to float32 as before
        if stacked.dtype != np.uint8:
            stacked = stacked.astype(np.float32)
        batch[key] = stacked
    if "orig_hw" in items[0]:
        # canvas feed (device-side resize): per-image valid extents
        batch["orig_hw"] = np.stack(
            [d["orig_hw"] for d in items]
        ).astype(np.int32)
    return batch


class DataLoader:
    """Minimal epoch iterator with shuffling and thread prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        max_label_len: int = 232,
        shuffle: bool = False,
        drop_last: bool = False,
        pad_last: bool = False,
        seed: int = 0,
        prefetch: int = 4,
        image_keys=("image",),
        sort_key=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_label_len = max_label_len
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch
        self.image_keys = image_keys
        # sort_key(index) -> sortable value: batch similar-length items
        # together (stable sort) so an early-exit decode's while_loop,
        # which runs to each BATCH's max length, stops early on the short
        # batches. Mutually exclusive with shuffle.
        self.sort_key = sort_key
        if sort_key is not None and shuffle:
            raise ValueError("sort_key and shuffle are mutually exclusive")

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self) -> List[np.ndarray]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        elif self.sort_key is not None:
            keys = np.asarray([self.sort_key(int(i)) for i in idx])
            idx = idx[np.argsort(keys, kind="stable")]
        batches = []
        for start in range(0, len(idx), self.batch_size):
            chunk = idx[start : start + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                continue
            batches.append(chunk)
        return batches

    def _make_batch(self, chunk: np.ndarray) -> Dict:
        items = [self.dataset[int(i)] for i in chunk]
        count = len(items)
        if self.pad_last and count < self.batch_size:
            items = items + [items[-1]] * (self.batch_size - count)
        batch = collate(items, self.max_label_len, self.image_keys)
        batch["count"] = count
        return batch

    def __iter__(self) -> Iterator[Dict]:
        batches = self._index_batches()
        if self.prefetch <= 0:
            for chunk in batches:
                yield self._make_batch(chunk)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                for chunk in batches:
                    q.put(self._make_batch(chunk))
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item


def dataset_loader(
    options,
    train_transform,
    valid_transform,
    *,
    max_label_len: int = 232,
):
    """Build (train_loader, train_dataset, valid_loader, valid_dataset)
    from a reference-schema config (reference loader.py:64-110)."""
    from p4fr_tpu.data.dataset import LoadDataset, split_gt

    train_data, valid_data = [], []
    for path in options.data.train:
        train, valid = split_gt(path, options.data.fold)
        train_data += train
        valid_data += valid

    token_paths = options.data.token_paths
    train_dataset = LoadDataset(
        train_data,
        token_paths,
        crop=options.data.crop,
        transform=train_transform,
        rgb=options.data.rgb,
    )
    valid_dataset = LoadDataset(
        valid_data,
        token_paths,
        crop=options.data.crop,
        transform=valid_transform,
        rgb=options.data.rgb,
    )
    train_loader = DataLoader(
        train_dataset,
        options.batch_size,
        max_label_len=max_label_len,
        shuffle=True,
        drop_last=True,
        seed=options.seed,
    )
    valid_loader = DataLoader(
        valid_dataset,
        options.batch_size,
        max_label_len=max_label_len,
        shuffle=False,
        pad_last=True,
    )
    return train_loader, train_dataset, valid_loader, valid_dataset
