"""Self-describing checkpoints (native format) + IO helpers.

The reference saves one ``.pth`` per run that embeds the config dict,
vocab maps and metric histories alongside the weights, so inference can
rebuild the exact model with zero external files (reference:
utils/checkpoint.py:7-32, train_modules/train_single_opt.py:489-514).
We keep that self-describing property in a single msgpack file:

    {
      "network": str, "epoch": int,
      "train_losses": [...], ... metric histories ...,
      "configs": {yaml dict}, "token_to_id": {...}, "id_to_token": {...},
      "params": pytree, "batch_stats": pytree, "opt_state": state-dict,
      "scheduler": {...}, "tf_scheduler": {...},
    }

Weights for ``opt_state`` are stored as a flax state-dict and re-hydrated
against a freshly ``optimizer.init``-ed structure. The ``.pth`` converter
lives in ``utils/convert_pth.py``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

default_checkpoint: Dict[str, Any] = {
    "epoch": 0,
    "train_losses": [],
    "train_symbol_accuracy": [],
    "train_sentence_accuracy": [],
    "train_wer": [],
    "validation_losses": [],
    "validation_symbol_accuracy": [],
    "validation_sentence_accuracy": [],
    "validation_wer": [],
    "lr": [],
    "grad_norm": [],
    "params": None,
    "batch_stats": None,
    "opt_state": None,
    "configs": {},
    "token_to_id": {},
    "id_to_token": {},
    "network": "",
    "scheduler": {},
    "tf_scheduler": {},
}


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    checkpoint: Dict[str, Any], dir: str = "./checkpoints", prefix: str = ""
) -> str:
    """Write ``{prefix}/{dir}/{network}_best_model.ckpt`` (msgpack)."""
    out_dir = os.path.join(prefix, dir)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{checkpoint['network']}_best_model.ckpt")
    payload = dict(checkpoint)
    for key in ("params", "batch_stats", "opt_state"):
        if payload.get(key) is not None:
            payload[key] = _to_numpy(serialization.to_state_dict(payload[key]))
    # msgpack dict keys must be uniform; stringify id_to_token int keys
    if payload.get("id_to_token"):
        payload["id_to_token"] = {
            str(k): v for k, v in payload["id_to_token"].items()
        }
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload, in_place=True))
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Read a native checkpoint; pytrees come back as nested dicts.

    ``params``/``batch_stats`` nested dicts are directly usable as flax
    variable collections; ``opt_state`` must be restored with
    ``restore_opt_state`` against a live optimizer structure.
    """
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    if payload.get("id_to_token"):
        payload["id_to_token"] = {
            int(k): v for k, v in payload["id_to_token"].items()
        }
    return payload


def restore_opt_state(opt_state_template, state_dict) -> Any:
    """Re-hydrate a serialized opt state against optimizer.init(params)."""
    return serialization.from_state_dict(opt_state_template, state_dict)


def make_checkpoint(
    *,
    network: str,
    epoch: int,
    params,
    batch_stats,
    opt_state,
    configs: Dict,
    token_to_id: Dict,
    id_to_token: Dict,
    histories: Optional[Dict] = None,
    scheduler: Optional[Dict] = None,
    tf_scheduler: Optional[Dict] = None,
) -> Dict[str, Any]:
    ckpt = dict(default_checkpoint)
    ckpt.update(histories or {})
    ckpt.update(
        network=network,
        epoch=epoch,
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        configs=configs,
        token_to_id=token_to_id,
        id_to_token=id_to_token,
        scheduler=scheduler or {},
        tf_scheduler=tf_scheduler or {},
    )
    return ckpt
