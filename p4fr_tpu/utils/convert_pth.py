"""Reference ``.pth`` checkpoint -> native TPU checkpoint converter.

The reference's checkpoints are self-describing torch files embedding the
model state_dict, config dict and vocab maps (reference:
utils/checkpoint.py:7-32). This module maps those state_dicts onto our
flax parameter trees so reference-trained weights run on TPU:

    python -m p4fr_tpu.utils.convert_pth ref.pth out.ckpt

Key-mapping is rule-based per family (regex -> flax path + transform):

- Linear  weight [O,I]      -> kernel [I,O] (transpose)
- Conv2d  weight [O,I,kh,kw]-> kernel [kh,kw,I,O]
- depthwise conv [C,1,k,k]  -> kernel [k,k,1,C]
- BatchNorm weight/bias     -> scale/bias; running stats -> batch_stats
- LayerNorm weight          -> scale
- Embedding / LSTM weights  -> unchanged layout (our cells use torch layout)

The converted checkpoint preserves the self-describing property (configs,
token maps, epoch) so ``inference.py --checkpoint out.ckpt`` just works.
Conversion requires ``reference_parity: True`` model configs (the default)
for bit-compatible behavior.
"""

from __future__ import annotations

import re
import sys
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np


def _t_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _t_conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _t_depthwise(w: np.ndarray) -> np.ndarray:
    # torch [C, 1, kh, kw] -> flax [kh, kw, 1, C]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _identity(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w)


# ---------------------------------------------------------------------------
# rule tables: (regex on torch key) -> (flax path template, transform, coll)
# coll: "params" | "batch_stats"
# ---------------------------------------------------------------------------

Rule = Tuple[str, str, Callable[[np.ndarray], np.ndarray], str]


def _norm_rules(torch_prefix: str, flax_prefix: str) -> List[Rule]:
    """BatchNorm2d param/stat rules."""
    return [
        (rf"{torch_prefix}\.weight$", f"{flax_prefix}/scale", _identity, "params"),
        (rf"{torch_prefix}\.bias$", f"{flax_prefix}/bias", _identity, "params"),
        (rf"{torch_prefix}\.running_mean$", f"{flax_prefix}/mean", _identity,
         "batch_stats"),
        (rf"{torch_prefix}\.running_var$", f"{flax_prefix}/var", _identity,
         "batch_stats"),
        (rf"{torch_prefix}\.num_batches_tracked$", "", _identity, "drop"),
    ]


def _ln_rules(torch_prefix: str, flax_prefix: str) -> List[Rule]:
    return [
        (rf"{torch_prefix}\.weight$", f"{flax_prefix}/scale", _identity, "params"),
        (rf"{torch_prefix}\.bias$", f"{flax_prefix}/bias", _identity, "params"),
    ]


def _linear_rules(torch_prefix: str, flax_prefix: str) -> List[Rule]:
    return [
        (rf"{torch_prefix}\.weight$", f"{flax_prefix}/kernel", _t_linear, "params"),
        (rf"{torch_prefix}\.bias$", f"{flax_prefix}/bias", _identity, "params"),
    ]


def _conv_rules(torch_prefix: str, flax_prefix: str, depthwise=False) -> List[Rule]:
    t = _t_depthwise if depthwise else _t_conv
    return [
        (rf"{torch_prefix}\.weight$", f"{flax_prefix}/kernel", t, "params"),
        (rf"{torch_prefix}\.bias$", f"{flax_prefix}/bias", _identity, "params"),
    ]


def _mha_rules(torch_prefix: str, flax_prefix: str) -> List[Rule]:
    rules: List[Rule] = []
    for name in ("q_linear", "k_linear", "v_linear", "out_linear"):
        rules += _linear_rules(
            rf"{torch_prefix}\.{name}", f"{flax_prefix}/{name}"
        )
    return rules


def _transformer_decoder_rules() -> List[Rule]:
    """decoder.* of the SATRN/SWIN families -> models.common naming."""
    p = r"decoder\.attention_layers\.(\d+)"
    f = r"decoder/layer\1"
    rules: List[Rule] = [
        (r"decoder\.embedding\.weight$", "decoder/embedding/embedding",
         _identity, "params"),
    ]
    rules += _mha_rules(rf"{p}\.self_attention_layer", rf"{f}/self_attention")
    rules += _ln_rules(rf"{p}\.self_attention_norm", rf"{f}/self_attention_norm")
    rules += _mha_rules(rf"{p}\.attention_layer", rf"{f}/cross_attention")
    rules += _ln_rules(rf"{p}\.attention_norm", rf"{f}/cross_attention_norm")
    rules += _linear_rules(
        rf"{p}\.feedforward_layer\.linear0", rf"{f}/feedforward/linear0"
    )
    rules += _linear_rules(
        rf"{p}\.feedforward_layer\.linear1", rf"{f}/feedforward/linear1"
    )
    rules += _ln_rules(rf"{p}\.feedforward_norm", rf"{f}/feedforward_norm")
    rules += _linear_rules(r"decoder\.generator", "decoder/generator")
    return rules


# timm efficientnetv2-s block layout per stage (type, n_bns)
_EFF_STAGE_TYPES = ["cba", "er", "er", "ir", "ir", "ir"]


def _efficientnet_rules(torch_root: str, flax_root: str) -> List[Rule]:
    """timm ``blocks.{s}.{b}`` -> our ``stage{s}_block{b}`` naming."""
    rules: List[Rule] = []
    b = rf"{torch_root}\.(\d+)\.(\d+)"
    fb = rf"{flax_root}/stage\1_block\2"
    # ConvBnAct (stage 0)
    rules += _conv_rules(rf"{b}\.conv", rf"{fb}/conv")
    # EdgeResidual / fused (stages 1-2)
    rules += _conv_rules(rf"{b}\.conv_exp", rf"{fb}/conv_exp")
    # InvertedResidual (stages 3-5)
    rules += _conv_rules(rf"{b}\.conv_pw", rf"{fb}/conv_pw")
    rules += [
        (rf"{b}\.conv_dw\.weight$", rf"{fb}/conv_dw/kernel", _t_depthwise,
         "params"),
    ]
    rules += _conv_rules(rf"{b}\.se\.conv_reduce", rf"{fb}/se/conv_reduce")
    rules += _conv_rules(rf"{b}\.se\.conv_expand", rf"{fb}/se/conv_expand")
    rules += _conv_rules(rf"{b}\.conv_pwl", rf"{fb}/conv_pwl")
    for bn in ("bn1", "bn2", "bn3"):
        rules += _norm_rules(rf"{b}\.{bn}", rf"{fb}/{bn}")
    return rules


def satrn_rules(backbone: str) -> List[Rule]:
    rules: List[Rule] = []
    if backbone == "shallow":
        root = r"encoder\.shallow_cnn"
        froot = "encoder/shallow_cnn"
        for i in range(4):
            rules += _conv_rules(rf"{root}\.conv{i}", rf"{froot}/conv{i}")
            rules += _norm_rules(rf"{root}\.batch_norm{i}", rf"{froot}/bn{i}")
    else:  # EfficientNet wrapper (EfficientSATRN.py:63-87)
        root = r"encoder\.shallow_cnn"
        froot = "encoder/efficientnet"
        rules += _conv_rules(rf"{root}\.conv_stem", rf"{froot}/conv_stem")
        rules += _norm_rules(rf"{root}\.bn1", rf"{froot}/bn1")
        rules += _efficientnet_rules(rf"{root}\.eff_block", rf"{froot}/blocks")
        rules += _conv_rules(rf"{root}\.conv_last", rf"{froot}/conv_last")
        rules += _norm_rules(rf"{root}\.bn2", rf"{froot}/bn2")

    pe = r"encoder\.positional_encoding"
    rules += _linear_rules(rf"{pe}\.dense0", "encoder/positional_encoding/dense0")
    rules += _linear_rules(rf"{pe}\.dense1", "encoder/positional_encoding/dense1")

    el = r"encoder\.attention_layers\.(\d+)"
    fl = r"encoder/layer\1"
    rules += _ln_rules(rf"{el}\.norm", rf"{fl}/norm")
    rules += _mha_rules(rf"{el}\.attention_layer", rf"{fl}/attention")
    rules += _conv_rules(rf"{el}\.conv0", rf"{fl}/conv0")
    rules += _norm_rules(rf"{el}\.norm0", rf"{fl}/bn0")
    rules += [
        (rf"{el}\.depthwise\.weight$", rf"{fl}/depthwise/kernel",
         _t_depthwise, "params"),
        (rf"{el}\.depthwise\.bias$", rf"{fl}/depthwise/bias", _identity,
         "params"),
    ]
    rules += _norm_rules(rf"{el}\.depthwise_norm", rf"{fl}/bn_depth")
    rules += _conv_rules(rf"{el}\.conv1", rf"{fl}/conv1")
    rules += _norm_rules(rf"{el}\.norm1", rf"{fl}/bn1")

    rules += _transformer_decoder_rules()
    return rules


def aster_rules() -> List[Rule]:
    rules: List[Rule] = []
    cnn = r"encoder\.cnn"
    f = "encoder/cnn"
    rules += _conv_rules(rf"{cnn}\.conv_stem", rf"{f}/conv_stem")
    rules += _norm_rules(rf"{cnn}\.bn1", rf"{f}/bn1")
    rules += _efficientnet_rules(rf"{cnn}\.eff_blocks", rf"{f}/blocks")
    # convRelu stages: conv1 holds conv4/batchnorm4, conv3 holds conv6/batchnorm6
    rules += _conv_rules(rf"{cnn}\.conv1\.conv4", rf"{f}/conv1")
    rules += _norm_rules(rf"{cnn}\.conv1\.batchnorm4", rf"{f}/conv1_bn")
    rules += _conv_rules(rf"{cnn}\.conv3\.conv6", rf"{f}/conv3")
    rules += _norm_rules(rf"{cnn}\.conv3\.batchnorm6", rf"{f}/conv3_bn")
    # BLSTM: torch l{k}[_reverse] -> l{k}_{fwd,bwd}/cell
    for k in range(2):
        for suffix, d in (("", "fwd"), ("_reverse", "bwd")):
            for w in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                rules.append(
                    (
                        rf"encoder\.blstm\.{w}_l{k}{suffix}$",
                        f"encoder/blstm/l{k}_{d}/cell/{w}",
                        _identity,
                        "params",
                    )
                )
    rules += _linear_rules(r"encoder\.proj", "encoder/proj")

    ac = r"decoder\.attention_cell"
    rules += [
        (r"decoder\.embedding\.weight$", "embedding/embedding", _identity,
         "params"),
    ]
    rules += _linear_rules(rf"{ac}\.i2h", "attention_cell/i2h")
    rules += _linear_rules(rf"{ac}\.h2h", "attention_cell/h2h")
    rules += _linear_rules(rf"{ac}\.score", "attention_cell/score")
    for w in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
        rules.append(
            (rf"{ac}\.rnn\.(\d+)\.{w}$", rf"attention_cell/cell\1/{w}",
             _identity, "params")
        )
        # single-layer decoders use a bare LSTMCell at .rnn
        rules.append(
            (rf"{ac}\.rnn\.{w}$", rf"attention_cell/cell0/{w}", _identity,
             "params")
        )
    rules += _linear_rules(r"decoder\.generator", "generator")
    return rules


def swin_rules() -> List[Rule]:
    rules: List[Rule] = []
    rules += _conv_rules(r"encoder\.patch_embed\.proj", "encoder/patch_embed")
    rules += _ln_rules(r"encoder\.patch_embed\.norm", "encoder/patch_norm")
    blk = r"encoder\.layers\.(\d+)\.blocks\.(\d+)"
    fb = r"encoder/stage\1_block\2"
    rules += _ln_rules(rf"{blk}\.norm1", rf"{fb}/norm1")
    rules += _linear_rules(rf"{blk}\.attn\.qkv", rf"{fb}/attn/qkv")
    rules += _linear_rules(rf"{blk}\.attn\.proj", rf"{fb}/attn/proj")
    rules += [
        (rf"{blk}\.attn\.relative_position_bias_table$",
         rf"{fb}/attn/relative_position_bias_table", _identity, "params"),
        (rf"{blk}\.attn\.relative_position_index$", "", _identity, "drop"),
    ]
    rules += _ln_rules(rf"{blk}\.norm2", rf"{fb}/norm2")
    rules += _linear_rules(rf"{blk}\.mlp\.fc1", rf"{fb}/mlp_fc1")
    rules += _linear_rules(rf"{blk}\.mlp\.fc2", rf"{fb}/mlp_fc2")
    ds = r"encoder\.layers\.(\d+)\.downsample"
    rules += _ln_rules(rf"{ds}\.norm", r"encoder/stage\1_merge/norm")
    rules += [
        (rf"{ds}\.reduction\.weight$", r"encoder/stage\1_merge/reduction/kernel",
         _t_linear, "params"),
    ]
    rules += _ln_rules(r"encoder\.norm", "encoder/norm")
    # classification head exists in the reference model but is unused
    rules += [
        (r"encoder\.head\..*$", "", _identity, "drop"),
        (r"encoder\.avgpool.*$", "", _identity, "drop"),
    ]
    rules += _transformer_decoder_rules()
    return rules


def rules_for(network: str) -> List[Rule]:
    if network in ("LiteSATRN",):
        return satrn_rules("shallow")
    if network in ("EfficientSATRN", "MySATRN"):
        return satrn_rules("efficientnetv2s")
    if network in ("EfficientASTER", "ASTER"):
        return aster_rules()
    if network in ("SWIN", "SwinTRN"):
        return swin_rules()
    raise NotImplementedError(network)


def _set_path(tree: Dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def convert_state_dict(
    network: str, state_dict: Dict[str, Any]
) -> Tuple[Dict, Dict, List[str]]:
    """-> (params, batch_stats, unmatched_keys)."""
    compiled = [
        (re.compile(pat), repl, t, coll) for pat, repl, t, coll in rules_for(network)
    ]
    params: Dict = {}
    batch_stats: Dict = {}
    unmatched: List[str] = []
    for key, value in state_dict.items():
        arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach")
                         else value)
        for pat, repl, transform, coll in compiled:
            m = pat.match(key)
            if m:
                if coll == "drop":
                    break
                path = pat.sub(repl, key)
                if coll == "params":
                    _set_path(params, path, transform(arr))
                else:
                    _set_path(batch_stats, path, transform(arr))
                break
        else:
            unmatched.append(key)
    return params, batch_stats, unmatched


def convert_pth(pth_path: str, out_path: str, *, strict: bool = True) -> str:
    """Full checkpoint conversion incl. configs/vocab/epoch."""
    import torch

    from p4fr_tpu.utils import checkpoint as ckpt_io

    ckpt = torch.load(pth_path, map_location="cpu", weights_only=False)
    network = ckpt.get("network") or ckpt["configs"].get("network")
    state_dict = ckpt.get("model") or ckpt.get("model_state_dict")
    params, batch_stats, unmatched = convert_state_dict(network, state_dict)
    if unmatched:
        msg = f"[convert_pth] {len(unmatched)} unmatched keys: {unmatched[:8]}..."
        if strict:
            raise ValueError(msg)
        print(msg, file=sys.stderr)

    native = ckpt_io.make_checkpoint(
        network=network,
        epoch=int(ckpt.get("epoch", 0)),
        params=params,
        batch_stats=batch_stats,
        opt_state=None,
        configs=dict(ckpt.get("configs", {})),
        token_to_id=dict(ckpt.get("token_to_id", {})),
        id_to_token=dict(ckpt.get("id_to_token", {})),
    )
    import os

    out_dir = os.path.dirname(os.path.abspath(out_path))
    os.makedirs(out_dir, exist_ok=True)
    # save_checkpoint derives the filename; write directly instead
    from flax import serialization

    payload = dict(native)
    payload["id_to_token"] = {str(k): v for k, v in payload["id_to_token"].items()}
    with open(out_path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload, in_place=True))
    return out_path


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print("usage: python -m p4fr_tpu.utils.convert_pth ref.pth out.ckpt")
        sys.exit(1)
    print(convert_pth(sys.argv[1], sys.argv[2]))
