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
    # np.array(copy=True), NOT ascontiguousarray: the input is usually a
    # numpy VIEW of a live torch tensor (state_dict -> .numpy()), and
    # ascontiguousarray is a no-op for contiguous arrays — the converted
    # tree would silently alias torch storage and mutate if the torch
    # model keeps training (bit us in the trainer-parity oracle)
    return np.array(w, copy=True)


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


def _transformer_decoder_rules(ff_naming: str = "linear") -> List[Rule]:
    """decoder.* of the SATRN/SWIN families -> models.common naming.

    ``ff_naming``: the LiteSATRN/EfficientSATRN Feedforward names its
    Linears ``linear0``/``linear1`` (LiteSATRN.py:307-315); SWIN.py's
    Feedforward is an ``nn.Sequential`` whose Linears sit at indices 0
    and 3 (``feedforward_layer.layers.{0,3}``, SWIN.py:827-841) — pass
    "sequential" for that family (caught by the r5 trained-SWIN parity
    test; the old linear-only rules left SWIN decoder FF weights
    unconverted)."""
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
    if ff_naming == "sequential":
        rules += _linear_rules(
            rf"{p}\.feedforward_layer\.layers\.0", rf"{f}/feedforward/linear0"
        )
        rules += _linear_rules(
            rf"{p}\.feedforward_layer\.layers\.3", rf"{f}/feedforward/linear1"
        )
    else:
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
    # DeepCNN defines a conv2 stage its forward never calls
    # (EfficientASTER.py:35 vs :39-48) — dead weights, dropped
    rules += [(rf"{cnn}\.conv2\..*$", "", _identity, "drop")]
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
    # the reference SWIN runs its encoder with ape=True (SWIN.py:1028):
    # the learned absolute position embedding is trained state and MUST
    # convert (the hub-backbone rules still drop the key — that file
    # never carries a trained one)
    rules += [
        (r"encoder\.absolute_pos_embed$", "encoder/absolute_pos_embed",
         _identity, "params"),
    ]
    blk = r"encoder\.layers\.(\d+)\.blocks\.(\d+)"
    fb = r"encoder/stage\1_block\2"
    rules += _ln_rules(rf"{blk}\.norm1", rf"{fb}/norm1")
    rules += _linear_rules(rf"{blk}\.attn\.qkv", rf"{fb}/attn/qkv")
    rules += _linear_rules(rf"{blk}\.attn\.proj", rf"{fb}/attn/proj")
    rules += [
        (rf"{blk}\.attn\.relative_position_bias_table$",
         rf"{fb}/attn/relative_position_bias_table", _identity, "params"),
        (rf"{blk}\.attn\.relative_position_index$", "", _identity, "drop"),
        # the reference's SWIN.py registers the shifted-window mask as a
        # PERSISTENT buffer (networks/SWIN.py:313 register_buffer), so
        # real checkpoints carry it; we recompute it from shape
        (rf"{blk}\.attn_mask$", "", _identity, "drop"),
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
    rules += _transformer_decoder_rules(ff_naming="sequential")
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


# ---------------------------------------------------------------------------
# raw pretrained-backbone importers (training-from-scratch bootstrap)
#
# The reference initializes its backbones from public torch weights at
# construction time: timm's tf_efficientnetv2_s_in21ft1k blocks
# (reference: networks/EfficientSATRN.py:63-87) and the Microsoft
# swin_base_patch4_window12_384_22k.pth hub file (networks/SWIN.py:1028-1034).
# This environment has no network access, so the equivalent path is:
# download the file offline, then convert it here and graft it into a
# freshly-initialized model's variables before training.
# ---------------------------------------------------------------------------


def _pattern_skeleton(pattern: str) -> str:
    """Regex rule pattern -> readable key template for diff hints."""
    s = pattern.rstrip("$")
    s = s.replace(r"\.", ".")
    s = re.sub(r"\(\\d\+\)", "N", s)
    return s.replace("\\", "")


def unmatched_report(
    rules: List[Rule], state_dict: Dict[str, Any], unmatched: List[str]
) -> str:
    """Actionable diagnostic for a drifted real checkpoint: each unmatched
    torch key with its shape and the closest rule templates, so the first
    real-file conversion failure points at which rule to fix instead of
    hard-failing with a bare key list (the timm/hub key names were
    inferred from source and may drift across versions)."""
    import difflib

    skeletons = sorted({_pattern_skeleton(p) for p, _, _, c in rules})
    lines = [f"{len(unmatched)} unmatched torch keys:"]
    for key in unmatched:
        v = state_dict.get(key)
        arr = (
            v.detach().cpu().numpy()
            if hasattr(v, "detach")
            else np.asarray(v)
        )
        close = difflib.get_close_matches(key, skeletons, n=2, cutoff=0.4)
        hint = " | ".join(close) if close else "(no close rule)"
        lines.append(f"  {key} shape={tuple(arr.shape)}")
        lines.append(f"    nearest rule(s): {hint}")
    matched_n = len(state_dict) - len(unmatched)
    lines.append(
        f"({matched_n}/{len(state_dict)} keys matched; fix the rule "
        f"table or pass strict=False/--report to convert what matched)"
    )
    return "\n".join(lines)


def _load_torch_state_dict(src) -> Dict[str, Any]:
    """Accept a path, a state_dict, or a wrapped checkpoint dict."""
    if isinstance(src, str):
        import torch

        src = torch.load(src, map_location="cpu", weights_only=False)
    if hasattr(src, "state_dict"):
        src = src.state_dict()
    # hub checkpoints nest the weights under 'model' or 'state_dict'
    for key in ("model", "state_dict"):
        if key in src and isinstance(src[key], dict) and any(
            hasattr(v, "shape") or isinstance(v, np.ndarray)
            for v in src[key].values()
        ):
            src = src[key]
            break
    return src


def _apply_rules(
    state_dict: Dict[str, Any], rules: List[Rule]
) -> Tuple[Dict, Dict, List[str]]:
    compiled = [(re.compile(p), r, t, c) for p, r, t, c in rules]
    params: Dict = {}
    batch_stats: Dict = {}
    unmatched: List[str] = []
    for key, value in state_dict.items():
        arr = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value
        )
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


def timm_efficientnetv2_rules() -> List[Rule]:
    """Raw timm ``tf_efficientnetv2_s*`` state_dict -> our
    ``EfficientNetV2Blocks`` tree. The reference keeps only ``m.blocks``
    and discards timm's stem/head/classifier (EfficientSATRN.py:66-80)."""
    rules = _efficientnet_rules(r"blocks", "")
    # strip the leading "/" the empty flax_root leaves behind
    rules = [(p, r.lstrip("/"), t, c) for p, r, t, c in rules]
    rules += [
        (r"conv_stem\..*$", "", _identity, "drop"),
        (r"bn1\..*$", "", _identity, "drop"),
        (r"conv_head\..*$", "", _identity, "drop"),
        (r"bn2\..*$", "", _identity, "drop"),
        (r"classifier\..*$", "", _identity, "drop"),
    ]
    return rules


def convert_timm_efficientnetv2(src, *, strict: bool = True):
    """timm EfficientNetV2-S weights -> (params, batch_stats) for
    ``EfficientNetV2Blocks`` (the ``blocks`` submodule of our backbones).

    ``src``: path to a .pth/.bin file, a torch module, or a state_dict.
    """
    state_dict = _load_torch_state_dict(src)
    params, batch_stats, unmatched = _apply_rules(
        state_dict, timm_efficientnetv2_rules()
    )
    if unmatched and strict:
        raise ValueError(
            "[convert_timm_efficientnetv2] "
            + unmatched_report(
                timm_efficientnetv2_rules(), state_dict, unmatched
            )
        )
    return params, batch_stats, unmatched


def swin_hub_rules() -> List[Rule]:
    """Official ``swin_base_patch4_window12_384_22k.pth`` state_dict
    (keys unprefixed: patch_embed.*, layers.*) -> our SwinEncoder tree."""
    rules: List[Rule] = []
    rules += _conv_rules(r"patch_embed\.proj", "patch_embed")
    rules += _ln_rules(r"patch_embed\.norm", "patch_norm")
    blk = r"layers\.(\d+)\.blocks\.(\d+)"
    fb = r"stage\1_block\2"
    rules += _ln_rules(rf"{blk}\.norm1", rf"{fb}/norm1")
    rules += _linear_rules(rf"{blk}\.attn\.qkv", rf"{fb}/attn/qkv")
    rules += _linear_rules(rf"{blk}\.attn\.proj", rf"{fb}/attn/proj")
    rules += [
        (rf"{blk}\.attn\.relative_position_bias_table$",
         rf"{fb}/attn/relative_position_bias_table", _identity, "params"),
        (rf"{blk}\.attn\.relative_position_index$", "", _identity, "drop"),
        (rf"{blk}\.attn_mask$", "", _identity, "drop"),
    ]
    rules += _ln_rules(rf"{blk}\.norm2", rf"{fb}/norm2")
    rules += _linear_rules(rf"{blk}\.mlp\.fc1", rf"{fb}/mlp_fc1")
    rules += _linear_rules(rf"{blk}\.mlp\.fc2", rf"{fb}/mlp_fc2")
    ds = r"layers\.(\d+)\.downsample"
    rules += _ln_rules(rf"{ds}\.norm", r"stage\1_merge/norm")
    rules += [
        (rf"{ds}\.reduction\.weight$", r"stage\1_merge/reduction/kernel",
         _t_linear, "params"),
    ]
    rules += _ln_rules(r"norm", "norm")
    rules += [
        (r"head\..*$", "", _identity, "drop"),
        (r"absolute_pos_embed$", "", _identity, "drop"),
        (r"avgpool.*$", "", _identity, "drop"),
    ]
    return rules


def convert_swin_hub(src, *, strict: bool = True):
    """Microsoft Swin hub weights -> (params, batch_stats) for our
    ``SwinEncoder`` (batch_stats always empty — Swin has no BN)."""
    state_dict = _load_torch_state_dict(src)
    params, batch_stats, unmatched = _apply_rules(state_dict, swin_hub_rules())
    if unmatched and strict:
        raise ValueError(
            "[convert_swin_hub] "
            + unmatched_report(swin_hub_rules(), state_dict, unmatched)
        )
    return params, batch_stats, unmatched


def graft_backbone(variables, params: Dict, batch_stats: Dict, path):
    """Replace the subtree of ``variables`` at ``path`` (a tuple of keys,
    e.g. ``("encoder", "efficientnet", "blocks")``) with converted
    pretrained weights, checking every leaf shape.

    Returns a new plain-dict variables tree; raises on missing keys or
    shape mismatches so drift fails loudly at graft time, not mid-train.
    """
    import jax

    def replace(tree, coll_new, coll_name):
        node = tree
        for p in path[:-1]:
            if p not in node:
                raise KeyError(
                    f"[graft_backbone] {coll_name}: no {'/'.join(path)} "
                    f"in model variables (missing {p!r})"
                )
            node = node[p]
        old = node.get(path[-1])
        if old is None:
            raise KeyError(f"[graft_backbone] {coll_name}: missing {path[-1]!r}")
        old_leaves = {
            "/".join(k.key for k in kp): v.shape
            for kp, v in jax.tree_util.tree_flatten_with_path(old)[0]
        }
        new_leaves = {
            "/".join(k.key for k in kp): v.shape
            for kp, v in jax.tree_util.tree_flatten_with_path(coll_new)[0]
        }
        if old_leaves != new_leaves:
            missing = sorted(set(old_leaves) - set(new_leaves))[:5]
            extra = sorted(set(new_leaves) - set(old_leaves))[:5]
            shapes = [
                f"{k}: {old_leaves[k]} != {new_leaves[k]}"
                for k in old_leaves
                if k in new_leaves and old_leaves[k] != new_leaves[k]
            ][:5]
            raise ValueError(
                f"[graft_backbone] {coll_name} mismatch at {'/'.join(path)}: "
                f"missing={missing} extra={extra} shapes={shapes}"
            )
        node[path[-1]] = coll_new

    variables = jax.tree_util.tree_map(lambda x: x, dict(variables))  # deep-ish copy
    variables["params"] = _to_plain_dict(variables["params"])
    replace(variables["params"], params, "params")
    if batch_stats:
        variables["batch_stats"] = _to_plain_dict(
            variables.get("batch_stats", {})
        )
        replace(variables["batch_stats"], batch_stats, "batch_stats")
    return variables


def _to_plain_dict(tree):
    if isinstance(tree, dict):
        return {k: _to_plain_dict(v) for k, v in tree.items()}
    if hasattr(tree, "items"):  # FrozenDict
        return {k: _to_plain_dict(v) for k, v in tree.items()}
    return tree


# graft location of each family's pretrained backbone inside the model
# variables tree
_BACKBONE_PATHS = {
    "EfficientSATRN": ("encoder", "efficientnet", "blocks"),
    "MySATRN": ("encoder", "efficientnet", "blocks"),
    "EfficientASTER": ("encoder", "cnn", "blocks"),
    "ASTER": ("encoder", "cnn", "blocks"),
    "SWIN": ("encoder",),
    "SwinTRN": ("encoder",),
}


def bootstrap_pretrained(variables, network: str, pretrained_cfg) -> Dict:
    """Training-from-scratch bootstrap: graft offline-downloaded public
    weights into freshly-initialized model variables.

    ``pretrained_cfg``: dict-like with optional keys

    - ``efficientnetv2``: path to a raw timm tf_efficientnetv2_s .pth/.bin
      (reference downloads it at construction, EfficientSATRN.py:63-87)
    - ``swin``: path to swin_base_patch4_window12_384_22k.pth
      (reference: SWIN.py:1028-1034)

    Returns (possibly new) variables. Raises instead of silently training
    from random init when ``pretrained_cfg`` is set but unusable (wrong
    type, unknown network, or no matching key) — a silent no-op here
    costs a full training run before anyone notices.
    """
    if not hasattr(pretrained_cfg, "get"):
        raise ValueError(
            "pretrained config must be a mapping with keys "
            "'efficientnetv2' and/or 'swin' (got "
            f"{type(pretrained_cfg).__name__}: {pretrained_cfg!r}); e.g. "
            "pretrained: {efficientnetv2: /path/to/timm.pth}"
        )
    get = pretrained_cfg.get
    path = _BACKBONE_PATHS.get(network)
    if path is None:
        raise ValueError(
            f"network {network!r} has no pretrained-backbone graft point "
            f"(known: {sorted(_BACKBONE_PATHS)}); remove the 'pretrained' "
            "config entry"
        )
    key = "swin" if network in ("SWIN", "SwinTRN") else "efficientnetv2"
    src = get(key)
    if not src:
        raise ValueError(
            f"'pretrained' is set but has no {key!r} entry for network "
            f"{network!r} (got keys {sorted(pretrained_cfg)})"
        )
    if key == "swin":
        params, stats, _ = convert_swin_hub(src)
        # the hub file carries no absolute_pos_embed; the reference's
        # strict=False load (SWIN.py:1033) keeps the model's own
        # trunc-normal init for it — mirror that by carrying the
        # current value through the graft
        node = variables.get("params", {})
        for p in path:
            node = node.get(p, {})
        if "absolute_pos_embed" in node and (
            "absolute_pos_embed" not in params
        ):
            params = dict(params)
            params["absolute_pos_embed"] = node["absolute_pos_embed"]
    else:
        params, stats, _ = convert_timm_efficientnetv2(src)
    return graft_backbone(dict(variables), params, stats, path)


# ---------------------------------------------------------------------------
# inverse direction: flax trees -> reference-named torch state_dict
#
# Derived mechanically from the SAME rule tables, so the two directions
# cannot drift: each forward rule (torch_regex -> flax_template,
# transform) inverts to (flax_regex -> torch_template, inverse
# transform). "drop" rules have no inverse — the dropped keys are
# derived buffers the reference modules recompute in __init__
# (relative_position_index, attn_mask, num_batches_tracked).
# ---------------------------------------------------------------------------

_INV_TRANSFORM = {}


def _inv_conv(w: np.ndarray) -> np.ndarray:
    # flax [kh, kw, I, O] -> torch [O, I, kh, kw]
    return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))


_INV_TRANSFORM[_identity] = _identity
_INV_TRANSFORM[_t_linear] = _t_linear  # transpose is its own inverse
_INV_TRANSFORM[_t_conv] = _inv_conv
_INV_TRANSFORM[_t_depthwise] = _inv_conv


def _invert_rule(pattern: str, template: str):
    """(torch_regex, flax_template) -> (flax_regex, backref_order).

    flax templates contain only literals and ``\\N`` backrefs into the
    torch pattern's ``(\\d+)`` groups; everything else in the rule
    tables is literal."""
    parts = re.split(r"(\\\d)", template)
    flax_pat = "^"
    order = []
    for p in parts:
        if re.fullmatch(r"\\\d", p):
            order.append(int(p[1]))
            flax_pat += r"(\d+)"
        else:
            flax_pat += re.escape(p)
    return re.compile(flax_pat + "$"), order


def _torch_key(pattern: str, groups: Dict[int, str]) -> str:
    """Fill the torch regex's ``(\\d+)`` groups with captured values and
    unescape the remaining literals."""
    counter = [0]

    def sub(_m):
        counter[0] += 1
        return groups[counter[0]]

    s = re.sub(r"\(\\d\+\)", sub, pattern.rstrip("$"))
    return re.sub(r"\\(.)", r"\1", s)


def export_state_dict(
    network: str, params: Dict, batch_stats: Optional[Dict] = None
) -> Tuple[Dict[str, np.ndarray], List[str]]:
    """flax (params, batch_stats) -> reference-named numpy state_dict.

    Returns ``(state_dict, unmatched_flax_paths)``. Loading the result
    into the real reference module requires no strictness relaxations:
    the only torch-side keys we never emit are the derived buffers its
    constructors rebuild (see note above), which torch's
    ``load_state_dict`` tolerates. Wrap values in ``torch.tensor`` (or
    use :func:`export_pth`) for a loadable ``.pth``."""
    inverted = []
    for pat, repl, transform, coll in rules_for(network):
        if coll == "drop" or not repl:
            continue
        flax_re, order = _invert_rule(pat, repl)
        inverted.append((flax_re, order, pat, _INV_TRANSFORM[transform]))

    def flatten(tree, prefix=""):
        out = {}
        for k, v in (tree or {}).items():
            path = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                out.update(flatten(v, path))
            else:
                out[path] = np.asarray(v)
        return out

    flat = flatten(params)
    flat.update(flatten(batch_stats))
    sd: Dict[str, np.ndarray] = {}
    unmatched: List[str] = []
    for path, arr in flat.items():
        for flax_re, order, pat, inv in inverted:
            m = flax_re.match(path)
            if m:
                groups = {n: g for n, g in zip(order, m.groups())}
                sd[_torch_key(pat, groups)] = inv(arr)
                break
        else:
            unmatched.append(path)

    if network in ("EfficientASTER", "ASTER"):
        # single-layer decoders keep a bare LSTMCell at .rnn (the
        # ModuleList naming only exists for num_layers > 1)
        if not any(
            k.startswith("decoder.attention_cell.rnn.1.") for k in sd
        ):
            sd = {
                k.replace(
                    "decoder.attention_cell.rnn.0.",
                    "decoder.attention_cell.rnn.",
                ): v
                for k, v in sd.items()
            }
    return sd, unmatched


def export_pth(ckpt_path: str, out_path: str) -> str:
    """Native msgpack checkpoint -> reference-format ``.pth``
    (self-describing: model + configs + vocab + epoch), loadable by the
    reference's ``utils/checkpoint.py:load_checkpoint``."""
    import torch

    from p4fr_tpu.utils import checkpoint as ckpt_io

    ckpt = ckpt_io.load_checkpoint(ckpt_path)
    network = ckpt.get("network") or ckpt.get("configs", {}).get("network")
    sd, unmatched = export_state_dict(
        network, ckpt["params"], ckpt.get("batch_stats") or {}
    )
    if unmatched:
        raise ValueError(
            f"[export_pth] {len(unmatched)} flax paths have no inverse "
            f"rule: {unmatched[:8]}"
        )
    payload = {
        "network": network,
        "epoch": int(ckpt.get("epoch", 0)),
        "model": {k: torch.tensor(v) for k, v in sd.items()},
        "configs": dict(ckpt.get("configs", {})),
        "token_to_id": dict(ckpt.get("token_to_id", {})),
        "id_to_token": {
            int(k): v for k, v in ckpt.get("id_to_token", {}).items()
        },
    }
    torch.save(payload, out_path)
    return out_path


def convert_pth(pth_path: str, out_path: str, *, strict: bool = True) -> str:
    """Full checkpoint conversion incl. configs/vocab/epoch."""
    import torch

    from p4fr_tpu.utils import checkpoint as ckpt_io

    ckpt = torch.load(pth_path, map_location="cpu", weights_only=False)
    network = ckpt.get("network") or ckpt["configs"].get("network")
    state_dict = ckpt.get("model") or ckpt.get("model_state_dict")
    params, batch_stats, unmatched = convert_state_dict(network, state_dict)
    if unmatched:
        msg = "[convert_pth] " + unmatched_report(
            rules_for(network), state_dict, unmatched
        )
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
    argv = [a for a in sys.argv[1:] if a not in ("--report", "--export")]
    report = "--report" in sys.argv[1:]
    export = "--export" in sys.argv[1:]
    if len(argv) != 2:
        print(
            "usage: python -m p4fr_tpu.utils.convert_pth [--report] "
            "ref.pth out.ckpt\n"
            "       python -m p4fr_tpu.utils.convert_pth --export "
            "native.ckpt out.pth\n"
            "  --report: convert what matches and print a diagnostic for "
            "unmatched keys instead of failing\n"
            "  --export: inverse direction — native checkpoint to "
            "reference-format .pth"
        )
        sys.exit(1)
    if export:
        print(export_pth(argv[0], argv[1]))
    else:
        print(convert_pth(argv[0], argv[1], strict=not report))
