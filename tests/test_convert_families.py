"""Converter round-trips for the remaining families (ASTER, EfficientNet
backbone, Swin): flax-init -> inverse-map to reference-named torch keys ->
convert -> exact tree equality. Proves the rule tables cover every
parameter with correct shapes/transposes for all four model families."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from p4fr_tpu.utils.convert_pth import convert_state_dict  # noqa: E402


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


class Inverse:
    """Build a torch-style state_dict from flax trees via inverse maps."""

    def __init__(self, params, stats):
        self.p = _flatten(params)
        self.s = _flatten(stats)
        self.sd = {}

    def linear(self, tkey, fkey):
        self.sd[tkey + ".weight"] = torch.tensor(self.p[fkey + "/kernel"].T)
        if fkey + "/bias" in self.p:
            self.sd[tkey + ".bias"] = torch.tensor(self.p[fkey + "/bias"])

    def conv(self, tkey, fkey):
        w = self.p[fkey + "/kernel"]
        self.sd[tkey + ".weight"] = torch.tensor(np.transpose(w, (3, 2, 0, 1)))
        if fkey + "/bias" in self.p:
            self.sd[tkey + ".bias"] = torch.tensor(self.p[fkey + "/bias"])

    def bn(self, tkey, fkey):
        self.sd[tkey + ".weight"] = torch.tensor(self.p[fkey + "/scale"])
        self.sd[tkey + ".bias"] = torch.tensor(self.p[fkey + "/bias"])
        self.sd[tkey + ".running_mean"] = torch.tensor(self.s[fkey + "/mean"])
        self.sd[tkey + ".running_var"] = torch.tensor(self.s[fkey + "/var"])

    def ln(self, tkey, fkey):
        self.sd[tkey + ".weight"] = torch.tensor(self.p[fkey + "/scale"])
        self.sd[tkey + ".bias"] = torch.tensor(self.p[fkey + "/bias"])

    def raw(self, tkey, fkey):
        self.sd[tkey] = torch.tensor(self.p[fkey])


def _assert_roundtrip(network, sd, params, stats):
    got_p, got_s, unmatched = convert_state_dict(network, sd)
    assert unmatched == [], unmatched[:10]
    want_p, want_s = _flatten(params), _flatten(stats)
    got_pf, got_sf = _flatten(got_p), _flatten(got_s)
    assert set(got_pf) == set(want_p), (
        sorted(set(want_p) - set(got_pf))[:8],
        sorted(set(got_pf) - set(want_p))[:8],
    )
    for k in want_p:
        np.testing.assert_array_equal(got_pf[k], want_p[k], err_msg=k)
    assert set(got_sf) == set(want_s), (
        sorted(set(want_s) - set(got_sf))[:8],
        sorted(set(got_sf) - set(want_s))[:8],
    )
    for k in want_s:
        np.testing.assert_array_equal(got_sf[k], want_s[k], err_msg=k)


def _inverse_efficientnet(inv: Inverse, troot: str, froot: str):
    from p4fr_tpu.models.efficientnetv2 import V2_S_STAGES

    for s_idx, (reps, _k, _s, expand, _i, _o, use_se, fused) in enumerate(
        V2_S_STAGES
    ):
        for b_idx in range(reps):
            t = f"{troot}.{s_idx}.{b_idx}"
            f = f"{froot}/stage{s_idx}_block{b_idx}"
            if fused and expand == 1:
                inv.conv(f"{t}.conv", f"{f}/conv")
                inv.bn(f"{t}.bn1", f"{f}/bn1")
            elif fused:
                inv.conv(f"{t}.conv_exp", f"{f}/conv_exp")
                inv.bn(f"{t}.bn1", f"{f}/bn1")
                inv.conv(f"{t}.conv_pwl", f"{f}/conv_pwl")
                inv.bn(f"{t}.bn2", f"{f}/bn2")
            else:
                inv.conv(f"{t}.conv_pw", f"{f}/conv_pw")
                inv.bn(f"{t}.bn1", f"{f}/bn1")
                inv.conv(f"{t}.conv_dw", f"{f}/conv_dw")
                inv.bn(f"{t}.bn2", f"{f}/bn2")
                if use_se:
                    inv.conv(f"{t}.se.conv_reduce", f"{f}/se/conv_reduce")
                    inv.conv(f"{t}.se.conv_expand", f"{f}/se/conv_expand")
                inv.conv(f"{t}.conv_pwl", f"{f}/conv_pwl")
                inv.bn(f"{t}.bn3", f"{f}/bn3")


def _inverse_transformer_decoder(inv: Inverse, params, ff_naming="linear"):
    inv.raw("decoder.embedding.weight", "decoder/embedding/embedding")
    layers = sorted(
        {p.split("/")[1] for p in inv.p if p.startswith("decoder/layer")}
    )
    for name in layers:
        i = name[len("layer"):]
        t = f"decoder.attention_layers.{i}"
        f = f"decoder/{name}"
        for lin in ("q_linear", "k_linear", "v_linear", "out_linear"):
            inv.linear(f"{t}.self_attention_layer.{lin}",
                       f"{f}/self_attention/{lin}")
            inv.linear(f"{t}.attention_layer.{lin}",
                       f"{f}/cross_attention/{lin}")
        inv.ln(f"{t}.self_attention_norm", f"{f}/self_attention_norm")
        inv.ln(f"{t}.attention_norm", f"{f}/cross_attention_norm")
        if ff_naming == "sequential":  # SWIN.py:827-841 Sequential FF
            inv.linear(f"{t}.feedforward_layer.layers.0",
                       f"{f}/feedforward/linear0")
            inv.linear(f"{t}.feedforward_layer.layers.3",
                       f"{f}/feedforward/linear1")
        else:
            inv.linear(f"{t}.feedforward_layer.linear0",
                       f"{f}/feedforward/linear0")
            inv.linear(f"{t}.feedforward_layer.linear1",
                       f"{f}/feedforward/linear1")
        inv.ln(f"{t}.feedforward_norm", f"{f}/feedforward_norm")
    inv.linear("decoder.generator", "decoder/generator")


def test_efficientsatrn_roundtrip():
    from p4fr_tpu.models.satrn import SATRN

    model = SATRN(
        num_classes=245, pad_id=2, sos_id=0,
        input_height=64, input_width=128,
        enc_hidden_dim=64, enc_filter_dim=64, enc_layer_num=1,
        enc_head_num=4,
        dec_src_dim=64, dec_hidden_dim=32, dec_filter_dim=64,
        dec_layer_num=1, dec_head_num=4,
        backbone="efficientnetv2s",
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 128, 3)),
        jnp.zeros((1, 4), jnp.int32),
        train=False,
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    inv = Inverse(params, stats)

    root, froot = "encoder.shallow_cnn", "encoder/efficientnet"
    inv.conv(f"{root}.conv_stem", f"{froot}/conv_stem")
    inv.bn(f"{root}.bn1", f"{froot}/bn1")
    _inverse_efficientnet(inv, f"{root}.eff_block", f"{froot}/blocks")
    inv.conv(f"{root}.conv_last", f"{froot}/conv_last")
    inv.bn(f"{root}.bn2", f"{froot}/bn2")
    inv.linear("encoder.positional_encoding.dense0",
               "encoder/positional_encoding/dense0")
    inv.linear("encoder.positional_encoding.dense1",
               "encoder/positional_encoding/dense1")
    t, f = "encoder.attention_layers.0", "encoder/layer0"
    inv.ln(f"{t}.norm", f"{f}/norm")
    for lin in ("q_linear", "k_linear", "v_linear", "out_linear"):
        inv.linear(f"{t}.attention_layer.{lin}", f"{f}/attention/{lin}")
    inv.conv(f"{t}.conv0", f"{f}/conv0")
    inv.bn(f"{t}.norm0", f"{f}/bn0")
    inv.conv(f"{t}.depthwise", f"{f}/depthwise")
    inv.bn(f"{t}.depthwise_norm", f"{f}/bn_depth")
    inv.conv(f"{t}.conv1", f"{f}/conv1")
    inv.bn(f"{t}.norm1", f"{f}/bn1")
    _inverse_transformer_decoder(inv, params)
    _assert_roundtrip("EfficientSATRN", inv.sd, params, stats)


def test_aster_roundtrip():
    from test_aster_swin import tiny_aster

    model = tiny_aster()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 256, 3)),
        jnp.zeros((1, 4), jnp.int32),
        train=False,
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    inv = Inverse(params, stats)

    cnn, f = "encoder.cnn", "encoder/cnn"
    inv.conv(f"{cnn}.conv_stem", f"{f}/conv_stem")
    inv.bn(f"{cnn}.bn1", f"{f}/bn1")
    _inverse_efficientnet(inv, f"{cnn}.eff_blocks", f"{f}/blocks")
    inv.conv(f"{cnn}.conv1.conv4", f"{f}/conv1")
    inv.bn(f"{cnn}.conv1.batchnorm4", f"{f}/conv1_bn")
    inv.conv(f"{cnn}.conv3.conv6", f"{f}/conv3")
    inv.bn(f"{cnn}.conv3.batchnorm6", f"{f}/conv3_bn")
    for k in range(2):
        for suffix, d in (("", "fwd"), ("_reverse", "bwd")):
            for w in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                inv.raw(
                    f"encoder.blstm.{w}_l{k}{suffix}",
                    f"encoder/blstm/l{k}_{d}/cell/{w}",
                )
    inv.linear("encoder.proj", "encoder/proj")
    inv.raw("decoder.embedding.weight", "embedding/embedding")
    inv.linear("decoder.attention_cell.i2h", "attention_cell/i2h")
    inv.linear("decoder.attention_cell.h2h", "attention_cell/h2h")
    inv.linear("decoder.attention_cell.score", "attention_cell/score")
    for i in range(2):
        for w in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            inv.raw(
                f"decoder.attention_cell.rnn.{i}.{w}",
                f"attention_cell/cell{i}/{w}",
            )
    inv.linear("decoder.generator", "generator")
    _assert_roundtrip("EfficientASTER", inv.sd, params, stats)


def test_swin_roundtrip():
    from p4fr_tpu.models.swin import SwinTRN
    import dataclasses

    # tiny swin: override the encoder config via a subclassed module
    from p4fr_tpu.models.swin import SwinEncoder
    from p4fr_tpu.models.common import TransformerDecoder
    from flax import linen as nn

    class TinySwinTRN(SwinTRN):
        def setup(self):
            self.encoder = SwinEncoder(
                img_size=16, patch_size=4, embed_dim=8, depths=(1, 1),
                num_heads=(2, 4), window=2, drop_path_rate=0.0,
                dtype=self.dtype,
            )
            self.decoder = TransformerDecoder(
                num_classes=self.num_classes, src_dim=16,
                hidden_dim=self.dec_hidden_dim,
                filter_dim=self.dec_filter_dim,
                head_num=self.dec_head_num, layer_num=self.dec_layer_num,
                pad_id=self.pad_id, sos_id=self.sos_id,
                dropout=self.dropout, dtype=self.dtype,
            )

    model = TinySwinTRN(
        num_classes=245, pad_id=2, sos_id=0,
        input_height=16, input_width=16,
        dec_src_dim=16, dec_hidden_dim=16, dec_filter_dim=32,
        dec_layer_num=1, dec_head_num=4,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 16, 3)),
        jnp.zeros((1, 4), jnp.int32),
        train=False,
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(
        np.asarray, variables.get("batch_stats", {})
    )
    inv = Inverse(params, stats)

    inv.conv("encoder.patch_embed.proj", "encoder/patch_embed")
    inv.ln("encoder.patch_embed.norm", "encoder/patch_norm")
    # the reference SWIN runs ape=True (SWIN.py:1028): learned state
    inv.raw("encoder.absolute_pos_embed", "encoder/absolute_pos_embed")
    for stage, depth in enumerate((1, 1)):
        for blk in range(depth):
            t = f"encoder.layers.{stage}.blocks.{blk}"
            f = f"encoder/stage{stage}_block{blk}"
            inv.ln(f"{t}.norm1", f"{f}/norm1")
            inv.linear(f"{t}.attn.qkv", f"{f}/attn/qkv")
            inv.linear(f"{t}.attn.proj", f"{f}/attn/proj")
            inv.raw(
                f"{t}.attn.relative_position_bias_table",
                f"{f}/attn/relative_position_bias_table",
            )
            inv.ln(f"{t}.norm2", f"{f}/norm2")
            inv.linear(f"{t}.mlp.fc1", f"{f}/mlp_fc1")
            inv.linear(f"{t}.mlp.fc2", f"{f}/mlp_fc2")
    inv.ln("encoder.layers.0.downsample.norm", "encoder/stage0_merge/norm")
    inv.sd["encoder.layers.0.downsample.reduction.weight"] = torch.tensor(
        inv.p["encoder/stage0_merge/reduction/kernel"].T
    )
    inv.ln("encoder.norm", "encoder/norm")
    _inverse_transformer_decoder(inv, params, ff_naming="sequential")
    _assert_roundtrip("SWIN", inv.sd, params, stats)
