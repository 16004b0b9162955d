"""Library inverse converter: flax trees -> reference-named state_dicts.

``export_state_dict`` is derived mechanically from the forward rule
tables (utils/convert_pth.py), so these tests pin the two invariants
that make it trustworthy:

1. round trip: convert_state_dict(export_state_dict(tree)) == tree,
   bit-exact, for every family (LiteSATRN, EfficientASTER 1- and
   2-layer, SWIN) — every flax path must be covered (no unmatched);
2. the emitted torch key names load into the REAL reference modules
   (ASTERDecoder / SwinTransformer constructed from
   /root/reference/networks) with no unexpected/missing params.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from reference_loader import load_reference_full  # noqa: E402

from p4fr_tpu.models.aster import ASTER  # noqa: E402
from p4fr_tpu.models.swin import SwinTRN  # noqa: E402
from p4fr_tpu.utils.convert_pth import (  # noqa: E402
    convert_state_dict,
    export_state_dict,
)

from helpers import synth_images, synth_labels, tiny_satrn  # noqa: E402


def _flatten(tree, prefix=""):
    out = {}
    for k, v in (tree or {}).items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def _assert_roundtrip(network, params, stats):
    sd, unmatched = export_state_dict(network, params, stats)
    assert unmatched == [], unmatched
    p2, s2, un2 = convert_state_dict(network, sd)
    assert un2 == [], un2
    want_p, got_p = _flatten(params), _flatten(p2)
    assert set(want_p) == set(got_p)
    for k in want_p:
        np.testing.assert_array_equal(want_p[k], got_p[k])
    want_s, got_s = _flatten(stats), _flatten(s2)
    assert set(want_s) == set(got_s)
    for k in want_s:
        np.testing.assert_array_equal(want_s[k], got_s[k])
    return sd


def test_litesatrn_roundtrip_via_library_inverse():
    model = tiny_satrn()
    images = jnp.asarray(synth_images(1))
    text = jnp.asarray(synth_labels(1, 6))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    _assert_roundtrip("LiteSATRN", params, stats)


@pytest.mark.parametrize("num_layers", [1, 2])
def test_aster_decoder_roundtrip_and_real_load(num_layers):
    V, C, E, H, PAD, SOS = 20, 32, 24, 48, 2, 0
    model = ASTER(
        num_classes=V, pad_id=PAD, sos_id=SOS, src_dim=C, hidden_dim=H,
        embedding_dim=E, layer_num=num_layers, dtype=jnp.float32,
    )
    # init only the decoder half (what export covers for the decoder
    # keys): decode_train traces embedding + attention cell (incl. the
    # i2h src projection) + generator without building the CNN encoder
    src = jnp.zeros((1, 5, C))
    text = jnp.zeros((1, 4), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        src, text, method="decode_train",
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    sd = _assert_roundtrip("EfficientASTER", params, {})
    # single-layer exports must use the reference's bare-LSTMCell naming
    has_bare = any(k == "decoder.attention_cell.rnn.weight_ih" for k in sd)
    assert has_bare == (num_layers == 1)

    # the real reference decoder must accept the export verbatim
    ref = load_reference_full()
    tdec = ref.aster.ASTERDecoder(
        num_classes=V, src_dim=C, embedding_dim=E, hidden_dim=H,
        pad_id=PAD, st_id=SOS, num_layers=num_layers,
    )
    dec_sd = {
        k[len("decoder."):]: torch.tensor(v)
        for k, v in sd.items() if k.startswith("decoder.")
    }
    missing, unexpected = tdec.load_state_dict(dec_sd, strict=True), None
    assert not missing.missing_keys and not missing.unexpected_keys


def test_swin_roundtrip_and_real_load():
    model = SwinTRN(
        num_classes=12, pad_id=2, sos_id=0, input_height=48, input_width=48,
        dec_src_dim=64, dec_hidden_dim=32, dec_filter_dim=48,
        dec_layer_num=1, dec_head_num=2, dtype=jnp.float32,
        enc_embed_dim=16, enc_depths=(2, 2), enc_num_heads=(2, 4),
        enc_window=3,
    )
    images = jnp.zeros((1, 48, 48, 3))
    text = jnp.zeros((1, 4), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    sd = _assert_roundtrip("SWIN", params, {})

    ref = load_reference_full()
    tenc = ref.swin.SwinTransformer(
        img_size=48, patch_size=4, in_chans=3, num_classes=5,
        embed_dim=16, depths=[2, 2], num_heads=[2, 4], window_size=3,
        ape=True,  # the reference SWIN's configuration (SWIN.py:1028)
    )
    enc_sd = {
        k[len("encoder."):]: torch.tensor(v)
        for k, v in sd.items() if k.startswith("encoder.")
    }
    # derived buffers + the (unused) classification head are the only
    # torch-side keys the export legitimately never carries
    res = tenc.load_state_dict(enc_sd, strict=False)
    assert not res.unexpected_keys
    allowed = ("attn_mask", "relative_position_index", "head.", "norm_vocab")
    leftover = [
        k for k in res.missing_keys if not any(a in k for a in allowed)
    ]
    assert leftover == [], leftover


def test_export_pth_file_loads_into_real_litesatrn(tmp_path):
    """File-level capstone: native checkpoint -> export_pth -> the REAL
    reference LiteSATRN constructed from the .pth (its __init__ calls
    load_state_dict on checkpoint; LiteSATRN.py:578-579) -> identical
    teacher-forced logits. Closes the interop loop in the direction the
    forward oracle tests don't cover: OUR trained weights running in
    the reference codebase."""
    from reference_loader import cpu_get_device, make_dataset_stub, make_flags

    from p4fr_tpu.data.vocab import Vocab
    from p4fr_tpu.utils.checkpoint import make_checkpoint
    from p4fr_tpu.utils.convert_pth import export_pth

    ref = load_reference_full()
    vocab = Vocab.from_files(["p4fr_tpu/configs/tokens.txt"])
    B, H, W, L = 3, 32, 64, 12

    model = tiny_satrn(num_classes=len(vocab), pad_id=vocab.pad_id,
                       sos_id=vocab.sos_id)
    rng = np.random.default_rng(21)
    images = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    labels = np.full((B, L), vocab.pad_id, np.int64)
    labels[:, 0] = vocab.sos_id
    labels[:, 1:5] = rng.integers(3, len(vocab) - 1, size=(B, 4))
    variables = model.init(
        {"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
        jnp.asarray(images), jnp.asarray(labels), train=False,
    )

    # native checkpoint file -> reference .pth file
    native = make_checkpoint(
        network="LiteSATRN", epoch=4,
        params=jax.tree_util.tree_map(np.asarray, variables["params"]),
        batch_stats=jax.tree_util.tree_map(
            np.asarray, variables["batch_stats"]
        ),
        opt_state=None, configs={"network": "LiteSATRN"},
        token_to_id=dict(vocab.token_to_id),
        id_to_token=dict(vocab.id_to_token),
    )
    from flax import serialization

    ckpt_path = tmp_path / "native.ckpt"
    payload = dict(native)
    payload["id_to_token"] = {
        str(k): v for k, v in payload["id_to_token"].items()
    }
    ckpt_path.write_bytes(
        serialization.msgpack_serialize(payload, in_place=True)
    )
    pth_path = str(tmp_path / "exported.pth")
    export_pth(str(ckpt_path), pth_path)

    loaded = torch.load(pth_path, map_location="cpu", weights_only=False)
    assert loaded["epoch"] == 4
    assert loaded["token_to_id"] == dict(vocab.token_to_id)

    flags = make_flags(
        height=H, width=W, enc_hidden=32, enc_filter=32, enc_heads=4,
        enc_layers=1, dec_src=32, dec_hidden=32, dec_filter=64,
        dec_heads=4, dec_layers=2,
    )
    torch.manual_seed(0)
    tmodel = ref.lite_satrn.LiteSATRN(
        flags, make_dataset_stub(vocab), checkpoint=loaded["model"]
    )
    tmodel.eval()

    want = model.apply(
        variables, jnp.asarray(images), jnp.asarray(labels[:, :-1]),
        train=False,
    )
    with cpu_get_device(), torch.no_grad():
        got = tmodel(
            torch.from_numpy(images.transpose(0, 3, 1, 2)),
            torch.from_numpy(labels), True, 1.0,  # teacher-forced branch
        ).numpy()
    assert np.asarray(want).shape == got.shape == (B, L - 1, len(vocab))
    np.testing.assert_allclose(
        np.asarray(want), got, rtol=1e-3, atol=2e-4
    )


def test_efficientsatrn_roundtrip_via_library_inverse():
    """Covers the efficientnet-block inverse rules (conv_stem/dw/se/pwl
    + bn stats) the other families don't touch."""
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
    _assert_roundtrip("EfficientSATRN", params, stats)


def test_aster_full_model_roundtrip_via_library_inverse():
    """Full EfficientASTER tree: covers the encoder-side inverse rules
    (BLSTM l{k}[_reverse] cells, proj, convRelu stages + bns) the
    decoder-only test skips."""
    V, PAD, SOS = 20, 2, 0
    model = ASTER(
        num_classes=V, pad_id=PAD, sos_id=SOS, src_dim=48, hidden_dim=48,
        embedding_dim=24, layer_num=1, dtype=jnp.float32,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 128, 3)), jnp.zeros((1, 4), jnp.int32),
        train=False,
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(
        np.asarray, variables.get("batch_stats", {})
    )
    _assert_roundtrip("EfficientASTER", params, stats)
