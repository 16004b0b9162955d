"""Flags/config-system behavior."""

import pathlib

from p4fr_tpu.utils.flags import Flags

REPO = pathlib.Path(__file__).resolve().parent.parent
CONFIGS = REPO / "p4fr_tpu" / "configs"


def test_load_all_model_configs():
    for name in ["LiteSATRN", "EfficientSATRN", "EfficientASTER", "SWIN"]:
        options = Flags(str(CONFIGS / f"{name}.yaml")).get()
        assert options.input_size.height > 0
        assert options.batch_size > 0
        assert isinstance(options.optimizer.lr, float)


def test_string_coercion_matches_reference():
    options = Flags(
        {
            "lr": "5e-4",
            "lst": "[1, 2]",
            "name": "hello",
            "nested": {"wd": "1e-6"},
        }
    ).get()
    assert options.lr == 5e-4
    assert options.lst == [1, 2]
    assert options.name == "hello"
    assert options.nested.wd == 1e-6


def test_dict_roundtrip():
    d = {"a": 1, "b": {"c": "2e-3", "d": "text"}}
    options = Flags(d).get()
    out = options.to_dict()
    assert out["b"]["c"] == 2e-3
    assert out["b"]["d"] == "text"
    # re-hydration from the round-tripped dict (checkpoint path)
    again = Flags(out).get()
    assert again.b.c == 2e-3


def test_litesatrn_hparams():
    options = Flags(str(CONFIGS / "LiteSATRN.yaml")).get()
    assert options.SATRN.encoder.hidden_dim == 256
    assert options.SATRN.decoder.layer_num == 2
    assert options.teacher_forcing_ratio.tf_max == 0.8
    assert options.tpu.compute_dtype == "bfloat16"
