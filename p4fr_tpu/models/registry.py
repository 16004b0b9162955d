"""Model registry: network-name string -> model builder.

Mirrors the reference's ``get_network`` dispatch incl. aliases
(reference: utils/utils.py:29-80). Builders take (options, vocab, dtype)
and return an un-initialized flax module following the unified contract
(``__call__`` teacher-forced, ``encode``, ``precompute_src``,
``decode_step``, ``cache_spec``).
"""

from __future__ import annotations

import jax.numpy as jnp

from p4fr_tpu.data.vocab import Vocab


def _satrn(options, vocab: Vocab, dtype):
    from p4fr_tpu.models.satrn import satrn_from_options

    return satrn_from_options(
        options, len(vocab), vocab.pad_id, vocab.sos_id, dtype=dtype
    )


def _aster(options, vocab: Vocab, dtype):
    from p4fr_tpu.models.aster import aster_from_options

    return aster_from_options(
        options, len(vocab), vocab.pad_id, vocab.sos_id, dtype=dtype
    )


def _swin(options, vocab: Vocab, dtype):
    from p4fr_tpu.models.swin import swin_from_options

    return swin_from_options(
        options, len(vocab), vocab.pad_id, vocab.sos_id, dtype=dtype
    )


_BUILDERS = {
    "LiteSATRN": _satrn,
    "EfficientSATRN": _satrn,
    "MySATRN": _satrn,  # reference alias
    "EfficientASTER": _aster,
    "ASTER": _aster,  # reference alias
    "SWIN": _swin,
    "SwinTRN": _swin,
}


def get_network(name: str, options, vocab: Vocab, dtype=jnp.float32):
    if name not in _BUILDERS:
        raise NotImplementedError(f"Unknown network: {name}")
    return _BUILDERS[name](options, vocab, dtype)


def available_networks():
    return sorted(_BUILDERS.keys())
