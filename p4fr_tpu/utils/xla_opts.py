"""Per-compile XLA option overrides (TPU backend).

Why not XLA_FLAGS: on this rig the TPU backend lives behind the axon
remote-compile service while the LOCAL jaxlib is a CPU build whose flag
parser FATALs on unknown ``--xla_tpu_*`` flags (``parse_flags_from_env``
aborts the process — it killed every bench probe subprocess that
inherited the flag). ``jax.jit(compiler_options=...)`` instead ships the
override inside the compile request's ExecutableBuildOptions, which is
exactly where a remote compiler reads it, and participates in the
persistent compilation-cache key.

The only override currently exposed is the Mosaic scoped-VMEM limit
(``P4FR_SCOPED_VMEM_KIB``, e.g. 24576): the default 16MB limit is what
rejects the faster auto-pipelined-src decode kernel configs inside the
full greedy program (ops/pallas/decoder_layer_v2.pick_v2_config).
Experiment knob — production paths leave it unset.
"""

from __future__ import annotations

import os
from typing import Optional


def tpu_compiler_options() -> Optional[dict]:
    """compiler_options dict for jax.jit, or None when nothing is set
    (None keeps jit on the exact default code path)."""
    opts = {}
    kib = os.environ.get("P4FR_SCOPED_VMEM_KIB")
    if kib:
        import jax

        # TPU-only option: a CPU compile rejects it with
        # INVALID_ARGUMENT (e.g. the --quick fallback inheriting the
        # env), so gate on the actual backend
        if jax.default_backend() == "tpu":
            opts["xla_tpu_scoped_vmem_limit_kib"] = int(kib)
    return opts or None
