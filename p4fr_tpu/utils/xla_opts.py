"""Per-compile XLA option overrides (TPU backend).

Why not XLA_FLAGS: on this rig the TPU backend lives behind the axon
remote-compile service while the LOCAL jaxlib is a CPU build whose flag
parser FATALs on unknown ``--xla_tpu_*`` flags (``parse_flags_from_env``
aborts the process — it killed every bench probe subprocess that
inherited the flag). ``jax.jit(compiler_options=...)`` instead ships the
override inside the compile request's ExecutableBuildOptions, which is
exactly where a remote compiler reads it, and participates in the
persistent compilation-cache key.

The only override currently exposed is the Mosaic scoped-VMEM limit:
the default 16MB limit is what rejects the fastest flagship decode
kernel config — auto-pipelined src, tb=64/ck=32 — inside the full
greedy program (ops/pallas/decoder_layer_v2.pick_v2_config). The r4
sweep (examples/vmem_sweep.sh) measured that config at 1808 img/s e2e
vs 1799 for the 16MB-fitting src_hbm variant, so production decode
jits now ship ``DECODE_SCOPED_VMEM_KIB`` by default;
``P4FR_SCOPED_VMEM_KIB`` overrides it (``0`` disables).
"""

from __future__ import annotations

import os
from typing import Optional

# production raised limit for flagship decode programs (r4 sweep row B;
# the full greedy program compiles at a compiler-reported 20.12M scoped
# VMEM with the auto-pipelined-src tb=64/ck=32 kernel)
DECODE_SCOPED_VMEM_KIB = 24576


def tpu_compiler_options(default_kib: Optional[int] = None) -> Optional[dict]:
    """compiler_options dict for jax.jit, or None when nothing is set
    (None keeps jit on the exact default code path).

    ``default_kib`` is the caller's production scoped-VMEM limit (pass
    ``DECODE_SCOPED_VMEM_KIB`` from decode jit sites); the
    ``P4FR_SCOPED_VMEM_KIB`` env var overrides it, and ``0`` disables
    the override entirely (A/B baseline runs)."""
    opts = {}
    raw = os.environ.get("P4FR_SCOPED_VMEM_KIB")
    kib = int(raw) if raw not in (None, "") else (default_kib or 0)
    if kib:
        import jax

        # TPU-only option: a CPU compile rejects it with
        # INVALID_ARGUMENT (e.g. the --quick fallback inheriting the
        # env), so gate on the actual backend
        if jax.default_backend() == "tpu":
            opts["xla_tpu_scoped_vmem_limit_kib"] = kib
    return opts or None


def decode_compiler_options() -> Optional[dict]:
    """Production compiler_options for decode jits: the raised
    scoped-VMEM limit that unlocks the auto-pipelined-src flagship
    kernel config (r4 sweep row B: 1808 vs 1799 img/s e2e). Returns
    None off-TPU; ``P4FR_SCOPED_VMEM_KIB=0`` reproduces the
    16MB-default baseline for A/B runs."""
    return tpu_compiler_options(default_kib=DECODE_SCOPED_VMEM_KIB)


def scoped_vmem_kib(opts: Optional[dict]) -> Optional[int]:
    """The scoped-VMEM limit a ``tpu_compiler_options`` dict carries, or
    None. Thread this into ``pick_v2_config(vmem_limit_kib=...)`` so the
    kernel-config choice and the compile options that make it legal stay
    coupled at the jit site."""
    return (opts or {}).get("xla_tpu_scoped_vmem_limit_kib")
