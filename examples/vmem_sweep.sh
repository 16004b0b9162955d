#!/bin/bash
# Scoped-VMEM-limit sweep for the v2 decode kernel config (round 4).
#
# The default 16MB Mosaic scoped-VMEM limit is what rejected the
# auto-pipelined-src tb=64 configs inside the full greedy program
# (decoder_layer_v2.pick_v2_config docstring: 20.12M compiler-reported).
# --xla_tpu_scoped_vmem_limit_kib raises it; P4FR_V2_FORCE bypasses the
# estimator. Each row is the FULL flagship bench (B=256, 230 steps,
# manager on, pipelined x8) — kernels-only scans mislead (CLAUDE.md).
#
# OUTCOME (r4, recorded in docs/PERFORMANCE.md): B won (1808-1813 vs
# A 1799; C 1613, E 1672, F 1555, G 1745) and SHIPPED as the
# production default (xla_opts.DECODE_SCOPED_VMEM_KIB) — so a plain
# `python bench.py` now reproduces row B, and row A pins
# P4FR_SCOPED_VMEM_KIB=0 to reproduce the historical baseline.
#
# Usage: bash examples/vmem_sweep.sh [row ...]   (default: all rows)
set -u
cd "$(dirname "$0")/.."

run() {
  local name="$1" limit="$2" force="$3"
  echo "=== $name (limit_kib=$limit force=$force)" >&2
  # NOT via XLA_FLAGS: the local CPU jaxlib's flag parser FATALs on
  # unknown --xla_tpu_* flags (it killed the probe subprocesses);
  # P4FR_SCOPED_VMEM_KIB ships the limit as per-compile
  # compiler_options instead (p4fr_tpu/utils/xla_opts.py)
  P4FR_SCOPED_VMEM_KIB="$limit" \
  P4FR_V2_FORCE="$force" \
  BENCH_PROBE_BUDGET=900 \
  timeout 2400 python bench.py 2>/tmp/vmem_sweep_err.log \
    | tail -1 | sed "s/^/$name /"
  tail -3 /tmp/vmem_sweep_err.log >&2
}

for row in "${@:-B C D E}"; do
  case "$row" in
    A) # the 16MB-default src_hbm config: bench.py now ships the
       # raised limit by default (sweep row B won), so the historical
       # baseline needs the explicit disable
       echo "=== A baseline (P4FR_SCOPED_VMEM_KIB=0)" >&2
       P4FR_SCOPED_VMEM_KIB=0 BENCH_PROBE_BUDGET=900 timeout 2400 python bench.py \
         2>/tmp/vmem_sweep_err.log | tail -1 | sed 's/^/A /';;
    B) run B 24576 "64,32,0";;   # pipelined src (r3's 19us-faster kernels-only)
    C) run C 32768 "64,64,0";;   # + bigger chunks (r2 standalone-fastest)
    D) run D 24576 "64,64,1";;   # bigger chunks, HBM src
    E) run E 32768 "128,32,1";;  # half the grid steps
    F) run F 40960 "128,64,1";;
    G) run G 65536 "256,32,1";;  # single grid step
  esac
done
