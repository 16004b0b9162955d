"""Smoke test for examples/bench_encoder_stages.py (--quick).

The encoder-stage attribution harness (added r4 to rank optimization
targets inside the 54 ms flagship encode) must keep producing its
machine-readable JSON tail: all nine segments, a segment sum, and the
fused full-encode cross-check at the same order of magnitude. Segment
provenance: the backbone mirrors
/root/reference/networks/EfficientSATRN.py:63-87 (stem + timm V2-S
stages + 1x1 projection + 2D-PE transformer).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SEGMENTS = [
    "stem", "stage0", "stage1", "stage2", "stage3", "stage4", "stage5",
    "proj", "pe+transformer",
]


def test_stage_bench_quick_json():
    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "examples", "bench_encoder_stages.py"),
         "--quick"],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-800:]
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    result = json.loads(lines[-1])
    # --quick must pin the CPU backend: without this the test silently
    # depends on the flaky TPU tunnel (advisor r4)
    assert result["backend"] == "cpu"
    assert set(result["segments"]) == set(SEGMENTS)
    # per-segment values are rounded to 2 decimals, so a sub-5us segment
    # can legitimately print 0.0 — require non-negative per segment and
    # strict positivity only of the (unrounded-sum-derived) total
    assert all(v >= 0 for v in result["segments"].values())
    seg_sum = result["segment_sum_ms"]
    assert seg_sum > 0
    full = result["full_encode_ms"]
    assert abs(seg_sum - sum(result["segments"].values())) < 0.1 * seg_sum
    # segments each pay an extra output materialization + jit dispatch;
    # the fused program can also fuse across boundaries. Same order of
    # magnitude is the contract (attribution, not an identity).
    assert 0.2 * full < seg_sum < 5.0 * full
