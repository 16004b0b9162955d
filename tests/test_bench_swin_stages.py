"""Smoke test for examples/bench_swin_stages.py (--quick): the Swin
stage-attribution harness must keep producing its machine-readable JSON
tail (segments for patch_embed + each block stage, a segment sum, the
pinned CPU backend). Reference provenance: the stages mirror
/root/reference/networks/SWIN.py:84-430 via p4fr_tpu/models/swin.py."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_swin_stage_bench_quick_json():
    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "examples", "bench_swin_stages.py"),
         "--quick"],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-800:]
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    result = json.loads(lines[-1])
    assert result["backend"] == "cpu"
    # --quick runs the 2-stage tiny config
    assert set(result["segments"]) == {"patch_embed", "stage0", "stage1"}
    assert all(v >= 0 for v in result["segments"].values())
    assert result["segment_sum_ms"] > 0
