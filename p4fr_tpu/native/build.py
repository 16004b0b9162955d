"""Build the native C++ helpers into shared libraries.

Usage: ``python -m p4fr_tpu.native.build``

Compiles with g++ into this directory; the ctypes wrappers in
``p4fr_tpu.native`` pick the .so up automatically (and fall back to pure
Python when it is absent, so the build step is optional).
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

TARGETS = {
    "libp4fr_editdistance.so": ["editdistance.cpp"],
}

CXXFLAGS = ["-O3", "-std=c++17", "-shared", "-fPIC", "-Wall"]


def build(verbose: bool = True) -> bool:
    """Compile all native targets. Returns True if everything built."""
    ok = True
    for out_name, sources in TARGETS.items():
        out_path = os.path.join(HERE, out_name)
        src_paths = [os.path.join(HERE, s) for s in sources]
        newest_src = max(os.path.getmtime(s) for s in src_paths)
        if os.path.exists(out_path) and os.path.getmtime(out_path) >= newest_src:
            if verbose:
                print(f"[native] {out_name} up to date")
            continue
        cmd = ["g++", *CXXFLAGS, "-o", out_path, *src_paths]
        if verbose:
            print("[native]", " ".join(cmd))
        try:
            subprocess.run(cmd, check=True, capture_output=not verbose)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            print(f"[native] build of {out_name} failed: {e}", file=sys.stderr)
            ok = False
    return ok


if __name__ == "__main__":
    sys.exit(0 if build() else 1)
