"""Build the native helper library: ``python -m ...native.build``.

Compiles ``src/rtow_native.cpp`` with g++ into ``librtow_native.so`` next to
``runtime.py``.  The framework works without it (pure-Python fallbacks); the
library accelerates PPM serialization and BVH construction and mirrors the
reference's host-C++ layer (SURVEY.md §2).
"""

from __future__ import annotations

import os
import subprocess
import sys


def build(verbose: bool = True) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "src", "rtow_native.cpp")
    out = os.path.join(here, "librtow_native.so")
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        "-o", out, src,
    ]
    if verbose:
        print(" ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
