"""Build the native sampler shared library.

Usage: ``python -m gcc_tpu.sampling.build``

One translation unit, no external deps — a direct g++ invocation beats a
cmake project here. The .so lands next to this file so ``native.py`` can
find it without installation.
"""

from __future__ import annotations

import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(os.path.dirname(_HERE))
SRC = os.path.join(_REPO, "csrc", "sampler.cpp")
OUT = os.path.join(_HERE, "libgccsampler.so")


def build(force: bool = False) -> str:
    """Compile csrc/sampler.cpp → gcc_tpu/sampling/libgccsampler.so."""
    if not force and os.path.exists(OUT) and (
        os.path.getmtime(OUT) >= os.path.getmtime(SRC)
    ):
        return OUT
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        "-fno-exceptions", "-o", OUT, SRC,
    ]
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    print(path)
