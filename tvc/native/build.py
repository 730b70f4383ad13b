"""Build the native image-ops library: ``python -m tvc.native.build``."""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path


def build(verbose: bool = False) -> Path:
    src = Path(__file__).with_name("image_ops.cpp")
    out = Path(__file__).with_name("_image_ops.so")
    gxx = shutil.which("g++") or shutil.which("clang++")
    if gxx is None:
        raise RuntimeError("no C++ compiler found")
    cmd = [
        gxx, "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        "-o", str(out), str(src),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=not verbose)
    except subprocess.CalledProcessError:
        # clang/no-openmp fallback
        cmd = [gxx, "-O3", "-shared", "-fPIC", "-o", str(out), str(src)]
        subprocess.run(cmd, check=True, capture_output=not verbose)
    return out


if __name__ == "__main__":
    path = build(verbose=True)
    print(f"built: {path}")
