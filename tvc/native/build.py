"""Build the native libraries: ``python -m tvc.native.build``."""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path

#: (source, output) pairs — one shared object per translation unit
TARGETS = (
    ("image_ops.cpp", "_image_ops.so"),
    ("bpe_tokenizer.cpp", "_bpe_tokenizer.so"),
)


def _compile(gxx: str, src: Path, out: Path, verbose: bool) -> None:
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


def build(verbose: bool = False, only: str | None = None) -> Path:
    """Build all native libs (or the one whose output name is ``only``);
    returns the last built path."""
    gxx = shutil.which("g++") or shutil.which("clang++")
    if gxx is None:
        raise RuntimeError("no C++ compiler found")
    here = Path(__file__).parent
    out_path = None
    for src_name, out_name in TARGETS:
        if only is not None and out_name != only:
            continue
        out_path = here / out_name
        _compile(gxx, here / src_name, out_path, verbose)
    return out_path


if __name__ == "__main__":
    path = build(verbose=True)
    print(f"built: {path}")
