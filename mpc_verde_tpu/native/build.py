"""Build the native host engine: ``python -m mpc_verde_tpu.native.build``."""
from __future__ import annotations

import shutil
import subprocess
import sys
from pathlib import Path


def build(verbose: bool = True) -> Path:
    root = Path(__file__).resolve().parents[2] / "native"
    bdir = root / "build"
    bdir.mkdir(exist_ok=True)
    gen = ["-G", "Ninja"] if shutil.which("ninja") else []
    subprocess.run(["cmake", *gen, ".."], cwd=bdir, check=True,
                   capture_output=not verbose)
    subprocess.run(["cmake", "--build", "."], cwd=bdir, check=True,
                   capture_output=not verbose)
    lib = bdir / "lib" / "libmpcverde_host.so"
    if not lib.is_file():
        raise RuntimeError("build produced no library")
    return lib


if __name__ == "__main__":
    p = build()
    print(f"built {p}")
    sys.exit(0)
