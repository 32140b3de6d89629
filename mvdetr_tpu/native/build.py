"""Build the native host-path extension in place.

Run ``python -m mvdetr_tpu.native.build`` or let
:mod:`mvdetr_tpu.native` build lazily on first import. Uses setuptools'
C-extension machinery (no pybind11 dependency).
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

HERE = os.path.dirname(os.path.abspath(__file__))


def extension_path() -> str:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(HERE, f"_dataio{suffix}")


def build(verbose: bool = False) -> bool:
    """Compile dataio.cpp -> _dataio extension next to this file."""
    src = os.path.join(HERE, "dataio.cpp")
    out = extension_path()
    include = sysconfig.get_path("include")
    cxx = os.environ.get("CXX", "g++")
    cmd = [
        cxx, "-O3", "-shared", "-fPIC", "-std=c++17", "-march=native",
        f"-I{include}", src, "-o", out,
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if verbose or res.returncode != 0:
            sys.stderr.write(res.stdout + res.stderr)
        return res.returncode == 0 and os.path.exists(out)
    except Exception as e:  # compiler missing etc.
        if verbose:
            sys.stderr.write(f"native build failed: {e}\n")
        return False


if __name__ == "__main__":
    ok = build(verbose=True)
    print("built" if ok else "FAILED", extension_path())
    sys.exit(0 if ok else 1)
