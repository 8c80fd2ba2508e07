"""Native (C++) host-side kernels with lazy build and numpy fallback.

``get_native()`` returns the compiled extension module or None.  The first call
builds it in-place with the system toolchain (g++) if the shared object is
missing; the converter / quantizers fall back to numpy when unavailable.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_native = None
_tried = False


def _so_path() -> str:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_HERE, f"_quant_native{suffix}")


def build(verbose: bool = False) -> bool:
    """Compile the extension in place. Returns True on success."""
    src = os.path.join(_HERE, "quant_native.cpp")
    out = _so_path()
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        f"-I{include}", src, "-o", out,
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=180)
        if verbose and res.returncode != 0:
            print(res.stderr, file=sys.stderr)
        return res.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def get_native():
    """Import (building if needed) the native module, or None."""
    global _native, _tried
    if _native is not None or _tried:
        return _native
    _tried = True
    if not os.path.exists(_so_path()):
        if not build():
            return None
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location("_quant_native", _so_path())
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _native = mod
    except Exception:
        _native = None
    return _native
