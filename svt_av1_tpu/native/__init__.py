"""Native (C) host components.

``get_ec()`` returns the compiled ec_native module, building it with the
system compiler on first use (no pip deps; plain CPython C API).  Falls
back to None when no compiler is available — callers then use the pure
Python reference implementations in codec/."""
from __future__ import annotations

import importlib.util
import os
import subprocess
import sysconfig

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "ec_native.so")
_SRC = os.path.join(_DIR, "ec_native.c")
_mod = None
_tried = False


def build() -> bool:
    inc = sysconfig.get_paths()["include"]
    cmd = ["cc", "-O2", "-shared", "-fPIC", f"-I{inc}", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_ec():
    global _mod, _tried
    if _mod is not None or _tried:
        return _mod
    _tried = True
    if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                   < os.path.getmtime(_SRC)):
        if not build():
            return None
    spec = importlib.util.spec_from_file_location("ec_native", _SO)
    try:
        _mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(_mod)
    except ImportError:
        _mod = None
    return _mod
