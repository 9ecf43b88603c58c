"""ctypes loader for the native keccak/STROBE core (native/keccak.c).

Builds the shared library on first use (gcc -O3) and memoizes; callers
fall back to the pure-Python implementation when a toolchain is absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

_LIB = None
_TRIED = False


def load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    src = os.path.join(root, "native", "keccak.c")
    so = os.path.join(root, "native", "libvpinkeccak.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["gcc", "-O3", "-shared", "-fPIC", "-o", so, src],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        u8p = ctypes.POINTER(ctypes.c_ubyte)
        lib.keccak_f1600.argtypes = [u8p]
        for name in ("strobe_absorb", "strobe_overwrite", "strobe_squeeze"):
            getattr(lib, name).argtypes = [
                u8p, ctypes.POINTER(ctypes.c_int32), u8p, ctypes.c_int64]
        lib.strobe_run_f.argtypes = [u8p, ctypes.POINTER(ctypes.c_int32)]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB
