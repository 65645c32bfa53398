"""Native runtime components (C++), built on demand with the system toolchain.

The reference implements its telemetry/IO runtime in C++ (`core/src/telemetry/`,
`core/src/io/`); this package provides the TPU-build equivalents compiled lazily
with g++ and loaded through ctypes (no pybind11 dependency).
"""

import ctypes
import os
import subprocess
import threading

_BUILD_LOCK = threading.Lock()
_LIBS = {}


def _build_and_load(name: str, extra_libs=("-lz",)) -> ctypes.CDLL:
    """Compile `<name>.cc` (once, cached by mtime) and dlopen it."""
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, f"{name}.cc")
    out = os.path.join(here, f"_{name}.so")
    with _BUILD_LOCK:
        if name in _LIBS:
            return _LIBS[name]
        if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
            cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", out,
                   *extra_libs]
            subprocess.run(cmd, check=True, capture_output=True)
        lib = ctypes.CDLL(out)
        _LIBS[name] = lib
        return lib


def load_tlmc() -> ctypes.CDLL:
    lib = _build_and_load("tlmc")
    lib.tlmc_write.restype = ctypes.c_int
    lib.tlmc_open.restype = ctypes.c_void_p
    lib.tlmc_open.argtypes = [ctypes.c_char_p]
    lib.tlmc_close.argtypes = [ctypes.c_void_p]
    lib.tlmc_num_constants.argtypes = [ctypes.c_void_p]
    lib.tlmc_num_constants.restype = ctypes.c_int32
    lib.tlmc_constant_key.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.tlmc_constant_key.restype = ctypes.c_char_p
    lib.tlmc_constant_value.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.tlmc_constant_value.restype = ctypes.POINTER(ctypes.c_char)
    lib.tlmc_num_vars.argtypes = [ctypes.c_void_p]
    lib.tlmc_num_vars.restype = ctypes.c_int32
    lib.tlmc_var_name.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.tlmc_var_name.restype = ctypes.c_char_p
    lib.tlmc_var_dtype.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.tlmc_var_dtype.restype = ctypes.c_uint8
    lib.tlmc_var_rows.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.tlmc_var_rows.restype = ctypes.c_uint64
    lib.tlmc_var_read.argtypes = [ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p]
    return lib
