"""ctypes bindings for the native IO kernels (mfas_tpu/data/cpp/mfas_io.cpp),
with transparent numpy fallbacks when no C++ toolchain is available.

The library is built once on first use (g++ -O3 -shared) and cached next to
the source. All entry points hold no Python state and release the GIL for
the duration of the call (ctypes does this automatically), so the MapLoader
threads overlap parse/normalize work with device steps.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "cpp", "mfas_io.cpp")


def _host_tag():
    """Short tag of the build host's CPU: -march=native code carried to a
    different machine (image copy, rsync) must trigger a rebuild rather
    than SIGILL at the first call."""
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            txt = "".join(l for l in f if l.startswith(("model name",
                                                        "flags")))
    except OSError:
        txt = os.uname().machine
    return hashlib.md5(txt.encode()).hexdigest()[:10]


_SO = os.path.join(_HERE, "cpp", f"libmfas_io-{_host_tag()}.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build():
    # compile to a private temp path, then rename: publication is atomic,
    # so a concurrent process (multi-host launch, bench subprocess) never
    # CDLLs a half-written .so
    tmp = f"{_SO}.build-{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
           "-std=c++17", _SRC, "-o", tmp]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, _SO)


def get_lib():
    """The loaded library, or None if unavailable (numpy fallback used)."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.mfas_parse_skeleton.restype = ctypes.c_int
            lib.mfas_parse_skeleton.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
            lib.mfas_gather_normalize_u8.restype = None
            lib.mfas_gather_normalize_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int]
            lib.mfas_gather_f32.restype = None
            lib.mfas_gather_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int]
            _lib = lib
        except Exception as e:  # pragma: no cover
            print(f"WARNING: native mfas_io unavailable ({e}); "
                  "falling back to numpy")
            _build_failed = True
        return _lib


def _fptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def parse_skeleton(path, max_frames):
    """-> ((3, max_frames, 25, 2) float32, num_frames_in_file)."""
    lib = get_lib()
    out = np.zeros((3, max_frames, 25, 2), np.float32)
    if lib is None:
        from mfas_tpu.data.ntu import get_3D_skeleton
        full = get_3D_skeleton(path)
        T = min(full.shape[1], max_frames)
        out[:, :T] = full[:, :T]
        return out, full.shape[1]
    n = lib.mfas_parse_skeleton(path.encode(), _fptr(out), max_frames)
    if n == -2:
        raise IOError(f"truncated or malformed skeleton file {path}")
    if n < 0:
        raise IOError(f"failed to parse skeleton file {path}")
    return out, n


def _default_threads(num_threads):
    n = os.cpu_count() or 1
    return max(1, min(num_threads if num_threads else n, n))


def gather_normalize_u8(base, indices, mean, std, num_threads=None):
    """base: (N, ...) uint8 C-contiguous with trailing channel dim matching
    len(mean); -> (len(indices), ...) float32 = (base[idx]/255 - mean)/std."""
    base = np.ascontiguousarray(base)
    indices = np.ascontiguousarray(indices, np.int64)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    sample_shape = base.shape[1:]
    lib = get_lib()
    if lib is None:
        sel = base[indices].astype(np.float32) / 255.0
        return ((sel - mean) / std).astype(np.float32)
    out = np.empty((len(indices),) + sample_shape, np.float32)
    lib.mfas_gather_normalize_u8(
        base.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(indices), int(np.prod(sample_shape)), _fptr(mean), _fptr(std),
        len(mean), _fptr(out), _default_threads(num_threads))
    return out


def gather_f32(base, indices, num_threads=None):
    base = np.ascontiguousarray(base, np.float32)
    indices = np.ascontiguousarray(indices, np.int64)
    sample_shape = base.shape[1:]
    lib = get_lib()
    if lib is None:
        return base[indices].copy()
    out = np.empty((len(indices),) + sample_shape, np.float32)
    lib.mfas_gather_f32(
        _fptr(base),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(indices), int(np.prod(sample_shape)), _fptr(out),
        _default_threads(num_threads))
    return out
