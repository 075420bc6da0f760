"""ctypes binding for the native WAV reader/writer (csrc/wavio.cc).

Build model: the shared library is compiled once per source version into
``~/.cache/audiocodecs_tpu/`` (or ``$ACX_NATIVE_CACHE``) by
:func:`ensure_built` — a single ``g++ -O3 -shared`` invocation, no build
system. Loading order for the binding:

  1. ``$ACX_WAVIO_LIB`` if set (explicit .so path);
  2. a cached build matching the current source hash;
  3. build from ``csrc/wavio.cc`` if a C++ compiler is available;
  4. otherwise the binding reports unavailable and callers fall back to
     the stdlib ``wave`` path (``utils/audio.py``).

``ACX_NATIVE_WAVIO=0`` disables the native path entirely; ``=1`` makes it
required (raises instead of falling back) — useful in deployments that
must not silently regress to the slow reader.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import threading

import numpy as np

__all__ = ["native_wavio_available", "read_wav_native", "write_wav_native",
           "ensure_built"]

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc", "wavio.cc")

_lock = threading.Lock()
_lib = None
_lib_err: str | None = None


def _cache_dir() -> str:
    return os.environ.get(
        "ACX_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "audiocodecs_tpu"))


def ensure_built(src: str = _SRC) -> str:
    """Compile (if needed) and return the shared-library path."""
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(_cache_dir(), f"_wavio_{tag}.so")
    if os.path.exists(out):
        return out
    cxx = os.environ.get("CXX") or shutil.which("g++") or shutil.which("c++")
    if cxx is None:
        raise RuntimeError("no C++ compiler found (set CXX or install g++)")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    tmp = out + f".tmp{os.getpid()}"
    subprocess.run(
        [cxx, "-O3", "-shared", "-fPIC", "-o", tmp, src],
        check=True, capture_output=True,
    )
    os.replace(tmp, out)  # atomic under concurrent builders
    return out


def _load():
    global _lib, _lib_err
    if _lib is not None:
        return _lib
    if _lib_err is not None:
        # a previous load failed — required mode must still raise, not
        # silently return None forever
        if os.environ.get("ACX_NATIVE_WAVIO") == "1":
            raise RuntimeError(
                f"ACX_NATIVE_WAVIO=1 but the native wavio library is "
                f"unavailable: {_lib_err}")
        return None
    with _lock:
        if _lib is not None or _lib_err is not None:
            return _lib
        mode = os.environ.get("ACX_NATIVE_WAVIO", "auto")
        if mode == "0":
            _lib_err = "disabled by ACX_NATIVE_WAVIO=0"
            return None
        try:
            path = os.environ.get("ACX_WAVIO_LIB") or ensure_built()
            lib = ctypes.CDLL(path)
            lib.wavio_read.restype = ctypes.c_int
            lib.wavio_read.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.wavio_write.restype = ctypes.c_int
            lib.wavio_write.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32,
            ]
            lib.wavio_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
            lib.wavio_error.restype = ctypes.c_char_p
            _lib = lib
        except Exception as e:  # no compiler, bad lib, ...
            _lib_err = str(e)
            if mode == "1":
                raise RuntimeError(
                    f"ACX_NATIVE_WAVIO=1 but the native wavio library is "
                    f"unavailable: {e}") from e
        return _lib


def native_wavio_available() -> bool:
    return _load() is not None


def read_wav_native(path: str) -> tuple[np.ndarray, int]:
    """Read via the native library → (``[channels, T]`` float32, rate)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native wavio unavailable: {_lib_err}")
    data = ctypes.POINTER(ctypes.c_float)()
    frames = ctypes.c_int64()
    channels = ctypes.c_int32()
    rate = ctypes.c_int32()
    rc = lib.wavio_read(path.encode(), ctypes.byref(data),
                        ctypes.byref(frames), ctypes.byref(channels),
                        ctypes.byref(rate))
    if rc != 0:
        raise ValueError(
            f"wavio_read({path}): {lib.wavio_error().decode()}")
    n, ch = frames.value, channels.value
    # zero-copy: view the C buffer and free it when the array (and every
    # view derived from it) is garbage collected
    import weakref

    arr = np.ctypeslib.as_array(data, shape=(n * ch,))
    weakref.finalize(arr, lib.wavio_free, data)
    return arr.reshape(n, ch).T, rate.value


def write_wav_native(path: str, sig: np.ndarray, sample_rate: int,
                     bits: int = 16) -> None:
    """Write ``[channels, T]`` or ``[T]`` float32 audio (PCM16 or float32)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native wavio unavailable: {_lib_err}")
    sig = np.asarray(sig, dtype=np.float32)
    if sig.ndim == 1:
        sig = sig[None]
    inter = np.ascontiguousarray(sig.T.reshape(-1))
    rc = lib.wavio_write(
        path.encode(), inter.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sig.shape[1], sig.shape[0], int(sample_rate), int(bits))
    if rc != 0:
        raise ValueError(
            f"wavio_write({path}): {lib.wavio_error().decode()}")
