"""Native (C++) runtime kernels, ctypes-loaded.

The library is compiled on first import with g++ (cached next to the
source); everything has a pure-Python fallback, so absence of a compiler
only costs speed, never correctness. See src/comms_native.cpp.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent / "src" / "comms_native.cpp"
_lib: Optional[ctypes.CDLL] = None
_tried = False


class _GLfsrState(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.c_uint64),
        ("polynomial", ctypes.c_uint64),
        ("mask", ctypes.c_uint64),
    ]


def _build() -> Optional[ctypes.CDLL]:
    src = _SRC.read_text()
    tag = hashlib.sha256(src.encode()).hexdigest()[:16]
    cache_dir = Path(
        os.environ.get("POTHOSCOMMS_NATIVE_CACHE",
                       Path(tempfile.gettempdir()) / "pothoscomms_native")
    )
    cache_dir.mkdir(parents=True, exist_ok=True)
    so_path = cache_dir / f"comms_native_{tag}.so"
    if not so_path.exists():
        tmp = so_path.with_suffix(".so.build")
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", str(_SRC), "-o", str(tmp)]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            return None
        os.replace(tmp, so_path)
    try:
        lib = ctypes.CDLL(str(so_path))
    except OSError:
        return None

    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.glfsr_init.argtypes = [ctypes.POINTER(_GLfsrState), ctypes.c_uint64,
                               ctypes.c_uint64]
    lib.glfsr_keystream.argtypes = [ctypes.POINTER(_GLfsrState), u8p,
                                    ctypes.c_size_t]
    lib.scramble_mult.argtypes = [ctypes.POINTER(_GLfsrState), u8p, u8p,
                                  ctypes.c_size_t]
    lib.descramble_mult.argtypes = [ctypes.POINTER(_GLfsrState), u8p, u8p,
                                    ctypes.c_size_t]
    lib.crc8.argtypes = [u8p, ctypes.c_size_t]
    lib.crc8.restype = ctypes.c_uint8
    lib.checksum8.argtypes = [u8p, ctypes.c_size_t]
    lib.checksum8.restype = ctypes.c_uint8
    lib.envelope_follow.argtypes = [f32p, f32p, ctypes.c_size_t,
                                    ctypes.POINTER(ctypes.c_float),
                                    ctypes.c_float, ctypes.c_float]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    """The native library, or None when unavailable (fallbacks apply)."""
    global _lib, _tried
    if not _tried:
        _tried = True
        _lib = _build()
    return _lib


def available() -> bool:
    return get_lib() is not None


# --------------------------------------------------------------------- #
# Wrappers used by the blocks
# --------------------------------------------------------------------- #
class NativeLfsr:
    """Galois LFSR backed by the C++ kernel (state mirrored in ctypes)."""

    def __init__(self, polynomial: int, seed: int):
        self._lib = get_lib()
        self._state = _GLfsrState()
        self._lib.glfsr_init(ctypes.byref(self._state),
                             polynomial & ((1 << 64) - 1),
                             seed & ((1 << 64) - 1))

    @property
    def data(self) -> int:
        return self._state.data

    @data.setter
    def data(self, v: int):
        self._state.data = v & ((1 << 64) - 1)

    def keystream(self, n: int) -> np.ndarray:
        out = np.empty(n, np.uint8)
        self._lib.glfsr_keystream(ctypes.byref(self._state), out, n)
        return out

    def scramble_mult(self, bits: np.ndarray) -> np.ndarray:
        bits = np.ascontiguousarray(bits, np.uint8)
        out = np.empty(len(bits), np.uint8)
        self._lib.scramble_mult(ctypes.byref(self._state), bits, out,
                                len(bits))
        return out

    def descramble_mult(self, bits: np.ndarray) -> np.ndarray:
        bits = np.ascontiguousarray(bits, np.uint8)
        out = np.empty(len(bits), np.uint8)
        self._lib.descramble_mult(ctypes.byref(self._state), bits, out,
                                  len(bits))
        return out


def crc8(data) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    arr = np.ascontiguousarray(data, np.uint8)
    return int(lib.crc8(arr, arr.size))


def envelope_follow(xabs: np.ndarray, envelope: float, attack_gain: float,
                    release_gain: float):
    """Returns (out, new_envelope) or None if native is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    xabs = np.ascontiguousarray(xabs, np.float32)
    out = np.empty_like(xabs)
    env = ctypes.c_float(envelope)
    lib.envelope_follow(xabs, out, xabs.size, ctypes.byref(env),
                        attack_gain, release_gain)
    return out, float(env.value)
