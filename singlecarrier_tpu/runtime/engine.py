"""ctypes binding to the native stream IO engine (native/scio.cc).

Builds ``libscio.so`` on demand (``make -C native``).  The engine does
the host-side heavy lifting the reference did with a single-channel
fread loop (reference: src/qpsk.c:436-458): multi-channel
deinterleaving, frame assembly (lock-free SPSC ring), and mmap'd PCM
file access, so Python only moves ready-to-ship
[n_channels, frame_size] blocks to the device.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libscio.so"))

_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR), "-s"],
                   check=True)


def load_library() -> ctypes.CDLL:
    """Load (building if needed) libscio."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)

    i16p = ctypes.POINTER(ctypes.c_int16)
    lib.scio_deinterleave.argtypes = [i16p, i16p, ctypes.c_long,
                                      ctypes.c_long]
    lib.scio_interleave.argtypes = [i16p, i16p, ctypes.c_long,
                                    ctypes.c_long]
    lib.scio_ring_create.restype = ctypes.c_void_p
    lib.scio_ring_create.argtypes = [ctypes.c_long] * 3
    lib.scio_ring_destroy.argtypes = [ctypes.c_void_p]
    lib.scio_ring_blocks_ready.argtypes = [ctypes.c_void_p]
    lib.scio_ring_blocks_ready.restype = ctypes.c_long
    lib.scio_ring_push_interleaved.argtypes = [ctypes.c_void_p, i16p,
                                               ctypes.c_long]
    lib.scio_ring_push_interleaved.restype = ctypes.c_long
    lib.scio_ring_pop_block.argtypes = [ctypes.c_void_p, i16p]
    lib.scio_ring_pop_block.restype = ctypes.c_int
    lib.scio_file_open.restype = ctypes.c_void_p
    lib.scio_file_open.argtypes = [ctypes.c_char_p]
    lib.scio_file_samples.argtypes = [ctypes.c_void_p]
    lib.scio_file_samples.restype = ctypes.c_long
    lib.scio_file_read.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                   ctypes.c_long, i16p]
    lib.scio_file_read.restype = ctypes.c_long
    lib.scio_file_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))


def deinterleave(data: np.ndarray, n_channels: int) -> np.ndarray:
    """[n_samples*n_channels] interleaved -> [n_channels, n_samples]."""
    lib = load_library()
    data = np.ascontiguousarray(data, np.int16)
    n_samples = data.size // n_channels
    out = np.empty((n_channels, n_samples), np.int16)
    lib.scio_deinterleave(_ptr(data), _ptr(out), n_samples, n_channels)
    return out


def interleave(chans: np.ndarray) -> np.ndarray:
    """[n_channels, n_samples] -> interleaved [n_samples*n_channels]."""
    lib = load_library()
    chans = np.ascontiguousarray(chans, np.int16)
    n_channels, n_samples = chans.shape
    out = np.empty(n_samples * n_channels, np.int16)
    lib.scio_interleave(_ptr(chans), _ptr(out), n_samples, n_channels)
    return out


class FrameRing:
    """Lock-free SPSC ring of [n_channels, frame_size] blocks."""

    def __init__(self, n_channels: int, frame_size: int,
                 capacity_blocks: int = 8):
        self._lib = load_library()
        self.n_channels = n_channels
        self.frame_size = frame_size
        self._ring = self._lib.scio_ring_create(
            n_channels, frame_size, capacity_blocks)

    def push(self, interleaved: np.ndarray) -> int:
        """Push [n_samples, n_channels] interleaved int16; returns
        samples consumed."""
        data = np.ascontiguousarray(interleaved, np.int16)
        n_samples = data.size // self.n_channels
        return self._lib.scio_ring_push_interleaved(
            self._ring, _ptr(data), n_samples)

    @property
    def blocks_ready(self) -> int:
        return self._lib.scio_ring_blocks_ready(self._ring)

    def pop(self) -> Optional[np.ndarray]:
        out = np.empty((self.n_channels, self.frame_size), np.int16)
        if self._lib.scio_ring_pop_block(self._ring, _ptr(out)):
            return out
        return None

    def close(self) -> None:
        if self._ring:
            self._lib.scio_ring_destroy(self._ring)
            self._ring = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class PcmFile:
    """mmap-backed int16 PCM file (zero-padded reads past EOF)."""

    def __init__(self, path: str):
        self._lib = load_library()
        self._f = self._lib.scio_file_open(path.encode())
        if not self._f:
            raise FileNotFoundError(path)

    @property
    def n_samples(self) -> int:
        return self._lib.scio_file_samples(self._f)

    def read(self, offset: int, count: int) -> np.ndarray:
        out = np.empty(count, np.int16)
        self._lib.scio_file_read(self._f, offset, count, _ptr(out))
        return out

    def close(self) -> None:
        if self._f:
            self._lib.scio_file_close(self._f)
            self._f = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
