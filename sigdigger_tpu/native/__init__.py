"""Native host runtime (C++): format converters, window framer, SPSC
ring buffer.

Builds ``libsdcore.so`` from ``src/sdcore.cpp`` on first import (g++,
cached next to the source) and binds it with ctypes.  Every entry point
has a numpy fallback, so the package works without a toolchain; use
``HAVE_NATIVE`` to check which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "sdcore.cpp")
_LIB = os.path.join(_DIR, "libsdcore.so")

_lib = None


def _build() -> str | None:
    if os.path.exists(_LIB) and \
            os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
        return _LIB
    except (OSError, subprocess.SubprocessError):
        return None


def _load():
    global _lib
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    i64 = ctypes.c_int64
    fp = ctypes.POINTER(ctypes.c_float)
    for name, args, res in [
        ("sd_convert_u8", [ctypes.c_void_p, fp, i64], None),
        ("sd_convert_i8", [ctypes.c_void_p, fp, i64], None),
        ("sd_convert_i16", [ctypes.c_void_p, fp, i64], None),
        ("sd_frame_windows", [fp, fp, fp, i64, i64, i64], None),
        ("sd_frame_windows_i16",
         [fp, ctypes.c_void_p, ctypes.c_void_p, i64, i64, i64,
          ctypes.c_float], None),
        ("sd_frame_windows_i8",
         [fp, ctypes.c_void_p, ctypes.c_void_p, i64, i64, i64,
          ctypes.c_float], None),
        ("sd_frame_psd", [fp, fp, fp, fp, i64, i64, i64], None),
        ("sd_ring_new", [i64], ctypes.c_void_p),
        ("sd_ring_free", [ctypes.c_void_p], None),
        ("sd_ring_readable", [ctypes.c_void_p], i64),
        ("sd_ring_writable", [ctypes.c_void_p], i64),
        ("sd_ring_write", [ctypes.c_void_p, fp, i64], i64),
        ("sd_ring_read", [ctypes.c_void_p, fp, i64], i64),
    ]:
        fn = getattr(lib, name)
        fn.argtypes = args
        fn.restype = res
    _lib = lib
    return lib


_load()
HAVE_NATIVE = _lib is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


# ---------------------------------------------------------------------
# converters
# ---------------------------------------------------------------------

def convert_interleaved(raw: np.ndarray) -> np.ndarray:
    """u8/i8/i16 interleaved I/Q → complex64 (native when available)."""
    n_pairs = len(raw) // 2
    if _lib is None:
        from sigdigger_tpu.sources.file import convert_raw
        from sigdigger_tpu.types import SampleFormat

        fmt = {np.uint8: SampleFormat.RAW_UINT8,
               np.int8: SampleFormat.RAW_INT8,
               np.int16: SampleFormat.RAW_INT16}[raw.dtype.type]
        return convert_raw(raw[: 2 * n_pairs], fmt)
    out = np.empty(2 * n_pairs, np.float32)
    raw = np.ascontiguousarray(raw[: 2 * n_pairs])
    if raw.dtype == np.uint8:
        _lib.sd_convert_u8(raw.ctypes.data, _fptr(out), n_pairs)
    elif raw.dtype == np.int8:
        _lib.sd_convert_i8(raw.ctypes.data, _fptr(out), n_pairs)
    elif raw.dtype == np.int16:
        _lib.sd_convert_i16(raw.ctypes.data, _fptr(out), n_pairs)
    else:
        raise ValueError(f"unsupported dtype {raw.dtype}")
    return out.view(np.complex64)


# ---------------------------------------------------------------------
# framers
# ---------------------------------------------------------------------

def frame_windows(ext: np.ndarray, m: int, k: int, d: int
                  ) -> tuple[np.ndarray, np.ndarray]:
    """complex64 ext[(K-1) + M*D] → (re[M,K], im[M,K]) stride-D windows."""
    ext = np.ascontiguousarray(ext, np.complex64)
    if _lib is None:
        w = np.lib.stride_tricks.as_strided(
            ext, shape=(m, k),
            strides=(ext.strides[0] * d, ext.strides[0]))
        return (np.ascontiguousarray(w.real),
                np.ascontiguousarray(w.imag))
    out_re = np.empty((m, k), np.float32)
    out_im = np.empty((m, k), np.float32)
    _lib.sd_frame_windows(
        ext.view(np.float32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)),
        _fptr(out_re), _fptr(out_im), m, k, d)
    return out_re, out_im


def frame_psd(x: np.ndarray, taps: np.ndarray, f: int, a: int, b: int
              ) -> tuple[np.ndarray, np.ndarray]:
    """complex64 x[F*N] → windowed Bailey layout ([A, F*B] re, im)."""
    x = np.ascontiguousarray(x, np.complex64)
    taps32 = np.ascontiguousarray(taps, np.float32)
    if _lib is None:
        frames = x.reshape(f, a * b) * taps32[None, :]
        arr = frames.reshape(f, a, b).transpose(1, 0, 2).reshape(a, f * b)
        return (np.ascontiguousarray(arr.real),
                np.ascontiguousarray(arr.imag))
    out_re = np.empty((a, f * b), np.float32)
    out_im = np.empty((a, f * b), np.float32)
    _lib.sd_frame_psd(
        x.view(np.float32).ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _fptr(taps32), _fptr(out_re), _fptr(out_im), f, a, b)
    return out_re, out_im


def frame_windows_packed(ext: np.ndarray, m: int, k: int,
                         d: int) -> np.ndarray:
    """Like :func:`frame_windows` but re/im planes stacked into ONE
    contiguous [2M, K] buffer (rows [0, M) = re, [M, 2M) = im) so the
    host→device upload is a single transfer — one tunnel RTT instead of
    two (the Pallas kernels read both planes from the same buffer via
    two BlockSpecs)."""
    ext = np.ascontiguousarray(ext, np.complex64)
    out = np.empty((2 * m, k), np.float32)
    if _lib is None:
        w = np.lib.stride_tricks.as_strided(
            ext, shape=(m, k),
            strides=(ext.strides[0] * d, ext.strides[0]))
        out[:m] = w.real
        out[m:] = w.imag
        return out
    _lib.sd_frame_windows(
        ext.view(np.float32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)),
        _fptr(out[:m]), _fptr(out[m:]), m, k, d)
    return out


def frame_windows_packed_i16(ext: np.ndarray, m: int, k: int, d: int,
                             scale: float) -> np.ndarray:
    """:func:`frame_windows_packed` quantized to int16 (saturating,
    ``scale`` counts per unit) — half the upload bytes; the kernel
    multiplies by 1/scale after the int16 load."""
    ext = np.ascontiguousarray(ext, np.complex64)
    out = np.empty((2 * m, k), np.int16)
    if _lib is None:
        w = np.lib.stride_tricks.as_strided(
            ext, shape=(m, k),
            strides=(ext.strides[0] * d, ext.strides[0]))
        np.clip(np.rint(w.real * scale), -32768, 32767, out[:m],
                casting="unsafe")
        np.clip(np.rint(w.imag * scale), -32768, 32767, out[m:],
                casting="unsafe")
        return out
    _lib.sd_frame_windows_i16(
        ext.view(np.float32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)),
        out[:m].ctypes.data, out[m:].ctypes.data, m, k, d,
        float(scale))
    return out


def frame_windows_packed_i8(ext: np.ndarray, m: int, k: int, d: int,
                            scale: float) -> np.ndarray:
    """:func:`frame_windows_packed` quantized to int8 (saturating,
    ``scale`` counts per unit) — a quarter of the f32 upload bytes.
    8 bits is the wire precision of RTL-SDR-class front ends; the
    kernel multiplies by 1/scale after the int8 load."""
    ext = np.ascontiguousarray(ext, np.complex64)
    out = np.empty((2 * m, k), np.int8)
    if _lib is None:
        w = np.lib.stride_tricks.as_strided(
            ext, shape=(m, k),
            strides=(ext.strides[0] * d, ext.strides[0]))
        np.clip(np.rint(w.real * scale), -128, 127, out[:m],
                casting="unsafe")
        np.clip(np.rint(w.imag * scale), -128, 127, out[m:],
                casting="unsafe")
        return out
    _lib.sd_frame_windows_i8(
        ext.view(np.float32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)),
        out[:m].ctypes.data, out[m:].ctypes.data, m, k, d,
        float(scale))
    return out


def frame_psd_packed(x: np.ndarray, taps: np.ndarray, f: int, a: int,
                     b: int) -> np.ndarray:
    """Like :func:`frame_psd` but packed into ONE [2A, F·B] buffer
    (rows [0, A) = re, [A, 2A) = im) for a single-transfer upload."""
    x = np.ascontiguousarray(x, np.complex64)
    taps32 = np.ascontiguousarray(taps, np.float32)
    out = np.empty((2 * a, f * b), np.float32)
    if _lib is None:
        frames = x.reshape(f, a * b) * taps32[None, :]
        arr = frames.reshape(f, a, b).transpose(1, 0, 2).reshape(a, f * b)
        out[:a] = arr.real
        out[a:] = arr.imag
        return out
    _lib.sd_frame_psd(
        x.view(np.float32).ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _fptr(taps32), _fptr(out[:a]), _fptr(out[a:]), f, a, b)
    return out


# ---------------------------------------------------------------------
# ring buffer
# ---------------------------------------------------------------------

class RingBuffer:
    """Lock-free SPSC IQ ring (native; deque fallback)."""

    def __init__(self, capacity: int) -> None:
        assert capacity > 0 and capacity & (capacity - 1) == 0
        self.capacity = capacity
        if _lib is not None:
            self._h = _lib.sd_ring_new(capacity)
        else:
            self._h = None
            self._buf = np.zeros(capacity, np.complex64)
            self._head = 0
            self._tail = 0

    @property
    def readable(self) -> int:
        if self._h is not None:
            return int(_lib.sd_ring_readable(self._h))
        return self._head - self._tail

    @property
    def writable(self) -> int:
        return self.capacity - self.readable

    def write(self, iq: np.ndarray) -> int:
        iq = np.ascontiguousarray(iq, np.complex64)
        if self._h is not None:
            return int(_lib.sd_ring_write(
                self._h,
                iq.view(np.float32).ctypes.data_as(
                    ctypes.POINTER(ctypes.c_float)), len(iq)))
        n = min(len(iq), self.writable)
        idx = (self._head + np.arange(n)) % self.capacity
        self._buf[idx] = iq[:n]
        self._head += n
        return n

    def read(self, n: int) -> np.ndarray:
        if self._h is not None:
            out = np.empty(n, np.complex64)
            got = int(_lib.sd_ring_read(
                self._h,
                out.view(np.float32).ctypes.data_as(
                    ctypes.POINTER(ctypes.c_float)), n))
            return out[:got]
        got = min(n, self.readable)
        idx = (self._tail + np.arange(got)) % self.capacity
        self._tail += got
        return self._buf[idx].copy()

    def __del__(self):
        if getattr(self, "_h", None) is not None and _lib is not None:
            _lib.sd_ring_free(self._h)
            self._h = None
