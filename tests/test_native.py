"""Native C++ runtime (sdcore): converters, framers, ring buffer.

Each test exercises the active path (native if the toolchain built it,
numpy fallback otherwise) and — when native is available — checks it
against the numpy reference for equality.
"""

import numpy as np

from sigdigger_tpu import native
from sigdigger_tpu.native import (
    HAVE_NATIVE,
    RingBuffer,
    convert_interleaved,
    frame_psd,
    frame_windows,
)


def test_native_built():
    # g++ is in the image; the native path must be active here
    assert HAVE_NATIVE


def test_convert_u8():
    raw = np.array([255, 127, 0, 128, 64, 191], np.uint8)
    out = convert_interleaved(raw)
    assert out.dtype == np.complex64
    assert np.isclose(out[0].real, 1.0) and abs(out[0].imag) < 0.005
    assert np.isclose(out[1].real, -1.0)


def test_convert_i16_matches_python():
    rng = np.random.default_rng(0)
    raw = rng.integers(-32768, 32767, 2000, dtype=np.int16)
    out = convert_interleaved(raw)
    from sigdigger_tpu.sources.file import convert_raw
    from sigdigger_tpu.types import SampleFormat

    ref = convert_raw(raw, SampleFormat.RAW_INT16)
    assert np.allclose(out, ref, atol=1e-7)


def test_convert_i8():
    raw = np.array([127, -128, 0, 64], np.int8)
    out = convert_interleaved(raw)
    assert np.isclose(out[0].real, 127 / 128) and \
        np.isclose(out[0].imag, -1.0)


def test_frame_windows_matches_numpy():
    m, k, d = 64, 16, 4
    ext = (np.arange(k - 1 + m * d) * (1 + 2j)).astype(np.complex64)
    re, im = frame_windows(ext, m, k, d)
    w = np.lib.stride_tricks.as_strided(
        ext, shape=(m, k), strides=(ext.strides[0] * d, ext.strides[0]))
    assert np.array_equal(re, w.real)
    assert np.array_equal(im, w.imag)


def test_frame_psd_matches_numpy():
    f, a, b = 4, 8, 16
    n = a * b
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(f * n) + 1j * rng.standard_normal(f * n)
         ).astype(np.complex64)
    taps = rng.standard_normal(n).astype(np.float32)
    re, im = frame_psd(x, taps, f, a, b)
    frames = x.reshape(f, n) * taps[None, :]
    ref = frames.reshape(f, a, b).transpose(1, 0, 2).reshape(a, f * b)
    assert np.allclose(re, ref.real, atol=1e-6)
    assert np.allclose(im, ref.imag, atol=1e-6)


def test_ring_buffer_basics():
    rb = RingBuffer(1024)
    assert rb.readable == 0 and rb.writable == 1024
    data = (np.arange(100) + 1j).astype(np.complex64)
    assert rb.write(data) == 100
    assert rb.readable == 100
    out = rb.read(60)
    assert np.array_equal(out, data[:60])
    out2 = rb.read(100)          # short read
    assert np.array_equal(out2, data[60:])
    assert rb.readable == 0


def test_ring_buffer_wraparound_and_overflow():
    rb = RingBuffer(128)
    a = np.full(100, 1 + 1j, np.complex64)
    assert rb.write(a) == 100
    rb.read(90)
    b = (np.arange(100) * 1j).astype(np.complex64)
    wrote = rb.write(b)          # wraps; capacity 128, used 10
    assert wrote == 100
    assert rb.write(np.ones(50, np.complex64)) == 128 - 110
    got = rb.read(200)
    assert len(got) == 128
    assert np.array_equal(got[10:110], b)


def test_ring_buffer_threaded():
    import threading

    rb = RingBuffer(4096)
    n_total = 200_000
    src = np.arange(n_total).astype(np.complex64)
    received = []

    def producer():
        pos = 0
        while pos < n_total:
            pos += rb.write(src[pos:pos + 1000])

    def consumer():
        got = 0
        while got < n_total:
            chunk = rb.read(777)
            if len(chunk):
                received.append(chunk)
                got += len(chunk)

    tp = threading.Thread(target=producer)
    tc = threading.Thread(target=consumer)
    tp.start(); tc.start()
    tp.join(timeout=30); tc.join(timeout=30)
    out = np.concatenate(received)
    assert len(out) == n_total
    assert np.array_equal(out, src)
