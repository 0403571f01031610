"""Full synthetic PAL field decode + sample-rate throughput.

Verifies the vectorized TV processor (sigdigger_tpu/dsp/tv.py) against a
625-line-standard signal at 8 Msps with realistic timing (64 µs lines,
4.7 µs hsync, broad vsync pulses), additive noise and randomly dropped
sync pulses — the component-level equivalent of the reference's
TVProcessorWorker driving `su_tv_processor_t`
(reference Default/GenericInspector/TVProcessorWorker.h:36-76).
"""

from __future__ import annotations

import time

import numpy as np

from sigdigger_tpu.dsp.tv import TVProcessor, TVProcessorParams

FS = 8_000_000.0
LINE_RATE = 15625.0
SPL = int(FS / LINE_RATE)            # 512 samples/line
LINES_PER_FIELD = 312
HSYNC = int(4.7e-6 * FS)             # 37 samples
BLANK = 0.30
WHITE = 0.95


def _make_field(rng: np.ndarray | None, field_idx: int,
                drop_rate: float = 0.0,
                rng_obj: np.random.Generator | None = None) -> np.ndarray:
    """One 312-line field: 3 broad vsync lines + 309 video lines with a
    vertical gradient, horizontal ramp and a bright band at rows
    100-120."""
    lines = np.zeros((LINES_PER_FIELD, SPL), np.float32)
    # vsync: broad pulses (low for ~70% of the line)
    broad = int(0.7 * SPL)
    lines[:3, :broad] = 0.0
    lines[:3, broad:] = BLANK
    ramp = np.linspace(0.0, 1.0, SPL - HSYNC - 20, dtype=np.float32)
    for i in range(3, LINES_PER_FIELD):
        row = i - 3
        # video stays at/above blanking (real composite: only sync dips
        # below black), brightness grows with the row index
        video = BLANK + (WHITE - BLANK) * ramp * \
            (0.3 + 0.7 * row / LINES_PER_FIELD)
        if 100 <= row < 120:
            video = np.full_like(ramp, WHITE)
        line = lines[i]
        line[:HSYNC] = 0.0                       # hsync tip
        line[HSYNC:HSYNC + 20] = BLANK           # back porch
        line[HSYNC + 20:] = video
        if rng_obj is not None and rng_obj.random() < drop_rate:
            line[:HSYNC] = BLANK                 # dropped sync pulse
    return lines.reshape(-1)


def _decode(signal: np.ndarray, chunk: int = 1 << 16
            ) -> tuple[list[np.ndarray], float]:
    params = TVProcessorParams(
        sample_rate=FS, line_rate=LINE_RATE,
        lines_per_frame=LINES_PER_FIELD, pixels_per_line=384)
    tv = TVProcessor(params)
    frames: list[np.ndarray] = []
    t0 = time.perf_counter()
    for i in range(0, len(signal), chunk):
        frames.extend(tv.feed(signal[i:i + chunk]))
    dt = time.perf_counter() - t0
    return frames, len(signal) / dt


def test_pal_field_decode_clean():
    sig = np.concatenate([_make_field(None, k) for k in range(6)])
    frames, _ = _decode(sig)
    assert len(frames) >= 4
    f = frames[2]
    # vertical gradient: row means increase with row index (skip the
    # white band, which is deliberately off-gradient)
    sel = np.r_[10:90, 130:290]
    rows = f.mean(axis=1)[sel]
    corr = np.corrcoef(rows, sel.astype(np.float64))[0, 1]
    assert corr > 0.85, corr
    # bright band lands near rows 100-120 (allow a few lines of field
    # restart offset)
    band = int(np.argmax(np.convolve(f.mean(axis=1),
                                     np.ones(20) / 20, "valid")))
    assert 90 <= band <= 130, band
    # horizontal ramp: pixel values increase along a mid line
    line = f[200]
    assert line[300] > line[50]


def test_pal_decode_noise_and_dropped_syncs():
    rng = np.random.default_rng(7)
    sig = np.concatenate([
        _make_field(None, k, drop_rate=0.05, rng_obj=rng)
        for k in range(6)])
    sig = sig + rng.normal(0.0, 0.02, len(sig)).astype(np.float32)
    frames, _ = _decode(sig)
    assert len(frames) >= 4
    f = frames[2]
    sel = np.r_[10:90, 130:290]
    rows = f.mean(axis=1)[sel]
    corr = np.corrcoef(rows, sel.astype(np.float64))[0, 1]
    assert corr > 0.8, corr


def test_pal_streaming_equals_oneshot():
    sig = np.concatenate([_make_field(None, k) for k in range(4)])
    frames_one, _ = _decode(sig, chunk=len(sig))
    frames_stream, _ = _decode(sig, chunk=50_000)
    assert len(frames_stream) >= len(frames_one) - 1 >= 1
    # middle frames must agree structurally regardless of chunking (the
    # AGC followers see different block boundaries, so compare shape of
    # content, not absolute level)
    a, b = frames_one[1].ravel(), frames_stream[1].ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.98, corr


def test_throughput_exceeds_sample_rate():
    """Decode ≥ 8 Msps in real time (≥ 25 fields/s of PAL) on one CPU
    core — VERDICT round-1 item 6's ≥24 fps bar."""
    sig = np.concatenate([_make_field(None, k) for k in range(25)])
    _, rate = _decode(sig)
    assert rate > FS, f"{rate / 1e6:.1f} Msps < 8 Msps"


def test_device_backend_matches_host():
    """backend="device" resamples lines on the Pallas MXU kernel
    (interpret mode here; the identical program compiles on TPU) and
    reproduces the host decode — same frame structure, pixel values
    within the truncation-vs-interpolation tolerance (the device path
    linearly interpolates where the host gather truncates)."""
    sig = np.concatenate([_make_field(None, k) for k in range(5)])
    params = TVProcessorParams(
        sample_rate=FS, line_rate=LINE_RATE,
        lines_per_frame=LINES_PER_FIELD, pixels_per_line=384)
    host = TVProcessor(params, backend="host")
    dev = TVProcessor(params, backend="device")
    assert dev.backend == "device"
    fh: list[np.ndarray] = []
    fd: list[np.ndarray] = []
    for i in range(0, len(sig), 1 << 16):
        fh.extend(host.feed(sig[i:i + (1 << 16)]))
        fd.extend(dev.feed(sig[i:i + (1 << 16)]))
    assert len(fd) == len(fh) >= 3
    a, b = fh[1], fd[1]
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.995, corr
    assert float(np.mean(np.abs(a - b))) < 0.02
