"""Offline-task PSD backend selection (SURVEY §7 phase 6: the offline
task library reuses the live-path kernels).

The minimal axon TPU surface has no FFT primitive, so on TPU backends
the FFT-heavy offline transforms — carrier detection
(reference Tasks/CarrierDetector.cpp:67-94), the Doppler spectrum
(Tasks/DopplerCalculator.cpp:52-170), the in-channel estimators and
the CLI ``psd`` — run the Bailey DFT-matmul Pallas kernel
(kernels/fft.py) instead of ``np.fft``.  CPU paths are unchanged.

Semantics note: the Pallas path computes a windowed *averaged
periodogram* at ``fft_size ≤ 16384`` bins (the Bailey factorization
caps A·B at 128·128), where the reference zero-pads one FFT to the
full capture length.  For captures up to 16384 samples the two
coincide (single frame); longer captures trade bin resolution for
frame averaging — the estimator family the live spectrum path already
uses.
"""

from __future__ import annotations

import numpy as np

from sigdigger_tpu.types import WindowFunction, next_pow2

MAX_FFT = 16384          # Bailey A·B ≤ 128·128

_CACHE: dict = {}


def use_pallas(estimator: str = "auto") -> bool:
    """Backend pick: "auto" → Pallas on TPU/axon, np.fft elsewhere;
    "pallas"/"numpy" force."""
    if estimator == "auto":
        import jax

        return jax.default_backend() in ("tpu", "axon")
    return estimator == "pallas"


def pallas_mean_psd(data: np.ndarray, sample_rate: float,
                    fft_size: int | None = None,
                    window: WindowFunction =
                    WindowFunction.BLACKMANN_HARRIS,
                    interpret: bool | None = None) -> np.ndarray:
    """Natural-order mean PSD [fft_size] of ``data`` on the Bailey
    kernel; the tail frame is zero-padded.  Instances are cached per
    (fft_size, frames, window) so repeated same-shape calls reuse the
    compiled kernel."""
    from sigdigger_tpu.kernels.fft import PallasPSD, PallasPSDConfig

    data = np.asarray(data, np.complex64)
    n = len(data)
    if fft_size is None:
        fft_size = min(MAX_FFT, next_pow2(max(n, 16)))
    fft_size = min(fft_size, MAX_FFT)
    frames = max(1, (n + fft_size - 1) // fft_size)
    fpp = max(d for d in range(1, 9) if frames % d == 0)
    key = (fft_size, frames, window, float(sample_rate), interpret)
    psd = _CACHE.get(key)
    if psd is None:
        psd = PallasPSD(
            PallasPSDConfig(fft_size=fft_size, frames_per_block=frames,
                            frames_per_program=fpp),
            float(sample_rate), window, interpret=interpret)
        _CACHE[key] = psd
    buf = np.zeros(frames * fft_size, np.complex64)
    buf[:n] = data
    psd.reset()
    return psd.feed(buf).copy()
