"""In-channel parameter estimators.

The suscan engine exposes togglable per-inspector estimators reported
through ESTIMATOR messages (reference Suscan/Analyzer.cpp:551-565;
include/Suscan/Estimator.h:26-32; the UI lists 'baud' (non-linear /
FAC-based) and carrier 'offset' estimators in
Default/GenericInspector/InspectorCtl/EstimatorControl.cpp).

- ``baud``:   fast autocorrelation (FFT → |X|^2 → IFFT) peak → symbol
  rate — the same math as the FAC tab (reference
  Default/GenericInspector/FACTab.cpp:181-259).
- ``offset``: spectral centroid → carrier frequency offset in Hz.
"""

from __future__ import annotations

import numpy as np


def estimate_baud(y: np.ndarray, sample_rate: float) -> float | None:
    """Cyclostationary baud estimate from the envelope autocorrelation."""
    n = len(y)
    if n < 256:
        return None
    env = np.abs(np.asarray(y)) ** 2
    env = env - env.mean()
    spec = np.abs(np.fft.rfft(env * np.hanning(n))) ** 2
    # baud line: strongest component above a small lower cutoff
    lo = max(2, int(n / sample_rate * (sample_rate / n) * 4))
    k = int(np.argmax(spec[lo:len(spec) - 1])) + lo
    if spec[k] < 10.0 * np.median(spec[lo:]):
        return None
    return k * sample_rate / n


def estimate_offset(y: np.ndarray, sample_rate: float) -> float | None:
    """Carrier offset via power-weighted spectral centroid."""
    n = len(y)
    if n < 64:
        return None
    spec = np.abs(np.fft.fft(np.asarray(y) * np.hanning(n))) ** 2
    freqs = np.fft.fftfreq(n, 1.0 / sample_rate)
    total = spec.sum()
    if total <= 0:
        return None
    return float((spec * freqs).sum() / total)


_ESTIMATORS = {
    "baud": estimate_baud,
    "offset": estimate_offset,
}


def estimator_ids() -> list[str]:
    return sorted(_ESTIMATORS)


def estimate(est_id: str, y: np.ndarray, sample_rate: float) -> float | None:
    fn = _ESTIMATORS.get(est_id)
    if fn is None:
        return None
    return fn(y, sample_rate)
