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


def estimate_baud(y: np.ndarray, sample_rate: float,
                  estimator: str = "auto") -> float | None:
    """Cyclostationary baud estimate from the envelope autocorrelation.
    On TPU backends the envelope line spectrum runs on the Bailey
    Pallas PSD (tasks/psdutil.py — no FFT primitive on axon)."""
    from sigdigger_tpu.tasks.psdutil import pallas_mean_psd, use_pallas
    from sigdigger_tpu.types import WindowFunction

    n = len(y)
    if n < 256:
        return None
    env = np.abs(np.asarray(y)) ** 2
    env = env - env.mean()
    if use_pallas(estimator):
        nat = pallas_mean_psd(env.astype(np.complex64), sample_rate,
                              window=WindowFunction.HANN)
        nb = len(nat)
        spec = nat[:nb // 2 + 1]
        scale = sample_rate / nb
    else:
        spec = np.abs(np.fft.rfft(env * np.hanning(n))) ** 2
        scale = sample_rate / n
    # baud line: strongest component above a small lower cutoff
    lo = max(2, int(n / sample_rate * (sample_rate / n) * 4))
    k = int(np.argmax(spec[lo:len(spec) - 1])) + lo
    if spec[k] < 10.0 * np.median(spec[lo:]):
        return None
    return k * scale


def estimate_offset(y: np.ndarray, sample_rate: float,
                    estimator: str = "auto") -> float | None:
    """Carrier offset via power-weighted spectral centroid (Bailey
    Pallas PSD on TPU backends)."""
    from sigdigger_tpu.tasks.psdutil import pallas_mean_psd, use_pallas
    from sigdigger_tpu.types import WindowFunction

    n = len(y)
    if n < 64:
        return None
    if use_pallas(estimator):
        spec = pallas_mean_psd(np.asarray(y, np.complex64),
                               sample_rate,
                               window=WindowFunction.HANN)
        nb = len(spec)
        freqs = np.fft.fftfreq(nb, 1.0 / sample_rate)
    else:
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
