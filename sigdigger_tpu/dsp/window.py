"""Spectral window taps — the `su_taps_apply_*` equivalent.

The reference applies windows sample-by-sample in C (e.g.
`su_taps_apply_blackmann_harris_complex`, reference
Tasks/CarrierDetector.cpp:87-89); the analyzer supports none / hamming /
hann / flat-top / blackmann-harris (reference
include/Suscan/AnalyzerParams.h:37-43).  Here taps are computed once on
host and broadcast-multiplied on device, where XLA fuses the multiply
into the FFT's input load.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from sigdigger_tpu.types import WindowFunction


def _cosine_window(n: int, coeffs: tuple[float, ...]) -> np.ndarray:
    k = np.arange(n, dtype=np.float64)
    w = np.zeros(n, dtype=np.float64)
    for i, a in enumerate(coeffs):
        w += ((-1) ** i) * a * np.cos(2.0 * np.pi * i * k / n)
    return w


@lru_cache(maxsize=64)
def window_taps(kind: WindowFunction, n: int) -> np.ndarray:
    """Periodic window taps of length ``n`` as float32.

    Uses the periodic (DFT-even) convention, matching sigutils' windows.
    """
    if kind == WindowFunction.NONE:
        w = np.ones(n, dtype=np.float64)
    elif kind == WindowFunction.HAMMING:
        w = _cosine_window(n, (0.54, 0.46))
    elif kind == WindowFunction.HANN:
        w = _cosine_window(n, (0.5, 0.5))
    elif kind == WindowFunction.FLAT_TOP:
        w = _cosine_window(
            n, (0.21557895, 0.41663158, 0.277263158, 0.083578947, 0.006947368)
        )
    elif kind == WindowFunction.BLACKMANN_HARRIS:
        w = _cosine_window(n, (0.35875, 0.48829, 0.14128, 0.01168))
    else:
        raise ValueError(f"unknown window {kind}")
    return w.astype(np.float32)


def window_energy(kind: WindowFunction, n: int) -> float:
    """Sum of squared taps (PSD normalization factor)."""
    w = window_taps(kind, n)
    return float(np.sum(w.astype(np.float64) ** 2))
