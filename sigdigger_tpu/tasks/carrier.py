"""Carrier detection and translation tasks.

- :class:`CarrierDetector` — reference Tasks/CarrierDetector.cpp:50-147:
  zero-pad to a power of two, Blackmann-Harris window, FFT, peak search
  skipping the DC notch, then a *circular centroid* of the peak
  neighborhood for sub-bin accuracy.
- :class:`CarrierXlator` — reference Tasks/CarrierXlator.cpp:48-77:
  NCQO mixdown of the detected carrier.
"""

from __future__ import annotations

import numpy as np

from sigdigger_tpu.dsp.ncqo import NCQO
from sigdigger_tpu.dsp.window import window_taps
from sigdigger_tpu.tasks.base import CancellableTask
from sigdigger_tpu.types import WindowFunction, next_pow2

_BLOCK = 4096  # reference block length (Tasks/AGCTask.cpp:30 et al.)


class CarrierDetector(CancellableTask):
    """Estimate the dominant carrier frequency of a capture.

    ``result`` is the carrier frequency in Hz (relative to baseband
    center, range ±fs/2).
    """

    def __init__(self, data: np.ndarray, sample_rate: float,
                 dc_notch_bins: int = 2, avg_radius: int = 4,
                 estimator: str = "auto") -> None:
        super().__init__()
        self.data = np.asarray(data, np.complex64)
        self.sample_rate = float(sample_rate)
        self.dc_notch_bins = int(dc_notch_bins)
        self.avg_radius = int(avg_radius)
        self.estimator = estimator
        self._n = next_pow2(len(self.data))
        self._buf = np.zeros(self._n, np.complex64)
        self._pos = 0

    def _finish(self, spec: np.ndarray) -> None:
        """Peak + circular centroid on a natural-order spectrum."""
        nbins = len(spec)
        # skip DC notch (reference skips bins around 0)
        notch = self.dc_notch_bins
        spec[:notch] = 0.0
        spec[nbins - notch:] = 0.0
        peak = int(np.argmax(spec))
        # circular centroid of the neighborhood: weights on the unit
        # circle so the estimate wraps correctly at ±fs/2
        r = self.avg_radius
        idx = (peak + np.arange(-r, r + 1)) % nbins
        wgt = spec[idx]
        ang = 2.0 * np.pi * idx / nbins
        z = np.sum(wgt * np.exp(1j * ang))
        frac = np.angle(z) / (2.0 * np.pi)  # in [-0.5, 0.5)
        self.result = float(frac * self.sample_rate)
        self.set_progress(1.0, "done")

    def work(self) -> bool:
        from sigdigger_tpu.tasks.psdutil import (
            pallas_mean_psd,
            use_pallas,
        )

        if use_pallas(self.estimator):
            # TPU path: Bailey DFT-matmul averaged periodogram
            # (tasks/psdutil.py; no FFT primitive on axon)
            self._finish(pallas_mean_psd(self.data, self.sample_rate))
            return False
        # windowing proceeds in blocks for cancellability
        end = min(self._pos + _BLOCK * 8, len(self.data))
        w = window_taps(WindowFunction.BLACKMANN_HARRIS, len(self.data))
        self._buf[self._pos:end] = self.data[self._pos:end] * \
            w[self._pos:end]
        self._pos = end
        self.set_progress(0.8 * end / len(self.data), "windowing")
        if end < len(self.data):
            return True
        self._finish(np.abs(np.fft.fft(self._buf)) ** 2)
        return False


class CarrierXlator(CancellableTask):
    """Translate a capture by ``-freq`` (mix the carrier to DC)."""

    def __init__(self, data: np.ndarray, sample_rate: float,
                 freq: float, phase: float = 0.0) -> None:
        super().__init__()
        self.data = np.asarray(data, np.complex64)
        self.out = np.empty_like(self.data)
        self._osc = NCQO(-freq, sample_rate, phase)
        self._pos = 0

    def work(self) -> bool:
        end = min(self._pos + _BLOCK, len(self.data))
        self.out[self._pos:end] = np.asarray(
            self._osc.mix(self.data[self._pos:end]))
        self._pos = end
        self.set_progress(end / len(self.data), "translating")
        if end >= len(self.data):
            self.result = self.out
            return False
        return True
