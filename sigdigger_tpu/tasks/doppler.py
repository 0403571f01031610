"""Doppler spectrum calculator.

reference Tasks/DopplerCalculator.cpp:52-170: windowed FFT → PSD →
power-weighted centroid and dispersion → radial-velocity axis using
lambda = c/f0, with Kahan-compensated energy summation.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from sigdigger_tpu.dsp.window import window_taps
from sigdigger_tpu.tasks.base import CancellableTask
from sigdigger_tpu.types import WindowFunction, next_pow2

SPEED_OF_LIGHT = 299_792_458.0


@dataclass
class DopplerResult:
    velocities: np.ndarray      # m/s axis (display order)
    spectrum: np.ndarray        # PSD over velocity
    center_velocity: float      # power-weighted centroid (m/s)
    dispersion: float           # sqrt of power-weighted variance (m/s)
    energy: float


class DopplerCalculator(CancellableTask):
    def __init__(self, data: np.ndarray, sample_rate: float,
                 carrier_freq: float, estimator: str = "auto") -> None:
        super().__init__()
        self.data = np.asarray(data, np.complex64)
        self.sample_rate = float(sample_rate)
        self.f0 = float(carrier_freq)
        self.estimator = estimator
        if self.f0 <= 0:
            raise ValueError("carrier frequency must be positive")
        self._stage = 0

    def work(self) -> bool:
        from sigdigger_tpu.tasks.psdutil import (
            pallas_mean_psd,
            use_pallas,
        )

        if use_pallas(self.estimator):
            # TPU path: Bailey DFT-matmul averaged periodogram
            nat = pallas_mean_psd(self.data, self.sample_rate)
            n = len(nat)
            spec = np.fft.fftshift(nat).astype(np.float64)
        else:
            n = next_pow2(len(self.data))
            w = window_taps(WindowFunction.BLACKMANN_HARRIS,
                            len(self.data))
            buf = np.zeros(n, np.complex64)
            buf[: len(self.data)] = self.data * w
            spec = np.fft.fftshift(np.abs(np.fft.fft(buf)) ** 2)
        freqs = np.fft.fftshift(np.fft.fftfreq(n, 1.0 / self.sample_rate))
        lam = SPEED_OF_LIGHT / self.f0
        v = -freqs * lam  # approaching target → positive Doppler shift

        # Kahan-compensated energy sum (reference's explicit compensation)
        energy = 0.0
        comp = 0.0
        for chunk in np.array_split(spec, 16):
            y = float(chunk.sum()) - comp
            t = energy + y
            comp = (t - energy) - y
            energy = t
        if energy <= 0:
            centroid = 0.0
            disp = 0.0
        else:
            centroid = float(np.sum(spec * v) / energy)
            disp = float(np.sqrt(max(0.0, np.sum(
                spec * (v - centroid) ** 2) / energy)))
        self.result = DopplerResult(
            velocities=v, spectrum=spec.astype(np.float32),
            center_velocity=centroid, dispersion=disp, energy=energy,
        )
        self.set_progress(1.0, "done")
        return False
