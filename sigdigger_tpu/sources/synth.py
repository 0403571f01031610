"""Tunable synthetic wideband source.

Simulates an SDR device over a synthetic RF band: a set of emitters at
*absolute* frequencies; reads return baseband IQ relative to the current
tuner frequency (``profile.freq``), so retunes behave like real
hardware.  Drives the panoramic-scan path end-to-end without a device —
the rebuild's stand-in for the SoapySDR source the reference sweeps with
(reference App/Application.cpp:772-839).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from sigdigger_tpu.profiles import SourceProfile
from sigdigger_tpu.sources.base import SignalSource


@dataclass
class Emitter:
    freq: float          # absolute Hz
    amplitude: float = 1.0
    fm_rate: float = 0.0     # optional FM modulation tone
    fm_dev: float = 0.0


class SynthBandSource(SignalSource):
    """``profile.freq`` is the tuner; emitters are absolute."""

    def __init__(self, profile: SourceProfile,
                 emitters: list[Emitter] | None = None,
                 seed: int = 0) -> None:
        super().__init__(profile)
        self.emitters = emitters if emitters is not None else []
        self._rng = np.random.default_rng(seed)
        self._noise_amp = float(10.0 ** (profile.noise_db / 20.0))

    @property
    def seekable(self) -> bool:
        return True

    def seek(self, sample: int) -> None:
        self._pos = sample

    def set_frequency(self, freq: float) -> None:
        """Retune (instantaneous; a settle time can be simulated by
        discarding a block after retuning)."""
        self.profile.freq = float(freq)

    def _read_impl(self, n: int) -> np.ndarray:
        fs = self.profile.sample_rate
        k = np.arange(self._pos, self._pos + n, dtype=np.float64)
        out = np.zeros(n, np.complex128)
        fc = self.profile.freq
        for e in self.emitters:
            rel = e.freq - fc
            if abs(rel) > fs:  # far outside the window
                continue
            phase = 2.0 * np.pi * rel * k / fs
            if e.fm_dev > 0.0:
                # closed-form FM phase: dev/fm_rate * sin(2*pi*fm_rate*t)
                t = k / fs
                phase = phase + (e.fm_dev / max(e.fm_rate, 1e-9)) * \
                    np.sin(2.0 * np.pi * e.fm_rate * t)
            out += e.amplitude * np.exp(1j * phase)
        if self._noise_amp > 1e-12:
            noise = self._rng.standard_normal(2 * n)
            out += (self._noise_amp / np.sqrt(2.0)) * (
                noise[:n] + 1j * noise[n:])
        return out.astype(np.complex64)
