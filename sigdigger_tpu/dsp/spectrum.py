"""Spectrum path: windowed FFT → PSD → EMA averaging, batched per block.

This is the TPU re-design of the reference's per-FFT spectrum loop
(engine side: window + FFT + `psd += alpha*(p - psd)` with
`spectrum_avg_alpha`, reference include/Suscan/AnalyzerParams.h:49-52;
UI side: the same EMA again in Misc/Averager.cpp:25-50).  Instead of one
FFT per timer tick, a whole IQ block is reshaped to [F, W] frames and
FFT'd at once; the F sequential EMA updates are folded into a single
closed-form weighted reduction

    psd' = (1-a)^F psd + sum_i a (1-a)^(F-1-i) P_i

i.e. one [1,F]x[F,W] matmul that XLA places on the MXU.  The result is
bit-equivalent (up to float assoc.) to the reference's sequential EMA.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sigdigger_tpu.dsp.window import window_energy, window_taps
from sigdigger_tpu.types import WindowFunction


@partial(jax.jit, static_argnames=("window_size",))
def _spectrum_step(psd, x, taps, weights, decay, scale, window_size):
    frames = x.reshape(-1, window_size) * taps[None, :]
    spec = jnp.fft.fft(frames, axis=-1)
    power = (spec.real * spec.real + spec.imag * spec.imag) * scale
    folded = weights @ power          # [1,F] @ [F,W] -> [1,W] (MXU)
    return decay * psd + folded[0], power[-1]


@dataclass
class SpectrumState:
    psd: jax.Array        # [W] running EMA PSD (natural FFT order)
    count: int = 0        # frames folded so far


class SpectrumEstimator:
    """Streaming PSD estimator over fixed-size IQ blocks.

    ``feed`` consumes a block whose length is a multiple of
    ``window_size`` and returns the updated EMA PSD (power/Hz, natural
    FFT bin order; use :func:`shifted` for display order).
    """

    def __init__(
        self,
        window_size: int,
        sample_rate: float,
        window: WindowFunction = WindowFunction.BLACKMANN_HARRIS,
        alpha: float = 0.25,
    ) -> None:
        self.window_size = int(window_size)
        self.sample_rate = float(sample_rate)
        self.window = window
        self.alpha = float(alpha)
        self._taps = jnp.asarray(window_taps(window, self.window_size))
        # PSD normalization: |X|^2 / (fs * sum(w^2)) → power density per Hz
        self._scale = np.float32(
            1.0 / (self.sample_rate * window_energy(window, self.window_size))
        )
        self.state = SpectrumState(
            psd=jnp.zeros(self.window_size, jnp.float32), count=0
        )

    def _ema_weights(self, frames: int, first: bool) -> tuple[jax.Array, jax.Array]:
        a = self.alpha
        i = np.arange(frames, dtype=np.float64)
        if first:
            # Seed: first frame initializes the EMA (reference Averager
            # behavior: first feed copies), subsequent frames EMA-fold.
            w = a * (1.0 - a) ** (frames - 1 - i)
            w[0] = (1.0 - a) ** (frames - 1)
            decay = 0.0
        else:
            w = a * (1.0 - a) ** (frames - 1 - i)
            decay = (1.0 - a) ** frames
        return (
            jnp.asarray(w[None, :].astype(np.float32)),
            jnp.float32(decay),
        )

    def feed(self, x: jax.Array | np.ndarray) -> jax.Array:
        x = jnp.asarray(x)
        n = x.shape[0]
        if n % self.window_size:
            raise ValueError(
                f"block length {n} not a multiple of window {self.window_size}"
            )
        frames = n // self.window_size
        weights, decay = self._ema_weights(frames, first=self.state.count == 0)
        psd, _last = _spectrum_step(
            self.state.psd, x, self._taps, weights, decay, self._scale,
            self.window_size,
        )
        self.state = SpectrumState(psd=psd, count=self.state.count + frames)
        return psd

    @property
    def psd(self) -> jax.Array:
        return self.state.psd

    def shifted(self) -> np.ndarray:
        """PSD in display order (negative freqs first), linear power."""
        return np.fft.fftshift(np.asarray(self.state.psd))

    def reset(self) -> None:
        self.state = SpectrumState(
            psd=jnp.zeros(self.window_size, jnp.float32), count=0
        )


def psd_frequencies(window_size: int, sample_rate: float,
                    center: float = 0.0) -> np.ndarray:
    """Bin center frequencies in display (shifted) order."""
    return center + np.fft.fftshift(
        np.fft.fftfreq(window_size, 1.0 / sample_rate)
    )
