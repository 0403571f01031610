"""Polyphase rational resampler (L/M) for audio-rate conversion.

The reference's audio inspector resamples channel baseband to the audio
device rate inside the suscan engine; here it is a polyphase
windowed-sinc interpolator: output k sits at input position k*M/L and is
computed as y[k] = sum_i bank[phase_k, i] * x[n_k - i] with
phase_k = (k*M) mod L, n_k = floor(k*M/L).  On device this is a shared
time-axis gather of input windows plus an einsum over the tap rows —
batched over channels, with a carried input tail so streaming is exact.
"""

from __future__ import annotations

from functools import partial
from math import gcd

import jax
import jax.numpy as jnp
import numpy as np

from sigdigger_tpu.dsp.filters import fir_lowpass


def polyphase_bank(l: int, taps_per_phase: int = 8,
                   cutoff_scale: float = 1.0) -> np.ndarray:
    """L-phase bank from a windowed-sinc prototype of L*taps_per_phase
    taps; phase p row holds proto[p::L] scaled by L (interpolation
    gain).  ``cutoff_scale`` < 1 moves the anti-alias cutoff below the
    input Nyquist (needed when decimating)."""
    proto = fir_lowpass(l * taps_per_phase, cutoff_scale / l,
                        window="blackman") * l
    return proto.reshape(taps_per_phase, l).T.copy()  # [L, K]


@partial(jax.jit, static_argnames=())
def _resample(ext, rows, n0):
    """ext: [C, T+K]; rows: [n_out, K] (reversed taps); n0: [n_out]."""
    k = rows.shape[1]
    idx = n0[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
    wins = jnp.take(ext, idx.reshape(-1), axis=1)
    wins = wins.reshape(ext.shape[0], rows.shape[0], k)
    return jnp.einsum("cnk,nk->cn", wins, rows)


class Resampler:
    """Streaming rational resampler over [C, T] complex blocks.

    rate_out/rate_in is reduced to L/M; irrational ratios are
    approximated to <1e-6 relative error with a bounded denominator.
    Splitting a stream into blocks gives identical output to one shot.
    """

    def __init__(self, rate_in: float, rate_out: float, channels: int,
                 taps_per_phase: int = 8, max_den: int = 1 << 12) -> None:
        from fractions import Fraction

        frac = Fraction(rate_out / rate_in).limit_denominator(max_den)
        l, m = frac.numerator, frac.denominator
        g = gcd(l, m)
        self.l, self.m = l // g, m // g
        self.rate_in = float(rate_in)
        self.rate_out = float(rate_out)
        self.channels = channels
        cutoff_scale = min(1.0, self.l / self.m)
        bank = polyphase_bank(self.l, taps_per_phase, cutoff_scale)
        self._bank_rev = jnp.asarray(bank[:, ::-1].copy())  # [L, K]
        self.k = bank.shape[1]
        self._tail = jnp.zeros((channels, self.k), jnp.complex64)
        self._consumed = 0   # input samples consumed (S)
        self._k_next = 0     # next output index

    @property
    def ratio(self) -> float:
        return self.l / self.m

    def output_count(self, t: int) -> int:
        """Outputs the next ``t``-sample block will produce."""
        s = self._consumed
        k_end = ((s + t) * self.l + self.m - 1) // self.m
        return max(0, k_end - self._k_next)

    def __call__(self, x) -> jax.Array:
        x = jnp.asarray(x, jnp.complex64)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None, :]
        t = x.shape[1]
        s = self._consumed
        ext = jnp.concatenate([self._tail, x], axis=1)
        self._tail = ext[:, -self.k:]

        k_end = ((s + t) * self.l + self.m - 1) // self.m
        n_out = max(0, k_end - self._k_next)
        if n_out == 0:
            self._consumed += t
            empty = jnp.zeros((x.shape[0], 0), jnp.complex64)
            return empty[0] if squeeze else empty

        kk = np.arange(self._k_next, k_end, dtype=np.int64)
        q = kk * self.m
        n_k = q // self.l
        phases = (q % self.l).astype(np.int32)
        n0 = (n_k - s + 1).astype(np.int32)   # window start in ext coords
        rows = jnp.take(self._bank_rev, jnp.asarray(phases), axis=0)
        y = _resample(ext, rows, jnp.asarray(n0))

        self._consumed += t
        self._k_next = int(k_end)
        return y[0] if squeeze else y

    def reset(self) -> None:
        self._tail = jnp.zeros_like(self._tail)
        self._consumed = 0
        self._k_next = 0
