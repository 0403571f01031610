"""NCQO — numerically controlled quadrature oscillator, vectorized.

The reference mixes signals down with a per-sample oscillator
(`su_ncqo_init/read`, reference Tasks/CarrierXlator.cpp:36-77).  On TPU
the oscillator is a closed-form phase ramp per block: phase continuity
across blocks is kept by tracking the absolute phase in float64 on the
host and passing the wrapped start phase into the jitted kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=())
def _mix(x: jax.Array, phi0: jax.Array, dphi: jax.Array) -> jax.Array:
    t = jnp.arange(x.shape[-1], dtype=jnp.float32)
    ph = phi0 + dphi * t
    return x * jax.lax.complex(jnp.cos(ph), jnp.sin(ph))


class NCQO:
    """Streaming complex oscillator/mixer.

    ``mix(x)`` multiplies a block by exp(j*(phi0 + 2*pi*f/fs*n)) with
    exact cross-block phase continuity.  Negative ``freq`` mixes down.
    """

    def __init__(self, freq: float, sample_rate: float, phase: float = 0.0):
        self.sample_rate = float(sample_rate)
        self.freq = float(freq)
        self.phase = float(phase)          # absolute, float64, radians

    @property
    def omega(self) -> float:
        return 2.0 * np.pi * self.freq / self.sample_rate

    def set_frequency(self, freq: float) -> None:
        self.freq = float(freq)

    def read(self, n: int) -> jax.Array:
        """Next ``n`` oscillator samples."""
        return self.mix(jnp.ones(n, jnp.complex64))

    def mix(self, x) -> jax.Array:
        x = jnp.asarray(x, jnp.complex64)
        n = x.shape[-1]
        out = _mix(x, jnp.float32(self.phase % (2.0 * np.pi)),
                   jnp.float32(self.omega))
        self.phase = (self.phase + self.omega * n) % (2.0 * np.pi)
        return out


def mix_frequency(x, freq: float, sample_rate: float,
                  phase: float = 0.0) -> jax.Array:
    """One-shot frequency translation x * exp(j*2*pi*freq/fs*n + j*phase)."""
    return NCQO(freq, sample_rate, phase).mix(x)
