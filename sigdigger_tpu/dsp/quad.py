"""Quadrature (FM) discriminator.

The reference computes `(1/pi) * arg(x[n] * conj(x[n-1]))` per sample
(reference Tasks/QuadDemodTask.cpp:50-60).  Here the whole block is one
vector op over [C, T], with the previous sample carried per channel so
block splits are exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def _quad(x: jax.Array, prev: jax.Array, gain: jax.Array) -> jax.Array:
    shifted = jnp.concatenate([prev[:, None], x[:, :-1]], axis=1)
    return gain * jnp.angle(x * jnp.conj(shifted))


class QuadDemod:
    """Streaming FM discriminator over [C, T] complex blocks.

    ``gain`` defaults to 1/pi (the reference's normalization); for
    frequency readout in Hz use gain = fs / (2*pi).
    """

    def __init__(self, channels: int, gain: float | None = None) -> None:
        self.channels = channels
        self.gain = float(gain) if gain is not None else 1.0 / jnp.pi
        self._prev = jnp.zeros(channels, jnp.complex64)

    def __call__(self, x) -> jax.Array:
        x = jnp.asarray(x, jnp.complex64)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None, :]
        y = _quad(x, self._prev, jnp.float32(self.gain))
        self._prev = x[:, -1]
        return y[0] if squeeze else y

    def reset(self) -> None:
        self._prev = jnp.zeros_like(self._prev)


def quad_demod(x, gain: float | None = None) -> jax.Array:
    """One-shot discriminator (first output uses prev=0 like the
    reference's initial state)."""
    x = jnp.asarray(x, jnp.complex64)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    g = float(gain) if gain is not None else 1.0 / jnp.pi
    y = _quad(x, jnp.zeros(x.shape[0], jnp.complex64), jnp.float32(g))
    return y[0] if squeeze else y
