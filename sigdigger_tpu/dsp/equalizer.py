"""CMA blind equalizer.

The reference inspectors expose an `equalizer.{type,rate,locked}` config
(reference Default/GenericInspector/InspectorCtl/EqualizerControl.cpp;
SURVEY.md §5.6): type 0 = bypass, 1 = constant-modulus algorithm.  An
N-tap complex FIR adapted per symbol with the CMA error
e = y·(|y|² − 1); taps frozen when ``locked``.

Channel-batched `lax.scan` like the other recurrent loops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("locked",))
def _cma_scan(x, taps, rate, locked: bool):
    """x: [C, T] symbol-spaced complex; taps: [C, K] complex FIR."""
    k = taps.shape[1]

    def step(carry, xt):
        taps_c, buf = carry                    # [C, K], [C, K]
        buf = jnp.concatenate([xt[:, None], buf[:, :-1]], axis=1)
        y = jnp.sum(taps_c * buf, axis=1)
        if not locked:
            # normalized (NLMS-style) update: stable through amplitude
            # transients (e.g. an upstream AGC still converging)
            err = y * (jnp.abs(y) ** 2 - 1.0)
            err = err / jnp.maximum(jnp.abs(err), 1.0)   # soft-clip
            power = jnp.sum(jnp.abs(buf) ** 2, axis=1) + 1e-6
            taps_c = taps_c - (rate / power)[:, None] * \
                err[:, None] * jnp.conj(buf)
        return (taps_c, buf), y

    c = x.shape[0]
    buf0 = jnp.zeros((c, k), jnp.complex64)
    (taps, _), ys = jax.lax.scan(step, (taps, buf0), jnp.transpose(x))
    return taps, jnp.transpose(ys)


class CMAEqualizer:
    """Streaming CMA over [C, T] symbol-spaced blocks."""

    def __init__(self, channels: int, taps: int = 5,
                 rate: float = 1e-3, locked: bool = False) -> None:
        self.channels = channels
        self.n_taps = taps
        self.rate = float(rate)
        self.locked = bool(locked)
        center = jnp.zeros((channels, taps), jnp.complex64)
        self.taps = center.at[:, taps // 2].set(1.0)

    def __call__(self, x) -> jax.Array:
        x = jnp.asarray(x, jnp.complex64)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None, :]
        self.taps, y = _cma_scan(x, self.taps, jnp.float32(self.rate),
                                 self.locked)
        return y[0] if squeeze else y

    def reset(self) -> None:
        center = jnp.zeros((self.channels, self.n_taps), jnp.complex64)
        self.taps = center.at[:, self.n_taps // 2].set(1.0)
