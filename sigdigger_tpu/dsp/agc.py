"""Hang AGC — the `su_agc` equivalent.

The reference drives a per-sample hang AGC with tau-scaled fast/slow
rise/fall times (reference Tasks/AGCTask.cpp:22-53: fast rise/fall =
2/4 tau, slow rise/fall = 8/16 tau, hang ~ 10 tau; and the per-channel
`agc.{enabled,gain,ts}` inspector keys).

TPU re-design: the loop is inherently sequential in time but trivially
parallel across channels, so it runs as one `lax.scan` over the block
with a [C]-wide carried state — each scan step is a VPU-wide vector op
over up to thousands of channels.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-6
_MAX_GAIN = 1e4


def _tau_alpha(t: float) -> float:
    """EMA coefficient for a time constant of ``t`` samples."""
    return 1.0 - float(np.exp(-1.0 / max(t, 1.0)))


@dataclass(frozen=True)
class AGCParams:
    """Time constants in samples, mirroring the reference's tau scaling
    (reference Tasks/AGCTask.cpp:41-53)."""

    tau: float = 100.0
    fast_rise: float | None = None   # default 2*tau
    fast_fall: float | None = None   # default 4*tau
    slow_rise: float | None = None   # default 8*tau
    slow_fall: float | None = None   # default 16*tau
    hang_max: float | None = None    # default 10*tau

    def resolved(self) -> tuple[float, float, float, float, float]:
        t = self.tau
        return (
            self.fast_rise if self.fast_rise is not None else 2.0 * t,
            self.fast_fall if self.fast_fall is not None else 4.0 * t,
            self.slow_rise if self.slow_rise is not None else 8.0 * t,
            self.slow_fall if self.slow_fall is not None else 16.0 * t,
            self.hang_max if self.hang_max is not None else 10.0 * t,
        )


@partial(jax.jit, static_argnames=())
def _agc_scan(x, state, alphas, hang_max):
    """x: [C, T] complex; state: (fast, slow, hang) each [C]."""
    a_fr, a_ff, a_sr, a_sf = alphas

    def step(carry, xt):
        fast, slow, hang = carry
        mag = jnp.abs(xt)
        a_fast = jnp.where(mag > fast, a_fr, a_ff)
        fast = fast + a_fast * (mag - fast)
        rising = mag > slow
        slow_up = slow + a_sr * (mag - slow)
        slow_dn = jnp.where(hang >= hang_max,
                            slow + a_sf * (mag - slow), slow)
        slow = jnp.where(rising, slow_up, slow_dn)
        hang = jnp.where(rising, 0.0, hang + 1.0)
        level = jnp.maximum(fast, slow)
        gain = jnp.minimum(1.0 / jnp.maximum(level, _EPS), _MAX_GAIN)
        return (fast, slow, hang), gain

    state, gains = jax.lax.scan(step, state, jnp.transpose(x))  # scan over T
    return state, x * jnp.transpose(gains)


class AGC:
    """Streaming hang AGC over [C, T] complex blocks."""

    def __init__(self, channels: int, params: AGCParams | None = None) -> None:
        self.channels = channels
        self.params = params or AGCParams()
        fr, ff, sr, sf, hang = self.params.resolved()
        self._alphas = tuple(
            jnp.float32(_tau_alpha(t)) for t in (fr, ff, sr, sf)
        )
        self._hang_max = jnp.float32(hang)
        self._state = (
            jnp.zeros(channels, jnp.float32),
            jnp.zeros(channels, jnp.float32),
            jnp.zeros(channels, jnp.float32),
        )

    def __call__(self, x) -> jax.Array:
        x = jnp.asarray(x, jnp.complex64)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None, :]
        self._state, y = _agc_scan(x, self._state, self._alphas,
                                   self._hang_max)
        return y[0] if squeeze else y

    def reset(self) -> None:
        self._state = tuple(jnp.zeros_like(s) for s in self._state)
