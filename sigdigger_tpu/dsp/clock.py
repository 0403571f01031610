"""Symbol timing recovery.

Three sampling modes, matching the reference's WaveSampler
(reference Tasks/WaveSampler.cpp:97-292) and the engine's per-channel
clock recovery (`clock.*` inspector keys, `su_clock_detector` Gardner
TED, reference Tasks/WaveSampler.cpp:178-213):

- GARDNER  — closed-loop Gardner timing-error detector with linear
  interpolation; `lax.scan` over time, [C]-wide state.  Output is a
  dense (sample-rate) stream of (symbol, strobe) pairs — fixed shapes
  for XLA; consumers compact on host or reduce with the strobe mask.
- MANUAL   — fixed-rate fractional resampling at ``period`` samples per
  symbol: interval *averaging* like the reference (WaveSampler.cpp:
  97-175), vectorized via cumulative sums + fractional-edge gathers.
- ZERO_CROSSING — threshold slicer: symbols sampled mid-way between
  zero crossings of the soft signal (WaveSampler.cpp:216-292).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Gardner
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=())
def _gardner_scan(x, state, gain_p, gain_f, period_min, period_max):
    """x: [C, T] complex (post matched filter).

    state: (t, period, prev, mid, strobe_prev, want_mid) per channel.
    ``t`` counts samples until the next timing event; events alternate
    midpoint / strobe every period/2.  Linear interpolation between the
    previous and current sample at the event's fractional position.
    """

    def step(carry, xt):
        t, period, prev, mid, strobe_prev, want_mid, power = carry
        t = t - 1.0
        event = t <= 0.0
        frac = jnp.clip(t + 1.0, 0.0, 1.0)
        interp = prev + frac.astype(jnp.complex64) * (xt - prev)

        is_mid = jnp.logical_and(event, want_mid)
        is_strobe = jnp.logical_and(event, jnp.logical_not(want_mid))

        # amplitude-invariant loop gain: normalize the TED by signal power
        power = power + 0.01 * (jnp.abs(xt) ** 2 - power)
        new_mid = jnp.where(is_mid, interp, mid)
        # Gardner TED: err > 0 ⇔ sampling late → advance the clock
        err = jnp.real((interp - strobe_prev) * jnp.conj(new_mid))
        err = jnp.where(is_strobe, err, 0.0) / jnp.maximum(power, 1e-9)
        err = jnp.clip(err, -2.0, 2.0)

        period = jnp.clip(period - gain_f * err, period_min, period_max)
        t = t + jnp.where(event, period * 0.5 - gain_p * err, 0.0)

        strobe_prev = jnp.where(is_strobe, interp, strobe_prev)
        want_mid = jnp.logical_xor(want_mid, event)
        out = jnp.where(is_strobe, interp, jnp.zeros_like(interp))
        return (t, period, xt, new_mid, strobe_prev, want_mid, power), \
            (out, is_strobe)

    state, (sym, strobe) = jax.lax.scan(step, state, jnp.transpose(x))
    return state, jnp.transpose(sym), jnp.transpose(strobe)


class GardnerClock:
    """Streaming Gardner symbol synchronizer over [C, T] blocks.

    ``feed`` returns (symbols, strobes): dense [C, T] arrays where
    ``strobes`` marks the positions that carry a recovered symbol.
    Needs >= 2 samples/symbol (the TED requires a midpoint sample).
    """

    def __init__(self, channels: int, sps: float, gain: float = 0.05,
                 max_dev: float = 0.1) -> None:
        if sps < 2.0:
            raise ValueError(f"Gardner needs >=2 samples/symbol, got {sps}")
        self.channels = channels
        self.sps = float(sps)
        self.gain_p = float(gain)
        self.gain_f = float(gain * gain / 4.0)
        self.period_min = jnp.float32(sps * (1.0 - max_dev))
        self.period_max = jnp.float32(sps * (1.0 + max_dev))
        c = channels
        self._state = (
            jnp.full(c, sps / 2.0, jnp.float32),      # t until first event
            jnp.full(c, sps, jnp.float32),            # period
            jnp.zeros(c, jnp.complex64),              # prev sample
            jnp.zeros(c, jnp.complex64),              # midpoint
            jnp.zeros(c, jnp.complex64),              # previous strobe
            jnp.ones(c, bool),                        # next event is midpoint
            jnp.ones(c, jnp.float32),                 # power follower
        )

    def __call__(self, x) -> tuple[jax.Array, jax.Array]:
        x = jnp.asarray(x, jnp.complex64)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None, :]
        self._state, sym, strobe = _gardner_scan(
            x, self._state, jnp.float32(self.gain_p),
            jnp.float32(self.gain_f), self.period_min, self.period_max,
        )
        if squeeze:
            return sym[0], strobe[0]
        return sym, strobe

    @property
    def period_estimate(self) -> jax.Array:
        return self._state[1]

    def reset(self) -> None:
        c = self.channels
        self._state = (
            jnp.full(c, self.sps / 2.0, jnp.float32),
            jnp.full(c, self.sps, jnp.float32),
            jnp.zeros(c, jnp.complex64),
            jnp.zeros(c, jnp.complex64),
            jnp.zeros(c, jnp.complex64),
            jnp.ones(c, bool),
            jnp.ones(c, jnp.float32),
        )


# ---------------------------------------------------------------------------
# Manual (fixed-rate interval averaging)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_out",))
def _manual_avg(x, period, phase, n_out: int):
    """Average ``x`` [C, T] over symbol intervals [phase + k*period,
    phase + (k+1)*period) with fractional edges, via cumsum + lerp."""
    c, t = x.shape
    csum = jnp.cumsum(x, axis=1)
    csum = jnp.concatenate([jnp.zeros((c, 1), x.dtype), csum], axis=1)

    def cs_at(pos):
        """Interpolated cumulative sum at fractional positions [n]."""
        i = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, t)
        f = (pos - i.astype(jnp.float32)).astype(x.dtype)
        lo = jnp.take(csum, i, axis=1)
        hi = jnp.take(csum, jnp.minimum(i + 1, t), axis=1)
        return lo + f[None, :] * (hi - lo)

    k = jnp.arange(n_out + 1, dtype=jnp.float32)
    edges = phase + k * period
    cs = cs_at(jnp.clip(edges, 0.0, jnp.float32(t)))
    sums = cs[:, 1:] - cs[:, :-1]
    return sums / jnp.asarray(period, x.dtype)


def manual_sample(x, period: float, phase: float = 0.0) -> jax.Array:
    """One-shot fixed-interval symbol averaging (reference WaveSampler
    MANUAL mode, Tasks/WaveSampler.cpp:97-175).  Returns [C, n_sym]."""
    x = jnp.asarray(x, jnp.complex64)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    t = x.shape[1]
    n_out = int(np.floor((t - phase) / period))
    y = _manual_avg(x, jnp.float32(period), jnp.float32(phase), n_out)
    return y[0] if squeeze else y


# ---------------------------------------------------------------------------
# Zero crossing slicer
# ---------------------------------------------------------------------------

def zero_crossing_sample(x, period: float, threshold: float = 0.0):
    """Threshold slicer (reference WaveSampler ZERO_CROSSING mode,
    Tasks/WaveSampler.cpp:216-292): resample the sign of (x - threshold)
    at ``period``-spaced instants offset half a symbol after each sign
    change.  Works on real soft values [T]; returns (symbols, n).

    Host-side convenience (offline task path) — vectorized numpy.
    """
    v = np.asarray(x, np.float32) - threshold
    sign = v >= 0
    # resync sampling phase at each transition
    trans = np.flatnonzero(sign[1:] != sign[:-1]) + 1
    n = len(v)
    out = []
    pos = period / 2.0
    ti = 0
    while pos < n:
        # resync: if a transition occurred before pos since last symbol,
        # restart the grid half a period after the latest one
        while ti < len(trans) and trans[ti] <= pos:
            pos = trans[ti] + period / 2.0
            ti += 1
            if pos >= n:
                break
        if pos >= n:
            break
        out.append(v[int(pos)])
        pos += period
    return np.asarray(out, np.float32)
