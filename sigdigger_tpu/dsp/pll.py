"""Carrier recovery loops: 2nd-order PLL and Costas loops (BPSK/QPSK/8PSK).

Behavioral contract of `su_pll_init/track` (reference
Tasks/PLLSyncTask.cpp:24-58) and `su_costas_init/feed` with kinds
BPSK/QPSK/8PSK (reference Tasks/CostasRecoveryTask.cpp:41-59,
Components/TimeWindow.cpp:1948-1960; `afc.*` inspector keys).

TPU re-design: one `lax.scan` over time with [C]-wide vector state.
The Costas phase detector is the modulation-stripping power detector
err = Im{(y/|y|)^M}/M, which removes M-PSK modulation for M = 1 (plain
PLL), 2, 4, 8 with unit small-signal gain, and vectorizes with no
branches.  Loop gains follow the standard proportional-integral design
from a normalized loop bandwidth (damping 1/sqrt(2)).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_TWO_PI = 2.0 * np.pi


def loop_gains(loop_bw: float, damping: float = 0.7071) -> tuple[float, float]:
    """Proportional (alpha) and integral (beta) gains for a 2nd-order
    loop with normalized noise bandwidth ``loop_bw`` (cycles/sample)."""
    bw = float(loop_bw) * _TWO_PI
    denom = 1.0 + 2.0 * damping * bw + bw * bw
    alpha = 4.0 * damping * bw / denom
    beta = 4.0 * bw * bw / denom
    return alpha, beta


@partial(jax.jit, static_argnames=("order",))
def _costas_scan(x, phase, freq, alpha, beta, order: int):
    """x: [C, T]; phase/freq: [C].  Returns (state, y) with y the
    derotated signal."""

    def step(carry, xt):
        ph, fr = carry
        lo = jax.lax.complex(jnp.cos(ph), -jnp.sin(ph))
        y = xt * lo
        u = y / jnp.maximum(jnp.abs(y), 1e-12)
        if order == 1:
            err = jnp.imag(u)
        else:
            up = u
            for _ in range(int(np.log2(order))):
                up = up * up
            err = jnp.imag(up) / order
        fr = fr + beta * err
        ph = jnp.mod(ph + fr + alpha * err, _TWO_PI)
        return (ph, fr), y

    (phase, freq), ys = jax.lax.scan(step, (phase, freq), jnp.transpose(x))
    return (phase, freq), jnp.transpose(ys)


class CostasLoop:
    """Streaming carrier recovery over [C, T] blocks.

    order=1 → plain PLL (tracks a residual carrier tone),
    order=2/4/8 → Costas for BPSK/QPSK/8PSK.
    """

    def __init__(self, channels: int, loop_bw: float = 0.01,
                 order: int = 2) -> None:
        if order not in (1, 2, 4, 8):
            raise ValueError(f"unsupported loop order {order}")
        self.channels = channels
        self.order = order
        self.alpha, self.beta = loop_gains(loop_bw)
        self.phase = jnp.zeros(channels, jnp.float32)
        self.freq = jnp.zeros(channels, jnp.float32)

    def __call__(self, x) -> jax.Array:
        x = jnp.asarray(x, jnp.complex64)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None, :]
        (self.phase, self.freq), y = _costas_scan(
            x, self.phase, self.freq,
            jnp.float32(self.alpha), jnp.float32(self.beta), self.order,
        )
        return y[0] if squeeze else y

    @property
    def frequency_estimate(self) -> jax.Array:
        """Tracked frequency offset in radians/sample, per channel."""
        return self.freq

    def reset(self) -> None:
        self.phase = jnp.zeros_like(self.phase)
        self.freq = jnp.zeros_like(self.freq)


class PLL(CostasLoop):
    """2nd-order PLL (reference `su_pll_t` semantics): CostasLoop of
    order 1 — tracks an unmodulated carrier."""

    def __init__(self, channels: int, loop_bw: float = 0.01) -> None:
        super().__init__(channels, loop_bw, order=1)
