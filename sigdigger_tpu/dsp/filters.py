"""FIR filter design and streaming application.

Design (host, float64): windowed-sinc lowpass and root-raised-cosine
taps — the `su_iir_rrc_init` equivalent (reference
Tasks/WaveSampler.cpp:73-78; `mf.*` config keys).

Application (device): batched convolution over [channels, time] blocks
with a carried tail so streaming is exact across block boundaries.  On
TPU the convolution runs as `lax.conv_general_dilated` over the real and
imaginary planes, which XLA lowers onto the MXU for wide channel
batches.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Design
# ---------------------------------------------------------------------------

def fir_lowpass(num_taps: int, cutoff: float, window: str = "hamming") -> np.ndarray:
    """Windowed-sinc lowpass; ``cutoff`` is normalized to Nyquist=1
    (i.e. cutoff frequency / (fs/2)).  Unity DC gain, float32."""
    if not 0.0 < cutoff <= 1.0:
        raise ValueError(f"cutoff must be in (0, 1], got {cutoff}")
    n = np.arange(num_taps, dtype=np.float64) - (num_taps - 1) / 2.0
    h = np.sinc(cutoff * n) * cutoff
    if window == "hamming":
        w = np.hamming(num_taps)
    elif window == "blackman":
        w = np.blackman(num_taps)
    elif window == "rect":
        w = np.ones(num_taps)
    else:
        raise ValueError(f"unknown window {window!r}")
    h *= w
    h /= h.sum()
    return h.astype(np.float32)


def rrc_taps(sps: float, span: int = 8, rolloff: float = 0.35) -> np.ndarray:
    """Root-raised-cosine taps at ``sps`` samples/symbol over ``span``
    symbols (odd length), unit energy.  Matched-filter contract of the
    reference's `mf.type=1` / `mf.roll-off` keys (SURVEY.md §5.6)."""
    beta = float(rolloff)
    n_taps = int(2 * np.floor(span * sps / 2) + 1)
    t = (np.arange(n_taps, dtype=np.float64) - (n_taps - 1) / 2.0) / sps
    h = np.zeros_like(t)
    for i, ti in enumerate(t):
        if abs(ti) < 1e-9:
            h[i] = 1.0 - beta + 4.0 * beta / np.pi
        elif beta > 0 and abs(abs(4.0 * beta * ti) - 1.0) < 1e-9:
            h[i] = (beta / np.sqrt(2.0)) * (
                (1 + 2 / np.pi) * np.sin(np.pi / (4 * beta))
                + (1 - 2 / np.pi) * np.cos(np.pi / (4 * beta))
            )
        else:
            num = (np.sin(np.pi * ti * (1 - beta))
                   + 4 * beta * ti * np.cos(np.pi * ti * (1 + beta)))
            den = np.pi * ti * (1 - (4 * beta * ti) ** 2)
            h[i] = num / den
    h /= np.sqrt(np.sum(h ** 2))
    return h.astype(np.float32)


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=())
def _conv_real(x: jax.Array, taps: jax.Array) -> jax.Array:
    """'valid' correlation-style FIR over the last axis of [C, T+K-1]."""
    c = x.shape[0]
    k = taps.shape[0]
    lhs = x[:, None, :]                       # [C, 1, T+K-1]
    rhs = taps[::-1][None, None, :]           # [1, 1, K] (conv flips)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "IOH", "NCH"),
    )
    return out[:, 0, :]


class FirFilter:
    """Streaming FIR y[n] = sum_k h[k] x[n-k] over [C, T] complex blocks.

    Carries the trailing K-1 input samples between blocks, so feeding a
    split stream equals filtering the concatenation (group delay
    (K-1)/2 samples, like any causal FIR).
    """

    def __init__(self, taps: np.ndarray, channels: int) -> None:
        self.taps = jnp.asarray(taps, jnp.float32)
        self.channels = channels
        k = len(taps)
        self._tail = jnp.zeros((channels, k - 1), jnp.complex64)

    def __call__(self, x: jax.Array) -> jax.Array:
        x = jnp.asarray(x, jnp.complex64)
        ext = jnp.concatenate([self._tail, x], axis=1)
        k = self.taps.shape[0]
        if k > 1:
            self._tail = ext[:, -(k - 1):]
        yr = _conv_real(ext.real, self.taps)
        yi = _conv_real(ext.imag, self.taps)
        return jax.lax.complex(yr, yi)

    def reset(self) -> None:
        self._tail = jnp.zeros_like(self._tail)


def fir_apply(x, taps) -> jax.Array:
    """One-shot zero-state FIR over [C, T] (or [T]) complex input,
    same-length output (zero-padded warmup)."""
    x = jnp.asarray(x, jnp.complex64)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    taps = jnp.asarray(taps, jnp.float32)
    k = taps.shape[0]
    ext = jnp.concatenate(
        [jnp.zeros((x.shape[0], k - 1), jnp.complex64), x], axis=1
    )
    y = jax.lax.complex(_conv_real(ext.real, taps), _conv_real(ext.imag, taps))
    return y[0] if squeeze else y
