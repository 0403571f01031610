"""Decider — soft values → symbol indices/bits.

Equivalent of the SuWidgets `Decider` helper the reference feeds from
WaveSampler output (reference Tasks/WaveSampler.cpp + SURVEY.md §2.2):
maps a decision space (AMPLITUDE / PHASE / FREQUENCY) onto 2^bps
uniform intervals.
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp
import numpy as np


class DecisionSpace(enum.Enum):
    """reference include/SamplingProperties.h:26-52 decision spaces."""

    AMPLITUDE = "amplitude"
    PHASE = "phase"
    FREQUENCY = "frequency"


def decide_interval(values, lo: float, hi: float, bits: int) -> jax.Array:
    """Uniformly quantize ``values`` in [lo, hi) to 2^bits symbol ids."""
    levels = 1 << bits
    v = jnp.asarray(values, jnp.float32)
    idx = jnp.floor((v - lo) / (hi - lo) * levels)
    return jnp.clip(idx, 0, levels - 1).astype(jnp.uint8)


def decide_phase(symbols, bits: int, offset: float = 0.0) -> jax.Array:
    """PSK decision: complex symbols → sector ids, sector 0 centered on
    angle ``offset`` (decision boundaries half-way between points)."""
    levels = 1 << bits
    ang = jnp.angle(jnp.asarray(symbols)) - offset
    sector = jnp.round(ang * levels / (2.0 * np.pi))
    return jnp.mod(sector, levels).astype(jnp.uint8)


def decide_amplitude(values, bits: int, vmax: float | None = None):
    """ASK decision: real amplitudes → 2^bits uniform levels in
    [0, vmax] with mid-tread placement."""
    v = jnp.asarray(values, jnp.float32)
    if vmax is None:
        vmax = jnp.maximum(jnp.max(v), 1e-12)
    levels = 1 << bits
    idx = jnp.round(v / vmax * (levels - 1))
    return jnp.clip(idx, 0, levels - 1).astype(jnp.uint8)


def decide_frequency(values, bits: int, span: float | None = None):
    """FSK decision: instantaneous-frequency soft values (symmetric
    around 0) → 2^bits tone ids."""
    v = jnp.asarray(values, jnp.float32)
    if span is None:
        span = jnp.maximum(jnp.max(jnp.abs(v)), 1e-12)
    return decide_interval(v, -span * (1 + 1e-6), span * (1 + 1e-6), bits)


def symbols_to_bits(symbols, bits: int) -> np.ndarray:
    """Unpack symbol ids to an MSB-first bit array (host side)."""
    s = np.asarray(symbols, np.uint8)
    out = np.zeros((len(s), bits), np.uint8)
    for b in range(bits):
        out[:, b] = (s >> (bits - 1 - b)) & 1
    return out.reshape(-1)
