"""Pallas TPU kernel: batched CMA blind equalizer.

The kernel-path counterpart of :mod:`sigdigger_tpu.dsp.equalizer` —
the reference inspectors' `equalizer.{type,rate,locked}` contract
(reference Default/GenericInspector/InspectorCtl/EqualizerControl.cpp).
Sits downstream of the RecoveryBank symbol output: a bank of per-channel
K-tap complex FIRs adapted per symbol with the soft-clipped, power-
normalized CMA update (identical math to the `lax.scan` reference
implementation, so the two paths are interchangeable and tested
equal).  Per-channel adaptation rate and lock mask are device-resident
rows — reconfiguring an inspector touches no compiled code.

Layout: time-major [T, C] planes, channel tiles of 128 lanes; the K
delay-line samples ride the fori_loop carry (K is small and static),
taps live in VMEM and are written back as state.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclass(frozen=True)
class CMABankConfig:
    n_channels: int
    block_len: int               # T symbols per dispatch
    n_taps: int = 5              # K (static)
    channel_tile: int = 128

    def __post_init__(self):
        assert self.n_channels % self.channel_tile == 0


def _cma_kernel(x_re, x_im, taps_re_in, taps_im_in, rate, locked,
                y_re, y_im, taps_re_out, taps_im_out,
                *, t_len: int, k: int):
    rt = rate[0, :]
    unlocked = 1.0 - locked[0, :]

    # taps into carried lane vectors (K static, unrolled)
    taps0 = tuple(taps_re_in[i, :] for i in range(k)) + \
        tuple(taps_im_in[i, :] for i in range(k))
    # delay line: buf[0] = newest sample (matches dsp _cma_scan)
    zeros = jnp.zeros_like(rt)
    buf0 = (zeros,) * (2 * k)

    def step(i, carry):
        taps = carry[:2 * k]
        buf = carry[2 * k:]
        br = (x_re[i, :],) + buf[:k - 1]
        bi = (x_im[i, :],) + buf[k:2 * k - 1]
        tr = taps[:k]
        ti = taps[k:]
        yr = zeros
        yi = zeros
        for j in range(k):
            yr = yr + tr[j] * br[j] - ti[j] * bi[j]
            yi = yi + tr[j] * bi[j] + ti[j] * br[j]
        y_re[i, :] = yr
        y_im[i, :] = yi
        # CMA error, soft-clipped and power-normalized
        p = yr * yr + yi * yi
        er = yr * (p - 1.0)
        ei = yi * (p - 1.0)
        emag = jnp.sqrt(er * er + ei * ei)
        s = 1.0 / jnp.maximum(emag, 1.0)
        er = er * s
        ei = ei * s
        power = jnp.float32(1e-6)
        for j in range(k):
            power = power + br[j] * br[j] + bi[j] * bi[j]
        g = unlocked * rt / power
        new_tr = []
        new_ti = []
        for j in range(k):
            new_tr.append(tr[j] - g * (er * br[j] + ei * bi[j]))
            new_ti.append(ti[j] - g * (ei * br[j] - er * bi[j]))
        return tuple(new_tr) + tuple(new_ti) + br + bi

    carry = jax.lax.fori_loop(0, t_len, step, taps0 + buf0)
    for i in range(k):
        taps_re_out[i, :] = carry[i]
        taps_im_out[i, :] = carry[k + i]


class CMABank:
    """Streaming batched CMA over [C, T] symbol blocks (kernel path)."""

    def __init__(self, cfg: CMABankConfig,
                 rate: float | np.ndarray = 1e-3,
                 locked: bool | np.ndarray = False,
                 interpret: bool | None = None) -> None:
        self.cfg = cfg
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu", "axon")
        self.interpret = interpret
        c, k = cfg.n_channels, cfg.n_taps
        self.rate = jnp.broadcast_to(
            jnp.asarray(rate, jnp.float32), (1, c))
        self.locked = jnp.broadcast_to(
            jnp.asarray(locked, jnp.float32) * 1.0, (1, c))
        taps_re = np.zeros((k, c), np.float32)
        taps_re[k // 2, :] = 1.0
        self.taps_re = jnp.asarray(taps_re)
        self.taps_im = jnp.zeros((k, c), jnp.float32)
        self._fn = self._build()

    def _build(self):
        cfg = self.cfg
        t, c, k = cfg.block_len, cfg.n_channels, cfg.n_taps
        tile = cfg.channel_tile
        grid = (c // tile,)

        def row_spec(rows):
            return pl.BlockSpec((rows, tile), lambda g: (0, g))

        kernel = partial(_cma_kernel, t_len=t, k=k)
        call = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[row_spec(t), row_spec(t), row_spec(k),
                      row_spec(k), row_spec(1), row_spec(1)],
            out_specs=[row_spec(t), row_spec(t), row_spec(k),
                       row_spec(k)],
            out_shape=[
                jax.ShapeDtypeStruct((t, c), jnp.float32),
                jax.ShapeDtypeStruct((t, c), jnp.float32),
                jax.ShapeDtypeStruct((k, c), jnp.float32),
                jax.ShapeDtypeStruct((k, c), jnp.float32),
            ],
            interpret=self.interpret,
        )
        return jax.jit(call)

    def __call__(self, x: jax.Array | np.ndarray) -> jax.Array:
        """x: [C, T] complex symbols → equalized [C, T] complex."""
        x = jnp.asarray(x, jnp.complex64)
        xr = jnp.transpose(jnp.real(x)).astype(jnp.float32)
        xi = jnp.transpose(jnp.imag(x)).astype(jnp.float32)
        yr, yi, self.taps_re, self.taps_im = self._fn(
            xr, xi, self.taps_re, self.taps_im, self.rate, self.locked)
        return jnp.transpose(yr + 1j * yi).astype(jnp.complex64)

    def reset(self) -> None:
        k, c = self.cfg.n_taps, self.cfg.n_channels
        taps_re = np.zeros((k, c), np.float32)
        taps_re[k // 2, :] = 1.0
        self.taps_re = jnp.asarray(taps_re)
        self.taps_im = jnp.zeros((k, c), jnp.float32)
