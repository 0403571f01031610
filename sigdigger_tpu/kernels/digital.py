"""Pallas TPU kernel: batched FSK / ASK symbol recovery.

Companion to `kernels/psk.py` with the carrier stage swapped:

- FSK: quadrature discriminator (previous-sample product + in-kernel
  atan2) → soft frequency values;
- ASK: envelope magnitude with a one-pole DC tracker (mean removal so
  the Gardner TED sees a bipolar eye);

then the same tail-exact matched filter (static shifted mul-adds) and
power-normalized Gardner pass as the PSK kernel.  Dense (soft, strobe)
outputs, [rows, C] state planes.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sigdigger_tpu.dsp.filters import rrc_taps
from sigdigger_tpu.kernels.ops import atan2


@dataclass(frozen=True)
class DigitalKernelConfig:
    n_channels: int
    block_len: int
    mode: str = "fsk"            # "fsk" | "ask"
    sps: float = 4.0
    clock_gain: float = 0.05
    mf_rolloff: float = 0.35
    use_mf: bool = True
    channel_tile: int = 128


def _digital_kernel(y_re, y_im, state_in, out_soft, out_strobe,
                    state_out, scr,
                    *, m: int, k: int, taps: tuple, mode: str,
                    gain_p: float, gain_f: float, p_min: float,
                    p_max: float):
    # state rows: 0 prev_re, 1 prev_im (quad) / dc (ask), 2 t,
    # 3 period, 4 prev_soft, 5 mid, 6 strobe_prev, 7 want_mid, 8 power,
    # 9.. mf tail (k-1 rows)
    # ----- pass 1: demod front-end → scr[k-1:], real soft values ------
    if mode == "fsk":
        pr = state_in[0, :]
        pi = state_in[1, :]

        def front_step(i, carry):
            pr, pi = carry
            xr = y_re[i, :]
            xi = y_im[i, :]
            dr = xr * pr + xi * pi
            di = xi * pr - xr * pi
            scr[i + (k - 1), :] = atan2(di, dr) * jnp.float32(1.0 / np.pi)
            return xr, xi

        pr, pi = jax.lax.fori_loop(0, m, front_step, (pr, pi))
        state_out[0, :] = pr
        state_out[1, :] = pi
    else:  # ask: envelope with slow DC removal
        dc = state_in[1, :]
        alpha = jnp.float32(0.9995)

        def front_step(i, dc):
            xr = y_re[i, :]
            xi = y_im[i, :]
            mag = jnp.sqrt(xr * xr + xi * xi)
            dc = alpha * dc + (1.0 - alpha) * mag
            scr[i + (k - 1), :] = mag - dc
            return dc

        dc = jax.lax.fori_loop(0, m, front_step, dc)
        state_out[0, :] = state_in[0, :]
        state_out[1, :] = dc

    # carry MF tail (no tail when the MF is bypassed, k == 1)
    if k > 1:
        scr[0:k - 1, :] = state_in[9:9 + (k - 1), :]
        state_out[9:9 + (k - 1), :] = scr[m:m + (k - 1), :]

    # ----- pass 2: matched filter ------------------------------------
    if len(taps) > 1:
        f = taps[0] * scr[k - 1:k - 1 + m, :]
        for t in range(1, k):
            f = f + taps[t] * scr[k - 1 - t:k - 1 - t + m, :]
        scr[0:m, :] = f

    # ----- pass 3: Gardner (real-valued) -----------------------------
    def gardner_step(i, carry):
        t, period, prev, mid, st_prev, want_mid, power = carry
        x = scr[i + (0 if len(taps) > 1 else k - 1), :]
        t = t - 1.0
        event = t <= 0.0
        frac = jnp.clip(t + 1.0, 0.0, 1.0)
        interp = prev + frac * (x - prev)

        is_mid = jnp.logical_and(event, want_mid > 0.5)
        is_strobe = jnp.logical_and(event, want_mid <= 0.5)

        power = power + 0.01 * (x * x - power)
        nm = jnp.where(is_mid, interp, mid)
        err = (interp - st_prev) * nm
        err = jnp.where(is_strobe, err, 0.0) / jnp.maximum(power, 1e-9)
        err = jnp.clip(err, -2.0, 2.0)

        period = jnp.clip(period - gain_f * err, p_min, p_max)
        t = t + jnp.where(event, period * 0.5 - gain_p * err, 0.0)

        st_prev = jnp.where(is_strobe, interp, st_prev)
        want_mid = jnp.where(event, 1.0 - want_mid, want_mid)
        out_soft[i, :] = jnp.where(is_strobe, interp, 0.0)
        out_strobe[i, :] = jnp.where(is_strobe, 1.0, 0.0)
        return t, period, x, nm, st_prev, want_mid, power

    carry = tuple(state_in[i, :] for i in range(2, 9))
    carry = jax.lax.fori_loop(0, m, gardner_step, carry)
    for i, v in enumerate(carry):
        state_out[2 + i, :] = v


class DigitalKernel:
    """Batched FSK/ASK recovery over [M, C] channelized blocks."""

    def __init__(self, cfg: DigitalKernelConfig,
                 interpret: bool | None = None) -> None:
        assert cfg.n_channels % cfg.channel_tile == 0
        assert cfg.mode in ("fsk", "ask")
        assert cfg.sps >= 2.0
        self.cfg = cfg
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu", "axon")
        if cfg.use_mf:
            taps = rrc_taps(cfg.sps, span=6, rolloff=cfg.mf_rolloff)
            self.taps = tuple(float(t) for t in taps)
        else:
            self.taps = (1.0,)
        k = len(self.taps)
        self.taps_len = k
        self.STATE_ROWS = 9 + (k - 1)
        m, ct = cfg.block_len, cfg.channel_tile
        n_tiles = cfg.n_channels // ct
        grid_spec = pl.GridSpec(
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((m, ct), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m, ct), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((self.STATE_ROWS, ct), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((m, ct), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m, ct), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((self.STATE_ROWS, ct), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((m + k - 1, ct), jnp.float32),
            ],
        )
        c = cfg.n_channels
        self._call = jax.jit(pl.pallas_call(
            partial(_digital_kernel, m=m, k=k, taps=self.taps,
                    mode=cfg.mode, gain_p=cfg.clock_gain,
                    gain_f=cfg.clock_gain ** 2 / 4.0,
                    p_min=cfg.sps * 0.9, p_max=cfg.sps * 1.1),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((m, c), jnp.float32),
                jax.ShapeDtypeStruct((m, c), jnp.float32),
                jax.ShapeDtypeStruct((self.STATE_ROWS, c), jnp.float32),
            ],
            interpret=interpret,
        ))
        self.state = self.init_state()

    def init_state(self) -> np.ndarray:
        c = self.cfg.n_channels
        s = np.zeros((self.STATE_ROWS, c), np.float32)
        s[2] = self.cfg.sps / 2.0     # t
        s[3] = self.cfg.sps           # period
        s[7] = 1.0                    # want_mid
        s[8] = 1.0                    # power
        return s

    def feed(self, y: np.ndarray):
        """y: [M, C] complex64 → (soft float32 [M, C], strobe bool)."""
        y = np.asarray(y, np.complex64)
        soft, strobe, self.state = self._call(
            np.ascontiguousarray(y.real), np.ascontiguousarray(y.imag),
            self.state)
        return np.asarray(soft), np.asarray(strobe) > 0.5

    @property
    def period_estimate(self) -> np.ndarray:
        return np.asarray(self.state[3])
