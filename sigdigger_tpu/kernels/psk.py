"""Pallas TPU kernel: batched PSK carrier + symbol recovery.

The recurrent inspector loops (Costas, Gardner — reference `su_costas`,
`su_clock_detector`) are per-sample feedback loops: sequential in time,
but trivially parallel across channels.  On TPU each kernel program owns
a channel tile and runs three passes entirely in VMEM:

  1. Costas derotation — `fori_loop` over time, [C_t]-wide phase/freq
     state, modulation-stripping power detector (no trig pairs per
     element: the LO is advanced as a complex phasor with periodic
     renormalization, so each step is mul/add + one rsqrt);
  2. RRC matched filter — K static shifted multiply-adds over the
     tail-extended VMEM buffer (no M×M matrix: VMEM-frugal and exact
     across block splits);
  3. Gardner timing recovery — `fori_loop`, power-normalized TED,
     linear interpolation, dense (symbol, strobe) output rows.

Outputs keep fixed shapes ([M, C_t] symbol planes + strobe mask);
consumers compact on host.
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
from sigdigger_tpu.dsp.pll import loop_gains


@dataclass(frozen=True)
class PskKernelConfig:
    n_channels: int
    block_len: int               # M samples per block (channel rate)
    sps: float = 4.0
    order: int = 4               # 2 | 4 | 8
    loop_bw: float = 0.005
    clock_gain: float = 0.05
    rrc_rolloff: float = 0.35
    channel_tile: int = 128


def make_psk_constants(cfg: PskKernelConfig) -> dict[str, np.ndarray]:
    """RRC taps; the kernel convolves them as K static shifted
    mul-adds over a tail-extended buffer (the previous block's last
    K-1 samples are carried in state, so block splits are exact)."""
    taps = rrc_taps(cfg.sps, span=6, rolloff=cfg.rrc_rolloff)
    return {"taps": taps.astype(np.float32),
            "taps_len": np.int64(len(taps))}


def _psk_kernel(y_re, y_im, state_in, out_sym_re, out_sym_im,
                out_strobe, state_out, scr_re, scr_im,
                *, m: int, k: int, taps: tuple, order: int,
                alpha: float, beta: float, gain_p: float, gain_f: float,
                p_min: float, p_max: float):
    # ----- pass 1: Costas derotation --------------------------------------
    # state rows: 0 lo_re, 1 lo_im, 2 freq, 3 t, 4 period, 5 prev_re,
    # 6 prev_im, 7 mid_re, 8 mid_im, 9 strobe_re, 10 strobe_im,
    # 11 want_mid, 12 power
    lo_re = state_in[0, :]
    lo_im = state_in[1, :]
    freq = state_in[2, :]

    def costas_step(i, carry):
        lo_re, lo_im, freq = carry
        xr = y_re[i, :]
        xi = y_im[i, :]
        # derotate: y * conj(lo)
        rr = xr * lo_re + xi * lo_im
        ri = xi * lo_re - xr * lo_im
        scr_re[i + (k - 1), :] = rr
        scr_im[i + (k - 1), :] = ri
        # normalize u = y/|y|
        mag = jnp.maximum(jnp.sqrt(rr * rr + ri * ri), 1e-12)
        ur = rr / mag
        ui = ri / mag
        # u^order via repeated squaring (order in {2,4,8})
        for _ in range(int(np.log2(order))):
            ur, ui = ur * ur - ui * ui, 2.0 * ur * ui
        err = ui * (1.0 / order)
        freq = freq + beta * err
        w = freq + alpha * err
        # advance LO by phasor multiply with e^{jw} ≈ small-angle exact:
        # use cos/sin (VPU transcendentals are available)
        cw = jnp.cos(w)
        sw = jnp.sin(w)
        nr = lo_re * cw - lo_im * sw
        ni = lo_re * sw + lo_im * cw
        # renormalize to kill drift
        inv = jax.lax.rsqrt(nr * nr + ni * ni)
        return nr * inv, ni * inv, freq

    # prefill the MF tail rows from carried state
    scr_re[0:k - 1, :] = state_in[13:13 + (k - 1), :]
    scr_im[0:k - 1, :] = state_in[13 + (k - 1):13 + 2 * (k - 1), :]

    lo_re, lo_im, freq = jax.lax.fori_loop(
        0, m, costas_step, (lo_re, lo_im, freq))
    new_tail_re = scr_re[m:m + (k - 1), :]
    new_tail_im = scr_im[m:m + (k - 1), :]

    # ----- pass 2: matched filter (K static shifted mul-adds) -----------
    # fr[i] = sum_t taps[t] * ext[(K-1) + i - t]
    fr = taps[0] * scr_re[k - 1:k - 1 + m, :]
    fi = taps[0] * scr_im[k - 1:k - 1 + m, :]
    for t in range(1, k):
        fr = fr + taps[t] * scr_re[k - 1 - t:k - 1 - t + m, :]
        fi = fi + taps[t] * scr_im[k - 1 - t:k - 1 - t + m, :]
    scr_re[0:m, :] = fr
    scr_im[0:m, :] = fi

    # ----- pass 3: Gardner ------------------------------------------------
    def gardner_step(i, carry):
        (t, period, prev_re, prev_im, mid_re, mid_im, st_re, st_im,
         want_mid, power) = carry
        xr = scr_re[i, :]
        xi = scr_im[i, :]
        t = t - 1.0
        event = t <= 0.0
        frac = jnp.clip(t + 1.0, 0.0, 1.0)
        ir = prev_re + frac * (xr - prev_re)
        ii = prev_im + frac * (xi - prev_im)

        is_mid = jnp.logical_and(event, want_mid > 0.5)
        is_strobe = jnp.logical_and(event, want_mid <= 0.5)

        power = power + 0.01 * (xr * xr + xi * xi - power)
        nm_re = jnp.where(is_mid, ir, mid_re)
        nm_im = jnp.where(is_mid, ii, mid_im)
        err = (ir - st_re) * nm_re + (ii - st_im) * nm_im
        err = jnp.where(is_strobe, err, 0.0) / jnp.maximum(power, 1e-9)
        err = jnp.clip(err, -2.0, 2.0)

        period = jnp.clip(period - gain_f * err, p_min, p_max)
        t = t + jnp.where(event, period * 0.5 - gain_p * err, 0.0)

        st_re = jnp.where(is_strobe, ir, st_re)
        st_im = jnp.where(is_strobe, ii, st_im)
        want_mid = jnp.where(event, 1.0 - want_mid, want_mid)
        out_sym_re[i, :] = jnp.where(is_strobe, ir, 0.0)
        out_sym_im[i, :] = jnp.where(is_strobe, ii, 0.0)
        out_strobe[i, :] = jnp.where(is_strobe, 1.0, 0.0)
        return (t, period, xr, xi, nm_re, nm_im, st_re, st_im,
                want_mid, power)

    carry = tuple(state_in[i, :] for i in range(3, 13))
    carry = jax.lax.fori_loop(0, m, gardner_step, carry)

    state_out[0, :] = lo_re
    state_out[1, :] = lo_im
    state_out[2, :] = freq
    for i, v in enumerate(carry):
        state_out[3 + i, :] = v
    state_out[13:13 + (k - 1), :] = new_tail_re
    state_out[13 + (k - 1):13 + 2 * (k - 1), :] = new_tail_im


class PskKernel:
    """Batched PSK recovery over [M, C] channelized blocks (time-major
    planes, matching the matmul channelizer's output layout)."""

    def __init__(self, cfg: PskKernelConfig,
                 interpret: bool | None = None) -> None:
        assert cfg.n_channels % cfg.channel_tile == 0
        assert cfg.order in (2, 4, 8)
        assert cfg.sps >= 2.0
        self.cfg = cfg
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu", "axon")
        consts = make_psk_constants(cfg)
        self.taps = tuple(float(t) for t in consts["taps"])
        self.taps_len = int(consts["taps_len"])
        self.STATE_ROWS = 13 + 2 * (self.taps_len - 1)
        alpha, beta = loop_gains(cfg.loop_bw)
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
                pl.BlockSpec((m, ct), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((self.STATE_ROWS, ct), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((m + self.taps_len - 1, ct), jnp.float32),
                pltpu.VMEM((m + self.taps_len - 1, ct), jnp.float32),
            ],
        )
        c = cfg.n_channels
        self._call = jax.jit(pl.pallas_call(
            partial(_psk_kernel, m=m, k=self.taps_len, taps=self.taps,
                    order=cfg.order,
                    alpha=float(alpha), beta=float(beta),
                    gain_p=cfg.clock_gain,
                    gain_f=cfg.clock_gain ** 2 / 4.0,
                    p_min=cfg.sps * 0.9, p_max=cfg.sps * 1.1),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((m, c), jnp.float32),
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
        s[0] = 1.0                        # lo_re
        s[3] = self.cfg.sps / 2.0         # t
        s[4] = self.cfg.sps               # period
        s[11] = 1.0                       # want_mid
        s[12] = 1.0                       # power
        return s

    def feed(self, y: np.ndarray):
        """y: [M, C] complex64 channel baseband → (symbols complex
        [M, C], strobe bool [M, C])."""
        y = np.asarray(y, np.complex64)
        sr, si, strobe, self.state = self._call(
            np.ascontiguousarray(y.real), np.ascontiguousarray(y.imag),
            self.state)
        return (np.asarray(sr) + 1j * np.asarray(si),
                np.asarray(strobe) > 0.5)

    @property
    def period_estimate(self) -> np.ndarray:
        return np.asarray(self.state[4])
