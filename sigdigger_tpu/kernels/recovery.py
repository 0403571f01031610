"""Pallas TPU kernel: the unified PSK/FSK/ASK recovery bank.

One kernel hosts every digital inspector class of the reference engine
("psk" / "fsk" / "ask", reference Default/Inspection/InspToolWidget.cpp:
932-950) over a bank of channels, honoring the FULL per-class config
contract (reference Default/GenericInspector/InspectorCtl/*.cpp):
per-channel demod kind, Costas order (BPSK/QPSK/8PSK) or plain PLL,
loop bandwidth, baud, Gardner vs manual clock (`clock.type`), clock
gain/phase/running, matched-filter taps (`mf.*`), FSK quadrature-vs-
phase detector and phase offset (`fsk.{quad-demod,phase}`), coherent
vs envelope ASK (`ask.use-pll`), and a fused per-symbol CMA equalizer
(`equalizer.{type,rate,locked}`) — all selected by device-resident
rows so the analyzer can open/retune/reconfigure digital inspectors at
runtime without recompiling (SURVEY.md §7).

Three passes per grid program, entirely in VMEM:

  1. front-end `fori_loop` — per channel-lane, simultaneously:
       carrier recovery with the order-BLENDED phase detector: the
       per-channel one-hots pick Im(u) (plain PLL, `ask.use-pll`),
       u², u⁴ or u⁸ Costas error terms (three chained complex
       squarings); lanes with all-zero gains keep LO = 1+0j so
       derotation is the identity;
       FSK detector: quadrature discriminator of the prev-sample
       product, or the instantaneous phase after a per-channel
       rotation (`fsk.phase`), selected by `fsk.quad-demod`;
       ASK detector: coherent Re{} of the PLL-locked signal or the
       envelope |x|, with one-pole DC tracking.
     The per-channel kind one-hot routes the result into the complex
     scratch planes (PSK keeps I/Q; FSK/ASK are real, imag = 0).
  2. matched filter — static shifted mul-adds with PER-CHANNEL tap
     rows [K, C] (per-channel roll-off and samples/symbol; `mf.*`
     config keys, reference Tasks/WaveSampler.cpp:73-78), tails
     carried in state so block splits are exact.
  3. Gardner timing recovery — complex, power-normalized TED with
     per-channel gains and period bounds (`clock.type` manual zeroes
     the gains: fixed-interval sampling); fused per-strobe CMA
     fractionally-NOT-spaced (symbol-rate) equalizer: a K-tap complex
     FIR over the strobed symbols with the soft-clipped, power-
     normalized CMA update (same math as kernels/equalizer.py,
     adaptation and delay-line pushes gated on strobe events);
     `clock.running` gates symbol emission.  Dense (symbol, strobe)
     output planes, compacted on host.
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
from sigdigger_tpu.kernels.ops import atan2

KIND_PSK = 0
KIND_FSK = 1
KIND_ASK = 2


@dataclass(frozen=True)
class RecoveryBankConfig:
    n_channels: int
    block_len: int               # M channel samples per dispatch
    mf_taps_max: int = 64        # K: per-channel MF tap budget
    eq_taps: int = 5             # CMA equalizer taps (static)
    channel_tile: int = 128
    m_tile: int = 0              # Mt per grid program (0 → auto ≤2048)
    dc_alpha: float = 0.9995     # ASK DC follower pole

    def __post_init__(self):
        assert self.n_channels % self.channel_tile == 0
        if self.m_tile == 0:
            # 1024 keeps the program's VMEM (double-buffered in/out
            # planes + MF/raw scratch) within the 16 MB budget; 2048
            # measured 17.1 MB on the real chip
            mt = min(self.block_len, 1024)
            while self.block_len % mt:
                mt -= 1
            object.__setattr__(self, "m_tile", mt)
        assert self.block_len % self.m_tile == 0


def _recovery_kernel(y_re, y_im, state_in, w_psk, w_fsk, w_ask,
                     w1, w2, w4, w8, alpha, beta, gp, gf, pmin, pmax,
                     fsk_cos, fsk_sin, w_quad, w_coh, w_run,
                     eq_en, eq_rate, mf,
                     out_sym_re, out_sym_im, out_strobe, state_out,
                     scr_re, scr_im, scr_mf_re, scr_mf_im, scr_carry,
                     *, mt: int, k: int, keq: int, m_tiles: int,
                     dc_alpha: float):
    # state rows: 0 lo_re, 1 lo_im, 2 freq | 3 qprev_re, 4 qprev_im |
    # 5 dc | 6 t, 7 period, 8 gprev_re, 9 gprev_im, 10 mid_re,
    # 11 mid_im, 12 st_re, 13 st_im, 14 want_mid, 15 power |
    # 16.. MF tails re then im (k-1 rows each) |
    # then EQ taps re/im (keq each) and EQ delay line re/im (keq each)
    #
    # Grid is (channel tiles, time tiles) with time innermost
    # SEQUENTIAL: loop/tail state rides scr_carry / scr planes across
    # time tiles (VMEM budget stays ~Mt-sized however long the block),
    # seeded from the block-carry state at tile 0 and drained to
    # state_out at the last tile — same pattern as kernels/audio.py.
    mi = pl.program_id(1)
    eq_base = 16 + 2 * (k - 1)
    ncar = 16 + 4 * keq
    al = alpha[0, :]
    be = beta[0, :]
    wp = w_psk[0, :]
    wf = w_fsk[0, :]
    wa = w_ask[0, :]
    o1 = w1[0, :]
    o2 = w2[0, :]
    o4 = w4[0, :]
    o8 = w8[0, :]
    fc = fsk_cos[0, :]
    fs = fsk_sin[0, :]
    wq = w_quad[0, :]
    wc = w_coh[0, :]
    run = w_run[0, :]
    eqe = eq_en[0, :]
    eqr = eq_rate[0, :]
    adc = jnp.float32(dc_alpha)

    @pl.when(mi == 0)
    def _():
        scr_re[0:k - 1, :] = state_in[16:16 + (k - 1), :]
        scr_im[0:k - 1, :] = state_in[16 + (k - 1):16 + 2 * (k - 1), :]
        scr_carry[0:16, :] = state_in[0:16, :]
        scr_carry[16:ncar, :] = state_in[eq_base:eq_base + 4 * keq, :]

    # ----- pass 1: blended front-end --------------------------------------
    def front_step(i, carry):
        lo_re, lo_im, freq, qpr, qpi, dc = carry
        xr = y_re[i, :]
        xi = y_im[i, :]
        # carrier derotation (identity for untracked lanes: LO = 1+0j)
        rr = xr * lo_re + xi * lo_im
        ri = xi * lo_re - xr * lo_im
        mag = jnp.maximum(jnp.sqrt(rr * rr + ri * ri), 1e-12)
        ur = rr / mag
        ui = ri / mag
        u2r = ur * ur - ui * ui
        u2i = 2.0 * ur * ui
        u4r = u2r * u2r - u2i * u2i
        u4i = 2.0 * u2r * u2i
        u8i = 2.0 * u4r * u4i
        err = (o1 * ui + o2 * u2i * 0.5 + o4 * u4i * 0.25
               + o8 * u8i * 0.125)
        freq = freq + be * err
        w = freq + al * err
        cw = jnp.cos(w)
        sw = jnp.sin(w)
        nr = lo_re * cw - lo_im * sw
        ni = lo_re * sw + lo_im * cw
        inv = jax.lax.rsqrt(nr * nr + ni * ni)
        # FSK: quadrature discriminator OR rotated instantaneous phase
        dr = xr * qpr + xi * qpi
        di = xi * qpr - xr * qpi
        fq = atan2(di, dr)
        xr2 = xr * fc - xi * fs
        xi2 = xr * fs + xi * fc
        fp = atan2(xi2, xr2)
        fv = (wq * fq + (1.0 - wq) * fp) * jnp.float32(1.0 / np.pi)
        # ASK: coherent Re{} of the locked signal or envelope, DC-tracked
        avs = wc * rr + (1.0 - wc) * mag
        dc = adc * dc + (1.0 - adc) * avs
        av = avs - dc
        scr_re[i + (k - 1), :] = wp * rr + wf * fv + wa * av
        scr_im[i + (k - 1), :] = wp * ri
        return nr * inv, ni * inv, freq, xr, xi, dc

    carry0 = tuple(scr_carry[i, :] for i in range(6))
    front_out = jax.lax.fori_loop(0, mt, front_step, carry0)
    for i in range(6):
        scr_carry[i, :] = front_out[i]

    # ----- pass 2: per-channel matched filter -----------------------------
    fr = mf[0:1, :] * scr_re[k - 1:k - 1 + mt, :]
    fi = mf[0:1, :] * scr_im[k - 1:k - 1 + mt, :]
    for t in range(1, k):
        fr = fr + mf[t:t + 1, :] * scr_re[k - 1 - t:k - 1 - t + mt, :]
        fi = fi + mf[t:t + 1, :] * scr_im[k - 1 - t:k - 1 - t + mt, :]
    scr_mf_re[:] = fr
    scr_mf_im[:] = fi
    # carry the raw-plane tails into the next time tile
    scr_re[0:k - 1, :] = scr_re[mt:mt + k - 1, :]
    scr_im[0:k - 1, :] = scr_im[mt:mt + k - 1, :]

    # ----- pass 3: Gardner + fused per-strobe CMA equalizer ---------------
    gpv = gp[0, :]
    gfv = gf[0, :]
    pmn = pmin[0, :]
    pmx = pmax[0, :]

    def gardner_step(i, carry):
        (t, period, prev_re, prev_im, mid_re, mid_im, st_re, st_im,
         want_mid, power) = carry[:10]
        eq = carry[10:]
        xr = scr_mf_re[i, :]
        xi = scr_mf_im[i, :]
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

        # NOT jnp.clip: the 3-operand clamp with per-channel vector
        # bounds trips the axon Mosaic layout check (SIGABRT in
        # layout.h); binary min/max lowers fine
        period = jnp.minimum(jnp.maximum(period - gfv * err, pmn), pmx)
        t = t + jnp.where(event, period * 0.5 - gpv * err, 0.0)

        st_re = jnp.where(is_strobe, ir, st_re)
        st_im = jnp.where(is_strobe, ii, st_im)
        want_mid = jnp.where(event, 1.0 - want_mid, want_mid)

        # fused CMA FSE at symbol rate: delay-line push, FIR, and the
        # soft-clipped power-normalized tap update all gated on strobes
        etr = list(eq[:keq])
        eti = list(eq[keq:2 * keq])
        ebr = list(eq[2 * keq:3 * keq])
        ebi = list(eq[3 * keq:4 * keq])
        push = jnp.where(is_strobe, 1.0, 0.0)
        nbr = [push * ir + (1.0 - push) * ebr[0]]
        nbi = [push * ii + (1.0 - push) * ebi[0]]
        for j in range(1, keq):
            nbr.append(push * ebr[j - 1] + (1.0 - push) * ebr[j])
            nbi.append(push * ebi[j - 1] + (1.0 - push) * ebi[j])
        yr = etr[0] * nbr[0] - eti[0] * nbi[0]
        yi = etr[0] * nbi[0] + eti[0] * nbr[0]
        for j in range(1, keq):
            yr = yr + etr[j] * nbr[j] - eti[j] * nbi[j]
            yi = yi + etr[j] * nbi[j] + eti[j] * nbr[j]
        p = yr * yr + yi * yi
        er = yr * (p - 1.0)
        ei = yi * (p - 1.0)
        emag = jnp.sqrt(er * er + ei * ei)
        s = 1.0 / jnp.maximum(emag, 1.0)
        er = er * s
        ei = ei * s
        pw = jnp.float32(1e-6)
        for j in range(keq):
            pw = pw + nbr[j] * nbr[j] + nbi[j] * nbi[j]
        g = push * eqr / pw
        for j in range(keq):
            etr[j] = etr[j] - g * (er * nbr[j] + ei * nbi[j])
            eti[j] = eti[j] - g * (ei * nbr[j] - er * nbi[j])

        # emit: equalized symbol for eq lanes, interpolant otherwise;
        # clock.running == False suppresses emission entirely
        outr = eqe * yr + (1.0 - eqe) * ir
        outi = eqe * yi + (1.0 - eqe) * ii
        emit = jnp.where(is_strobe, 1.0, 0.0) * run
        out_sym_re[i, :] = emit * outr
        out_sym_im[i, :] = emit * outi
        out_strobe[i, :] = emit
        return ((t, period, xr, xi, nm_re, nm_im, st_re, st_im,
                 want_mid, power) + tuple(etr) + tuple(eti)
                + tuple(nbr) + tuple(nbi))

    carry = tuple(scr_carry[6 + i, :] for i in range(10)) \
        + tuple(scr_carry[16 + i, :] for i in range(4 * keq))
    carry = jax.lax.fori_loop(0, mt, gardner_step, carry)
    for i in range(10):
        scr_carry[6 + i, :] = carry[i]
    for i in range(4 * keq):
        scr_carry[16 + i, :] = carry[10 + i]

    @pl.when(mi == m_tiles - 1)
    def _():
        state_out[0:16, :] = scr_carry[0:16, :]
        state_out[16:16 + (k - 1), :] = scr_re[0:k - 1, :]
        state_out[16 + (k - 1):16 + 2 * (k - 1), :] = \
            scr_im[0:k - 1, :]
        state_out[eq_base:eq_base + 4 * keq, :] = \
            scr_carry[16:ncar, :]


class RecoveryBank:
    """Batched PSK/FSK/ASK recovery with per-channel configuration."""

    def __init__(self, cfg: RecoveryBankConfig,
                 interpret: bool | None = None) -> None:
        self.cfg = cfg
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu", "axon")
        self.interpret = interpret
        self.sharding = None          # set by parallel.banks.shard_*
        c = cfg.n_channels
        k = cfg.mf_taps_max
        self.STATE_ROWS = 16 + 2 * (k - 1) + 4 * cfg.eq_taps

        # host mirrors
        self._kind = np.zeros(c, np.int32)
        self._order = np.full(c, 4, np.int32)
        self._sps = np.full(c, 8.0, np.float64)
        self._loop_bw = np.full(c, 0.005, np.float64)
        self._clock_gain = np.full(c, 0.05, np.float64)
        self._rolloff = np.full(c, 0.35, np.float64)
        self._use_mf = np.ones(c, bool)
        self._pll = np.zeros(c, bool)            # ask.use-pll carrier
        self._quad = np.ones(c, bool)            # fsk.quad-demod
        self._fsk_phase = np.zeros(c, np.float64)
        self._running = np.ones(c, bool)         # clock.running
        self._manual_clock = np.zeros(c, bool)   # clock.type == 0
        self._clock_phase = np.zeros(c, np.float64)
        self._eq_enabled = np.zeros(c, bool)     # equalizer.type == 1
        self._eq_rate = np.full(c, 1e-3, np.float64)
        self._eq_locked = np.zeros(c, bool)
        self._mf = np.zeros((k, c), np.float32)
        self._alpha = np.zeros(c, np.float32)
        self._beta = np.zeros(c, np.float32)
        self.state = np.zeros((self.STATE_ROWS, c), np.float32)
        self._defer = False
        self._rebuild(np.arange(c), reset_state=True)
        self._upload()
        self._call = self._build()

    # ------------------------------------------------------------------
    def configure_channel(self, i: int, *, kind: int | None = None,
                          sps: float | None = None,
                          order: int | None = None,
                          loop_bw: float | None = None,
                          clock_gain: float | None = None,
                          mf_rolloff: float | None = None,
                          use_mf: bool | None = None,
                          pll: bool | None = None,
                          quad_demod: bool | None = None,
                          fsk_phase: float | None = None,
                          running: bool | None = None,
                          manual_clock: bool | None = None,
                          clock_phase: float | None = None,
                          eq_enabled: bool | None = None,
                          eq_rate: float | None = None,
                          eq_locked: bool | None = None,
                          reset_state: bool = True) -> None:
        if kind is not None:
            self._kind[i] = int(kind)
        if sps is not None:
            if sps < 2.0:
                raise ValueError(f"sps must be >= 2, got {sps}")
            self._sps[i] = float(sps)
        if order is not None:
            if order not in (2, 4, 8):
                raise ValueError(f"costas order must be 2|4|8, got {order}")
            self._order[i] = int(order)
        if loop_bw is not None:
            self._loop_bw[i] = float(loop_bw)
        if clock_gain is not None:
            self._clock_gain[i] = float(clock_gain)
        if mf_rolloff is not None:
            self._rolloff[i] = float(mf_rolloff)
        if use_mf is not None:
            self._use_mf[i] = bool(use_mf)
        if pll is not None:
            self._pll[i] = bool(pll)
        if quad_demod is not None:
            self._quad[i] = bool(quad_demod)
        if fsk_phase is not None:
            self._fsk_phase[i] = float(fsk_phase)
        if running is not None:
            self._running[i] = bool(running)
        if manual_clock is not None:
            self._manual_clock[i] = bool(manual_clock)
        if clock_phase is not None:
            self._clock_phase[i] = float(clock_phase) % 1.0
        if eq_enabled is not None:
            self._eq_enabled[i] = bool(eq_enabled)
        if eq_rate is not None:
            self._eq_rate[i] = float(eq_rate)
        if eq_locked is not None:
            self._eq_locked[i] = bool(eq_locked)
        self._rebuild(np.asarray([i]), reset_state=reset_state)
        if not self._defer:
            self._upload()

    def begin_defer(self) -> None:
        """Suspend per-configure device uploads (bulk slot setup)."""
        self._defer = True

    def end_defer(self) -> None:
        self._defer = False
        self._upload()

    def _rebuild(self, idx: np.ndarray, reset_state: bool) -> None:
        k = self.cfg.mf_taps_max
        keq = self.cfg.eq_taps
        if reset_state and not isinstance(self.state, np.ndarray):
            # state is device-resident in steady state; pull it back to
            # mutable numpy for the (rare) per-slot reset
            # np.array (copy): np.asarray of a jax buffer is a
            # READ-ONLY view — per-column resets must mutate it
            self.state = np.array(self.state)
        for i in np.asarray(idx).ravel():
            a, b = loop_gains(float(self._loop_bw[i]))
            self._alpha[i] = a
            self._beta[i] = b
            taps = np.zeros(k, np.float32)
            if self._use_mf[i]:
                sps = float(self._sps[i])
                span = min(6, max(1, int((k - 1) // sps)))
                t = rrc_taps(sps, span=span,
                             rolloff=float(self._rolloff[i]))
                taps[:len(t)] = t
            else:
                taps[0] = 1.0
            self._mf[:, i] = taps
            if reset_state:
                s = np.zeros(self.STATE_ROWS, np.float32)
                s[0] = 1.0                       # lo_re
                # clock.phase shifts the first strobe inside the period
                s[6] = self._sps[i] * (0.5 + self._clock_phase[i])
                s[7] = self._sps[i]              # period
                s[14] = 1.0                      # want_mid
                s[15] = 1.0                      # power
                s[16 + 2 * (k - 1) + keq // 2] = 1.0   # EQ center tap
                self.state[:, i] = s

    def _upload(self) -> None:
        kind = self._kind
        order = self._order
        track = (kind == KIND_PSK) | ((kind == KIND_ASK) & self._pll)

        def row(v):
            a = np.asarray(v, np.float32)[None, :]
            if self.sharding is not None:
                return jax.device_put(a, self.sharding)
            return jnp.asarray(a)

        clock_gain = np.where(self._manual_clock, 0.0, self._clock_gain)
        self.consts = {
            "w_psk": row(kind == KIND_PSK),
            "w_fsk": row(kind == KIND_FSK),
            "w_ask": row(kind == KIND_ASK),
            "w1": row((kind == KIND_ASK) & self._pll),
            "w2": row((kind == KIND_PSK) & (order == 2)),
            "w4": row((kind == KIND_PSK) & (order == 4)),
            "w8": row((kind == KIND_PSK) & (order == 8)),
            # lanes without carrier tracking keep zero loop gains
            "alpha": row(np.where(track, self._alpha, 0.0)),
            "beta": row(np.where(track, self._beta, 0.0)),
            "gp": row(clock_gain),
            "gf": row(clock_gain ** 2 / 4.0),
            "pmin": row(self._sps * np.where(self._manual_clock,
                                             1.0, 0.9)),
            "pmax": row(self._sps * np.where(self._manual_clock,
                                             1.0, 1.1)),
            "fsk_cos": row(np.cos(self._fsk_phase)),
            "fsk_sin": row(np.sin(self._fsk_phase)),
            "w_quad": row(self._quad),
            "w_coh": row((kind == KIND_ASK) & self._pll),
            "w_run": row(self._running),
            "eq_en": row((kind == KIND_PSK) & self._eq_enabled),
            "eq_rate": row(np.where(self._eq_locked, 0.0,
                                    self._eq_rate)),
            "mf": (jax.device_put(self._mf, self.sharding)
                   if self.sharding is not None
                   else jnp.asarray(self._mf)),
        }

    def _build(self, cfg: RecoveryBankConfig | None = None,
               jit: bool = True):
        cfg = cfg or self.cfg
        m, ct, k = cfg.block_len, cfg.channel_tile, cfg.mf_taps_max
        mt = cfg.m_tile
        keq = cfg.eq_taps
        c_tiles = cfg.n_channels // ct
        m_tiles = m // mt

        def row(_):
            return pl.BlockSpec((1, ct), lambda ci, mi: (0, ci),
                                memory_space=pltpu.VMEM)

        plane = pl.BlockSpec((mt, ct), lambda ci, mi: (mi, ci),
                             memory_space=pltpu.VMEM)
        state_spec = pl.BlockSpec((self.STATE_ROWS, ct),
                                  lambda ci, mi: (0, ci),
                                  memory_space=pltpu.VMEM)
        grid_spec = pl.GridSpec(
            grid=(c_tiles, m_tiles),      # mi innermost, sequential
            in_specs=[
                plane, plane,
                state_spec,
                row(0), row(0), row(0),              # w_psk/fsk/ask
                row(0), row(0), row(0), row(0),      # w1/w2/w4/w8
                row(0), row(0),                      # alpha, beta
                row(0), row(0), row(0), row(0),      # gp, gf, pmin, pmax
                row(0), row(0), row(0),              # fsk_cos/sin, w_quad
                row(0), row(0),                      # w_coh, w_run
                row(0), row(0),                      # eq_en, eq_rate
                pl.BlockSpec((k, ct), lambda ci, mi: (0, ci),
                             memory_space=pltpu.VMEM),  # mf
            ],
            out_specs=[
                plane, plane, plane,
                state_spec,
            ],
            scratch_shapes=[
                pltpu.VMEM((mt + k - 1, ct), jnp.float32),   # raw ext
                pltpu.VMEM((mt + k - 1, ct), jnp.float32),
                pltpu.VMEM((mt, ct), jnp.float32),           # MF out
                pltpu.VMEM((mt, ct), jnp.float32),
                pltpu.VMEM((16 + 4 * keq, ct), jnp.float32),  # carries
            ],
        )
        c = cfg.n_channels
        call = pl.pallas_call(
            partial(_recovery_kernel, mt=mt, k=k, keq=keq,
                    m_tiles=m_tiles, dc_alpha=cfg.dc_alpha),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((m, c), jnp.float32),
                jax.ShapeDtypeStruct((m, c), jnp.float32),
                jax.ShapeDtypeStruct((m, c), jnp.float32),
                jax.ShapeDtypeStruct((self.STATE_ROWS, c), jnp.float32),
            ],
            interpret=self.interpret,
        )
        return jax.jit(call) if jit else call

    def feed_planes(self, y_re: np.ndarray, y_im: np.ndarray,
                    fetch: bool = True):
        """[M, C] float32 channel-baseband planes (RawBank layout,
        host OR device-resident) → (soft complex [M, C], strobe bool
        [M, C]).  Loop state stays on device between blocks.
        ``fetch=False`` returns the DEVICE (sym_re, sym_im, strobe)
        planes instead (the engine compacts active columns on device
        before the D2H drain)."""
        c = self.consts
        sr, si, strobe, self.state = self._call(
            y_re, y_im, self.state, c["w_psk"], c["w_fsk"], c["w_ask"],
            c["w1"], c["w2"], c["w4"], c["w8"], c["alpha"], c["beta"],
            c["gp"], c["gf"], c["pmin"], c["pmax"],
            c["fsk_cos"], c["fsk_sin"], c["w_quad"], c["w_coh"],
            c["w_run"], c["eq_en"], c["eq_rate"], c["mf"],
        )
        if not fetch:
            return sr, si, strobe
        return (np.asarray(sr) + 1j * np.asarray(si),
                np.asarray(strobe) > 0.5)

    def feed(self, y: np.ndarray):
        y = np.asarray(y, np.complex64)
        return self.feed_planes(np.ascontiguousarray(y.real),
                                np.ascontiguousarray(y.imag))

    @property
    def period_estimate(self) -> np.ndarray:
        return np.asarray(self.state)[7]
