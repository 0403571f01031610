"""Fused Pallas TPU kernel: the multi-mode audio demodulator bank.

TPU-native equivalent of the engine-side "audio" inspector chain for
EVERY demodulator the reference supports — AM / FM / USB / LSB / RAW
with squelch, AGC, per-channel audio cutoff and volume (reference
Default/Audio/AudioProcessor.cpp:251-269 config push of
audio.{cutoff,volume,sample-rate,demodulator,squelch,squelch-level} +
agc.{enabled,ts}; demod taxonomy include/SigDiggerHelpers.h:39-45).

One kernel serves a whole *bank* of channels, each with its own center
frequency, bandwidth, demodulator, cutoff and squelch settings.
Per-channel behavior is selected by device-resident one-hot weight rows
— NOT by recompilation — so opening, retuning or reconfiguring a
channel is a host-side constant update (a column rewrite of the
mix-baked taps).  This is the mechanism that lets the dynamic analyzer
engine run on the TPU kernel path: channel slots are pre-allocated,
inactive slots are masked (SURVEY.md §7 "dynamic channel open/close
without recompile").

Pipeline inside one grid program (channel tile × time tile), all VMEM:

  1. channelize:  Y = Xw · H  — mix-baked complex matmul (MXU) with a
     per-channel prototype lowpass AND per-channel mix frequency.  SSB
     channels mix at f0 ± cutoff/2, centering the wanted sideband at
     DC (the reference offsets the channel LO the same way,
     AudioProcessor.cpp:200-248).
  2. residual rotation e^{-j(φ0 + m·θ)} — θ is the carrier rate for
     AM/FM/RAW and the sideband-center rate for SSB.
  3. per-mode demod arms on the VPU, mixed by one-hot rows:
       FM  — discriminator atan2(Im, Re) of Y[m]·conj(Y[m-1])
       AM  — envelope |Y|            (× block AGC)
       RAW — Re{Y}                   (× block AGC)
       SSB — complex planes (Re, Im) (× block AGC), resolved in step 6
  4. block AGC — g = rsqrt(power EMA); FM is scale-invariant so the
     discriminator ignores it (reference agc.enabled).
  5. audio decimating FIR as a banded local matmul (one per plane;
     the second plane exists only when the bank is built with
     ``enable_ssb``, so FM-only banks pay nothing).
  6. per-channel audio-rate FIR — audio.cutoff as static shifted
     mul-adds with PER-CHANNEL tap rows [Ka2, C].  This is the sharp
     filter: at the decimated rate, 64 taps give a ~100 Hz transition,
     which is what makes true SSB sideband rejection possible (the
     input-rate prototype alone never could).  For SSB the wanted
     sideband (|f| < cutoff/2 around DC) is selected here, then
     shifted back up by a per-channel audio-rate LO and Re{·} taken —
     the Weaver product detector:  audio = f1·cos(Ωi) − f2·sin(Ωi)
     (non-SSB channels have Ω = 0, which degenerates to audio = f1).
  7. AM DC blocker — the one-pole DC follower is *closed-form*: an EMA
     is a causal exponential convolution, so at the audio rate it is
     one small lower-triangular Toeplitz matmul plus a rank-1 seed.
     Exact streaming, zero sequential loops.
  8. squelch + volume — power-EMA gate vs audio.squelch-level, then
     audio.volume (reference AudioProcessor.cpp squelch semantics).

State carried across time tiles in VMEM scratch and across blocks in
tiny [rows, C] planes: discriminator prev row, channel-rate FIR tails
(both planes), audio-rate FIR tails, squelch power EMA, AM DC level,
rotation + audio-LO phases (host float64).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sigdigger_tpu.kernels.ops import atan2

_TWO_PI = 2.0 * np.pi

# wire values of audio.demodulator (reference SigDiggerHelpers.h:39-45)
MODE_DISABLED = 0
MODE_AM = 1
MODE_FM = 2
MODE_USB = 3
MODE_LSB = 4
MODE_RAW = 5


@dataclass(frozen=True)
class AudioBankConfig:
    sample_rate: float
    n_channels: int
    taps: int = 64               # channel FIR length K
    decimation: int = 64         # D: input samples per channel sample
    audio_taps: int = 64         # decimating FIR length (channel samples)
    audio_decim: int = 8         # channel samples per audio sample
    audio_fir_taps: int = 64     # per-channel audio-rate FIR length Ka2
    block_out: int = 8192        # M channel samples per dispatch
    m_tile: int = 2048           # Mt per grid program
    channel_tile: int = 128
    quad_gain: float = 1.0 / np.pi
    dc_alpha: float = 0.9995     # AM DC follower pole (per channel sample)
    sq_alpha: float = 0.5        # squelch power EMA weight per tile
    enable_ssb: bool = True      # compile the second (imag) audio plane
    fir_tile: int = 0            # banded-FIR chunk rows (0 → auto ≤256)
    in_scale: float = 4096.0     # dequant scale for integer uploads
    # per-sample hang AGC (the su_agc follower — fast/slow rise/fall
    # EMAs + hang counter, reference Tasks/AGCTask.cpp:41-53) instead
    # of the block power-EMA rsqrt; costs one fori_loop pass per tile
    hang_agc: bool = False
    # inject the sq/dc/agc state seeds at THIS time tile instead of
    # tile 0 (time-sharded wrappers: tiles below seed_tile are halo
    # recompute — their EMA state restarts from zero and the real
    # region starts from the exact carried state).  Block power then
    # averages only tiles >= seed_tile.
    seed_tile: int = 0

    def __post_init__(self):
        assert self.block_out % self.m_tile == 0
        assert self.m_tile % self.audio_decim == 0
        assert self.audio_taps % self.audio_decim == 0
        assert self.n_channels % self.channel_tile == 0
        if self.fir_tile == 0:
            ft = min(self.m_tile, 256)
            ft -= ft % self.audio_decim
            while ft >= self.audio_decim and self.m_tile % ft:
                ft -= self.audio_decim
            object.__setattr__(self, "fir_tile",
                               ft if ft >= self.audio_decim
                               else self.m_tile)
        assert self.m_tile % self.fir_tile == 0
        assert self.fir_tile % self.audio_decim == 0

    @property
    def block_in(self) -> int:
        return self.block_out * self.decimation

    @property
    def audio_out(self) -> int:
        return self.block_out // self.audio_decim

    @property
    def channel_rate(self) -> float:
        return self.sample_rate / self.decimation

    @property
    def audio_rate(self) -> float:
        return self.channel_rate / self.audio_decim


def _lowpass_columns(taps: int, cutoff_norm: np.ndarray) -> np.ndarray:
    """Vectorized windowed-sinc lowpass columns [K, C]; per-channel
    ``cutoff_norm`` in Nyquist=1 units (same convention as
    dsp.filters.fir_lowpass), unity DC gain."""
    cn = np.clip(np.asarray(cutoff_norm, np.float64), 1e-6, 1.0)
    n = np.arange(taps, dtype=np.float64) - (taps - 1) / 2.0
    h = np.sinc(np.outer(n, cn)) * cn[None, :]
    h *= np.hamming(taps)[:, None]
    h /= h.sum(axis=0, keepdims=True)
    return h


def _band_matrix(fir_tile: int, audio_taps: int, audio_decim: int
                 ) -> np.ndarray:
    """Banded audio decimating FIR over one tail-extended FIR chunk:
    row i (audio sample) hits f_ext[i·Da - t + (Ka-1)] for tap t
    (identical band pattern to kernels/channelizer2.py; the pattern
    repeats every chunk, so one [Ft/Da, Ft+Ka-1] constant serves
    every chunk of every tile — chunking cuts the executed MXU flops
    of the mostly-zero band ~(Mt+Ka)/(Ft+Ka)x)."""
    from sigdigger_tpu.dsp.filters import fir_lowpass

    ka, da = audio_taps, audio_decim
    ataps = fir_lowpass(ka, min(1.0, 1.0 / da))
    bt = np.zeros((fir_tile // da, fir_tile + ka - 1), np.float32)
    for i in range(fir_tile // da):
        for t in range(ka):
            bt[i, i * da - t + ka - 1] = ataps[t]
    return bt


def _dc_matrices(cfg: AudioBankConfig) -> tuple[np.ndarray, np.ndarray]:
    """Closed-form one-pole DC follower at the audio rate:
    dc[i] = β^{i+1}·dc0 + Σ_{j≤i} (1-β)β^{i-j}·a[j]  with
    β = dc_alpha^audio_decim (the channel-rate pole resampled)."""
    mta = cfg.m_tile // cfg.audio_decim
    beta = float(cfg.dc_alpha) ** cfg.audio_decim
    i = np.arange(mta)
    diff = i[:, None] - i[None, :]
    tdc = np.where(diff >= 0, (1.0 - beta) * beta ** np.maximum(diff, 0),
                   0.0).astype(np.float32)
    dcpow = (beta ** (i + 1.0)).astype(np.float32)[:, None]
    return tdc, dcpow


def _audio_kernel(xw_re, xw_im, h_re, h_im, theta, m_ramp, ia_ramp, phi0,
                  phs0, omega_a, prev_re, prev_im, ftail1_in, ftail2_in,
                  atail1_in, atail2_in, sq_in, dc_in,
                  w_fm, w_am, w_re1, w_ssb, agc_w, vol, sq_w, sq_level,
                  sqa, taps2, bt, tdc, dcpow, agc_rows, agcs_in,
                  audio_ref, last_re_ref, last_im_ref, ftail1_out_ref,
                  ftail2_out_ref, atail1_out_ref, atail2_out_ref,
                  sq_out_ref, dc_out_ref, pow_out_ref, agcs_out_ref,
                  scr_prev, scr_f1, scr_f2, scr_a1, scr_a2, scr_st,
                  scr_gain,
                  *, mt: int, ka: int, ka2: int, mta: int, ft: int,
                  m_tiles: int, quad_gain: float, ssb: bool,
                  in_gain: float = 1.0, hang: bool = False,
                  seed_tile: int = 0):
    mi = pl.program_id(1)

    xr = xw_re[:]
    xi = xw_im[:]
    if xr.dtype != jnp.float32:
        # int16 packed upload: dequantize in VMEM
        xr = xr.astype(jnp.float32) * jnp.float32(in_gain)
        xi = xi.astype(jnp.float32) * jnp.float32(in_gain)
    # 1. channelize (complex matmul on the MXU)
    yr = jnp.dot(xr, h_re[:], preferred_element_type=jnp.float32) \
        - jnp.dot(xi, h_im[:], preferred_element_type=jnp.float32)
    yi = jnp.dot(xr, h_im[:], preferred_element_type=jnp.float32) \
        + jnp.dot(xi, h_re[:], preferred_element_type=jnp.float32)

    # 2. residual rotation (phi0 row 0 of this time tile's 8-row padded
    # block carries the f64-computed start phase)
    ph = phi0[0:1, :] + m_ramp[:] * theta[:]
    cr = jnp.cos(ph)
    ci = -jnp.sin(ph)
    rr = yr * cr - yi * ci
    ri = yr * ci + yi * cr

    # seed cross-tile scratch from the block-carry state at tile 0;
    # with seed_tile > 0 the sq/dc/agc seeds inject at the first REAL
    # tile instead (halo tiles restart their EMAs from zero)
    @pl.when(mi == 0)
    def _():
        scr_prev[0:1, :] = prev_re[:]
        scr_prev[1:2, :] = prev_im[:]
        scr_f1[0:ka - 1, :] = ftail1_in[:]
        scr_a1[0:ka2 - 1, :] = atail1_in[:]
        if ssb:
            scr_f2[0:ka - 1, :] = ftail2_in[:]
            scr_a2[0:ka2 - 1, :] = atail2_in[:]
        if seed_tile == 0:
            scr_st[0:1, :] = sq_in[:]
            scr_st[1:2, :] = dc_in[:]
        else:
            scr_st[0:1, :] = jnp.zeros_like(sq_in[:])
            scr_st[1:2, :] = jnp.zeros_like(sq_in[:])
        scr_st[2:3, :] = jnp.zeros_like(sq_in[:])
        if hang:
            if seed_tile == 0:
                scr_st[3:6, :] = agcs_in[0:3, :]
            else:
                scr_st[3:6, :] = jnp.zeros_like(agcs_in[0:3, :])

    if seed_tile > 0:
        @pl.when(mi == seed_tile)
        def _():
            scr_st[0:1, :] = sq_in[:]
            scr_st[1:2, :] = dc_in[:]
            if hang:
                scr_st[3:6, :] = agcs_in[0:3, :]

    # channel power EMA (squelch + block AGC source); per-channel
    # weight row honors agc.ts (reference AudioProcessor.cpp:265)
    p_tile = jnp.mean(rr * rr + ri * ri, axis=0, keepdims=True)
    sq_ema = (1.0 - sqa[:]) * scr_st[0:1, :] + sqa[:] * p_tile
    scr_st[0:1, :] = sq_ema
    if seed_tile > 0:
        # halo tiles don't count toward the block power average
        scr_st[2:3, :] = scr_st[2:3, :] + jnp.where(
            mi >= seed_tile, p_tile, jnp.zeros_like(p_tile))
    else:
        scr_st[2:3, :] = scr_st[2:3, :] + p_tile

    # 4. AGC gain (FM is scale-invariant; applied elsewhere).  With
    # ``hang`` compiled in, a per-sample su_agc follower — fast/slow
    # rise/fall EMAs + hang counter (reference Tasks/AGCTask.cpp:41-53
    # tau scaling; same recurrence as dsp/agc.py) — replaces the block
    # power-EMA rsqrt.  The per-row loop reads/overwrites scr_gain in
    # place (the RecoveryBank's dynamic-row-index pattern).
    if hang:
        mag_p = jnp.sqrt(rr * rr + ri * ri)
        scr_gain[:] = mag_p

        def agc_step(i, carry):
            fast, slow, hng = carry
            m = scr_gain[i, :]
            af = jnp.where(m > fast, agc_rows[0, :], agc_rows[1, :])
            fast = fast + af * (m - fast)
            rising = m > slow
            slow_up = slow + agc_rows[2, :] * (m - slow)
            slow_dn = jnp.where(hng >= agc_rows[4, :],
                                slow + agc_rows[3, :] * (m - slow),
                                slow)
            slow = jnp.where(rising, slow_up, slow_dn)
            hng = jnp.where(rising, 0.0, hng + 1.0)
            level = jnp.maximum(fast, slow)
            scr_gain[i, :] = jnp.minimum(
                1.0 / jnp.maximum(level, 1e-6), 1e4)
            return fast, slow, hng

        c0 = (scr_st[3, :], scr_st[4, :], scr_st[5, :])
        fast, slow, hng = jax.lax.fori_loop(0, mt, agc_step, c0)
        scr_st[3, :] = fast
        scr_st[4, :] = slow
        scr_st[5, :] = hng
        g = agc_w[:] * scr_gain[:] + (1.0 - agc_w[:])
    else:
        g = agc_w[:] * jax.lax.rsqrt(jnp.maximum(sq_ema, 1e-9)) \
            + (1.0 - agc_w[:])

    # 3. demod arms, one-hot mixed into the filter plane(s)
    pr = jnp.concatenate([scr_prev[0:1, :], rr[:-1, :]], axis=0)
    pi = jnp.concatenate([scr_prev[1:2, :], ri[:-1, :]], axis=0)
    dr = rr * pr + ri * pi
    di = ri * pr - rr * pi
    fm = atan2(di, dr) * quad_gain
    am = g * jnp.sqrt(rr * rr + ri * ri)
    f1 = w_fm[:] * fm + w_am[:] * am + (w_re1[:] + w_ssb[:]) * (g * rr)
    scr_f1[ka - 1:ka - 1 + mt, :] = f1
    if ssb:
        scr_f2[ka - 1:ka - 1 + mt, :] = w_ssb[:] * (g * ri)

    # 5. audio decimating FIR (banded local matmul per plane, run in
    # fir_tile chunks — the band is mostly zeros, chunking trims the
    # executed MXU flops at identical useful work)
    fta = ft // (mt // mta)   # = ft // audio_decim
    for fi in range(mt // ft):
        a1c = jnp.dot(bt[:], scr_f1[fi * ft:fi * ft + ft + ka - 1, :],
                      preferred_element_type=jnp.float32)
        scr_a1[ka2 - 1 + fi * fta:ka2 - 1 + (fi + 1) * fta, :] = a1c
        if ssb:
            a2c = jnp.dot(bt[:],
                          scr_f2[fi * ft:fi * ft + ft + ka - 1, :],
                          preferred_element_type=jnp.float32)
            scr_a2[ka2 - 1 + fi * fta:
                   ka2 - 1 + (fi + 1) * fta, :] = a2c

    # 6. per-channel audio-rate FIR (audio.cutoff / SSB selection):
    # static shifted mul-adds with per-channel tap rows
    g1 = taps2[0:1, :] * scr_a1[ka2 - 1:ka2 - 1 + mta, :]
    for t in range(1, ka2):
        g1 = g1 + taps2[t:t + 1, :] * scr_a1[ka2 - 1 - t:
                                             ka2 - 1 - t + mta, :]
    if ssb:
        g2 = taps2[0:1, :] * scr_a2[ka2 - 1:ka2 - 1 + mta, :]
        for t in range(1, ka2):
            g2 = g2 + taps2[t:t + 1, :] * scr_a2[ka2 - 1 - t:
                                                 ka2 - 1 - t + mta, :]
        # Weaver shift: audio = Re{(g1 + j g2)·e^{jΩi}}; Ω = 0 for
        # non-SSB channels so this degenerates to audio = g1
        pa = phs0[0:1, :] + ia_ramp[:] * omega_a[:]
        audio = g1 * jnp.cos(pa) - g2 * jnp.sin(pa)
    else:
        audio = g1

    # 7. AM DC blocker: closed-form EMA as Toeplitz matmul + rank-1 seed
    dcv = jnp.dot(tdc[:], audio, preferred_element_type=jnp.float32) \
        + dcpow[:] * scr_st[1:2, :]
    scr_st[1:2, :] = dcv[-1:, :]
    audio = audio - w_am[:] * dcv

    # 8. squelch gate + volume
    opened = jnp.where(sq_ema >= sq_level[:], 1.0, 0.0)
    gate = sq_w[:] * opened + (1.0 - sq_w[:])
    audio_ref[:] = audio * gate * vol[:]

    # cross-tile carries
    scr_prev[0:1, :] = rr[-1:, :]
    scr_prev[1:2, :] = ri[-1:, :]
    scr_f1[0:ka - 1, :] = scr_f1[mt:mt + ka - 1, :]
    scr_a1[0:ka2 - 1, :] = scr_a1[mta:mta + ka2 - 1, :]
    if ssb:
        scr_f2[0:ka - 1, :] = scr_f2[mt:mt + ka - 1, :]
        scr_a2[0:ka2 - 1, :] = scr_a2[mta:mta + ka2 - 1, :]

    @pl.when(mi == m_tiles - 1)
    def _():
        last_re_ref[:] = rr[-1:, :]
        last_im_ref[:] = ri[-1:, :]
        ftail1_out_ref[:] = scr_f1[0:ka - 1, :]
        atail1_out_ref[:] = scr_a1[0:ka2 - 1, :]
        if ssb:
            ftail2_out_ref[:] = scr_f2[0:ka - 1, :]
            atail2_out_ref[:] = scr_a2[0:ka2 - 1, :]
        else:
            ftail2_out_ref[:] = jnp.zeros_like(ftail2_out_ref)
            atail2_out_ref[:] = jnp.zeros_like(atail2_out_ref)
        sq_out_ref[:] = scr_st[0:1, :]
        dc_out_ref[:] = scr_st[1:2, :]
        pow_out_ref[:] = scr_st[2:3, :] * (1.0 / (m_tiles - seed_tile))
        agcs_out_ref[:] = jnp.zeros_like(agcs_out_ref)
        if hang:
            agcs_out_ref[0:3, :] = scr_st[3:6, :]


class AudioBank:
    """Streaming multi-channel, multi-mode audio receiver bank.

    Every channel slot has an independent (f0, bandwidth, demodulator,
    cutoff, volume, squelch, AGC) configuration applied through
    device-resident per-channel constant rows.  ``configure_channel``
    rewrites one column of the mix-baked taps and the parameter rows —
    the compiled kernel never changes.
    """

    def __init__(self, cfg: AudioBankConfig,
                 interpret: bool | None = None) -> None:
        self.cfg = cfg
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu", "axon")
        self.interpret = interpret
        self.sharding = None          # set by parallel.banks.shard_*
        c = cfg.n_channels

        # host mirrors of per-channel configuration
        self._f0 = np.zeros(c, np.float64)
        self._bw = np.full(c, cfg.channel_rate / 2.0, np.float64)
        self._mode = np.zeros(c, np.int32)
        self._cutoff = np.full(
            c, min(0.45 * cfg.audio_rate, 15e3), np.float64)
        self._volume = np.zeros(c, np.float64)
        self._squelch = np.zeros(c, bool)
        self._sq_level = np.zeros(c, np.float64)
        self._agc = np.zeros(c, bool)
        self._agc_ts = np.zeros(c, np.float64)   # ms; 0 = default EMA

        # static constants
        self._m_ramp = jnp.asarray(
            np.arange(cfg.m_tile, dtype=np.float32)[:, None])
        mta = cfg.m_tile // cfg.audio_decim
        self._ia_ramp = jnp.asarray(
            np.arange(mta, dtype=np.float32)[:, None])
        self._bt = jnp.asarray(_band_matrix(cfg.fir_tile,
                                            cfg.audio_taps,
                                            cfg.audio_decim))
        tdc, dcpow = _dc_matrices(cfg)
        self._tdc = jnp.asarray(tdc)
        self._dcpow = jnp.asarray(dcpow)

        # per-channel derived constants (host f64 mirrors + device copies)
        self._h = np.zeros((cfg.taps, c), np.complex128)
        self._theta64 = np.zeros(c, np.float64)
        self._omega_a64 = np.zeros(c, np.float64)   # audio LO rad/sample
        self._taps2 = np.zeros((cfg.audio_fir_taps, c), np.float32)
        self._defer = False
        self._rebuild_columns(np.arange(c))
        self._upload_params()

        # DSP state
        ka, ka2 = cfg.audio_taps, cfg.audio_fir_taps
        self._history = np.zeros(cfg.taps - 1, np.complex64)
        self._prev_re = np.zeros((1, c), np.float32)
        self._prev_im = np.zeros((1, c), np.float32)
        self._ftail1 = np.zeros((ka - 1, c), np.float32)
        self._ftail2 = np.zeros((ka - 1, c), np.float32)
        self._atail1 = np.zeros((ka2 - 1, c), np.float32)
        self._atail2 = np.zeros((ka2 - 1, c), np.float32)
        self._sq = np.zeros((1, c), np.float32)
        self._dc = np.zeros((1, c), np.float32)
        self._phi = np.zeros(c, np.float64)
        self._phs_a = np.zeros(c, np.float64)
        self._power_host = np.zeros(c, np.float32)
        self._power_dev = None
        # hang-AGC follower state (rows 0-2: fast, slow, hang counter)
        self._agcs = np.zeros((8, c), np.float32)

        self._call = self._build()

    # ------------------------------------------------------------------
    # per-channel configuration (host constant updates, no recompile)
    # ------------------------------------------------------------------
    def configure_channel(self, i: int, *, f0: float | None = None,
                          bw: float | None = None, mode: int | None = None,
                          cutoff: float | None = None,
                          volume: float | None = None,
                          squelch: bool | None = None,
                          squelch_level: float | None = None,
                          agc: bool | None = None,
                          agc_ts: float | None = None,
                          reset_state: bool = False) -> None:
        """Update one slot; ``bw`` is the channel half-bandwidth (the
        prototype lowpass edge), ``cutoff`` the audio cutoff (also the
        SSB sideband width)."""
        if f0 is not None:
            self._f0[i] = float(f0)
        if bw is not None:
            self._bw[i] = float(bw)
        if mode is not None:
            self._mode[i] = int(mode)
            if int(mode) in (MODE_USB, MODE_LSB) and not \
                    self.cfg.enable_ssb:
                raise ValueError(
                    "bank built with enable_ssb=False cannot host "
                    "USB/LSB slots")
        if cutoff is not None:
            self._cutoff[i] = float(cutoff)
        if volume is not None:
            self._volume[i] = float(volume)
        if squelch is not None:
            self._squelch[i] = bool(squelch)
        if squelch_level is not None:
            self._sq_level[i] = float(squelch_level)
        if agc is not None:
            self._agc[i] = bool(agc)
        if agc_ts is not None:
            # agc.ts in milliseconds (reference AudioProcessor.cpp:265;
            # CPU path inspectors/audio.py tau = ts·rate/1000) sets the
            # power-follower time constant; 0 restores the default
            self._agc_ts[i] = max(0.0, float(agc_ts))
        self._rebuild_columns(np.asarray([i]))
        if not self._defer:
            self._upload_params()
        if reset_state:
            self._state_to_host()
            self._prev_re[0, i] = 0.0
            self._prev_im[0, i] = 0.0
            self._ftail1[:, i] = 0.0
            self._ftail2[:, i] = 0.0
            self._atail1[:, i] = 0.0
            self._atail2[:, i] = 0.0
            self._sq[0, i] = 0.0
            self._dc[0, i] = 0.0
            self._agcs[:, i] = 0.0
            self._phi[i] = 0.0
            self._phs_a[i] = 0.0

    def begin_defer(self) -> None:
        """Suspend per-configure device uploads (bulk slot setup)."""
        self._defer = True

    def end_defer(self) -> None:
        self._defer = False
        self._upload_params()

    def _state_to_host(self) -> None:
        """Pull device-resident carries back to mutable numpy (slot
        resets are rare; the steady-state path never does this)."""
        for name in ("_prev_re", "_prev_im", "_ftail1", "_ftail2",
                     "_atail1", "_atail2", "_sq", "_dc", "_agcs"):
            v = getattr(self, name)
            if not isinstance(v, np.ndarray):
                # copy: np.asarray of a jax buffer is READ-ONLY
                setattr(self, name, np.array(v))

    def _rebuild_columns(self, idx: np.ndarray) -> None:
        """Recompute mix-baked tap columns, rotation rates and the
        per-channel audio-rate FIR for slots ``idx``."""
        cfg = self.cfg
        fs = cfg.sample_rate
        mode = self._mode[idx]
        ssb = np.where(mode == MODE_USB, 1.0,
                       np.where(mode == MODE_LSB, -1.0, 0.0))
        cutoff = self._cutoff[idx]
        f_mix = self._f0[idx] + ssb * cutoff / 2.0
        omega_mix = _TWO_PI * f_mix / fs

        proto = _lowpass_columns(cfg.taps, 2.0 * self._bw[idx] / fs)
        k = np.arange(cfg.taps)
        phase = -np.outer(k - (cfg.taps - 1), omega_mix)
        self._h[:, idx] = proto[::-1, :] * np.exp(1j * phase)

        # rotation: carrier rate for AM/FM/RAW, sideband-center for SSB
        # (the sideband is shifted back at the audio rate — step 6)
        self._theta64[idx] = np.mod(omega_mix * cfg.decimation, _TWO_PI)
        self._omega_a64[idx] = ssb * _TWO_PI * (cutoff / 2.0) \
            / cfg.audio_rate

        # audio-rate FIR: SSB selects the sideband (cutoff/2 edge);
        # other modes apply audio.cutoff; RAW bypasses (delta taps)
        edge = np.where(ssb != 0.0, cutoff / 2.0,
                        np.minimum(cutoff, 0.45 * cfg.audio_rate))
        t2 = _lowpass_columns(cfg.audio_fir_taps,
                              2.0 * edge / cfg.audio_rate)
        delta = np.zeros(cfg.audio_fir_taps)
        delta[0] = 1.0
        is_raw = (mode == MODE_RAW)[None, :]
        self._taps2[:, idx] = np.where(is_raw, delta[:, None],
                                       t2).astype(np.float32)

    def _dev(self, a: np.ndarray):
        """Upload a per-channel constant plane honoring the bank's
        sharding (set by parallel.banks when the bank is sharded)."""
        if self.sharding is not None:
            return jax.device_put(a, self.sharding)
        return jnp.asarray(a)

    def _upload_params(self) -> None:
        mode = self._mode
        self.consts = {
            "h_re": self._dev(self._h.real.astype(np.float32)),
            "h_im": self._dev(self._h.imag.astype(np.float32)),
            "theta": self._dev(
                self._theta64.astype(np.float32)[None, :]),
            "omega_a": self._dev(
                self._omega_a64.astype(np.float32)[None, :]),
            "taps2": self._dev(self._taps2),
            "w_fm": self._dev(
                (mode == MODE_FM).astype(np.float32)[None, :]),
            "w_am": self._dev(
                (mode == MODE_AM).astype(np.float32)[None, :]),
            "w_re1": self._dev(
                (mode == MODE_RAW).astype(np.float32)[None, :]),
            "w_ssb": self._dev(np.isin(
                mode, (MODE_USB, MODE_LSB)).astype(np.float32)[None, :]),
            "agc_w": self._dev(
                self._agc.astype(np.float32)[None, :]),
            "vol": self._dev(np.where(
                mode == MODE_DISABLED, 0.0, self._volume
            ).astype(np.float32)[None, :]),
            "sq_w": self._dev(
                self._squelch.astype(np.float32)[None, :]),
            "sq_level": self._dev(
                self._sq_level.astype(np.float32)[None, :]),
            "sqa": self._dev(self._sq_alpha_row()[None, :]),
            "agc_rows": self._dev(self._agc_hang_rows()),
        }

    def _sq_alpha_row(self) -> np.ndarray:
        """Per-channel power-EMA weight per m_tile: agc.ts (ms) maps to
        α = 1 − exp(−tile/τ) with τ = ts·channel_rate/1000 samples;
        slots with no ts set keep the default cfg.sq_alpha."""
        cfg = self.cfg
        tau = self._agc_ts * 1e-3 * cfg.channel_rate
        with np.errstate(divide="ignore", over="ignore"):
            alpha = 1.0 - np.exp(-cfg.m_tile / np.maximum(tau, 1e-9))
        return np.where(self._agc_ts > 0.0,
                        np.clip(alpha, 1e-4, 1.0),
                        cfg.sq_alpha).astype(np.float32)

    def _agc_hang_rows(self) -> np.ndarray:
        """Per-channel hang-AGC constants [8, C]: rows 0-3 the
        fast-rise/fast-fall/slow-rise/slow-fall EMA alphas at
        2/4/8/16×tau, row 4 the hang time 10×tau (reference
        Tasks/AGCTask.cpp:41-53; tau = agc.ts ms at the channel rate,
        matching dsp/agc.py AGCParams)."""
        cfg = self.cfg
        tau = np.maximum(self._agc_ts * 1e-3 * cfg.channel_rate, 1.0)
        out = np.zeros((8, cfg.n_channels), np.float32)
        for r, mult in enumerate((2.0, 4.0, 8.0, 16.0)):
            out[r] = 1.0 - np.exp(-1.0 / np.maximum(mult * tau, 1.0))
        out[4] = 10.0 * tau
        return out

    # ------------------------------------------------------------------
    def _build(self, cfg: AudioBankConfig | None = None,
               jit: bool = True, packed: bool = False):
        cfg = cfg or self.cfg
        ct, mt, ka, k = (cfg.channel_tile, cfg.m_tile, cfg.audio_taps,
                         cfg.taps)
        ka2 = cfg.audio_fir_taps
        c_tiles = cfg.n_channels // ct
        m_tiles = cfg.block_out // mt
        da = cfg.audio_decim
        mta = mt // da

        def row(i_expr):
            return pl.BlockSpec((1, ct), i_expr, memory_space=pltpu.VMEM)

        per_ch = lambda ci, mi: (0, ci)          # noqa: E731
        grid_spec = pl.GridSpec(
            grid=(c_tiles, m_tiles),             # mi innermost, sequential
            in_specs=[
                pl.BlockSpec((mt, k), lambda ci, mi: (mi, 0),
                             memory_space=pltpu.VMEM),      # xw_re
                # packed: the im plane is rows [M, 2M) of the SAME
                # buffer — one H2D transfer, optionally int16
                (pl.BlockSpec((mt, k),
                              lambda ci, mi, _mt=m_tiles: (_mt + mi, 0),
                              memory_space=pltpu.VMEM) if packed else
                 pl.BlockSpec((mt, k), lambda ci, mi: (mi, 0),
                              memory_space=pltpu.VMEM)),    # xw_im
                pl.BlockSpec((k, ct), lambda ci, mi: (0, ci),
                             memory_space=pltpu.VMEM),      # h_re
                pl.BlockSpec((k, ct), lambda ci, mi: (0, ci),
                             memory_space=pltpu.VMEM),      # h_im
                row(per_ch),                                # theta
                pl.BlockSpec((mt, 1), lambda ci, mi: (0, 0),
                             memory_space=pltpu.VMEM),      # m_ramp
                pl.BlockSpec((mta, 1), lambda ci, mi: (0, 0),
                             memory_space=pltpu.VMEM),      # ia_ramp
                pl.BlockSpec((8, ct), lambda ci, mi: (mi, ci),
                             memory_space=pltpu.VMEM),      # phi0
                pl.BlockSpec((8, ct), lambda ci, mi: (mi, ci),
                             memory_space=pltpu.VMEM),      # phs0
                row(per_ch),                                # omega_a
                row(per_ch), row(per_ch),                   # prev_re/im
                pl.BlockSpec((ka - 1, ct), lambda ci, mi: (0, ci),
                             memory_space=pltpu.VMEM),      # ftail1_in
                pl.BlockSpec((ka - 1, ct), lambda ci, mi: (0, ci),
                             memory_space=pltpu.VMEM),      # ftail2_in
                pl.BlockSpec((ka2 - 1, ct), lambda ci, mi: (0, ci),
                             memory_space=pltpu.VMEM),      # atail1_in
                pl.BlockSpec((ka2 - 1, ct), lambda ci, mi: (0, ci),
                             memory_space=pltpu.VMEM),      # atail2_in
                row(per_ch), row(per_ch),                   # sq_in, dc_in
                row(per_ch), row(per_ch),                   # w_fm, w_am
                row(per_ch), row(per_ch),                   # w_re1, w_ssb
                row(per_ch), row(per_ch),                   # agc_w, vol
                row(per_ch), row(per_ch),                   # sq_w, sq_level
                row(per_ch),                                # sqa
                pl.BlockSpec((ka2, ct), lambda ci, mi: (0, ci),
                             memory_space=pltpu.VMEM),      # taps2
                pl.BlockSpec((cfg.fir_tile // da,
                              cfg.fir_tile + ka - 1),
                             lambda ci, mi: (0, 0),
                             memory_space=pltpu.VMEM),      # bt
                pl.BlockSpec((mta, mta), lambda ci, mi: (0, 0),
                             memory_space=pltpu.VMEM),      # tdc
                pl.BlockSpec((mta, 1), lambda ci, mi: (0, 0),
                             memory_space=pltpu.VMEM),      # dcpow
                pl.BlockSpec((8, ct), lambda ci, mi: (0, ci),
                             memory_space=pltpu.VMEM),      # agc_rows
                pl.BlockSpec((8, ct), lambda ci, mi: (0, ci),
                             memory_space=pltpu.VMEM),      # agcs_in
            ],
            out_specs=[
                pl.BlockSpec((mta, ct), lambda ci, mi: (mi, ci),
                             memory_space=pltpu.VMEM),      # audio
                row(per_ch), row(per_ch),                   # last_re/im
                pl.BlockSpec((ka - 1, ct), lambda ci, mi: (0, ci),
                             memory_space=pltpu.VMEM),      # ftail1_out
                pl.BlockSpec((ka - 1, ct), lambda ci, mi: (0, ci),
                             memory_space=pltpu.VMEM),      # ftail2_out
                pl.BlockSpec((ka2 - 1, ct), lambda ci, mi: (0, ci),
                             memory_space=pltpu.VMEM),      # atail1_out
                pl.BlockSpec((ka2 - 1, ct), lambda ci, mi: (0, ci),
                             memory_space=pltpu.VMEM),      # atail2_out
                row(per_ch), row(per_ch), row(per_ch),      # sq/dc/pow out
                pl.BlockSpec((8, ct), lambda ci, mi: (0, ci),
                             memory_space=pltpu.VMEM),      # agcs out
            ],
            scratch_shapes=[
                pltpu.VMEM((2, ct), jnp.float32),            # prev rows
                pltpu.VMEM((mt + ka - 1, ct), jnp.float32),  # f plane 1
                pltpu.VMEM((mt + ka - 1 if cfg.enable_ssb else 8, ct),
                           jnp.float32),                     # f plane 2
                pltpu.VMEM((mta + ka2 - 1, ct), jnp.float32),  # a plane 1
                pltpu.VMEM((mta + ka2 - 1 if cfg.enable_ssb else 8, ct),
                           jnp.float32),                     # a plane 2
                pltpu.VMEM((8, ct), jnp.float32),            # sq/dc/pow/agc
                pltpu.VMEM((mt if cfg.hang_agc else 8, ct),
                           jnp.float32),                     # agc gains
            ],
        )
        c = cfg.n_channels
        call = pl.pallas_call(
            partial(_audio_kernel, mt=mt, ka=ka, ka2=ka2, mta=mta,
                    ft=cfg.fir_tile,
                    m_tiles=m_tiles, quad_gain=cfg.quad_gain,
                    ssb=cfg.enable_ssb,
                    in_gain=1.0 / cfg.in_scale,
                    hang=cfg.hang_agc,
                    seed_tile=cfg.seed_tile),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((cfg.audio_out, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
                jax.ShapeDtypeStruct((ka - 1, c), jnp.float32),
                jax.ShapeDtypeStruct((ka - 1, c), jnp.float32),
                jax.ShapeDtypeStruct((ka2 - 1, c), jnp.float32),
                jax.ShapeDtypeStruct((ka2 - 1, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
                jax.ShapeDtypeStruct((8, c), jnp.float32),
            ],
            interpret=self.interpret,
        )
        return jax.jit(call) if jit else call

    # ------------------------------------------------------------------
    def _phase_tiles(self, base: np.ndarray, rate: np.ndarray,
                     per_tile: int) -> np.ndarray:
        """Per-time-tile start phases [m_tiles·8, C] (f64 host tracking,
        8-row sublane padding as kernels/channelizer2.py)."""
        cfg = self.cfg
        m_tiles = cfg.block_out // cfg.m_tile
        mi = np.arange(m_tiles, dtype=np.float64)[:, None]
        tiles = np.mod(base[None, :] + mi * per_tile * rate[None, :],
                       _TWO_PI).astype(np.float32)
        out = np.zeros((m_tiles * 8, cfg.n_channels), np.float32)
        out[::8] = tiles
        return out

    def frame(self, x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Host framing with carried history → stride-D window planes
        (shareable with any bank of the same taps/decimation/block)."""
        from sigdigger_tpu.native import frame_windows

        cfg = self.cfg
        ext = np.concatenate([self._history, np.asarray(x, np.complex64)])
        xw_re, xw_im = frame_windows(ext, cfg.block_out, cfg.taps,
                                     cfg.decimation)
        self._history = ext[-(cfg.taps - 1):].copy()
        return xw_re, xw_im

    def feed(self, x: np.ndarray) -> np.ndarray:
        """One block of ``cfg.block_in`` IQ samples → audio
        [audio_out, n_channels] float32 (all modes demodulated)."""
        return self.feed_frames(*self.frame(x))

    def feed_packed(self, xw, fetch: bool = True) -> np.ndarray:
        """Like :meth:`feed_frames` on a packed [2M, K] (f32 or i16)
        buffer — upload once, alias twice."""
        import jax as _jax

        if getattr(self, "_call_packed", None) is None:
            self._call_packed = self._build(packed=True)
        xw = _jax.device_put(xw)
        return self._feed_call(self._call_packed, xw, xw, fetch)

    def feed_frames(self, xw_re: np.ndarray, xw_im: np.ndarray,
                    fetch: bool = True) -> np.ndarray:
        return self._feed_call(self._call, xw_re, xw_im, fetch)

    def _feed_call(self, call, xw_re, xw_im, fetch: bool) -> np.ndarray:
        cfg = self.cfg
        mta = cfg.m_tile // cfg.audio_decim
        out = call(
            xw_re, xw_im, self.consts["h_re"], self.consts["h_im"],
            self.consts["theta"], self._m_ramp, self._ia_ramp,
            self._phase_tiles(self._phi, self._theta64, cfg.m_tile),
            self._phase_tiles(self._phs_a, self._omega_a64, mta),
            self.consts["omega_a"], self._prev_re, self._prev_im,
            self._ftail1, self._ftail2, self._atail1, self._atail2,
            self._sq, self._dc, self.consts["w_fm"], self.consts["w_am"],
            self.consts["w_re1"], self.consts["w_ssb"],
            self.consts["agc_w"], self.consts["vol"],
            self.consts["sq_w"], self.consts["sq_level"],
            self.consts["sqa"],
            self.consts["taps2"], self._bt, self._tdc, self._dcpow,
            self.consts["agc_rows"], self._agcs,
        )
        (audio, last_re, last_im, ftail1, ftail2, atail1, atail2, sq,
         dc, power, agcs) = out
        # carried state stays DEVICE-resident (it is only ever fed back
        # into the next call); configure_channel pulls it to host when
        # a slot reset needs to mutate it
        self._prev_re = last_re
        self._prev_im = last_im
        self._ftail1 = ftail1
        self._ftail2 = ftail2
        self._atail1 = atail1
        self._atail2 = atail2
        self._sq = sq
        self._sq_host = None          # lazy: one fetch per block, cached
        self._dc = dc
        self._agcs = agcs
        self._power_dev = power       # lazy fetch (tunnel RTT per fetch)
        self._power_host = None
        self._phi = np.mod(
            self._phi + self._theta64 * cfg.block_out, _TWO_PI)
        self._phs_a = np.mod(
            self._phs_a + self._omega_a64 * cfg.audio_out, _TWO_PI)
        # fetch=False keeps the [Ma, C] plane on device (the engine
        # compacts active columns there before the D2H drain)
        return np.asarray(audio) if fetch else audio

    def feed_device(self, xw_re, xw_im, phi0, phs0, prev_re, prev_im,
                    ftail1, ftail2, atail1, atail2, sq, dc,
                    agcs=None):
        """Device-resident call (bench path, no host conversions)."""
        if agcs is None:
            agcs = self._agcs
        return self._call(
            xw_re, xw_im, self.consts["h_re"], self.consts["h_im"],
            self.consts["theta"], self._m_ramp, self._ia_ramp, phi0,
            phs0, self.consts["omega_a"], prev_re, prev_im,
            ftail1, ftail2, atail1, atail2, sq, dc,
            self.consts["w_fm"], self.consts["w_am"],
            self.consts["w_re1"], self.consts["w_ssb"],
            self.consts["agc_w"], self.consts["vol"],
            self.consts["sq_w"], self.consts["sq_level"],
            self.consts["sqa"],
            self.consts["taps2"], self._bt, self._tdc, self._dcpow,
            self.consts["agc_rows"], agcs,
        )

    def squelch_open(self) -> np.ndarray:
        """Per-channel squelch state after the last block (fetched
        once per block, cached — callers hit this per audio slot)."""
        if getattr(self, "_sq_host", None) is None:
            self._sq_host = np.asarray(self._sq)
        return (~self._squelch) | (self._sq_host[0] >= self._sq_level)

    @property
    def block_power(self) -> np.ndarray:
        if self._power_host is None:
            self._power_host = np.asarray(self._power_dev)[0]
        return self._power_host

    def flops_per_block(self) -> float:
        """Real FLOPs of one dispatch (matmul terms only; VPU demod
        elementwise work excluded) — the MFU numerator for bench.py."""
        cfg = self.cfg
        c = cfg.n_channels
        planes = 2 if cfg.enable_ssb else 1
        chan = 8.0 * cfg.block_out * cfg.taps * c      # 4 matmuls × 2
        fir = planes * 2.0 * cfg.audio_out \
            * (cfg.fir_tile + cfg.audio_taps - 1) * c
        mta = cfg.m_tile // cfg.audio_decim
        dcb = 2.0 * mta * mta * c * (cfg.block_out // cfg.m_tile)
        fir2 = planes * 2.0 * cfg.audio_out * cfg.audio_fir_taps * c
        return chan + fir + dcb + fir2
