"""Functional multi-channel receiver pipeline — the flagship hot path.

This is the fully-jittable core the analyzer's object API is built on
top of: ONE device program per IQ block that runs

    big FFT (overlap-save frames)
    → batched channel extraction (gather + small IFFT)
    → per-channel demod chains (vector scans over [C])
    → PSD fold

with every carried quantity (overlap tail, oscillator phases, loop
states) living in an explicit state pytree.  It is what `bench.py`
measures, what `__graft_entry__.entry()` exposes, and what the
`parallel` layer shards over a device mesh.

Equivalent reference behavior: the suscan source thread + specttuner +
per-inspector demod loops (SURVEY.md §3.2/§3.3 hot loops), re-expressed
as one XLA program.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from sigdigger_tpu.dsp.agc import _agc_scan, _tau_alpha
from sigdigger_tpu.dsp.channelizer import channel_filter_response
from sigdigger_tpu.dsp.clock import _gardner_scan
from sigdigger_tpu.dsp.filters import _conv_real, fir_lowpass, rrc_taps
from sigdigger_tpu.dsp.pll import _costas_scan, loop_gains
from sigdigger_tpu.dsp.window import window_energy, window_taps
from sigdigger_tpu.types import WindowFunction


@dataclass(frozen=True)
class PipelineConfig:
    """Static (compile-time) pipeline shape."""

    sample_rate: float
    fft_size: int                 # big FFT N (hop N/2)
    n_channels: int
    n_sub: int                    # channel sub-FFT size (one bucket)
    demod: str = "fm"             # "fm" | "am" | "psk" | "raw"
    window: WindowFunction = WindowFunction.BLACKMANN_HARRIS
    psd_alpha: float = 0.25
    audio_taps: int = 63
    audio_cutoff: float = 0.8     # fraction of channel Nyquist
    # psk chain
    psk_order: int = 4
    psk_loop_bw: float = 0.005
    sps: float = 4.0              # samples/symbol at channel rate
    rrc_rolloff: float = 0.35
    clock_gain: float = 0.05
    agc_tau: float = 200.0

    @property
    def hop(self) -> int:
        return self.fft_size // 2

    @property
    def decimation(self) -> int:
        return self.fft_size // self.n_sub

    @property
    def channel_rate(self) -> float:
        return self.sample_rate / self.decimation


def make_constants(cfg: PipelineConfig, f0s: np.ndarray,
                   bws: np.ndarray) -> dict[str, Any]:
    """Per-channel gather indices, filter responses and mixer rates."""
    n, ns = cfg.fft_size, cfg.n_sub
    c = cfg.n_channels
    f0s = np.broadcast_to(np.asarray(f0s, np.float64), (c,))
    bws = np.broadcast_to(np.asarray(bws, np.float64), (c,))
    bin_hz = cfg.sample_rate / n
    half = ns // 2
    j_signed = ((np.arange(ns) + half) % ns) - half
    k0 = (np.round(f0s / bin_hz).astype(np.int64)) % n
    idx = (k0[:, None] + j_signed[None, :]) % n
    resp = np.stack([
        channel_filter_response(ns, bw / 2.0 / bin_hz) for bw in bws
    ])
    k0_signed = ((k0 + n // 2) % n) - n // 2
    df = f0s - bin_hz * k0_signed
    dphi = 2.0 * np.pi * df * cfg.decimation / cfg.sample_rate
    consts = {
        "idx": jnp.asarray(idx, jnp.int32),
        "resp": jnp.asarray(resp, jnp.complex64),
        "k0": jnp.asarray(k0, jnp.int32),
        "dphi": jnp.asarray(dphi, jnp.float32),
        "taps": jnp.asarray(window_taps(cfg.window, n)),
        "psd_scale": jnp.float32(
            1.0 / (cfg.sample_rate * window_energy(cfg.window, n))
        ),
    }
    if cfg.demod in ("fm", "am"):
        consts["audio_taps"] = jnp.asarray(
            fir_lowpass(cfg.audio_taps, cfg.audio_cutoff)
        )
    if cfg.demod == "psk":
        consts["mf_taps"] = jnp.asarray(
            rrc_taps(cfg.sps, span=6, rolloff=cfg.rrc_rolloff)
        )
    return consts


def init_state(cfg: PipelineConfig) -> dict[str, Any]:
    c = cfg.n_channels
    state: dict[str, Any] = {
        "tail": jnp.zeros(cfg.hop, jnp.complex64),
        "phi": jnp.zeros(c, jnp.float32),       # residual mixer phase
        "frame_parity": jnp.int32(0),
        "psd": jnp.zeros(cfg.fft_size, jnp.float32),
        "psd_count": jnp.int32(0),
    }
    if cfg.demod in ("fm", "am"):
        state["quad_prev"] = jnp.zeros(c, jnp.complex64)
        state["lpf_tail"] = jnp.zeros((c, cfg.audio_taps - 1), jnp.complex64)
        state["dc"] = jnp.zeros(c, jnp.float32)
    if cfg.demod == "psk":
        state["agc"] = (jnp.zeros(c, jnp.float32), jnp.zeros(c, jnp.float32),
                        jnp.zeros(c, jnp.float32))
        state["costas"] = (jnp.zeros(c, jnp.float32),
                           jnp.zeros(c, jnp.float32))
        k = int(2 * np.floor(6 * cfg.sps / 2) + 1)
        state["mf_tail"] = jnp.zeros((c, k - 1), jnp.complex64)
        state["clock"] = (
            jnp.full(c, cfg.sps / 2.0, jnp.float32),
            jnp.full(c, cfg.sps, jnp.float32),
            jnp.zeros(c, jnp.complex64),
            jnp.zeros(c, jnp.complex64),
            jnp.zeros(c, jnp.complex64),
            jnp.ones(c, bool),
            jnp.ones(c, jnp.float32),
        )
    return state


def _stft(tail, x, taps, psd_scale, psd, psd_count, alpha, fft_size):
    """Shared big FFT + PSD EMA fold (rectangular frames feed the
    channelizer; windowed frames feed the PSD)."""
    hop = fft_size // 2
    ext = jnp.concatenate([tail, x])
    nf = x.shape[0] // hop
    first = ext[: nf * hop].reshape(nf, hop)
    second = ext[hop : hop + nf * hop].reshape(nf, hop)
    frames = jnp.concatenate([first, second], axis=1)
    spectra = jnp.fft.fft(frames, axis=1)

    # PSD from even frames (non-overlapping), with the closed-form EMA
    wframes = frames[::2] * taps[None, :]
    wspec = jnp.fft.fft(wframes, axis=1)
    power = (wspec.real**2 + wspec.imag**2) * psd_scale
    f = power.shape[0]
    i = jnp.arange(f, dtype=jnp.float32)
    w = alpha * (1.0 - alpha) ** (f - 1 - i)
    # on the first block the EMA is seeded with frame 0 instead of zero
    psd_new = (1.0 - alpha) ** f * jnp.where(psd_count > 0, psd, power[0]) \
        + w @ power
    return spectra, ext[-hop:], psd_new, psd_count + f


def _extract(spectra, consts, phi, parity, n_sub, fft_size):
    nf = spectra.shape[0]
    half = n_sub // 2
    nch = consts["idx"].shape[0]
    bins = jnp.take(spectra, consts["idx"].reshape(-1), axis=1)
    bins = bins.reshape(nf, nch, n_sub)
    z = jnp.fft.ifft(bins * consts["resp"][None, :, :], axis=-1)
    z = z * (n_sub / fft_size)
    keep = z[:, :, half:]
    m = parity + jnp.arange(nf, dtype=jnp.int32) - 1
    sign_bit = (consts["k0"][None, :] * m[:, None]) & 1
    factor = 1.0 - 2.0 * sign_bit.astype(jnp.float32)
    keep = keep * factor[:, :, None]
    y = jnp.transpose(keep, (1, 0, 2)).reshape(nch, nf * half)
    t = jnp.arange(nf * half, dtype=jnp.float32)
    ph = phi[:, None] + consts["dphi"][:, None] * t[None, :]
    y = y * jax.lax.complex(jnp.cos(ph), -jnp.sin(ph))
    phi_new = jnp.mod(phi + consts["dphi"] * (nf * half), 2.0 * np.pi)
    return y, phi_new, parity + nf


def _demod_fm(cfg, consts, state, y):
    prev = state["quad_prev"]
    shifted = jnp.concatenate([prev[:, None], y[:, :-1]], axis=1)
    f = jnp.angle(y * jnp.conj(shifted)) * jnp.float32(1.0 / np.pi)
    state["quad_prev"] = y[:, -1]
    ext = jnp.concatenate([state["lpf_tail"].real, f], axis=1)
    state["lpf_tail"] = jnp.asarray(
        ext[:, -(cfg.audio_taps - 1):], jnp.complex64)
    audio = _conv_real(ext, consts["audio_taps"])
    return state, {"audio": audio}


def _demod_am(cfg, consts, state, y):
    mag = jnp.abs(y)
    alpha = jnp.float32(0.9995)

    def dc_step(carry, m):
        carry = alpha * carry + (1 - alpha) * m
        return carry, m - carry

    state["dc"], a = jax.lax.scan(dc_step, state["dc"], jnp.transpose(mag))
    a = jnp.transpose(a)
    ext = jnp.concatenate([state["lpf_tail"].real, a], axis=1)
    state["lpf_tail"] = jnp.asarray(
        ext[:, -(cfg.audio_taps - 1):], jnp.complex64)
    audio = _conv_real(ext, consts["audio_taps"])
    return state, {"audio": audio}


def _demod_psk(cfg, consts, state, y):
    alphas = tuple(jnp.float32(_tau_alpha(t)) for t in (
        2 * cfg.agc_tau, 4 * cfg.agc_tau, 8 * cfg.agc_tau, 16 * cfg.agc_tau))
    state["agc"], y = _agc_scan(y, state["agc"], alphas,
                                jnp.float32(10 * cfg.agc_tau))
    alpha, beta = loop_gains(cfg.psk_loop_bw)
    (ph, fr), y = _costas_scan(y, state["costas"][0], state["costas"][1],
                               jnp.float32(alpha), jnp.float32(beta),
                               cfg.psk_order)
    state["costas"] = (ph, fr)
    k = consts["mf_taps"].shape[0]
    ext = jnp.concatenate([state["mf_tail"], y], axis=1)
    state["mf_tail"] = ext[:, -(k - 1):]
    y = jax.lax.complex(_conv_real(ext.real, consts["mf_taps"]),
                        _conv_real(ext.imag, consts["mf_taps"]))
    state["clock"], sym, strobe = _gardner_scan(
        y, state["clock"], jnp.float32(cfg.clock_gain),
        jnp.float32(cfg.clock_gain**2 / 4),
        jnp.float32(cfg.sps * 0.9), jnp.float32(cfg.sps * 1.1),
    )
    return state, {"symbols": sym, "strobes": strobe}


_DEMODS = {"fm": _demod_fm, "am": _demod_am, "psk": _demod_psk,
           "raw": lambda cfg, consts, state, y: (state, {"iq": y})}


def pipeline_step(cfg: PipelineConfig, consts: dict[str, Any],
                  state: dict[str, Any], x: jax.Array):
    """One block through the full receiver.  Pure function of
    (consts, state, x) — jit with cfg closed over / static."""
    spectra, tail, psd, psd_count = _stft(
        state["tail"], x, consts["taps"], consts["psd_scale"],
        state["psd"], state["psd_count"], jnp.float32(cfg.psd_alpha),
        cfg.fft_size,
    )
    state = dict(state)
    state["tail"] = tail
    state["psd"] = psd
    state["psd_count"] = psd_count
    y, phi, parity = _extract(spectra, consts, state["phi"],
                              state["frame_parity"], cfg.n_sub,
                              cfg.fft_size)
    state["phi"] = phi
    state["frame_parity"] = parity
    state, outputs = _DEMODS[cfg.demod](cfg, consts, state, y)
    outputs["psd"] = psd
    return state, outputs


def jit_pipeline(cfg: PipelineConfig):
    """jit-compiled pipeline_step with cfg closed over."""
    return jax.jit(partial(pipeline_step, cfg))
