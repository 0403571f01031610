"""Fused Pallas TPU kernel: channelize → FM demod → audio decimation.

TPU-native re-design of the per-channel extraction + discriminator hot
path (the suscan specttuner + inspector loop, SURVEY.md §3.3).  Instead
of translating the FFT/overlap-save structure, the whole chain is cast
as MXU matmuls so one kernel invocation demodulates ALL channels of a
block:

  1. channelize: Y[m, c] = Σ_k  Xw[m, k] · H[k, c]
     where Xw are stride-D windows of the input and H[k, c] =
     h[K-1-k]·e^{jω_c(mD-…)} are the *mix-modulated* taps — baking the
     oscillator into the taps turns "LO multiply + FIR + decimate" into
     ONE complex matmul ([M,K]×[K,C] → 4 real MXU matmuls).
  2. residual rotation: Y · e^{-jω_c m D} from an on-VPU sin/cos of the
     outer product (m ramp)·(θ_c), phase-continuous across blocks.
  3. FM discriminator: atan2(Im, Re) of Y[m]·conj(Y[m-1]) with the
     previous block's last row carried in.
  4. audio decimation: A = Bᵀ[Ma, M] × f[M, C] — a banded decimating
     FIR as a (sparse-in-theory, dense-on-MXU) matmul.

Everything stays in VMEM between stages; HBM traffic per block is the
input windows + tiny outputs, so the kernel is MXU-bound by design.
Grid: one program per channel tile.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sigdigger_tpu.dsp.filters import fir_lowpass
from sigdigger_tpu.kernels.ops import atan2

_TWO_PI = 2.0 * np.pi


@dataclass(frozen=True)
class MatChannelizerConfig:
    sample_rate: float
    n_channels: int
    taps: int = 64              # channel FIR length K
    decimation: int = 16        # D: input samples per channel sample
    audio_taps: int = 64        # audio FIR length (in channel samples)
    audio_decim: int = 8        # channel samples per audio sample
    block_out: int = 2048       # M: channel samples per block
    channel_tile: int = 128     # C_t per grid program
    quad_gain: float = 1.0 / np.pi

    @property
    def block_in(self) -> int:
        """Input samples consumed per block."""
        return self.block_out * self.decimation

    @property
    def audio_out(self) -> int:
        return self.block_out // self.audio_decim

    @property
    def channel_rate(self) -> float:
        return self.sample_rate / self.decimation


def make_mat_constants(cfg: MatChannelizerConfig, f0s: np.ndarray,
                       bw: float) -> dict[str, np.ndarray]:
    """Host-side constants: modulated taps, rotation rates, audio bank."""
    c = cfg.n_channels
    f0s = np.broadcast_to(np.asarray(f0s, np.float64), (c,))
    omega = _TWO_PI * f0s / cfg.sample_rate          # rad/input-sample

    # prototype lowpass at the channel bandwidth
    proto = fir_lowpass(cfg.taps, min(1.0, bw / cfg.sample_rate * 2.0)
                        ).astype(np.float64)
    # window m covers input samples [mD - K + 1 … mD]; tap index k in
    # the matmul multiplies x[mD - K + 1 + k] → filter coefficient
    # h[K-1-k], modulated at its absolute sample offset:
    #   H[k, c] = h[K-1-k] · exp(-j ω_c (k - (K-1)))
    k = np.arange(cfg.taps)
    phase = -np.outer(k - (cfg.taps - 1), omega)     # [K, C]
    h = proto[::-1][:, None] * np.exp(1j * phase)
    # rotation per output sample: θ_c = ω_c · D  (mod 2π)
    theta = np.mod(omega * cfg.decimation, _TWO_PI)

    # banded audio decimation matrix Bᵀ [Ma, M]
    ataps = fir_lowpass(cfg.audio_taps,
                        min(1.0, 1.0 / cfg.audio_decim))
    bt = np.zeros((cfg.audio_out, cfg.block_out), np.float32)
    for i in range(cfg.audio_out):
        for t in range(cfg.audio_taps):
            m = i * cfg.audio_decim - t
            if 0 <= m < cfg.block_out:
                bt[i, m] = ataps[t]

    return {
        "h_re": h.real.astype(np.float32),
        "h_im": h.imag.astype(np.float32),
        "theta": theta.astype(np.float32)[None, :],      # [1, C]
        "m_ramp": np.arange(cfg.block_out,
                            dtype=np.float32)[:, None],  # [M, 1]
        "bt": bt,
    }


def make_windows(cfg: MatChannelizerConfig, x: np.ndarray,
                 history: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Stride-D windows [M, K] of (history | x); returns (windows,
    new_history[K-1])."""
    assert len(x) == cfg.block_in
    ext = np.concatenate([history, x])
    m = cfg.block_out
    windows = np.lib.stride_tricks.as_strided(
        ext, shape=(m, cfg.taps),
        strides=(ext.strides[0] * cfg.decimation, ext.strides[0]),
    )
    return np.ascontiguousarray(windows), ext[-(cfg.taps - 1):].copy()


def _kernel(xw_re, xw_im, h_re, h_im, theta, m_ramp, phi0, prev_re,
            prev_im, bt, audio_ref, last_re_ref, last_im_ref,
            *, quad_gain: float):
    # 1. channelize: complex matmul [M,K] x [K,C_t]
    yr = jnp.dot(xw_re[:], h_re[:], preferred_element_type=jnp.float32) \
        - jnp.dot(xw_im[:], h_im[:], preferred_element_type=jnp.float32)
    yi = jnp.dot(xw_re[:], h_im[:], preferred_element_type=jnp.float32) \
        + jnp.dot(xw_im[:], h_re[:], preferred_element_type=jnp.float32)

    # 2. residual rotation e^{-j(phi0 + m·θ)}
    ph = phi0[:] + m_ramp[:] * theta[:]
    cr = jnp.cos(ph)
    ci = -jnp.sin(ph)
    rr = yr * cr - yi * ci
    ri = yr * ci + yi * cr

    # 3. FM discriminator with carried previous row
    pr = jnp.concatenate([prev_re[:], rr[:-1, :]], axis=0)
    pi = jnp.concatenate([prev_im[:], ri[:-1, :]], axis=0)
    dr = rr * pr + ri * pi
    di = ri * pr - rr * pi
    f = atan2(di, dr) * quad_gain

    # 4. audio decimating FIR as matmul [Ma, M] x [M, C_t]
    audio_ref[:] = jnp.dot(bt[:], f, preferred_element_type=jnp.float32)
    last_re_ref[:] = rr[-1:, :]
    last_im_ref[:] = ri[-1:, :]


class MatChannelizer:
    """Streaming multi-channel FM receiver on the fused TPU kernel.

    Host keeps the tiny carried state (filter history, last demod row,
    rotation phases) and feeds fixed-size blocks; each ``feed`` is one
    pallas_call.  CPU fallback runs the same kernel in interpreter mode
    so tests validate the exact TPU program.
    """

    def __init__(self, cfg: MatChannelizerConfig, f0s: np.ndarray,
                 bw: float, interpret: bool | None = None) -> None:
        assert cfg.n_channels % cfg.channel_tile == 0
        self.cfg = cfg
        # device-resident constants: uploading them per call would cost
        # more than the kernel itself on a remote-tunnel backend
        self.consts = {k: jnp.asarray(v)
                       for k, v in make_mat_constants(cfg, f0s, bw).items()}
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu", "axon")
        self.interpret = interpret
        self._history = np.zeros(cfg.taps - 1, np.complex64)
        self._prev = np.zeros((1, cfg.n_channels), np.complex64)
        self._phi = np.zeros((1, cfg.n_channels), np.float64)
        self._theta64 = np.mod(
            _TWO_PI * np.broadcast_to(np.asarray(f0s, np.float64),
                                      (cfg.n_channels,))
            / cfg.sample_rate * cfg.decimation, _TWO_PI)
        self._call = self._build()

    def _build(self):
        cfg = self.cfg
        ct = cfg.channel_tile
        n_tiles = cfg.n_channels // ct
        m, k, ma = cfg.block_out, cfg.taps, cfg.audio_out

        grid_spec = pl.GridSpec(
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((m, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),      # xw_re
                pl.BlockSpec((m, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),      # xw_im
                pl.BlockSpec((k, ct), lambda i: (0, i),
                             memory_space=pltpu.VMEM),      # h_re
                pl.BlockSpec((k, ct), lambda i: (0, i),
                             memory_space=pltpu.VMEM),      # h_im
                pl.BlockSpec((1, ct), lambda i: (0, i),
                             memory_space=pltpu.VMEM),      # theta
                pl.BlockSpec((m, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),      # m_ramp
                pl.BlockSpec((1, ct), lambda i: (0, i),
                             memory_space=pltpu.VMEM),      # phi0
                pl.BlockSpec((1, ct), lambda i: (0, i),
                             memory_space=pltpu.VMEM),      # prev_re
                pl.BlockSpec((1, ct), lambda i: (0, i),
                             memory_space=pltpu.VMEM),      # prev_im
                pl.BlockSpec((ma, m), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),      # bt
            ],
            out_specs=[
                pl.BlockSpec((ma, ct), lambda i: (0, i),
                             memory_space=pltpu.VMEM),      # audio
                pl.BlockSpec((1, ct), lambda i: (0, i),
                             memory_space=pltpu.VMEM),      # last_re
                pl.BlockSpec((1, ct), lambda i: (0, i),
                             memory_space=pltpu.VMEM),      # last_im
            ],
        )
        c = cfg.n_channels
        call = pl.pallas_call(
            partial(_kernel, quad_gain=cfg.quad_gain),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((ma, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
            ],
            interpret=self.interpret,
        )
        return jax.jit(call)

    def feed(self, x: np.ndarray) -> np.ndarray:
        """One block of ``cfg.block_in`` input samples → audio
        [audio_out, n_channels] float32."""
        from sigdigger_tpu.native import frame_windows

        cfg = self.cfg
        ext = np.concatenate([self._history,
                              np.asarray(x, np.complex64)])
        xw_re, xw_im = frame_windows(ext, cfg.block_out, cfg.taps,
                                     cfg.decimation)
        self._history = ext[-(cfg.taps - 1):].copy()
        phi0 = np.mod(self._phi, _TWO_PI).astype(np.float32)
        audio, last_re, last_im = self._call(
            xw_re, xw_im,
            self.consts["h_re"], self.consts["h_im"],
            self.consts["theta"], self.consts["m_ramp"], phi0,
            np.ascontiguousarray(self._prev.real),
            np.ascontiguousarray(self._prev.imag),
            self.consts["bt"],
        )
        self._prev = np.asarray(last_re) + 1j * np.asarray(last_im)
        self._phi = self._phi + self._theta64[None, :] * cfg.block_out
        return np.asarray(audio)

    def feed_device(self, xw_re, xw_im, phi0, prev_re, prev_im):
        """Raw device-side call for benchmarking (no host conversions)."""
        return self._call(
            xw_re, xw_im, self.consts["h_re"], self.consts["h_im"],
            self.consts["theta"], self.consts["m_ramp"], phi0,
            prev_re, prev_im, self.consts["bt"],
        )
