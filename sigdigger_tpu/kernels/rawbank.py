"""Pallas TPU kernel: the raw channelizer bank.

Channel extraction with NO demodulation — the universal tap of the
TPU-path analyzer engine.  Every inspector slot gets a column here:
"raw" inspectors stream it directly (reference Default/Inspection/
InspToolWidget.cpp:558-628 capture path), "power" inspectors integrate
it (reference Default/RMSInspector), estimators and per-inspector
spectrum sources read it (reference Suscan/Analyzer.cpp:539-565), and
the PSK/FSK/ASK recovery bank consumes it as [M, C] baseband planes.

Same mix-baked matmul channelization as kernels/audio.py (and the
same per-channel column updates — open/retune/close never recompile),
2-D (channel, time) tiled so one dispatch handles arbitrarily long
blocks in a fixed VMEM budget.  Per-block mean channel power comes out
for free (the power-inspector / squelch source).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sigdigger_tpu.kernels.audio import _lowpass_columns

_TWO_PI = 2.0 * np.pi


@dataclass(frozen=True)
class RawBankConfig:
    sample_rate: float
    n_channels: int
    taps: int = 64
    decimation: int = 64
    block_out: int = 8192
    m_tile: int = 2048
    channel_tile: int = 128
    # dequantization scale for integer packed uploads (counts/unit):
    # 4096 for int16, typically 64 for int8 (frame_packed modes)
    in_scale: float = 4096.0

    def __post_init__(self):
        assert self.block_out % self.m_tile == 0
        assert self.n_channels % self.channel_tile == 0

    @property
    def block_in(self) -> int:
        return self.block_out * self.decimation

    @property
    def channel_rate(self) -> float:
        return self.sample_rate / self.decimation


def _raw_kernel(xw_re, xw_im, h_re, h_im, theta, m_ramp, phi0,
                y_re_ref, y_im_ref, pow_ref, scr_pow,
                *, m_tiles: int, mt: int, in_gain: float = 1.0):
    mi = pl.program_id(1)
    xr = xw_re[:]
    xi = xw_im[:]
    if xr.dtype != jnp.float32:
        # int16 packed upload: dequantize in VMEM
        xr = xr.astype(jnp.float32) * jnp.float32(in_gain)
        xi = xi.astype(jnp.float32) * jnp.float32(in_gain)
    yr = jnp.dot(xr, h_re[:], preferred_element_type=jnp.float32) \
        - jnp.dot(xi, h_im[:], preferred_element_type=jnp.float32)
    yi = jnp.dot(xr, h_im[:], preferred_element_type=jnp.float32) \
        + jnp.dot(xi, h_re[:], preferred_element_type=jnp.float32)
    ph = phi0[0:1, :] + m_ramp[:] * theta[:]
    cr = jnp.cos(ph)
    ci = -jnp.sin(ph)
    rr = yr * cr - yi * ci
    ri = yr * ci + yi * cr
    y_re_ref[:] = rr
    y_im_ref[:] = ri

    @pl.when(mi == 0)
    def _():
        scr_pow[0:1, :] = jnp.zeros_like(scr_pow[0:1, :])

    scr_pow[0:1, :] = scr_pow[0:1, :] + jnp.mean(
        rr * rr + ri * ri, axis=0, keepdims=True)

    @pl.when(mi == m_tiles - 1)
    def _():
        pow_ref[:] = scr_pow[0:1, :] * (1.0 / m_tiles)


class RawBank:
    """Streaming multi-channel raw extractor with per-channel columns."""

    def __init__(self, cfg: RawBankConfig,
                 interpret: bool | None = None) -> None:
        self.cfg = cfg
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu", "axon")
        self.interpret = interpret
        self.sharding = None          # set by parallel.banks.shard_*
        c = cfg.n_channels
        self._f0 = np.zeros(c, np.float64)
        self._bw = np.full(c, cfg.channel_rate / 2.0, np.float64)
        self._h = np.zeros((cfg.taps, c), np.complex128)
        self._theta64 = np.zeros(c, np.float64)
        self._m_ramp = jnp.asarray(
            np.arange(cfg.m_tile, dtype=np.float32)[:, None])
        self._defer = False
        self._rebuild_columns(np.arange(c))
        self._upload()
        self._history = np.zeros(cfg.taps - 1, np.complex64)
        self._phi = np.zeros(c, np.float64)
        self._power_host = np.zeros(c, np.float32)
        self._power_dev = None
        self._call = self._build()

    def configure_channel(self, i: int, *, f0: float | None = None,
                          bw: float | None = None,
                          reset_state: bool = False) -> None:
        """``bw`` is the channel half-bandwidth (prototype lowpass
        edge).  Host constant update only — never a recompile."""
        if f0 is not None:
            self._f0[i] = float(f0)
        if bw is not None:
            self._bw[i] = float(bw)
        self._rebuild_columns(np.asarray([i]))
        if not self._defer:
            self._upload()
        if reset_state:
            self._phi[i] = 0.0

    def begin_defer(self) -> None:
        """Suspend per-configure device uploads (bulk slot setup —
        1000+ opens would otherwise re-upload the full constant
        planes per slot)."""
        self._defer = True

    def end_defer(self) -> None:
        self._defer = False
        self._upload()

    def _rebuild_columns(self, idx: np.ndarray) -> None:
        cfg = self.cfg
        omega = _TWO_PI * self._f0[idx] / cfg.sample_rate
        proto = _lowpass_columns(cfg.taps,
                                 2.0 * self._bw[idx] / cfg.sample_rate)
        k = np.arange(cfg.taps)
        phase = -np.outer(k - (cfg.taps - 1), omega)
        self._h[:, idx] = proto[::-1, :] * np.exp(1j * phase)
        self._theta64[idx] = np.mod(omega * cfg.decimation, _TWO_PI)

    def _dev(self, a: np.ndarray):
        """Upload a per-channel constant plane honoring the bank's
        sharding (set by parallel.banks when the bank is sharded)."""
        if self.sharding is not None:
            return jax.device_put(a, self.sharding)
        return jnp.asarray(a)

    def _upload(self) -> None:
        self.consts = {
            "h_re": self._dev(self._h.real.astype(np.float32)),
            "h_im": self._dev(self._h.imag.astype(np.float32)),
            "theta": self._dev(
                self._theta64.astype(np.float32)[None, :]),
        }

    def _build(self, cfg: RawBankConfig | None = None, jit: bool = True,
               packed: bool = False):
        cfg = cfg or self.cfg
        ct, mt, k = cfg.channel_tile, cfg.m_tile, cfg.taps
        c_tiles = cfg.n_channels // ct
        m_tiles = cfg.block_out // mt
        # packed: re/im planes are two views of ONE [2M, K] buffer
        # (rows [0, M) then [M, 2M)) — single H2D transfer, optionally
        # int16 (the kernel dequantizes)
        im_spec = (pl.BlockSpec((mt, k),
                                lambda ci, mi, _mt=m_tiles: (_mt + mi, 0),
                                memory_space=pltpu.VMEM) if packed
                   else pl.BlockSpec((mt, k), lambda ci, mi: (mi, 0),
                                     memory_space=pltpu.VMEM))
        grid_spec = pl.GridSpec(
            grid=(c_tiles, m_tiles),
            in_specs=[
                pl.BlockSpec((mt, k), lambda ci, mi: (mi, 0),
                             memory_space=pltpu.VMEM),
                im_spec,
                pl.BlockSpec((k, ct), lambda ci, mi: (0, ci),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, ct), lambda ci, mi: (0, ci),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ct), lambda ci, mi: (0, ci),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mt, 1), lambda ci, mi: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, ct), lambda ci, mi: (mi, ci),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((mt, ct), lambda ci, mi: (mi, ci),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mt, ct), lambda ci, mi: (mi, ci),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ct), lambda ci, mi: (0, ci),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((1, ct), jnp.float32)],
        )
        c = cfg.n_channels
        call = pl.pallas_call(
            partial(_raw_kernel, m_tiles=m_tiles, mt=mt,
                    in_gain=1.0 / cfg.in_scale),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((cfg.block_out, c), jnp.float32),
                jax.ShapeDtypeStruct((cfg.block_out, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
            ],
            interpret=self.interpret,
        )
        return jax.jit(call) if jit else call

    def _phi_tiles(self) -> np.ndarray:
        cfg = self.cfg
        m_tiles = cfg.block_out // cfg.m_tile
        mi = np.arange(m_tiles, dtype=np.float64)[:, None]
        tiles = np.mod(self._phi[None, :] + mi * cfg.m_tile *
                       self._theta64[None, :], _TWO_PI).astype(np.float32)
        out = np.zeros((m_tiles * 8, cfg.n_channels), np.float32)
        out[::8] = tiles
        return out

    def frame(self, x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Host framing with carried history (shareable across banks
        of the same taps/decimation/block)."""
        from sigdigger_tpu.native import frame_windows

        cfg = self.cfg
        ext = np.concatenate([self._history, np.asarray(x, np.complex64)])
        xw_re, xw_im = frame_windows(ext, cfg.block_out, cfg.taps,
                                     cfg.decimation)
        self._history = ext[-(cfg.taps - 1):].copy()
        return xw_re, xw_im

    def frame_packed(self, x: np.ndarray, i16: bool = False,
                     i8: bool = False) -> np.ndarray:
        """Host framing into ONE packed [2M, K] buffer (optionally
        saturating int16/int8 at ``cfg.in_scale`` counts/unit) with
        carried history — shareable across same-shape banks AND
        PallasPSDFromXW."""
        from sigdigger_tpu.native import (
            frame_windows_packed,
            frame_windows_packed_i8,
            frame_windows_packed_i16,
        )

        cfg = self.cfg
        ext = np.concatenate([self._history,
                              np.asarray(x, np.complex64)])
        if i8:
            xw = frame_windows_packed_i8(ext, cfg.block_out, cfg.taps,
                                         cfg.decimation, cfg.in_scale)
        elif i16:
            xw = frame_windows_packed_i16(ext, cfg.block_out, cfg.taps,
                                          cfg.decimation, cfg.in_scale)
        else:
            xw = frame_windows_packed(ext, cfg.block_out, cfg.taps,
                                      cfg.decimation)
        self._history = ext[-(cfg.taps - 1):].copy()
        return xw

    def feed_packed(self, xw, fetch: bool = True):
        """Like :meth:`feed_frames` but on a packed [2M, K] buffer
        (upload once, alias twice)."""
        import jax as _jax

        if getattr(self, "_call_packed", None) is None:
            self._call_packed = self._build(packed=True)
        cfg = self.cfg
        xw = _jax.device_put(xw)
        y_re, y_im, power = self._call_packed(
            xw, xw, self.consts["h_re"], self.consts["h_im"],
            self.consts["theta"], self._m_ramp, self._phi_tiles(),
        )
        self._phi = np.mod(
            self._phi + self._theta64 * cfg.block_out, _TWO_PI)
        self._power_dev = power
        self._power_host = None
        if fetch:
            return np.asarray(y_re), np.asarray(y_im)
        return y_re, y_im

    def feed(self, x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """One block of ``cfg.block_in`` IQ samples → (y_re, y_im)
        float32 planes [block_out, n_channels]; also updates
        ``block_power``."""
        return self.feed_frames(*self.frame(x))

    def feed_frames(self, xw_re: np.ndarray, xw_im: np.ndarray,
                    fetch: bool = True):
        """``fetch=False`` leaves the [M, C] output planes on device
        (for chaining into RecoveryBank without a host round-trip —
        they are several MB; only ``block_power`` is drained)."""
        cfg = self.cfg
        y_re, y_im, power = self._call(
            xw_re, xw_im, self.consts["h_re"], self.consts["h_im"],
            self.consts["theta"], self._m_ramp, self._phi_tiles(),
        )
        self._phi = np.mod(
            self._phi + self._theta64 * cfg.block_out, _TWO_PI)
        # lazy: per-fetch tunnel RTT is ~ms — only consumers pay it
        self._power_dev = power
        self._power_host = None
        if fetch:
            return np.asarray(y_re), np.asarray(y_im)
        return y_re, y_im

    @property
    def block_power(self) -> np.ndarray:
        if self._power_host is None:
            self._power_host = np.asarray(self._power_dev)[0]
        return self._power_host

    def feed_device(self, xw_re, xw_im, phi0):
        return self._call(
            xw_re, xw_im, self.consts["h_re"], self.consts["h_im"],
            self.consts["theta"], self._m_ramp, phi0,
        )
