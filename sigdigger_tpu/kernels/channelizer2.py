"""Fused channelizer v2: 2-D (channel, time) grid for large blocks.

Identical math to `kernels/channelizer.py` (mix-baked matmul channelize
→ rotate → discriminator → audio decimation) but tiled over TIME as
well as channels, so one dispatch can process arbitrarily long blocks
within a fixed VMEM budget — amortizing the per-dispatch cost that
dominates remote-attached TPUs:

- the audio decimating FIR becomes a *local banded matrix*
  [Mt/Da, Mt+Ka-1] applied per time tile over a tail-extended f buffer
  (the band pattern repeats every tile, so one small constant replaces
  the [Ma, M] global matrix that blew VMEM);
- discriminator prev-row and FIR tails carry across time tiles through
  VMEM scratch (TPU grid programs run sequentially, innermost axis
  fastest), seeded from the block-carry state at the first tile.
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
from sigdigger_tpu.kernels.channelizer import make_mat_constants
from sigdigger_tpu.kernels.ops import atan2

_TWO_PI = 2.0 * np.pi


@dataclass(frozen=True)
class MatChannelizer2Config:
    sample_rate: float
    n_channels: int
    taps: int = 64
    decimation: int = 64
    audio_taps: int = 64
    audio_decim: int = 8
    block_out: int = 8192        # M total per dispatch
    m_tile: int = 2048           # Mt per grid program
    channel_tile: int = 128
    # audio-FIR chunk (channel samples): the banded FIR matmul runs in
    # [Ft/Da, Ft+Ka-1] chunks instead of one [Mt/Da, Mt+Ka-1] pass —
    # the dense band is ~97% zeros at Mt=2048, so chunking cuts the
    # EXECUTED MXU flops ~(Mt+Ka)/(Ft+Ka)x at equal useful work
    # (r3 VERDICT item 5: close the mfu vs hw-util gap).  0 → auto.
    fir_tile: int = 0
    quad_gain: float = 1.0 / np.pi
    # transfer discipline (VERDICT r2: halve e2e bytes per block):
    in_i16: bool = False         # upload framed IQ as int16 (2x H2D)
    i16_scale: float = 4096.0    # counts per unit (8x headroom)
    # int8 uploads (4x H2D vs f32): the wire precision of 8-bit SDR
    # front ends (RTL-SDR class); quantization floor ~-36 dBFS at the
    # default scale.  Wins over in_i16 when both set.
    in_i8: bool = False
    i8_scale: float = 64.0       # counts per unit (2x headroom)
    audio_bf16: bool = False     # drain audio as bfloat16 (2x D2H)
    # fold the Bailey four-step PSD INTO this kernel's grid (channel
    # tile 0 computes it from the already-loaded window slabs): the
    # PSD then rides the channelizer's amortized dispatch instead of
    # paying its own ~0.5-0.9 ms per-dispatch floor (measured r5,
    # BENCHMARKS.md).  Requires taps == 64 and psd_fft == 4096
    # (A = B = 64) and m_tile % 512 == 0.
    fuse_psd: bool = False
    psd_fft: int = 4096
    # frames per fused-PSD chunk: the block-diagonal DFT_A executes
    # psd_fb x the per-frame flops (the price of batching frames into
    # one MXU-sized matmul).  fb=2 measured fastest on-chip AND is
    # what the per-program slab admits at the 1024-channel serving
    # geometry (BENCHMARKS.md).
    psd_fb: int = 2

    def __post_init__(self):
        assert self.block_out % self.m_tile == 0
        assert self.m_tile % self.audio_decim == 0
        assert self.audio_taps % self.audio_decim == 0
        if self.fir_tile == 0:
            # auto: ≤256 rows, multiple of audio_decim, divides m_tile
            ft = min(self.m_tile, 256)
            ft -= ft % self.audio_decim
            while ft >= self.audio_decim and self.m_tile % ft:
                ft -= self.audio_decim
            object.__setattr__(self, "fir_tile",
                               ft if ft >= self.audio_decim
                               else self.m_tile)
        assert self.m_tile % self.fir_tile == 0
        assert self.fir_tile % self.audio_decim == 0
        if self.fuse_psd:
            assert self.taps == 64 and self.psd_fft == 4096, \
                "fuse_psd needs the A=B=64 Bailey geometry"
            assert self.m_tile % (128 * self.psd_fb) == 0

    @property
    def block_in(self) -> int:
        return self.block_out * self.decimation

    @property
    def audio_out(self) -> int:
        return self.block_out // self.audio_decim

    @property
    def channel_rate(self) -> float:
        return self.sample_rate / self.decimation


def _local_band(cfg: MatChannelizer2Config) -> np.ndarray:
    """Banded audio FIR over one tail-extended FIR chunk: row i (audio)
    hits f_ext[i*Da - t + (Ka-1)] for tap t.  The band pattern repeats
    every chunk, so one [Ft/Da, Ft+Ka-1] constant serves every chunk
    of every time tile."""
    ka, da, ft = cfg.audio_taps, cfg.audio_decim, cfg.fir_tile
    ataps = fir_lowpass(ka, min(1.0, 1.0 / da))
    bt = np.zeros((ft // da, ft + ka - 1), np.float32)
    for i in range(ft // da):
        for t in range(ka):
            bt[i, i * da - t + ka - 1] = ataps[t]
    return bt


def _kernel2(xw_re, xw_im, h_re, h_im, theta, m_ramp, phi0, prev_re,
             prev_im, ftail_in, bt, *rest,
             mt: int, ka: int, ft: int, da: int, m_tiles: int,
             quad_gain: float, in_gain: float = 1.0,
             audio_bf16: bool = False, table_rot: bool = False,
             fuse_psd: bool = False, psd_scale: float = 1.0,
             psd_fb: int = 8):
    if fuse_psd:
        (w2d, bd_re, bd_im, tw_re, tw_im, db_re, db_im, fsum, fold,
         audio_ref, last_re_ref, last_im_ref, ftail_out_ref, psd_ref,
         scr_prev, scr_f) = rest
    else:
        (audio_ref, last_re_ref, last_im_ref, ftail_out_ref,
         scr_prev, scr_f) = rest
    mi = pl.program_id(1)

    xr = xw_re[:]
    xi = xw_im[:]
    if xr.dtype != jnp.float32:
        # int16 upload: dequantize in VMEM (in_gain = 1/i16_scale)
        xr = xr.astype(jnp.float32) * jnp.float32(in_gain)
        xi = xi.astype(jnp.float32) * jnp.float32(in_gain)
    yr = jnp.dot(xr, h_re[:], preferred_element_type=jnp.float32) \
        - jnp.dot(xi, h_im[:], preferred_element_type=jnp.float32)
    yi = jnp.dot(xr, h_im[:], preferred_element_type=jnp.float32) \
        + jnp.dot(xi, h_re[:], preferred_element_type=jnp.float32)

    if table_rot:
        # rotator from precomputed phase tables (measured r5,
        # scripts/tpu_kernel_probe.out: in-kernel cos/sin was 58% of
        # the whole kernel; the table product is ~20x cheaper).
        # e^{-j m θ_c} factors as Q[m // 64]·R[m % 64]: Q rows (one
        # per 64-sample span, f64-built on host, phi0 folded in) are
        # broadcast 64x, R rows tile mt/64x — no transcendentals.
        # Here (phi0, theta) carry the table planes: phi0 = Q
        # [qs, ct] for this tile, theta = R [64, ct] interleaved
        # re/im via lane-split constants q_re/q_im packed as
        # [2*qs, ct] and [128, ct].
        qs = mt // 64
        q_re, q_im = phi0[0:qs, :], phi0[qs:2 * qs, :]
        r_re, r_im = theta[0:64, :], theta[64:128, :]
        cr_q = jnp.concatenate(
            [jnp.broadcast_to(q_re[i:i + 1, :], (64, q_re.shape[1]))
             for i in range(qs)], axis=0)
        ci_q = jnp.concatenate(
            [jnp.broadcast_to(q_im[i:i + 1, :], (64, q_im.shape[1]))
             for i in range(qs)], axis=0)
        cr_r = jnp.concatenate([r_re] * qs, axis=0)
        ci_r = jnp.concatenate([r_im] * qs, axis=0)
        cr = cr_q * cr_r - ci_q * ci_r
        ci = cr_q * ci_r + ci_q * cr_r
    else:
        # phi0 block row 0 already includes the mi*Mt*theta offset
        # (host f64), keeping trig arguments small enough for f32
        # precision (rows are padded to 8 for the sublane tiling rule)
        ph = phi0[0:1, :] + m_ramp[:] * theta[:]
        cr = jnp.cos(ph)
        ci = -jnp.sin(ph)
    rr = yr * cr - yi * ci
    ri = yr * ci + yi * cr

    # discriminator prev row: block-carry state at the first time tile,
    # scratch afterwards
    @pl.when(mi == 0)
    def _():
        scr_prev[0:1, :] = prev_re[:]
        scr_prev[1:2, :] = prev_im[:]
        scr_f[0:ka - 1, :] = ftail_in[:]

    pr = jnp.concatenate([scr_prev[0:1, :], rr[:-1, :]], axis=0)
    pi = jnp.concatenate([scr_prev[1:2, :], ri[:-1, :]], axis=0)
    dr = rr * pr + ri * pi
    di = ri * pr - rr * pi
    f = atan2(di, dr) * quad_gain

    scr_f[ka - 1:ka - 1 + mt, :] = f
    # banded FIR in chunks: each [Ft/Da, Ft+Ka-1] matmul covers Ft
    # channel samples — same useful work as one [Mt/Da, Mt+Ka-1] pass
    # with ~(Mt+Ka)/(Ft+Ka)x fewer executed (mostly-zero) MXU flops
    fta = ft // da
    for fi in range(mt // ft):
        chunk = jnp.dot(bt[:], scr_f[fi * ft:fi * ft + ft + ka - 1, :],
                        preferred_element_type=jnp.float32)
        audio_ref[fi * fta:(fi + 1) * fta, :] = (
            chunk.astype(jnp.bfloat16) if audio_bf16 else chunk)

    # carry for the next time tile / the next block
    scr_prev[0:1, :] = rr[-1:, :]
    scr_prev[1:2, :] = ri[-1:, :]
    scr_f[0:ka - 1, :] = scr_f[mt:mt + ka - 1, :]

    @pl.when(mi == m_tiles - 1)
    def _():
        last_re_ref[:] = rr[-1:, :]
        last_im_ref[:] = ri[-1:, :]
        ftail_out_ref[:] = scr_f[0:ka - 1, :]

    if fuse_psd:
        # Bailey four-step PSD folded into THIS grid, computed on
        # channel tile 0 from the already-loaded window slab (rows ARE
        # consecutive samples — taps == decimation).  Two frame chunks
        # ride SIDE BY SIDE in the 128 lanes (B=64 alone left half the
        # datapath idle — measured r5); db/tw are pre-doubled
        # block-diagonally, `fold` sums the halves.  (Distributing the
        # PSD across channel tiles via per-program slab remaps was
        # ALSO measured — 10% slower than this form.)
        ci = pl.program_id(0)

        @pl.when((ci == 0) & (mi == 0))
        def _():
            psd_ref[:] = jnp.zeros_like(psd_ref)

        @pl.when(ci == 0)
        def _():
            acc = None
            rows = psd_fb * 64
            for c0 in range(mt // (2 * rows)):
                s0 = slice((2 * c0) * rows, (2 * c0 + 1) * rows)
                s1 = slice((2 * c0 + 1) * rows, (2 * c0 + 2) * rows)
                cr = jnp.concatenate(
                    [xr[s0, :] * w2d[:], xr[s1, :] * w2d[:]], axis=1)
                cx = jnp.concatenate(
                    [xi[s0, :] * w2d[:], xi[s1, :] * w2d[:]], axis=1)
                s1r = jnp.dot(bd_re[:], cr,
                              preferred_element_type=jnp.float32) \
                    - jnp.dot(bd_im[:], cx,
                              preferred_element_type=jnp.float32)
                s1i = jnp.dot(bd_re[:], cx,
                              preferred_element_type=jnp.float32) \
                    + jnp.dot(bd_im[:], cr,
                              preferred_element_type=jnp.float32)
                s2r = s1r * tw_re[:] - s1i * tw_im[:]
                s2i = s1r * tw_im[:] + s1i * tw_re[:]
                s3r = jnp.dot(s2r, db_re[:],
                              preferred_element_type=jnp.float32) \
                    - jnp.dot(s2i, db_im[:],
                              preferred_element_type=jnp.float32)
                s3i = jnp.dot(s2r, db_im[:],
                              preferred_element_type=jnp.float32) \
                    + jnp.dot(s2i, db_re[:],
                              preferred_element_type=jnp.float32)
                p = s3r * s3r + s3i * s3i
                a_ = jnp.dot(fsum[:], p,
                             preferred_element_type=jnp.float32)
                acc = a_ if acc is None else acc + a_
            acc = jnp.dot(acc, fold[:],
                          preferred_element_type=jnp.float32)
            psd_ref[:] += acc * jnp.float32(psd_scale)


class MatChannelizer2:
    """Large-block streaming FM receiver on the 2-D-tiled fused kernel.

    Transfer discipline (remote/tunnel-attached TPUs pay ~10-25 ms RTT
    per transfer): the framed input is ONE packed [2M, K] buffer (the
    kernel reads re/im planes from it via two BlockSpecs), and the
    inter-block carries (discriminator prev row, audio FIR tail) stay
    device-resident — they never round-trip to the host.

    ``snap_grid=True`` quantizes channel centers to the block-rate grid
    fs/(decimation·block_out) (±half a grid step ≈ hundreds of mHz —
    standard channelizer practice), which makes the rotator phase
    pattern periodic in the block so ``phi0`` becomes a device-resident
    CONSTANT: zero per-block phase upload and no host f64 bookkeeping.
    """

    def __init__(self, cfg: MatChannelizer2Config, f0s: np.ndarray,
                 bw: float, interpret: bool | None = None,
                 snap_grid: bool = False) -> None:
        assert cfg.n_channels % cfg.channel_tile == 0
        self.cfg = cfg
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu", "axon")
        self.interpret = interpret
        f0s = np.asarray(f0s, np.float64)
        if snap_grid:
            grid = cfg.sample_rate / cfg.block_in
            f0s = np.round(f0s / grid) * grid
        self.f0s = f0s
        self.snap_grid = snap_grid
        base_cfg_consts = make_mat_constants(
            _as_v1_cfg(cfg), f0s, bw)
        self.consts = {
            "h_re": jnp.asarray(base_cfg_consts["h_re"]),
            "h_im": jnp.asarray(base_cfg_consts["h_im"]),
            "theta": jnp.asarray(base_cfg_consts["theta"]),
            "m_ramp": jnp.asarray(
                np.arange(cfg.m_tile, dtype=np.float32)[:, None]),
            "bt": jnp.asarray(_local_band(cfg)),
        }
        c = cfg.n_channels
        self._history = np.zeros(cfg.taps - 1, np.complex64)
        self._prev_re = jnp.zeros((1, c), jnp.float32)
        self._prev_im = jnp.zeros((1, c), jnp.float32)
        self._ftail = jnp.zeros((cfg.audio_taps - 1, c), jnp.float32)
        self._phi = np.zeros((1, c), np.float64)
        self._theta64 = np.mod(
            _TWO_PI * np.broadcast_to(f0s, (c,))
            / cfg.sample_rate * cfg.decimation, _TWO_PI)
        # table-based rotator (r5, scripts/tpu_kernel_probe.out:
        # in-kernel cos/sin measured 58% of the kernel; the Q·R table
        # product removes it).  Needs the snapped grid — tables are
        # then block-invariant device constants.
        self._table_rot = bool(snap_grid) and cfg.m_tile % 64 == 0
        self._psd_scale = 1.0
        if cfg.fuse_psd:
            self._psd_dev_consts = self._psd_constants()
        self._call = self._build()
        if self._table_rot:
            q_tab, r_tab = self._rot_tables()
            # the phi0/theta argument slots carry the Q/R planes
            self.consts["theta"] = jnp.asarray(r_tab)
            self._phi0_dev = jnp.asarray(q_tab)
        else:
            # with a snapped grid the per-block phase advance is ≡ 0
            # mod 2π, so the phase-tile pattern is one device constant
            self._phi0_dev = (jnp.asarray(self._phi_tiles())
                              if snap_grid else None)

    def _psd_constants(self):
        """Constants of the fused four-step PSD (A=B=64, fb=8 — the
        PallasPSDFromXW math riding this kernel's grid)."""
        from sigdigger_tpu.dsp.window import window_taps
        from sigdigger_tpu.kernels.fft import _dft_matrix
        from sigdigger_tpu.types import WindowFunction

        cfg = self.cfg
        a = b = 64
        fb = cfg.psd_fb
        taps = np.asarray(window_taps(
            WindowFunction.BLACKMANN_HARRIS, cfg.psd_fft), np.float64)
        da_re, da_im = _dft_matrix(a)
        bd_re = np.zeros((fb * a, fb * a), np.float32)
        bd_im = np.zeros((fb * a, fb * a), np.float32)
        for fi in range(fb):
            bd_re[fi * a:(fi + 1) * a, fi * a:(fi + 1) * a] = da_re
            bd_im[fi * a:(fi + 1) * a, fi * a:(fi + 1) * a] = da_im
        db_re, db_im = _dft_matrix(b)
        k1 = np.arange(a)[:, None]
        bb = np.arange(b)[None, :]
        ang = -2.0 * np.pi * k1 * bb / cfg.psd_fft
        # two chunks side by side in the lanes: twiddles tile 2x on
        # lanes, DFT_B doubles block-diagonally, `fold` sums halves
        tw1_re = np.tile(np.cos(ang).astype(np.float32), (fb, 1))
        tw1_im = np.tile(np.sin(ang).astype(np.float32), (fb, 1))
        tw_re = np.tile(tw1_re, (1, 2))
        tw_im = np.tile(tw1_im, (1, 2))
        db2_re = np.zeros((2 * b, 2 * b), np.float32)
        db2_im = np.zeros((2 * b, 2 * b), np.float32)
        for half in range(2):
            db2_re[half * b:(half + 1) * b,
                   half * b:(half + 1) * b] = db_re
            db2_im[half * b:(half + 1) * b,
                   half * b:(half + 1) * b] = db_im
        fsum = np.zeros((a, fb * a), np.float32)
        for fi in range(fb):
            fsum[np.arange(a), fi * a + np.arange(a)] = 1.0
        fold = np.concatenate([np.eye(b, dtype=np.float32)] * 2)
        w2d = np.tile(taps.astype(np.float32).reshape(a, b), (fb, 1))
        frames = cfg.block_in // cfg.psd_fft
        self._psd_scale = 1.0 / (cfg.sample_rate
                                 * float(np.sum(taps ** 2)) * frames)
        return tuple(jnp.asarray(v) for v in (
            w2d, bd_re, bd_im, tw_re, tw_im, db2_re, db2_im, fsum,
            fold))

    def _rot_tables(self) -> tuple[np.ndarray, np.ndarray]:
        """Rotator factor tables, f64-built: Q rows e^{-j(φ0+64gθ)}
        per 64-sample span of each tile (cos rows then -sin rows,
        [m_tiles·2qs, C]) and R rows e^{-j rθ}, r<64 ([128, C])."""
        cfg = self.cfg
        th = self._theta64.astype(np.float64)
        phi = self._phi[0]
        qs = cfg.m_tile // 64
        m_tiles = cfg.block_out // cfg.m_tile
        g = np.arange(qs, dtype=np.float64)
        q = np.zeros((m_tiles * 2 * qs, cfg.n_channels), np.float32)
        for mi in range(m_tiles):
            ang = np.mod(
                phi[None, :] + (mi * cfg.m_tile + g[:, None] * 64.0)
                * th[None, :], _TWO_PI)
            q[mi * 2 * qs:mi * 2 * qs + qs] = np.cos(ang)
            q[mi * 2 * qs + qs:(mi + 1) * 2 * qs] = -np.sin(ang)
        r_ang = np.mod(
            np.arange(64.0)[:, None] * th[None, :], _TWO_PI)
        r = np.concatenate([np.cos(r_ang), -np.sin(r_ang)]
                           ).astype(np.float32)
        return q, r

    def _build(self):
        cfg = self.cfg
        ct, mt, ka = cfg.channel_tile, cfg.m_tile, cfg.audio_taps
        k = cfg.taps
        c_tiles = cfg.n_channels // ct
        m_tiles = cfg.block_out // mt
        da = cfg.audio_decim

        grid_spec = pl.GridSpec(
            grid=(c_tiles, m_tiles),      # mi innermost (sequential)
            in_specs=[
                # re/im planes are two views of ONE packed [2M, K]
                # buffer (single H2D transfer): rows [0, M) then [M, 2M)
                pl.BlockSpec((mt, k), lambda ci, mi: (mi, 0),
                             memory_space=pltpu.VMEM),      # xw packed re
                pl.BlockSpec((mt, k),
                             lambda ci, mi, _mtiles=m_tiles:
                             (_mtiles + mi, 0),
                             memory_space=pltpu.VMEM),      # xw packed im
                pl.BlockSpec((k, ct), lambda ci, mi: (0, ci),
                             memory_space=pltpu.VMEM),      # h_re
                pl.BlockSpec((k, ct), lambda ci, mi: (0, ci),
                             memory_space=pltpu.VMEM),      # h_im
                # table mode: the theta slot carries the R table
                # [128, C], the phi0 slot the per-tile Q rows
                (pl.BlockSpec((128, ct), lambda ci, mi: (0, ci),
                              memory_space=pltpu.VMEM)
                 if self._table_rot else
                 pl.BlockSpec((1, ct), lambda ci, mi: (0, ci),
                              memory_space=pltpu.VMEM)),    # theta / R
                pl.BlockSpec((mt, 1), lambda ci, mi: (0, 0),
                             memory_space=pltpu.VMEM),      # m_ramp
                (pl.BlockSpec((2 * (mt // 64), ct),
                              lambda ci, mi: (mi, ci),
                              memory_space=pltpu.VMEM)
                 if self._table_rot else
                 pl.BlockSpec((8, ct), lambda ci, mi: (mi, ci),
                              memory_space=pltpu.VMEM)),    # phi0 / Q
                pl.BlockSpec((1, ct), lambda ci, mi: (0, ci),
                             memory_space=pltpu.VMEM),      # prev_re
                pl.BlockSpec((1, ct), lambda ci, mi: (0, ci),
                             memory_space=pltpu.VMEM),      # prev_im
                pl.BlockSpec((ka - 1, ct), lambda ci, mi: (0, ci),
                             memory_space=pltpu.VMEM),      # ftail_in
                pl.BlockSpec((cfg.fir_tile // da,
                              cfg.fir_tile + ka - 1),
                             lambda ci, mi: (0, 0),
                             memory_space=pltpu.VMEM),      # bt
            ]
            + ([                                 # fused-PSD constants
                pl.BlockSpec((cfg.psd_fb * 64, 64),
                             lambda ci, mi: (0, 0),
                             memory_space=pltpu.VMEM),      # w2d
                pl.BlockSpec((cfg.psd_fb * 64, cfg.psd_fb * 64),
                             lambda ci, mi: (0, 0),
                             memory_space=pltpu.VMEM),      # bd_re
                pl.BlockSpec((cfg.psd_fb * 64, cfg.psd_fb * 64),
                             lambda ci, mi: (0, 0),
                             memory_space=pltpu.VMEM),      # bd_im
                pl.BlockSpec((cfg.psd_fb * 64, 128),
                             lambda ci, mi: (0, 0),
                             memory_space=pltpu.VMEM),      # tw_re x2
                pl.BlockSpec((cfg.psd_fb * 64, 128),
                             lambda ci, mi: (0, 0),
                             memory_space=pltpu.VMEM),      # tw_im x2
                pl.BlockSpec((128, 128), lambda ci, mi: (0, 0),
                             memory_space=pltpu.VMEM),      # db2_re
                pl.BlockSpec((128, 128), lambda ci, mi: (0, 0),
                             memory_space=pltpu.VMEM),      # db2_im
                pl.BlockSpec((64, cfg.psd_fb * 64),
                             lambda ci, mi: (0, 0),
                             memory_space=pltpu.VMEM),      # fsum
                pl.BlockSpec((128, 64), lambda ci, mi: (0, 0),
                             memory_space=pltpu.VMEM),      # fold
            ] if cfg.fuse_psd else []),
            out_specs=[
                pl.BlockSpec((mt // da, ct), lambda ci, mi: (mi, ci),
                             memory_space=pltpu.VMEM),      # audio
                pl.BlockSpec((1, ct), lambda ci, mi: (0, ci),
                             memory_space=pltpu.VMEM),      # last_re
                pl.BlockSpec((1, ct), lambda ci, mi: (0, ci),
                             memory_space=pltpu.VMEM),      # last_im
                pl.BlockSpec((ka - 1, ct), lambda ci, mi: (0, ci),
                             memory_space=pltpu.VMEM),      # ftail_out
            ]
            + ([pl.BlockSpec((64, 64), lambda ci, mi: (0, 0),
                             memory_space=pltpu.VMEM)]      # psd
               if cfg.fuse_psd else []),
            scratch_shapes=[
                pltpu.VMEM((2, ct), jnp.float32),            # prev rows
                pltpu.VMEM((mt + ka - 1, ct), jnp.float32),  # f ext
            ],
        )
        c = cfg.n_channels
        audio_dtype = jnp.bfloat16 if cfg.audio_bf16 else jnp.float32
        call = pl.pallas_call(
            partial(_kernel2, mt=mt, ka=ka, ft=cfg.fir_tile, da=da,
                    m_tiles=m_tiles, quad_gain=cfg.quad_gain,
                    in_gain=(1.0 / cfg.i8_scale if cfg.in_i8
                             else 1.0 / cfg.i16_scale),
                    audio_bf16=cfg.audio_bf16,
                    table_rot=self._table_rot,
                    fuse_psd=cfg.fuse_psd,
                    psd_scale=self._psd_scale,
                    psd_fb=cfg.psd_fb),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((cfg.audio_out, c), audio_dtype),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
                jax.ShapeDtypeStruct((ka - 1, c), jnp.float32),
            ]
            + ([jax.ShapeDtypeStruct((64, 64), jnp.float32)]
               if cfg.fuse_psd else []),
            interpret=self.interpret,
        )
        return jax.jit(call)

    def feed(self, x: np.ndarray) -> np.ndarray:
        return np.asarray(self.feed_async(x))

    def feed_async(self, x: np.ndarray):
        """Frame + dispatch one block; returns the DEVICE audio array
        without forcing the D2H fetch (callers pipeline the drain)."""
        return self.feed_packed(self._frame(x))

    def feed_packed(self, xw):
        """Dispatch one pre-framed packed [2M, K] buffer (callers may
        share the same buffer with :class:`PallasPSDFromXW`)."""
        import jax as _jax

        cfg = self.cfg
        # upload ONCE — the kernel takes the buffer as two aliased
        # inputs, which must not become two host→device transfers
        xw = _jax.device_put(xw)
        phi0 = (self._phi0_dev if self.snap_grid
                else self._phi_tiles())
        args = [xw, xw, self.consts["h_re"], self.consts["h_im"],
                self.consts["theta"], self.consts["m_ramp"], phi0,
                self._prev_re, self._prev_im,
                self._ftail, self.consts["bt"]]
        if cfg.fuse_psd:
            args += list(self._psd_dev_consts)
        out = self._call(*args)
        audio, last_re, last_im, ftail = out[:4]
        # the fused PSD block ((k1,k2) digit order) — callers fetch it
        # from `psd_block` when a spectrum message is due
        self.psd_block = out[4] if cfg.fuse_psd else None
        # carries stay device-resident across blocks
        self._prev_re, self._prev_im = last_re, last_im
        self._ftail = ftail
        if not self.snap_grid:
            self._phi = self._phi + self._theta64[None, :] * cfg.block_out
        return audio

    def _frame(self, x: np.ndarray) -> np.ndarray:
        from sigdigger_tpu.native import (
            frame_windows_packed,
            frame_windows_packed_i16,
        )

        cfg = self.cfg
        ext = np.concatenate([self._history,
                              np.asarray(x, np.complex64)])
        if cfg.in_i8:
            from sigdigger_tpu.native import frame_windows_packed_i8

            xw = frame_windows_packed_i8(ext, cfg.block_out, cfg.taps,
                                         cfg.decimation, cfg.i8_scale)
        elif cfg.in_i16:
            xw = frame_windows_packed_i16(ext, cfg.block_out, cfg.taps,
                                          cfg.decimation, cfg.i16_scale)
        else:
            xw = frame_windows_packed(ext, cfg.block_out, cfg.taps,
                                      cfg.decimation)
        self._history = ext[-(cfg.taps - 1):].copy()
        return xw

    def _phi_tiles(self) -> np.ndarray:
        """Per-time-tile start phases [m_tiles, C] in float32, computed
        in float64 so large blocks keep trig precision."""
        cfg = self.cfg
        m_tiles = cfg.block_out // cfg.m_tile
        mi = np.arange(m_tiles, dtype=np.float64)[:, None]
        tiles = np.mod(self._phi + mi * cfg.m_tile *
                       self._theta64[None, :], _TWO_PI).astype(np.float32)
        # pad each tile row to 8 sublanes (TPU block tiling rule)
        out = np.zeros((m_tiles * 8, cfg.n_channels), np.float32)
        out[::8] = tiles
        return out

    def feed_device(self, xw_packed, phi0, prev_re, prev_im, ftail):
        if phi0 is None:
            phi0 = self._phi0_dev
        args = [xw_packed, xw_packed, self.consts["h_re"],
                self.consts["h_im"], self.consts["theta"],
                self.consts["m_ramp"], phi0,
                prev_re, prev_im, ftail, self.consts["bt"]]
        if self.cfg.fuse_psd:
            args += list(self._psd_dev_consts)
        return self._call(*args)


def _as_v1_cfg(cfg: MatChannelizer2Config):
    from sigdigger_tpu.kernels.channelizer import MatChannelizerConfig

    return MatChannelizerConfig(
        sample_rate=cfg.sample_rate, n_channels=cfg.n_channels,
        taps=cfg.taps, decimation=cfg.decimation,
        audio_taps=cfg.audio_taps, audio_decim=cfg.audio_decim,
        block_out=cfg.block_out, channel_tile=cfg.channel_tile,
        quad_gain=cfg.quad_gain,
    )
