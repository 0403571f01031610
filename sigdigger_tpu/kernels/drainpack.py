"""Pallas TPU kernel: single-fetch drain packing for the analyzer.

Profiling the engine on the tunnel-attached chip showed the drain is
RTT-bound, not byte-bound: every D2H fetch costs ~25 ms flat (even a
512-byte squelch row), so the per-block drain of audio + squelch +
power + digital + raw planes paid 4-5 round trips.  This kernel packs
EVERY per-block drain payload into ONE scaled-int16 buffer:

    audio tiles     : audio columns        audio[Ma, C] @ S  × 4096
    status tile     : rows 0-2 squelch EMA sq[1, C] @ S  (3-lane residual)
                      rows 3-5 block power pow[1, C] @ S (3-lane residual)
    digital tiles   : soft re/im           soft[M, C] @ S    × 8192
                      and strobe           strobe[M, C] @ S  × 16384
    raw tiles       : raw channel re/im    y[M, C] @ S       × 4096

    The status rows are NOT plain-quantized: channel powers after
    channelization routinely sit below 1/512 of full scale, where a
    single ×256 int16 lane rounds to zero (r3 advisor finding — raw
    AGC would then blow up to 1/sqrt(eps) and squelch thresholds under
    1/256 were meaningless).  Each status value v is instead split
    across three int16 lanes, h = floor(v·256), m = floor((v·256−h)·2¹⁵),
    l = floor-of-the-next-residual, recovering the full f32 value to
    ~4e-12 absolute (beyond f32's own mantissa for these magnitudes)
    with pure VPU arithmetic (no bitcast needed on this backend).

``S`` is the same device-resident one-hot active-column selection used
by kernels/compact.py (slot lifecycle stays recompile-free).  One
dispatch, one D2H: the whole drain pays ONE round trip, and int16
halves the bytes of an f32 drain while keeping ~72 dB of headroom
(audio's natural endpoint is 16-bit PCM anyway; IQ sources are
typically 8-16 bit).  Strobes quantize exactly (0/1 → 0/16384).

Sections are static per variant (has_audio, has_digital, has_raw);
variants compile lazily on first use — opening more inspectors of an
already-seen class never recompiles (reference lifecycle contract,
Suscan/Analyzer.cpp:411-598).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

A_SCALE = 4096.0       # audio samples (±8 range)
S_SCALE = 256.0        # squelch EMA / block power (±128 range)
D_SCALE = 8192.0       # digital soft symbols (±4 range)
T_SCALE = 16384.0      # strobe 0/1 (exact)
R_SCALE = 4096.0       # raw channel IQ (±8, matches the i16 upload)

_SCALES = {"audio": A_SCALE, "d_sr": D_SCALE, "d_si": D_SCALE,
           "d_st": T_SCALE, "y_re": R_SCALE, "y_im": R_SCALE}


def _largest_divisor(n: int, limit: int) -> int:
    d = min(n, limit)
    while n % d:
        d -= 1
    return d


@dataclass(frozen=True)
class DrainPackerConfig:
    n_rows: int                  # M (dig/raw plane rows)
    audio_rows: int              # Ma (= M // audio_decim)
    n_channels: int              # C
    width: int                   # W compact columns
    has_audio: bool = True
    has_digital: bool = True
    has_raw: bool = True
    m_tile: int = 0              # 0 → auto (≤1024, divides Ma and M)

    def __post_init__(self):
        assert self.n_rows % self.audio_rows == 0
        if self.m_tile == 0:
            object.__setattr__(
                self, "m_tile", _largest_divisor(self.audio_rows, 1024))
        assert self.audio_rows % self.m_tile == 0
        assert self.n_rows % self.m_tile == 0
        # the status tile carries 2 values × 3 residual lanes
        assert self.m_tile >= 6, (
            f"m_tile {self.m_tile} too small for the 6-row status tile")

    def sections(self) -> list[tuple[str, int, int]]:
        """[(name, first tile, tile count)] in pack order."""
        mt = self.m_tile
        t = 0
        out = []
        if self.has_audio:
            n = self.audio_rows // mt
            out.append(("audio", t, n))
            t += n
        out.append(("status", t, 1))
        t += 1
        pt = self.n_rows // mt
        if self.has_digital:
            for name in ("d_sr", "d_si", "d_st"):
                out.append((name, t, pt))
                t += pt
        if self.has_raw:
            for name in ("y_re", "y_im"):
                out.append((name, t, pt))
                t += pt
        return out

    @property
    def total_tiles(self) -> int:
        s = self.sections()
        return s[-1][1] + s[-1][2]


def _pack_kernel(*refs, plan, n_in: int):
    # refs = plane inputs..., sq, pw, S, out ; plan = [(name, t0, cnt)]
    s = refs[n_in]
    out = refs[n_in + 1]
    sq, pw = refs[n_in - 2], refs[n_in - 1]
    t = pl.program_id(0)

    def q(acc, scale):
        v = jnp.clip(acc * jnp.float32(scale), -32768.0, 32767.0)
        return v.astype(jnp.int16)

    def residual3(v):
        """Split v·S_SCALE across (floor, 2×15-bit residual) lanes —
        full f32 precision for the status rows (see module docstring)."""
        v = jnp.clip(v * jnp.float32(S_SCALE), -32768.0, 32766.0)
        h = jnp.floor(v)
        r1 = (v - h) * jnp.float32(32768.0)
        m = jnp.floor(r1)
        lo = jnp.floor((r1 - m) * jnp.float32(32768.0))
        return (h.astype(jnp.int16), m.astype(jnp.int16),
                lo.astype(jnp.int16))

    i = 0
    for name, t0, cnt in plan:
        if name == "status":
            @pl.when(t == t0)
            def _():
                out[:] = jnp.zeros_like(out)
                sq_h, sq_m, sq_l = residual3(jnp.dot(
                    sq[:], s[:], preferred_element_type=jnp.float32))
                pw_h, pw_m, pw_l = residual3(jnp.dot(
                    pw[:], s[:], preferred_element_type=jnp.float32))
                out[0:1, :] = sq_h
                out[1:2, :] = sq_m
                out[2:3, :] = sq_l
                out[3:4, :] = pw_h
                out[4:5, :] = pw_m
                out[5:6, :] = pw_l
            continue
        x = refs[i]
        i += 1
        scale = _SCALES[name]

        @pl.when((t >= t0) & (t < t0 + cnt))
        def _(x=x, scale=scale):
            acc = jnp.dot(x[:], s[:],
                          preferred_element_type=jnp.float32)
            out[:] = q(acc, scale)


class DrainPacker:
    """Packs a bucket's entire per-block drain into one int16 fetch."""

    def __init__(self, cfg: DrainPackerConfig,
                 interpret: bool | None = None) -> None:
        self.cfg = cfg
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu", "axon")
        self.interpret = interpret
        self._sel = np.zeros((cfg.n_channels, cfg.width), np.float32)
        self._sel_dev = jnp.asarray(self._sel)
        self._call = self._build()

    def set_mapping(self, slots: list[int]) -> None:
        assert len(slots) <= self.cfg.width
        self._sel[:] = 0.0
        for w, c in enumerate(slots):
            self._sel[int(c), w] = 1.0
        self._sel_dev = jnp.asarray(self._sel)

    # ------------------------------------------------------------------
    def _build(self):
        cfg = self.cfg
        mt, w, c = cfg.m_tile, cfg.width, cfg.n_channels
        plan = cfg.sections()

        def clip_map(t0, cnt):
            return (lambda t, _t0=t0, _hi=cnt - 1:
                    (jnp.clip(t - _t0, 0, _hi), 0))

        in_specs = []
        for name, t0, cnt in plan:
            if name == "status":
                continue
            in_specs.append(pl.BlockSpec((mt, c), clip_map(t0, cnt),
                                         memory_space=pltpu.VMEM))
        in_specs += [pl.BlockSpec((1, c), lambda t: (0, 0),
                                  memory_space=pltpu.VMEM)] * 2  # sq,pw
        n_in = len(in_specs)
        in_specs.append(pl.BlockSpec((c, w), lambda t: (0, 0),
                                     memory_space=pltpu.VMEM))   # S

        grid_spec = pl.GridSpec(
            grid=(cfg.total_tiles,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((mt, w), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
        )
        call = pl.pallas_call(
            partial(_pack_kernel, plan=tuple(plan), n_in=n_in),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((cfg.total_tiles * mt, w),
                                           jnp.int16),
            interpret=self.interpret,
        )
        return jax.jit(call)

    # ------------------------------------------------------------------
    def dispatch(self, *, audio=None, sq=None, pw=None, dig=None,
                 raw=None):
        """All device-resident; returns the device int16 pack handle."""
        cfg = self.cfg
        args = []
        if cfg.has_audio:
            assert audio is not None
            args.append(audio)
        if cfg.has_digital:
            assert dig is not None and len(dig) == 3
            args.extend(dig)
        if cfg.has_raw:
            assert raw is not None and len(raw) == 2
            args.extend(raw)
        if sq is None:
            sq = self._zero_row()
        if pw is None:
            pw = self._zero_row()
        args += [sq, pw, self._sel_dev]
        return self._call(*args)

    def _zero_row(self):
        z = getattr(self, "_zrow", None)
        if z is None:
            z = self._zrow = jnp.zeros((1, self.cfg.n_channels),
                                       jnp.float32)
        return z

    def fetch(self, handle) -> dict:
        """ONE D2H fetch → dequantized numpy sections."""
        cfg = self.cfg
        mt = cfg.m_tile
        buf = np.asarray(handle)
        lay = {name: (t0, cnt) for name, t0, cnt in cfg.sections()}
        out: dict = {}

        def sect(name):
            t0, cnt = lay[name]
            return buf[t0 * mt:(t0 + cnt) * mt]

        if cfg.has_audio:
            out["audio"] = sect("audio").astype(np.float32) * (
                1.0 / A_SCALE)
        st = sect("status").astype(np.float64)

        def dec3(r0):
            return ((st[r0] + st[r0 + 1] * (1.0 / 32768.0)
                     + st[r0 + 2] * (1.0 / (32768.0 * 32768.0)))
                    * (1.0 / S_SCALE)).astype(np.float32)

        out["sq"] = dec3(0)
        out["power"] = dec3(3)
        if cfg.has_digital:
            sr = sect("d_sr").astype(np.float32)
            si = sect("d_si").astype(np.float32)
            out["soft"] = (sr + 1j * si) * (1.0 / D_SCALE)
            out["strobe"] = sect("d_st") > (T_SCALE / 2)
        if cfg.has_raw:
            out["y_re"] = sect("y_re").astype(np.float32) * (
                1.0 / R_SCALE)
            out["y_im"] = sect("y_im").astype(np.float32) * (
                1.0 / R_SCALE)
        return out
