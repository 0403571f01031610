"""Pallas TPU kernel: single-fetch drain packing for the analyzer.

Profiling the engine on the tunnel-attached chip showed the drain is
both RTT-bound (~24 ms flat per D2H fetch) and byte-bound (~30-45 MB/s
link), so the per-block drain of audio + squelch + power + digital +
raw planes must pay ONE round trip with as few bytes as possible.
This kernel packs EVERY per-block drain payload into ONE scaled-int16
buffer, with PER-SECTION compact widths:

    audio tiles     : audio-slot columns    audio[Ma, C] @ S_a  × 4096
    status tile     : rows 0-2 squelch EMA  sq[1, C] @ S  (3-lane residual)
                      rows 3-5 block power  pow[1, C] @ S (3-lane residual)
    digital tiles   : soft re/im + strobe   [M, C] @ S_d  × 8192/16384
    raw tiles       : raw channel re/im     [M, C] @ S_r  × 4096

A mixed session rarely lights every column of every section (e.g.
8 audio + 8 psk + 1 power inspectors), so each section selects only
ITS live columns: section ``s`` has width ``w_s`` dividing the buffer
lane width ``W``, and ``G_s = W / w_s`` consecutive time tiles pack
into the lane groups of one output tile.  The grouping needs no lane-
slice stores: the host pre-builds one selection matrix per group with
the columns already placed at lane offset ``g*w_s``, and the kernel
accumulates ``Σ_g dot(x_g, S_g)`` — pure MXU matmuls and adds.  For
the flagship bench session this cuts the drain from 2.75 MB to
~0.69 MB per block.

The status rows are NOT plain-quantized: channel powers after
channelization routinely sit below 1/512 of full scale, where a
single ×256 int16 lane rounds to zero (r3 advisor finding — raw
AGC would then blow up to 1/sqrt(eps) and squelch thresholds under
1/256 were meaningless).  Each status value v is instead split
across three int16 lanes, h = floor(v·256), m = floor((v·256−h)·2¹⁵),
l = floor-of-the-next-residual, recovering the full f32 value to
~4e-12 absolute with pure VPU arithmetic.

Selection matrices are the same device-resident one-hot scheme as
kernels/compact.py (slot lifecycle stays recompile-free).  int16
halves the bytes of an f32 drain while keeping ~72 dB of headroom
(audio's natural endpoint is 16-bit PCM anyway; IQ sources are
typically 8-16 bit).  Strobes quantize exactly (0/1 → 0/16384).

Sections are static per variant (has_audio, has_digital, has_raw,
widths); variants compile lazily on first use — opening more
inspectors of an already-seen class at the same width never recompiles
(reference lifecycle contract, Suscan/Analyzer.cpp:411-598).
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

# plane name -> section-selection name
_SEL_OF = {"audio": "audio", "d_sr": "digital", "d_si": "digital",
           "d_st": "digital", "y_re": "raw", "y_im": "raw"}


def _largest_divisor(n: int, limit: int) -> int:
    d = min(n, limit)
    while n % d:
        d -= 1
    return d


@dataclass(frozen=True)
class DrainPackerConfig:
    n_rows: int                  # M (raw plane rows)
    audio_rows: int              # Ma (= M // audio_decim)
    n_channels: int              # C
    width: int                   # W: buffer lane width (status width)
    has_audio: bool = True
    has_digital: bool = True
    has_raw: bool = True
    # per-section compact widths; 0 -> width (no lane grouping).
    # Must divide `width`.
    audio_width: int = 0
    digital_width: int = 0
    raw_width: int = 0
    m_tile: int = 0              # 0 → auto (≤1024, fits all sections)
    digital_rows: int = 0        # Md (0 → n_rows; symbol-squeezed
                                 # digital planes have M/group rows)

    def __post_init__(self):
        assert self.n_rows % self.audio_rows == 0
        if self.digital_rows == 0:
            object.__setattr__(self, "digital_rows", self.n_rows)
        for name in ("audio_width", "digital_width", "raw_width"):
            w = getattr(self, name)
            if w == 0:
                object.__setattr__(self, name, self.width)
            elif self.width % w:
                raise ValueError(
                    f"{name} {w} must divide width {self.width}")
        if self.m_tile == 0:
            object.__setattr__(self, "m_tile", self._pick_m_tile())
        mt = self.m_tile
        assert self.audio_rows % mt == 0 and self.n_rows % mt == 0
        if self.has_digital:
            assert self.digital_rows % mt == 0
        if self.has_audio:
            assert (self.audio_rows // mt) % self.group("audio") == 0
        if self.has_digital:
            assert (self.digital_rows // mt) % self.group("digital") == 0
        if self.has_raw:
            assert (self.n_rows // mt) % self.group("raw") == 0
        # the status tile carries 2 values × 3 residual lanes
        assert mt >= 6, (
            f"m_tile {mt} too small for the 6-row status tile")

    def group(self, section: str) -> int:
        return self.width // getattr(self, f"{section}_width")

    def _pick_m_tile(self) -> int:
        mt = _largest_divisor(self.audio_rows, 1024)
        while mt >= 6:
            ok = True
            if self.has_audio and \
                    (self.audio_rows // mt) % self.group("audio"):
                ok = False
            if self.has_digital and (
                    self.digital_rows % mt
                    or (self.digital_rows // mt)
                    % self.group("digital")):
                ok = False
            if self.has_raw and \
                    (self.n_rows // mt) % self.group("raw"):
                ok = False
            if ok:
                return mt
            nxt = mt - 1
            while nxt >= 6 and self.audio_rows % nxt:
                nxt -= 1
            mt = nxt
        raise ValueError(
            "no m_tile satisfies the section grouping constraints "
            f"(audio_rows={self.audio_rows}, n_rows={self.n_rows}, "
            f"widths={self.audio_width}/{self.digital_width}/"
            f"{self.raw_width} of {self.width})")

    def sections(self) -> list[tuple[str, int, int, int]]:
        """[(name, first out tile, out tile count, lane groups)]."""
        mt = self.m_tile
        t = 0
        out = []
        if self.has_audio:
            g = self.group("audio")
            n = (self.audio_rows // mt) // g
            out.append(("audio", t, n, g))
            t += n
        out.append(("status", t, 1, 1))
        t += 1
        pt = self.n_rows // mt
        if self.has_digital:
            g = self.group("digital")
            dt = self.digital_rows // mt
            for name in ("d_sr", "d_si", "d_st"):
                out.append((name, t, dt // g, g))
                t += dt // g
        if self.has_raw:
            g = self.group("raw")
            for name in ("y_re", "y_im"):
                out.append((name, t, pt // g, g))
                t += pt // g
        return out

    @property
    def total_tiles(self) -> int:
        s = self.sections()
        return s[-1][1] + s[-1][2]


def _pack_kernel(*refs, plan, mt: int, n_ch: int):
    # refs layout (see _build): plane inputs, sq, pw, selection
    # matrices, out; `plan` entries carry the ref indices.
    out = refs[-1]
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

    for name, t0, cnt, grp, x_i, s_i in plan:
        if name == "status":
            sq, pw, s = refs[x_i], refs[x_i + 1], refs[s_i]

            @pl.when(t == t0)
            def _(sq=sq, pw=pw, s=s):
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
        x = refs[x_i]
        s = refs[s_i]
        scale = _SCALES[name]

        @pl.when((t >= t0) & (t < t0 + cnt))
        def _(x=x, s=s, scale=scale, grp=grp):
            acc = jnp.dot(x[0:mt, :], s[0:n_ch, :],
                          preferred_element_type=jnp.float32)
            for g in range(1, grp):
                acc = acc + jnp.dot(
                    x[g * mt:(g + 1) * mt, :],
                    s[g * n_ch:(g + 1) * n_ch, :],
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
        c, w = cfg.n_channels, cfg.width
        self._sel = {"status": np.zeros((c, w), np.float32)}
        for sec, present in (("audio", cfg.has_audio),
                             ("digital", cfg.has_digital),
                             ("raw", cfg.has_raw)):
            if present:
                g = cfg.group(sec)
                self._sel[sec] = np.zeros((g * c, w), np.float32)
        self._sel_dev = {k: jnp.asarray(v)
                         for k, v in self._sel.items()}
        self._call = self._build()

    def set_mapping(self, slots: list[int]) -> None:
        """All sections share one mapping (legacy path; requires every
        per-section width == width so no lane grouping is active)."""
        maps = {}
        for sec in self._sel:
            if sec == "status":
                continue
            assert self.cfg.group(sec) == 1, (
                "set_mapping needs ungrouped sections; use "
                "set_mappings for per-section widths")
            maps[sec] = slots
        self.set_mappings(slots, **maps)

    def set_mappings(self, status: list[int], *, audio=None,
                     digital=None, raw=None) -> None:
        """Per-section slot->column maps.  ``status`` covers every
        active slot (squelch + power rows); each section lists only
        the slots whose columns it drains."""
        cfg = self.cfg
        c = cfg.n_channels

        def fill(sec, slots):
            a = self._sel[sec]
            a[:] = 0.0
            if sec == "status":
                assert len(slots) <= cfg.width
                for col, ch in enumerate(slots):
                    a[int(ch), col] = 1.0
            else:
                ws = getattr(cfg, f"{sec}_width")
                assert len(slots) <= ws, (sec, slots, ws)
                for g in range(cfg.group(sec)):
                    for col, ch in enumerate(slots):
                        a[g * c + int(ch), g * ws + col] = 1.0
            self._sel_dev[sec] = jnp.asarray(a)

        fill("status", status)
        for sec, slots in (("audio", audio), ("digital", digital),
                           ("raw", raw)):
            if sec in self._sel:
                fill(sec, slots or [])

    # ------------------------------------------------------------------
    def _build(self):
        cfg = self.cfg
        mt, w, c = cfg.m_tile, cfg.width, cfg.n_channels
        secs = cfg.sections()

        def clip_map(t0, cnt):
            return (lambda t, _t0=t0, _hi=cnt - 1:
                    (jnp.clip(t - _t0, 0, _hi), 0))

        in_specs = []
        plan = []
        x_i = 0
        for name, t0, cnt, grp in secs:
            if name == "status":
                continue
            in_specs.append(pl.BlockSpec((grp * mt, c),
                                         clip_map(t0, cnt),
                                         memory_space=pltpu.VMEM))
            plan.append([name, t0, cnt, grp, x_i, None])
            x_i += 1
        # sq, pw rows
        in_specs += [pl.BlockSpec((1, c), lambda t: (0, 0),
                                  memory_space=pltpu.VMEM)] * 2
        status_t0 = next(t0 for n, t0, _, _ in secs if n == "status")
        plan.append(["status", status_t0, 1, 1, x_i, None])
        x_i += 2
        # selection matrices, fixed order
        sel_order = [k for k in ("status", "audio", "digital", "raw")
                     if k in self._sel]
        sel_idx = {}
        for k in sel_order:
            rows = c if k == "status" else cfg.group(k) * c
            in_specs.append(pl.BlockSpec((rows, w), lambda t: (0, 0),
                                         memory_space=pltpu.VMEM))
            sel_idx[k] = x_i
            x_i += 1
        for e in plan:
            e[5] = sel_idx["status" if e[0] == "status"
                           else _SEL_OF[e[0]]]
        self._sel_order = sel_order

        grid_spec = pl.GridSpec(
            grid=(cfg.total_tiles,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((mt, w), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
        )
        call = pl.pallas_call(
            partial(_pack_kernel,
                    plan=tuple(tuple(e) for e in plan),
                    mt=mt, n_ch=c),
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
        args += [sq, pw]
        args += [self._sel_dev[k] for k in self._sel_order]
        return self._call(*args)

    def _zero_row(self):
        z = getattr(self, "_zrow", None)
        if z is None:
            z = self._zrow = jnp.zeros((1, self.cfg.n_channels),
                                       jnp.float32)
        return z

    def fetch(self, handle, buf: np.ndarray | None = None) -> dict:
        """ONE D2H fetch → dequantized numpy sections (each at its own
        section width).  ``buf`` short-circuits the fetch when the
        caller already pulled the pack (instrumented paths)."""
        cfg = self.cfg
        mt = cfg.m_tile
        if buf is None:
            buf = np.asarray(handle)
        lay = {name: (t0, cnt, grp)
               for name, t0, cnt, grp in cfg.sections()}
        out: dict = {}

        def sect(name):
            """Un-group a section back to [rows, w_section]."""
            t0, cnt, grp = lay[name]
            b = buf[t0 * mt:(t0 + cnt) * mt]
            if grp == 1:
                return b
            ws = cfg.width // grp
            # lane group g of out tile `local` holds source tile
            # local*grp + g
            return (b.reshape(cnt, mt, grp, ws)
                     .transpose(0, 2, 1, 3)
                     .reshape(cnt * grp * mt, ws))

        if cfg.has_audio:
            out["audio"] = sect("audio").astype(np.float32) * (
                1.0 / A_SCALE)
        st0 = lay["status"][0] * mt
        st = buf[st0:st0 + 6].astype(np.float64)

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
