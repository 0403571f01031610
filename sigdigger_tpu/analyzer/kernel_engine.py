"""KernelAnalyzer — the dynamic analyzer engine on the Pallas TPU path.

The round-1 analyzer (`analyzer/engine.py`) is feature-complete but its
hot path is pure JAX (XLA FFT + per-slot channels=1 inspector calls),
which the minimal axon TPU toolchain cannot execute.  This subclass
runs the SAME session protocol — message taxonomy, async inspector
acks, config-key contract (reference Suscan/Analyzer.cpp:111-623) — on
the Pallas bank kernels, so the full-featured dynamic analyzer executes
on the target hardware:

- spectrum path → `kernels/fft.py` PallasPSD (Bailey DFT-matmul);
- channel extraction → `kernels/rawbank.py` RawBank (the universal
  per-slot tap: "raw" streams, "power" integration, estimators and
  per-inspector spectrum sources, and the recovery bank's input);
- "audio" inspectors → `kernels/audio.py` AudioBank (AM/FM/USB/LSB/RAW
  + squelch/AGC/cutoff/volume);
- "psk"/"fsk"/"ask" inspectors → `kernels/recovery.py` RecoveryBank
  (per-channel kind/order/baud/loop parameters).

Dynamic open/retune/close without recompile (SURVEY.md §7): every
inspector takes a pre-allocated slot index shared across the banks;
opening rewrites that slot's device-resident constant columns, closing
masks it.  The compiled kernels never change — asserted by tests.

Deviations from the generic engine, by design:
- per-channel decimation is BUCKETED: the analyzer pre-declares a set
  of decimation classes (``decimations=...``), each with its own bank
  trio, and every inspector lands in the slowest bucket covering its
  bandwidth — wide audio and narrow digital channels get different
  equiv_rates, quantized to the declared classes (SURVEY §7; the
  generic engine picks an arbitrary per-channel power of two);
- audio AGC is the in-kernel su_agc hang follower (kernels/audio.py
  ``hang_agc``) on single-device sessions; meshed sessions keep the
  bank's block power-EMA AGC (the follower state is a sequential
  cross-shard carry);
- host-side audio resampling to `audio.sample-rate` is linear-
  interpolation (numpy), since XLA ops are unavailable on axon.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from sigdigger_tpu.analyzer.engine import Analyzer, _InspectorSlot
from sigdigger_tpu.analyzer.messages import (
    InspectorMessage,
    InspectorMessageKind,
)
from sigdigger_tpu.config import INSPECTOR_SCHEMAS, Config
from sigdigger_tpu.kernels.audio import AudioBank, AudioBankConfig
from sigdigger_tpu.kernels.compact import (
    ColumnCompactor,
    ColumnCompactorConfig,
)
from sigdigger_tpu.kernels.fft import PallasPSD, PallasPSDConfig
from sigdigger_tpu.kernels.rawbank import RawBank, RawBankConfig
from sigdigger_tpu.kernels.recovery import (
    KIND_ASK,
    KIND_FSK,
    KIND_PSK,
    RecoveryBank,
    RecoveryBankConfig,
)
from sigdigger_tpu.types import Channel

_DIGITAL = {"psk": KIND_PSK, "fsk": KIND_FSK, "ask": KIND_ASK}


def ks_schema_keys(slot) -> set[str]:
    """All schema keys of a slot's inspector class (warn only on keys
    that exist in the contract yet have no kernel-path effect)."""
    return {f.name for f in INSPECTOR_SCHEMAS[slot.class_name]}


def _largest_divisor(n: int, limit: int) -> int:
    d = min(n, limit)
    while n % d:
        d -= 1
    return d


def _decide_phase(syms: np.ndarray, bits: int) -> np.ndarray:
    levels = 1 << bits
    sector = np.round(np.angle(syms) * levels / (2.0 * np.pi))
    return np.mod(sector, levels).astype(np.uint8)


def _decide_interval(v: np.ndarray, lo: float, hi: float,
                     bits: int) -> np.ndarray:
    levels = 1 << bits
    idx = np.floor((v - lo) / (hi - lo) * levels)
    return np.clip(idx, 0, levels - 1).astype(np.uint8)


def _decide_amplitude(v: np.ndarray, bits: int,
                      vmax: float | None = None) -> np.ndarray:
    if vmax is None:
        vmax = max(float(np.max(v)) if v.size else 0.0, 1e-12)
    levels = 1 << bits
    idx = np.round(v / vmax * (levels - 1))
    return np.clip(idx, 0, levels - 1).astype(np.uint8)


class _HostResampler:
    """Streaming linear-interpolation rate converter (numpy; the audio
    tail of the TPU path must not touch XLA)."""

    def __init__(self, rate_in: float, rate_out: float) -> None:
        self.ratio = float(rate_in) / float(rate_out)
        self._pos = 0.0
        self._last = 0.0

    def __call__(self, x: np.ndarray) -> np.ndarray:
        if not len(x):
            return x
        ext = np.concatenate([[self._last], np.asarray(x, np.float64)])
        # output sample k sits at input position _pos + k*ratio (in ext
        # coordinates, +1 for the carried sample)
        n_out = int(np.floor((len(ext) - 1 - self._pos) / self.ratio))
        if n_out <= 0:
            self._pos -= len(x)
            self._last = x[-1]
            return np.zeros(0, np.float32)
        pos = self._pos + np.arange(n_out) * self.ratio
        out = np.interp(pos, np.arange(len(ext)) - 1.0, ext)
        self._pos = self._pos + n_out * self.ratio - len(x)
        self._last = x[-1]
        return out.astype(np.float32)


class _KernelSlotExtra:
    """Per-inspector host-side bits the banks don't hold."""

    def __init__(self, idx: int, config: Config) -> None:
        self.idx = idx
        self.config = config
        self.resampler: _HostResampler | None = None
        self.pw_acc = 0.0
        self.pw_cnt = 0
        self.offset = 0.0           # afc.offset / ask.offset (Hz)
        self.bucket = None          # _Bucket hosting this slot
        self.agc_ema: float | None = None  # digital drain AGC power EMA
        # EMA-tracked decision ranges (stable symbol boundaries across
        # blocks — reference Decider fixed min/max)
        self.dec_span: float | None = None   # fsk |freq| span
        self.dec_vmax: float | None = None   # ask amplitude max


# config keys each inspector class honors on the kernel path; a set of
# any OTHER schema key is acknowledged but logged loudly (reference
# contract: Default/GenericInspector/InspectorCtl/*.cpp)
_HONORED_KEYS: dict[str, set[str]] = {
    "audio": {"audio.cutoff", "audio.volume", "audio.sample-rate",
              "audio.demodulator", "audio.squelch",
              "audio.squelch-level", "agc.enabled", "agc.gain",
              "agc.ts"},
    "psk": {"afc.bits-per-symbol", "afc.costas-order", "afc.loop-bw",
            "afc.offset", "mf.type", "mf.roll-off", "clock.baud",
            "clock.gain", "clock.phase", "clock.running", "clock.type",
            "equalizer.type", "equalizer.rate", "equalizer.locked",
            "agc.enabled", "agc.gain", "agc.ts"},
    "fsk": {"fsk.bits-per-symbol", "fsk.phase", "fsk.quad-demod",
            "mf.type", "mf.roll-off", "clock.baud", "clock.gain",
            "clock.phase", "clock.running", "clock.type",
            # the fsk discriminator is amplitude-invariant: the gain-
            # control contract is honored trivially (as on the CPU
            # path, where input AGC cannot change the quad output)
            "agc.enabled", "agc.gain", "agc.ts"},
    "ask": {"ask.bits-per-symbol", "ask.channel", "ask.loop-bw",
            "ask.offset", "ask.use-pll", "mf.type", "mf.roll-off",
            "clock.baud", "clock.gain", "clock.phase", "clock.running",
            "clock.type", "agc.enabled", "agc.gain", "agc.ts"},
    "raw": {"agc.enabled", "agc.gain", "agc.ts"},
    "power": {"power.integrate-samples"},
}


class _Bucket:
    """One (decimation) class of pre-allocated inspector slots: its own
    RawBank + AudioBank + RecoveryBank at equiv_rate = fs/decimation
    (SURVEY §7 bucketed channel groups; reference per-inspector
    decimation choice, Tasks/LPFTask.cpp:52-69)."""

    def __init__(self, decimation: int, raw, audio, rec,
                 n_slots: int) -> None:
        self.decimation = decimation
        self.raw = raw
        self.audio = audio
        self.rec = rec
        self.free = list(range(n_slots - 1, -1, -1))
        # device-side active-column compaction (kernels/compact.py):
        # built by the engine when n_slots > compact_cols; cmap maps
        # slot idx -> compact column while the active set fits
        self.comp_digital = None
        self.comp_raw = None
        self.comp_audio = None
        # time-sharded wrappers (("time","ch") mesh; parallel/timebanks)
        self.t_raw = None
        self.t_audio = None
        self.t_rec = None
        self.cmap: dict[int, int] = {}
        self.active: list[int] = []
        # per-section active slot lists (the DrainPacker packs each
        # section at its own compact width): "audio" = audio slots,
        # "digital" = psk/fsk/ask, "raw" = slots that consume the raw
        # planes on the host (raw/power payloads, estimators,
        # spectrum sources)
        self.active_by: dict[str, list[int]] = {
            "audio": [], "digital": [], "raw": []}
        # single-fetch drain packers, keyed (audio, digital, raw) —
        # variants compile lazily on first need (kernels/drainpack.py)
        self.packers: dict = {}
        # device symbol-rate squeeze of the digital planes (built when
        # the engine runs with symbol_group > 1)
        self.squeeze = None
        # side compactors for sections too narrow for the packer's
        # lane grouping at large widths, keyed (section, width)
        self.sides: dict = {}

    @property
    def channel_rate(self) -> float:
        return self.raw.cfg.channel_rate

    @property
    def audio_rate(self) -> float:
        return self.audio.cfg.audio_rate


class KernelAnalyzer(Analyzer):
    """Analyzer running its hot path entirely on Pallas kernels.

    ``decimations`` declares the available (bw, rate) bucket classes —
    each gets ``n_slots`` pre-allocated inspector slots at
    equiv_rate = fs / decimation; ``open_inspector`` places each
    inspector in the slowest bucket that still covers its bandwidth
    (with a 1.25 guard), so wide audio and narrow digital channels in
    one session get different equiv_rates.  ``decimation`` names the
    primary/default bucket.
    """

    def __init__(self, profile=None, params=None, source=None,
                 block_size: int | None = None, n_slots: int = 128,
                 decimation: int = 64, audio_decim: int = 8,
                 decimations: tuple[int, ...] | None = None,
                 interpret: bool | None = None, mesh=None,
                 compact_cols: int = 32,
                 pipeline_depth: int = 1,
                 in_i16: bool | None = None,
                 drain_bf16: bool | None = None,
                 drain_pack: bool = True,
                 in_i8: bool = False,
                 symbol_group: int = 1,
                 drain_thread: bool = False) -> None:
        self._compact_cols = int(compact_cols)
        # int16 packed uploads (in-kernel dequantization at 4096
        # counts/unit — quantization floor ~-72 dBFS): defaults ON for
        # compiled TPU runs (halves H2D bytes through tunnel/PCIe),
        # OFF under interpret so CPU tests stay exact.  in_i8 (opt-in)
        # quarters the f32 bytes at 64 counts/unit (~-36 dBFS — the
        # wire precision of 8-bit SDR front ends).
        self._in_i16 = in_i16
        self._in_i8 = bool(in_i8)
        # bf16 drains for the audio + digital compactors (raw IQ stays
        # f32 for recording fidelity); same default policy as in_i16
        self._drain_bf16 = drain_bf16
        # single-fetch int16 drain packing (kernels/drainpack.py): the
        # whole per-block drain in ONE D2H round trip.  Quantization:
        # audio 1/4096 (below 16-bit PCM), soft symbols 1/8192, raw IQ
        # 1/4096 (matches the i16 upload), strobes exact.
        self._drain_pack = bool(drain_pack)
        # depth >1 overlaps the next block's framing/upload with the
        # previous block's device compute + D2H drain (messages lag
        # depth-1 blocks; flushed at EOS)
        self._pipeline_depth = max(1, int(pipeline_depth))
        self._inflight: list = []
        # symbol_group R > 1 squeezes the digital drain to ~symbol
        # rate on device (kernels/symsqueeze.py): soft/strobe planes
        # shrink R× before the D2H drain.  Requires sps >= R+1 on
        # every digital inspector (validated at configure time).
        self._symbol_group = max(1, int(symbol_group))
        # drain_thread moves fetch + demap + message emission to a
        # worker so the host demap overlaps the next block's framing,
        # upload and device compute (the r4 eng_demap_ms term)
        self._drain_thread_on = bool(drain_thread)
        self._drain_worker = None
        self._drain_q = None
        self._n_slots = int(n_slots)
        self._defer_compact = False
        self._decimation = int(decimation)
        self._audio_decim = int(audio_decim)
        self._decimations = tuple(sorted(
            set(decimations or ()) | {int(decimation)}, reverse=True))
        self._interpret = interpret
        self._mesh = mesh
        super().__init__(profile=profile, params=params, source=source,
                         block_size=block_size)

    # ------------------------------------------------------------------
    # DSP construction
    # ------------------------------------------------------------------
    def _build_dsp(self) -> None:
        import jax

        rate = self.source.sample_rate
        w = self.params.window_size
        itp = self._interpret
        if itp is None:
            itp = jax.default_backend() not in ("tpu", "axon")
        if self._in_i16 is None:
            self._in_i16 = not itp
        if self._drain_bf16 is None:
            self._drain_bf16 = not itp
        # a ("time", "ch") mesh time-shards one wideband stream ON the
        # bank path (parallel/timebanks.py wrappers): RawBank stateless
        # split, AudioBank input halos (FM/RAW exact), RecoveryBank
        # exact turn-taking handoff.  A plain ("ch",) mesh keeps the
        # zero-comm channel sharding.
        self._tmesh = (self._mesh is not None
                       and "time" in self._mesh.axis_names
                       and self._mesh.shape["time"] > 1)
        n_mesh = self._mesh.shape["ch"] if self._mesh is not None else 1
        if self._n_slots % max(n_mesh, 1):
            raise ValueError(
                f"n_slots {self._n_slots} must be a multiple of the "
                f"mesh size {n_mesh}")
        frames = self.block_size // w
        if frames % max(n_mesh, 1):
            raise ValueError(
                f"PSD frames per block {frames} must be a multiple of "
                f"the mesh size {n_mesh}")
        self._spectrum = PallasPSD(
            PallasPSDConfig(
                fft_size=w, frames_per_block=frames,
                frames_per_program=_largest_divisor(frames // n_mesh, 8)),
            rate, self.params.window_function,
            alpha=self.params.spectrum_avg_alpha,
            interpret=self._interpret,
        )
        if self._mesh is not None:
            from sigdigger_tpu.parallel.banks import shard_psd

            shard_psd(self._spectrum, self._mesh)

        tile = 128 if self._n_slots % 128 == 0 else self._n_slots
        self._buckets: dict[int, _Bucket] = {}
        for d in self._decimations:
            if self.block_size % (d * self._audio_decim):
                raise ValueError(
                    f"block_size {self.block_size} must be a multiple "
                    f"of decimation*audio_decim = "
                    f"{d * self._audio_decim}")
            block_out = self.block_size // d
            m_tile = _largest_divisor(block_out, 2048)
            if m_tile % self._audio_decim:
                raise ValueError(
                    f"derived m_tile {m_tile} not a multiple of audio "
                    f"decimation {self._audio_decim}")
            in_scale = 64.0 if self._in_i8 else 4096.0
            # fir_tile 1024 measured ~13% faster than the 256 default
            # on-chip at this geometry (larger banded-FIR matmul rows
            # beat the executed-flop saving of small chunks)
            ft = (1024 if m_tile % 1024 == 0
                  and 1024 % self._audio_decim == 0 else 0)
            audio = AudioBank(AudioBankConfig(
                sample_rate=rate, n_channels=self._n_slots,
                decimation=d, audio_decim=self._audio_decim,
                block_out=block_out, m_tile=m_tile, channel_tile=tile,
                enable_ssb=True, in_scale=in_scale, fir_tile=ft,
                # the su_agc hang follower runs in-kernel on single-
                # device sessions (reference Tasks/AGCTask.cpp:41-53);
                # meshed sessions keep the block power-EMA AGC (the
                # follower state is a sequential cross-shard carry)
                hang_agc=self._mesh is None,
            ), interpret=self._interpret)
            raw = RawBank(RawBankConfig(
                sample_rate=rate, n_channels=self._n_slots,
                decimation=d, block_out=block_out, m_tile=m_tile,
                channel_tile=tile, in_scale=in_scale,
            ), interpret=self._interpret)
            # recovery tile policy (r5): the per-sample loops are
            # LATENCY-bound, so run the widest slot tile per grid
            # program (ct×mt VMEM held at the proven 128×1024
            # product) — measured 16.5 → 5.3 ms at 1024 slots
            rec_ct = min(self._n_slots, 1024)
            while self._n_slots % rec_ct:
                rec_ct -= 1
            rec_mt = _largest_divisor(
                block_out, max(128, (128 * 1024) // rec_ct))
            rec = RecoveryBank(RecoveryBankConfig(
                n_channels=self._n_slots, block_len=block_out,
                channel_tile=rec_ct, m_tile=rec_mt,
            ), interpret=self._interpret)
            t_raw = t_audio = t_rec = None
            if self._tmesh:
                from sigdigger_tpu.parallel.timebanks import (
                    TimeShardedAudioBank,
                    TimeShardedRawBank,
                    TimeShardedRecoveryBank,
                )

                t_raw = TimeShardedRawBank(raw, self._mesh)
                t_audio = TimeShardedAudioBank(audio, self._mesh)
                t_rec = TimeShardedRecoveryBank(rec, self._mesh)
            elif self._mesh is not None:
                # scale-out: channel-shard the banks (parallel/banks.py;
                # zero per-step comm on the channel axis)
                from sigdigger_tpu.parallel.banks import (
                    shard_audio_bank,
                    shard_raw_bank,
                    shard_recovery_bank,
                )

                shard_audio_bank(audio, self._mesh)
                shard_raw_bank(raw, self._mesh)
                shard_recovery_bank(rec, self._mesh)
            bucket = _Bucket(d, raw, audio, rec, self._n_slots)
            bucket.t_raw, bucket.t_audio, bucket.t_rec = \
                t_raw, t_audio, t_rec
            if self._symbol_group > 1 and self._mesh is None:
                from sigdigger_tpu.kernels.symsqueeze import (
                    SymbolSqueeze,
                    SymbolSqueezeConfig,
                )

                bucket.squeeze = SymbolSqueeze(SymbolSqueezeConfig(
                    n_rows=block_out, n_channels=self._n_slots,
                    group=self._symbol_group, channel_tile=tile),
                    interpret=self._interpret)
            if (self._mesh is None and self._compact_cols > 0
                    and self._n_slots >= self._compact_cols):
                w = self._compact_cols
                bucket.comp_digital = ColumnCompactor(
                    ColumnCompactorConfig(
                        n_rows=block_out, n_channels=self._n_slots,
                        width=w, n_planes=3, channel_tile=tile,
                        out_bf16=self._drain_bf16),
                    interpret=self._interpret)
                bucket.comp_raw = ColumnCompactor(
                    ColumnCompactorConfig(
                        n_rows=block_out, n_channels=self._n_slots,
                        width=w, n_planes=2, channel_tile=tile),
                    interpret=self._interpret)
                bucket.comp_audio = ColumnCompactor(
                    ColumnCompactorConfig(
                        n_rows=block_out // self._audio_decim,
                        n_channels=self._n_slots, width=w, n_planes=1,
                        channel_tile=tile, out_bf16=self._drain_bf16),
                    interpret=self._interpret)
            self._buckets[d] = bucket

        # Spectrum sharing the channelizer upload: when a bucket's
        # window geometry matches the Bailey factorization (decimation
        # == taps == B), the PSD reads that bucket's packed [2M, K]
        # buffer directly (kernels/fft.py PallasPSDFromXW) — per block
        # the host uploads ONE buffer for PSD + AudioBank + RawBank
        # (reference: one shared source loop feeds FFT and inspectors,
        # Suscan/Analyzer.cpp source worker).
        from sigdigger_tpu.types import AnalyzerMode

        self._psd_bucket = None
        if (self._mesh is None
                and self.params.mode != AnalyzerMode.WIDE_SPECTRUM):
            b_fac = self._spectrum.cfg.b
            for d in self._decimations:
                raw_cfg = self._buckets[d].raw.cfg
                if d == b_fac and raw_cfg.taps == b_fac:
                    from sigdigger_tpu.kernels.fft import PallasPSDFromXW

                    self._spectrum = PallasPSDFromXW(
                        self._spectrum.cfg,
                        m_rows=self.block_size // d,
                        sample_rate=rate,
                        window=self.params.window_function,
                        alpha=self.params.spectrum_avg_alpha,
                        interpret=self._interpret,
                        in_scale=(1.0 / 64.0 if self._in_i8
                                  else 1.0 / 4096.0 if self._in_i16
                                  else 1.0),
                    )
                    self._psd_bucket = self._buckets[d]
                    break

        primary = self._buckets[self._decimation]
        self._audio_bank = primary.audio      # primary-bucket aliases
        self._raw_bank = primary.raw
        self._rec_bank = primary.rec
        self._channelizer = None          # base machinery unused
        self._kslots: dict[int, _KernelSlotExtra] = {}

    @property
    def channel_rate(self) -> float:
        return self._raw_bank.cfg.channel_rate

    @property
    def audio_rate(self) -> float:
        return self._audio_bank.cfg.audio_rate

    def _pick_bucket(self, bw: float) -> _Bucket:
        """The slowest bucket (largest decimation) whose channel rate
        still covers the requested bandwidth with a 1.25 guard
        (reference per-inspector guard choice, Tasks/LPFTask.cpp:63-65),
        falling back to the fastest bucket."""
        for d in self._decimations:          # sorted descending
            b = self._buckets[d]
            if b.channel_rate >= bw * 1.25 and b.free:
                return b
        return self._buckets[self._decimations[-1]]

    def _refresh_compact(self, bucket: _Bucket) -> None:
        """Rebuild the bucket's slot->compact-column mapping (constant
        rewrite, no recompile).  When the active set outgrows the
        compact width the drain falls back to full planes."""
        if bucket.comp_digital is None or self._defer_compact:
            return
        active = sorted(ks.idx for ks in self._kslots.values()
                        if ks.bucket is bucket)
        w = bucket.comp_digital.cfg.width
        if len(active) > w:
            bucket.cmap = {}
            bucket.active = []
            return
        bucket.cmap = {idx: i for i, idx in enumerate(active)}
        bucket.active = active
        bucket.active_by = self._active_by(bucket)
        for comp in (bucket.comp_digital, bucket.comp_raw,
                     bucket.comp_audio):
            comp.set_mapping(active)
        for packer in bucket.packers.values():
            cfg = packer.cfg
            ab = bucket.active_by
            if (len(active) <= cfg.width
                    and len(ab["audio"]) <= cfg.audio_width
                    and len(ab["digital"]) <= cfg.digital_width
                    and len(ab["raw"]) <= cfg.raw_width):
                packer.set_mappings(active, audio=ab["audio"],
                                    digital=ab["digital"],
                                    raw=ab["raw"])
            # else: stale variant — _get_packer's width key no longer
            # selects it
        for (sec, w, _rows), comp in bucket.sides.items():
            if len(bucket.active_by[sec]) <= w:
                comp.set_mapping(bucket.active_by[sec])

    def _active_by(self, bucket: _Bucket) -> dict[str, list[int]]:
        by: dict[str, list[int]] = {"audio": [], "digital": [],
                                    "raw": []}
        for slot in self._inspectors.values():
            ks = self._kslots[slot.handle]
            if ks.bucket is not bucket:
                continue
            if slot.class_name == "audio":
                by["audio"].append(ks.idx)
            elif slot.class_name in _DIGITAL:
                by["digital"].append(ks.idx)
            if self._needs_host_raw(slot, ks):
                by["raw"].append(ks.idx)
        return {k: sorted(v) for k, v in by.items()}

    def _needs_host_raw(self, slot, ks: _KernelSlotExtra) -> bool:
        """Whether this slot's raw [M] channel column must cross to the
        host.  Power inspectors whose integration window is a whole
        number of blocks are served by the device block-power row
        instead (the raw planes stay on device — at 1024 open
        inspectors the column drain would otherwise dominate)."""
        if slot.estimators or slot.spectrum_source:
            return True
        if slot.class_name == "raw":
            return True
        if slot.class_name == "power":
            n_int = max(1, int(ks.config["power.integrate-samples"]))
            return n_int % ks.bucket.raw.cfg.block_out != 0
        return False

    def bulk_config(self):
        """Context manager batching many open/close/configure calls:
        per-channel device constant uploads and compact-map refreshes
        are suspended and flushed ONCE on exit.  Opening ~1024
        inspectors re-uploads the constant planes once instead of per
        call (reference opens are individually cheap because its
        per-inspector state is host-side; here each open rewrites
        device-resident columns — Suscan/Analyzer.cpp:411-460)."""
        from contextlib import contextmanager

        @contextmanager
        def _bulk():
            banks = [b for bk in self._buckets.values()
                     for b in (bk.raw, bk.audio, bk.rec)]
            with self._lock:
                for b in banks:
                    b.begin_defer()
                self._defer_compact = True
            try:
                yield
            finally:
                with self._lock:
                    for b in banks:
                        b.end_defer()
                    self._defer_compact = False
                    for bk in self._buckets.values():
                        self._refresh_compact(bk)
        return _bulk()

    def set_estimator(self, handle: int, estimator_id: str,
                      enabled: bool, request_id: int = 0) -> None:
        super().set_estimator(handle, estimator_id, enabled,
                              request_id)
        slot = self._inspectors.get(handle)
        if slot is not None:
            with self._lock:
                self._refresh_compact(self._kslots[handle].bucket)

    def set_spectrum_source(self, handle: int, source_id: int,
                            request_id: int = 0) -> None:
        super().set_spectrum_source(handle, source_id, request_id)
        slot = self._inspectors.get(handle)
        if slot is not None:
            with self._lock:
                self._refresh_compact(self._kslots[handle].bucket)

    # ------------------------------------------------------------------
    # inspector lifecycle (same ack protocol as the base engine)
    # ------------------------------------------------------------------
    def open_inspector(self, class_name: str, channel: Channel,
                       request_id: int = 0,
                       config: dict[str, Any] | None = None) -> int:
        if class_name not in INSPECTOR_SCHEMAS:
            self._emit(InspectorMessage(
                inspector_kind=InspectorMessageKind.WRONG_KIND,
                request_id=request_id, class_name=class_name))
            raise ValueError(f"unknown inspector class {class_name!r}")
        with self._lock:
            bw = channel.bw or (channel.f_high - channel.f_low)
            bw = max(bw, self.sample_rate /
                     self.params.window_size * 8)
            if class_name == "audio":
                bw = min(bw, self.sample_rate / 2.0, 200e3)
            bucket = self._pick_bucket(bw)
            if not bucket.free:
                self._emit(InspectorMessage(
                    inspector_kind=InspectorMessageKind.WRONG_OBJECT,
                    request_id=request_id, class_name=class_name))
                raise RuntimeError(
                    f"all {self._n_slots} kernel slots of the "
                    f"1/{bucket.decimation} bucket in use")
            idx = bucket.free.pop()
            cfgobj = Config(INSPECTOR_SCHEMAS[class_name])
            if config:
                cfgobj.update(config)
            equiv_rate = bucket.channel_rate

            bucket.raw.configure_channel(
                idx, f0=channel.fc, bw=bw / 2.0, reset_state=True)
            handle = self._next_handle
            self._next_handle += 1
            slot = _InspectorSlot(
                handle=handle, inspector_id=handle,
                class_name=class_name, inspector=None, chan_handle=idx,
                equiv_rate=equiv_rate, bandwidth=bw, lo=channel.fc,
                estimators=set(),
            )
            ks = _KernelSlotExtra(idx, cfgobj)
            ks.bucket = bucket
            self._inspectors[handle] = slot
            self._by_id[handle] = handle
            self._kslots[handle] = ks
            self._apply_config(slot, ks, reset_state=True)
            self._refresh_compact(bucket)
        self._emit(InspectorMessage(
            inspector_kind=InspectorMessageKind.OPEN,
            request_id=request_id, handle=handle, inspector_id=handle,
            class_name=class_name, config=cfgobj.copy(),
            equiv_rate=equiv_rate, bandwidth=bw, lo=channel.fc,
        ))
        return handle

    def _apply_config(self, slot: _InspectorSlot, ks: _KernelSlotExtra,
                      reset_state: bool = False) -> None:
        c = ks.config
        name = slot.class_name
        bucket = ks.bucket
        if name == "audio":
            cutoff = min(float(c["audio.cutoff"]),
                         0.9 * bucket.audio_rate)
            bucket.audio.configure_channel(
                ks.idx, f0=slot.lo, bw=slot.bandwidth / 2.0,
                mode=int(c["audio.demodulator"]), cutoff=cutoff,
                # manual agc.gain applies when AGC is off (reference
                # GainControl semantics), folded into the volume row
                volume=float(c["audio.volume"]) * (
                    1.0 if bool(c["agc.enabled"])
                    else float(c["agc.gain"])),
                squelch=bool(c["audio.squelch"]),
                squelch_level=float(c["audio.squelch-level"]),
                agc=bool(c["agc.enabled"]),
                # 0.0 restores the bank's default squelch-EMA constant
                # (None would leave a stale agc.ts driving it forever)
                agc_ts=(float(c["agc.ts"])
                        if bool(c["agc.enabled"]) else 0.0),
                reset_state=reset_state)
            target = float(c["audio.sample-rate"])
            ks.resampler = (_HostResampler(bucket.audio_rate, target)
                            if abs(target - bucket.audio_rate) > 1e-6
                            else None)
        elif name in _DIGITAL:
            kw: dict[str, Any] = {}
            if name == "psk":
                bps = max(1, int(c["afc.bits-per-symbol"]))
                order = int(c["afc.costas-order"])
                if order not in (2, 4, 8):
                    order = min(1 << bps, 8)
                loop_bw = float(c["afc.loop-bw"])
                ks.offset = float(c["afc.offset"])
                kw.update(eq_enabled=int(c["equalizer.type"]) == 1,
                          eq_rate=float(c["equalizer.rate"]),
                          eq_locked=bool(c["equalizer.locked"]))
            elif name == "ask":
                order = 2
                loop_bw = float(c["ask.loop-bw"])
                ks.offset = float(c["ask.offset"])
                kw.update(pll=bool(c["ask.use-pll"]))
            else:                                # fsk
                order = 2
                loop_bw = None    # derived from the baud rate below
                ks.offset = 0.0
                kw.update(quad_demod=bool(c["fsk.quad-demod"]),
                          fsk_phase=float(c["fsk.phase"]))
            baud = max(float(c["clock.baud"]), 1e-3)
            sps = max(2.0, bucket.channel_rate / baud)
            if self._symbol_group > 1 and sps < self._symbol_group + 1:
                raise ValueError(
                    f"symbol_group={self._symbol_group} requires "
                    f"sps >= {self._symbol_group + 1} on every digital "
                    f"inspector (got sps={sps:.2f}); the squeezed "
                    "drain would collide strobes")
            if loop_bw is None:
                # the fsk contract exposes no loop key (reference
                # InspectorCtl/FskControl.cpp); size the coherent-path
                # PLL at 5% of the symbol rate instead of a hardcode
                loop_bw = 0.05 / sps
            bucket.rec.configure_channel(
                ks.idx, kind=_DIGITAL[name], sps=sps, order=order,
                loop_bw=loop_bw,
                clock_gain=float(c["clock.gain"]),
                mf_rolloff=float(c["mf.roll-off"]),
                use_mf=int(c["mf.type"]) == 1,
                running=bool(c["clock.running"]),
                manual_clock=int(c["clock.type"]) == 0,
                clock_phase=float(c["clock.phase"]),
                reset_state=reset_state, **kw)
            # manual carrier offset shifts the channel mix (reference
            # AfcControl/AskControl offset semantics)
            bucket.raw.configure_channel(
                ks.idx, f0=slot.lo + ks.offset)

    def set_inspector_config(self, handle: int, config: dict[str, Any],
                             request_id: int = 0) -> None:
        slot = self._slot(handle, request_id)
        if slot is None:
            return
        honored = _HONORED_KEYS.get(slot.class_name, set())
        ignored = [k for k in config
                   if k not in honored and k in ks_schema_keys(slot)]
        if ignored:
            from sigdigger_tpu.utils.logger import Logger

            Logger.instance().warning(
                f"kernel path does not honor {sorted(ignored)} on "
                f"{slot.class_name!r} inspector {handle} (accepted, "
                "no effect)", domain="kernel_engine")
        with self._lock:
            ks = self._kslots[handle]
            ks.config.update(config)
            self._apply_config(slot, ks)
        self._emit(InspectorMessage(
            inspector_kind=InspectorMessageKind.SET_CONFIG,
            request_id=request_id, handle=handle,
            inspector_id=slot.inspector_id, class_name=slot.class_name,
            config=ks.config.copy(),
        ))

    def set_inspector_freq(self, handle: int, freq: float,
                           request_id: int = 0) -> None:
        slot = self._slot(handle, request_id)
        if slot is None:
            return
        with self._lock:
            ks = self._kslots[handle]
            slot.lo = freq
            ks.bucket.raw.configure_channel(ks.idx,
                                            f0=freq + ks.offset)
            if slot.class_name == "audio":
                ks.bucket.audio.configure_channel(ks.idx, f0=freq)
        self._emit(InspectorMessage(
            inspector_kind=InspectorMessageKind.SET_FREQ,
            request_id=request_id, handle=handle, lo=freq,
        ))

    def _retune_channel(self, slot, f0: float) -> None:
        """Doppler-corrected LO move on the bank constants (same path
        as set_inspector_freq, without touching the user-visible
        slot.lo)."""
        ks = self._kslots[slot.handle]
        ks.bucket.raw.configure_channel(ks.idx, f0=f0 + ks.offset)
        if slot.class_name == "audio":
            ks.bucket.audio.configure_channel(ks.idx, f0=f0)

    def set_inspector_bandwidth(self, handle: int, bw: float,
                                request_id: int = 0) -> None:
        slot = self._slot(handle, request_id)
        if slot is None:
            return
        with self._lock:
            ks = self._kslots[handle]
            slot.bandwidth = bw
            ks.bucket.raw.configure_channel(ks.idx, bw=bw / 2.0)
            if slot.class_name == "audio":
                ks.bucket.audio.configure_channel(ks.idx, bw=bw / 2.0)
        self._emit(InspectorMessage(
            inspector_kind=InspectorMessageKind.SET_BANDWIDTH,
            request_id=request_id, handle=handle, bandwidth=bw,
        ))

    def close_inspector(self, handle: int, request_id: int = 0) -> None:
        slot = self._slot(handle, request_id)
        if slot is None:
            return
        import time as _time

        self._flush_watermark(slot, _time.time())
        with self._lock:
            ks = self._kslots.pop(handle)
            # mask the slot: silence the audio column, then recycle
            ks.bucket.audio.configure_channel(ks.idx, mode=0,
                                              volume=0.0)
            ks.bucket.free.append(ks.idx)
            self._by_id.pop(slot.inspector_id, None)
            del self._inspectors[handle]
            self._refresh_compact(ks.bucket)
        self._emit(InspectorMessage(
            inspector_kind=InspectorMessageKind.CLOSE,
            request_id=request_id, handle=handle,
            inspector_id=slot.inspector_id,
        ))

    # ------------------------------------------------------------------
    # block compute on the kernel banks
    # ------------------------------------------------------------------
    def _compute_block(self, x: np.ndarray) -> list:
        """Depth-``pipeline_depth`` block pipeline: dispatch block n,
        drain block n-(depth-1) — host framing/upload of the next block
        overlaps the device compute and D2H drain of the previous one
        (the receiver's feed_async/drain discipline, KernelReceiver.run).
        Messages lag (depth-1) blocks; ``_flush_pipeline`` drains the
        tail at EOS."""
        import jax

        by_bucket: dict[int, list] = {}
        for slot in self._inspectors.values():
            ks = self._kslots[slot.handle]
            by_bucket.setdefault(ks.bucket.decimation, []).append(slot)
        xw_shared = None
        if self._psd_bucket is not None:
            # ONE packed (optionally int16) upload feeds the PSD and —
            # via _dispatch_bucket below — this bucket's banks; the
            # EMA folds on device, fetched only when a message is due
            xw_shared = jax.device_put(
                self._psd_bucket.raw.frame_packed(
                    x, i16=self._in_i16, i8=self._in_i8))
            self._spectrum.feed_ema(xw_shared)
        handles = [self._dispatch_bucket(
            self._buckets[d], slots, x,
            xw_shared if self._buckets[d] is self._psd_bucket else None)
            for d, slots in by_bucket.items()]
        self._inflight.append(handles)
        if len(self._inflight) < self._pipeline_depth:
            return []
        entry = self._inflight.pop(0)
        if self._drain_thread_on:
            self._queue_drain(entry)
            return []
        return self._drain_entry(entry)

    def _feed_spectrum(self, x: np.ndarray) -> None:
        if self._psd_bucket is None:
            super()._feed_spectrum(x)
        # else: _compute_block feeds the PSD from the shared packed
        # buffer (fold lags depth-1 blocks, like the sample messages)

    def _drain_entry(self, handles) -> list:
        return [m for hs in handles for m in self._drain_bucket(hs)]

    def _flush_pipeline(self) -> list:
        out = []
        while self._inflight:
            out.extend(self._drain_entry(self._inflight.pop(0)))
        return out

    def _emit_block_msgs(self, msgs, now: float) -> None:
        for slot, samples, extras, raw in msgs:
            self._emit_samples(slot, samples, extras, now)
            if slot.estimators:
                self._emit_estimators(slot, raw)
            if slot.spectrum_source:
                self._emit_inspector_spectrum(slot, raw)

    # ------------------------------------------------------------------
    # threaded drain: fetch + demap + emission run on a worker so the
    # host-side demap overlaps the next block's framing/upload/compute
    # (the r4 eng_demap_ms term — VERDICT r4 item 1)
    # ------------------------------------------------------------------
    def _queue_drain(self, entry) -> None:
        import queue as _q
        import threading

        if self._drain_q is None:
            # maxsize well above the step() throttle point so the
            # producer's put() never actually blocks while holding the
            # engine lock (the worker needs that lock to emit)
            self._drain_q = _q.Queue(
                maxsize=self._pipeline_depth + 6)
            self._drain_worker = threading.Thread(
                target=self._drain_loop, daemon=True,
                name="kernel-drain")
            self._drain_worker.start()
        self._drain_q.put(entry)

    def _drain_loop(self) -> None:
        import time as _time

        while True:
            entry = self._drain_q.get()
            if entry is None:
                self._drain_q.task_done()
                return
            try:
                msgs = self._drain_entry(entry)
                self._emit_block_msgs(msgs, _time.time())
            except Exception as e:  # noqa: BLE001 — worker must live
                from sigdigger_tpu.utils.logger import Logger

                Logger.instance().error(
                    f"drain worker failed: {e!r}",
                    domain="kernel_engine")
            finally:
                self._drain_q.task_done()

    def step(self) -> bool:
        import time as _time

        if self._drain_q is not None:
            # backpressure OUTSIDE the engine lock: never let the
            # drain queue grow past the pipeline depth + slack
            while self._drain_q.qsize() > self._pipeline_depth + 2:
                _time.sleep(0.002)
        ok = super().step()
        if not ok and self._inflight:
            # EOS with blocks still in flight: drain and emit the tail
            entries = list(self._inflight)
            self._inflight.clear()
            if self._drain_thread_on and self._drain_q is not None:
                for e in entries:
                    self._drain_q.put(e)
            else:
                now = _time.time()
                for e in entries:
                    self._emit_block_msgs(self._drain_entry(e), now)
        if not ok and self._drain_q is not None:
            self._drain_q.join()   # every queued drain emitted at EOS
        return ok

    def _dispatch_bucket(self, bucket: _Bucket, slots: list,
                         x: np.ndarray, xw=None) -> dict:
        """Frame + dispatch every bank this bucket's slots need;
        returns a handle of DEVICE arrays (plus the mapping snapshot)
        for :meth:`_drain_bucket`.  ``xw`` is an already-uploaded
        packed window buffer (from the PSD share in _compute_block);
        when None and unsharded, the bucket frames packed itself —
        ONE H2D per bucket (int16 when ``in_i16``) feeds both banks."""
        import jax

        any_audio = any(s.class_name == "audio" for s in slots)
        any_digital = any(s.class_name in _DIGITAL for s in slots)
        # the [M, C] raw planes only cross to the host when a slot
        # actually consumes them there (raw payloads, estimators,
        # spectrum sources, non-block-aligned power); the digital
        # chain and block-aligned power consume them ON DEVICE
        need_host_raw = any(
            self._needs_host_raw(s, self._kslots[s.handle])
            for s in slots if s.handle in self._kslots)
        # block-aligned power slots need the RawBank DISPATCH (their
        # channel's block-power row) but not the host plane drain
        any_power_fast = any(
            s.class_name == "power"
            and s.handle in self._kslots
            and not self._needs_host_raw(s, self._kslots[s.handle])
            for s in slots)
        need_raw_compute = need_host_raw or any_digital or any_power_fast

        # device-side column compaction: only active-slot columns cross
        # to the host (kernels/compact.py; VERDICT r2 'drain only
        # active-slot columns').  cmap empty = fall back to full planes.
        comp = bool(bucket.cmap) and all(
            self._kslots[s.handle].idx in bucket.cmap for s in slots)

        h: dict = {"bucket": bucket, "slots": slots, "comp": comp,
                   "cmap": dict(bucket.cmap),
                   "need_host_raw": need_host_raw}
        if self._tmesh:
            # ("time","ch") mesh: the time-sharded wrappers own their
            # framing (input halos for the fused audio chain) — full
            # planes cross to the host, no compaction/packing
            audio = None
            if any_audio:
                h["audio"] = bucket.t_audio.feed(x, fetch=False)
                h["sq"] = bucket.audio._sq
                h["sq_level"] = bucket.audio._sq_level.copy()
                h["squelch"] = bucket.audio._squelch.copy()
            y_re = y_im = None
            if need_raw_compute:
                y_re, y_im = bucket.t_raw.feed(x, fetch=False)
            if any_digital:
                h["dig"] = bucket.t_rec.feed_planes(y_re, y_im,
                                                    fetch=False)
            if need_host_raw:
                h["raw"] = (y_re, y_im)
            if need_raw_compute:
                h["power"] = bucket.raw._power_dev
            return h
        packed = self._mesh is None
        if packed and xw is None:
            xw = jax.device_put(
                bucket.raw.frame_packed(x, i16=self._in_i16,
                                        i8=self._in_i8))
        frames = None if packed else bucket.raw.frame(x)

        audio = None
        if any_audio:
            audio = (bucket.audio.feed_packed(xw, fetch=False)
                     if packed else
                     bucket.audio.feed_frames(*frames, fetch=False))
            h["sq_level"] = bucket.audio._sq_level.copy()
            h["squelch"] = bucket.audio._squelch.copy()
        y_re = y_im = None
        if need_raw_compute:
            y_re, y_im = (bucket.raw.feed_packed(xw, fetch=False)
                          if packed else
                          bucket.raw.feed_frames(*frames, fetch=False))
        dig = None
        if any_digital:
            dig = bucket.rec.feed_planes(y_re, y_im, fetch=False)

        if comp and self._drain_pack and packed:
            # single-fetch drain: ONE dispatch packs audio + squelch +
            # power + digital + raw active columns as scaled int16 —
            # the whole drain pays one D2H round trip.  Sections too
            # narrow for the packer's lane grouping at this width
            # drain via their own int16 compactor instead (`sides`).
            if dig is not None and bucket.squeeze is not None:
                dig = bucket.squeeze.dispatch(*dig)
                h["squeezed"] = True
            packer, sides = self._get_packer(
                bucket, any_audio, any_digital, need_host_raw)
            h["packer"] = packer
            # per-section column maps, snapshotted with the dispatch
            # (pipelined drains must demap with the maps the pack was
            # built from)
            h["pmaps"] = {
                sec: {idx: col for col, idx in enumerate(cols)}
                for sec, cols in bucket.active_by.items()}
            h["pack"] = packer.dispatch(
                audio=audio if packer.cfg.has_audio else None,
                sq=bucket.audio._sq if any_audio else None,
                pw=(bucket.raw._power_dev
                    if need_raw_compute else None),
                dig=dig if packer.cfg.has_digital else None,
                raw=((y_re, y_im)
                     if packer.cfg.has_raw and need_host_raw
                     else None))
            if sides:
                h["sides"] = {
                    sec: (c_, c_.dispatch(
                        *{"audio": (audio,), "digital": tuple(dig),
                          "raw": (y_re, y_im)}[sec]))
                    for sec, c_ in sides.items()}
            return h

        if any_audio:
            h["audio"] = (bucket.comp_audio.dispatch(audio) if comp
                          else audio)
            h["sq"] = bucket.audio._sq        # this block's squelch rows
        if need_raw_compute:
            h["power"] = bucket.raw._power_dev
        if any_digital:
            h["dig"] = (bucket.comp_digital.dispatch(*dig)
                        if comp else dig)
        if need_host_raw:
            h["raw"] = (bucket.comp_raw.dispatch(y_re, y_im) if comp
                        else (y_re, y_im))
        return h

    def _digital_gain(self, ks: _KernelSlotExtra,
                      sym: np.ndarray) -> float:
        """Gain-control contract for the drained digital stream
        (reference InspectorCtl/GainControl.cpp): manual ``agc.gain``
        when AGC is off; when on, a power-EMA normalizer whose time
        constant is ``agc.ts`` symbol periods (the CPU inspectors'
        tau = ts·sps, inspectors/digital.py)."""
        c = ks.config
        if not bool(c["agc.enabled"]):
            ks.agc_ema = None
            return float(c["agc.gain"])
        if not len(sym):
            return 1.0
        p = float(np.mean(np.abs(sym) ** 2))
        baud = max(float(c["clock.baud"]), 1e-3)
        sps = max(2.0, ks.bucket.channel_rate / baud)
        tau = max(float(c["agc.ts"]) * sps, 1.0)
        alpha = 1.0 - np.exp(-len(sym) / tau)
        if ks.agc_ema is None:
            ks.agc_ema = p
        else:
            ks.agc_ema += alpha * (p - ks.agc_ema)
        return 1.0 / np.sqrt(max(ks.agc_ema, 1e-12))

    def _digital_gain_power(self, ks: _KernelSlotExtra, p: float,
                            n_elapsed: int) -> float:
        """Same gain contract as :meth:`_digital_gain`, but the power
        estimate is the device block-power row (pre-MF channel power)
        — the symbol-squeezed drain has no full-rate stream on the
        host to measure."""
        c = ks.config
        if not bool(c["agc.enabled"]):
            ks.agc_ema = None
            return float(c["agc.gain"])
        p = max(p, 1e-12)
        baud = max(float(c["clock.baud"]), 1e-3)
        sps = max(2.0, ks.bucket.channel_rate / baud)
        tau = max(float(c["agc.ts"]) * sps, 1.0)
        alpha = 1.0 - np.exp(-n_elapsed / tau)
        if ks.agc_ema is None:
            ks.agc_ema = p
        else:
            ks.agc_ema += alpha * (p - ks.agc_ema)
        return 1.0 / np.sqrt(max(ks.agc_ema, 1e-12))

    def _get_packer(self, bucket: _Bucket, any_audio: bool,
                    any_digital: bool, need_raw: bool):
        from sigdigger_tpu.kernels.drainpack import (
            A_SCALE,
            D_SCALE,
            R_SCALE,
            T_SCALE,
            DrainPacker,
            DrainPackerConfig,
        )

        def w8(n: int) -> int:
            w = 8
            while w < n:
                w *= 2
            return w

        ab = bucket.active_by
        block_out = bucket.raw.cfg.block_out
        dig_rows = (block_out // self._symbol_group
                    if bucket.squeeze is not None else block_out)
        w_a = w8(len(ab["audio"])) if any_audio else 0
        w_d = w8(len(ab["digital"])) if any_digital else 0
        w_r = w8(len(ab["raw"])) if need_raw else 0
        # the status tile carries every active slot; per-section widths
        # (powers of two × 8) divide it, so lane grouping always lines
        # up
        width = max(w8(len(bucket.active)), w_a, w_d, w_r)
        # a section much narrower than the buffer would need the
        # packer to hold `width/w_s` source tiles + selection rows per
        # output tile — past 2 lane groups that outgrows VMEM at large
        # widths, so such sections leave the packer for their own
        # int16 ColumnCompactor fetch (overlapped by the drain worker)
        side_a = any_audio and width > 2 * w_a
        side_d = any_digital and width > 2 * w_d
        side_r = need_raw and width > 2 * w_r
        key = (any_audio and not side_a, any_digital and not side_d,
               need_raw and not side_r, width,
               w_a if not side_a else 0, w_d if not side_d else 0,
               w_r if not side_r else 0, dig_rows)
        packer = bucket.packers.get(key)
        if packer is None:
            audio_rows = block_out // self._audio_decim
            # prefer small packer tiles: the 6-row status tile pads to
            # a whole m_tile of int16 zeros (0.5 MB of drain waste at
            # m_tile 256 × width 1024)
            groups = []
            if any_audio and not side_a:
                groups.append((audio_rows, width // w_a))
            if any_digital and not side_d:
                groups.append((dig_rows, width // w_d))
            if need_raw and not side_r:
                groups.append((block_out, width // w_r))
            m_tile = 0
            for mt in (64, 32, 16):
                if (audio_rows % mt or block_out % mt
                        or dig_rows % mt):
                    continue
                if all((rows // mt) % g == 0 for rows, g in groups):
                    m_tile = mt
                    break
            packer = DrainPacker(DrainPackerConfig(
                n_rows=block_out,
                audio_rows=audio_rows,
                n_channels=self._n_slots, width=width,
                has_audio=any_audio and not side_a,
                has_digital=any_digital and not side_d,
                has_raw=need_raw and not side_r,
                audio_width=w_a if not side_a else 0,
                digital_width=w_d if not side_d else 0,
                raw_width=w_r if not side_r else 0,
                digital_rows=dig_rows, m_tile=m_tile),
                interpret=self._interpret)
            packer.set_mappings(bucket.active, audio=ab["audio"],
                                digital=ab["digital"], raw=ab["raw"])
            bucket.packers[key] = packer
        sides = {}
        if side_a:
            sides["audio"] = self._get_side(
                bucket, "audio", w_a, block_out // self._audio_decim,
                1, (A_SCALE,), ab["audio"])
        if side_d:
            sides["digital"] = self._get_side(
                bucket, "digital", w_d, dig_rows, 3,
                (D_SCALE, D_SCALE, T_SCALE), ab["digital"])
        if side_r:
            sides["raw"] = self._get_side(
                bucket, "raw", w_r, block_out, 2,
                (R_SCALE, R_SCALE), ab["raw"])
        return packer, sides

    def _get_side(self, bucket: _Bucket, section: str, width: int,
                  rows: int, planes: int, scales: tuple,
                  slots: list[int]):
        key = (section, width, rows)
        comp = bucket.sides.get(key)
        if comp is None:
            tile = (128 if self._n_slots % 128 == 0
                    else self._n_slots)
            comp = ColumnCompactor(ColumnCompactorConfig(
                n_rows=rows, n_channels=self._n_slots, width=width,
                n_planes=planes, channel_tile=tile, out_i16=True,
                scales=scales), interpret=self._interpret)
            comp.set_mapping(slots)
            bucket.sides[key] = comp
        return comp

    def _drain_bucket(self, h: dict) -> list:
        bucket: _Bucket = h["bucket"]
        slots = h["slots"]
        comp = h["comp"]
        cmap = h["cmap"]
        audio_out = soft = strobe = y_re = y_im = power = None
        squelch_open = None
        if "pack" in h:
            sec = h["packer"].fetch(h["pack"],
                                    buf=h.get("_buf"))  # pack round trip
            n = self._n_slots
            audio_out = sec.get("audio")
            soft = sec.get("soft")
            strobe = sec.get("strobe")
            y_re, y_im = sec.get("y_re"), sec.get("y_im")
            # narrow sections arrive via their own compactor fetch
            for sname, (comp, hd) in h.get("sides", {}).items():
                planes = comp.fetch(hd)
                if sname == "audio":
                    audio_out = planes[0]
                elif sname == "digital":
                    soft = planes[0] + 1j * planes[1]
                    strobe = planes[2] > 0.5
                else:
                    y_re, y_im = planes
            if audio_out is not None:
                sq = np.zeros(n, np.float32)     # compact → full width
                for idx, w in cmap.items():
                    sq[idx] = sec["sq"][w]
                squelch_open = (~h["squelch"]) | (sq >= h["sq_level"])
            power = np.zeros(n, np.float32)
            for idx, w in cmap.items():
                power[idx] = sec["power"][w]
        else:
            if "audio" in h:
                if comp:
                    audio_out = bucket.comp_audio.fetch(h["audio"])[0]
                else:
                    audio_out = np.asarray(h["audio"])
                sq = np.asarray(h["sq"])[0]
                squelch_open = (~h["squelch"]) | (sq >= h["sq_level"])
            if "dig" in h:
                if comp:
                    c_sr, c_si, c_st = bucket.comp_digital.fetch(
                        h["dig"])
                else:
                    c_sr, c_si, c_st = (np.asarray(a) for a in h["dig"])
                soft = c_sr + 1j * c_si
                strobe = c_st > 0.5
            if "raw" in h:
                if comp:
                    y_re, y_im = bucket.comp_raw.fetch(h["raw"])
                else:
                    y_re, y_im = (np.asarray(a) for a in h["raw"])
            # block power crosses only if a slot actually consumes it
            # on the host (raw AGC, or a block-aligned power slot on
            # the device fast path) — one RTT per fetch
            def _uses_power(s):
                ks = self._kslots.get(s.handle)
                if ks is None:
                    return False
                if s.class_name == "raw":
                    return bool(ks.config["agc.enabled"])
                return (s.class_name == "power"
                        and not self._needs_host_raw(s, ks))
            if "power" in h and any(_uses_power(s) for s in slots):
                power = np.asarray(h["power"])[0]

        msgs = []
        pmaps = h.get("pmaps")
        for slot in slots:
            # a control thread may close a slot while its last block
            # is still in flight (pipeline_depth > 1): closed slots
            # simply stop producing messages (reference close
            # semantics) instead of crashing the drain
            ks = self._kslots.get(slot.handle)
            if ks is None:
                continue
            idx = cmap[ks.idx] if comp else ks.idx
            # the packed drain compacts each section at its own width
            # (kernels/drainpack.py) — demap with the per-section maps
            # snapshotted at dispatch; a slot missing from its class
            # map (membership changed mid-flight) skips that section
            # for this lagged block rather than indexing a wrong column
            if "pack" in h:
                a_idx = pmaps["audio"].get(ks.idx)
                d_idx = pmaps["digital"].get(ks.idx)
                r_idx = pmaps["raw"].get(ks.idx)
                if slot.class_name == "audio" and a_idx is None:
                    continue
                if slot.class_name in _DIGITAL and d_idx is None:
                    continue
                if slot.class_name == "raw" and r_idx is None:
                    continue
                if (slot.class_name == "power" and r_idx is None
                        and self._needs_host_raw(slot, ks)):
                    continue
            else:
                a_idx = d_idx = r_idx = idx
            c = ks.config
            raw_col = None
            if y_re is not None and r_idx is not None and (
                    slot.class_name in ("raw", "power")
                    or slot.estimators or slot.spectrum_source):
                raw_col = (y_re[:, r_idx]
                           + 1j * y_im[:, r_idx]).astype(np.complex64)
            name = slot.class_name
            if name == "audio":
                aud = audio_out[:, a_idx]
                if ks.resampler is not None:
                    aud = ks.resampler(aud)
                extras = {"squelch_open": bool(squelch_open[ks.idx])}
                msgs.append((slot, aud, extras, raw_col))
            elif name == "raw":
                if bool(c["agc.enabled"]):
                    # power-EMA follower honoring agc.ts (the block
                    # power crossed in the status drain seeds it)
                    p = max(float(power[ks.idx]), 1e-12)
                    # raw agc.ts is in channel samples (CPU path
                    # inspectors/simple.py: AGCParams(tau=agc.ts))
                    tau = max(float(c["agc.ts"]), 1.0)
                    alpha = 1.0 - np.exp(-len(raw_col) / tau)
                    if ks.agc_ema is None:
                        ks.agc_ema = p
                    else:
                        ks.agc_ema += alpha * (p - ks.agc_ema)
                    g = 1.0 / np.sqrt(max(ks.agc_ema, 1e-12))
                else:
                    ks.agc_ema = None
                    g = float(c["agc.gain"])
                msgs.append((slot, raw_col * np.float32(g), {}, raw_col))
            elif name == "power":
                n_int = max(1, int(c["power.integrate-samples"]))
                out = []
                if raw_col is None:
                    # device fast path: block-aligned integration on
                    # the [1, C] block-power row (mean |y|² × M) —
                    # the raw plane never crossed to the host
                    m_blk = bucket.raw.cfg.block_out
                    ks.pw_acc += float(power[ks.idx]) * m_blk
                    ks.pw_cnt += m_blk
                    if ks.pw_cnt >= n_int:
                        out.append(np.sqrt(ks.pw_acc / n_int))
                        ks.pw_acc, ks.pw_cnt = 0.0, 0
                else:
                    p = (raw_col.real.astype(np.float64) ** 2
                         + raw_col.imag.astype(np.float64) ** 2)
                    pos = 0
                    while pos < len(p):
                        take = min(n_int - ks.pw_cnt, len(p) - pos)
                        ks.pw_acc += float(p[pos:pos + take].sum())
                        ks.pw_cnt += take
                        pos += take
                        if ks.pw_cnt == n_int:
                            out.append(np.sqrt(ks.pw_acc / n_int))
                            ks.pw_acc, ks.pw_cnt = 0.0, 0
                msgs.append((slot, np.asarray(out, np.float32), {},
                             raw_col))
            else:                              # psk / fsk / ask
                sym = soft[:, d_idx]
                st = strobe[:, d_idx]
                if name != "fsk":              # fsk is amp-invariant
                    if h.get("squeezed") and power is not None:
                        g = self._digital_gain_power(
                            ks, float(power[ks.idx]),
                            bucket.raw.cfg.block_out)
                    else:
                        g = self._digital_gain(ks, sym)
                    sym = sym * np.float32(g)
                if name == "psk":
                    bps = max(1, int(c["afc.bits-per-symbol"]))
                    ids = _decide_phase(sym, bps)
                    extras = {"strobes": st, "symbols": ids}
                    msgs.append((slot, sym, extras, raw_col))
                elif name == "fsk":
                    bps = max(1, int(c["fsk.bits-per-symbol"]))
                    vals = np.real(sym)
                    if st.any():
                        # per-slot EMA-tracked decision span: symbol
                        # boundaries stay put across blocks (reference
                        # Decider fixed min/max,
                        # InspectorUI.cpp:229-250), instead of the
                        # per-block adaptive max (r4 VERDICT weak #5)
                        m = float(np.max(np.abs(vals[st])))
                        ks.dec_span = m if ks.dec_span is None else \
                            ks.dec_span + 0.1 * (m - ks.dec_span)
                        span = max(ks.dec_span, 1e-12)
                        ids = _decide_interval(
                            vals[st], -span * (1 + 1e-6),
                            span * (1 + 1e-6), bps)
                    else:
                        ids = np.zeros(0, np.uint8)
                    extras = {"strobes": st, "symbols": ids}
                    msgs.append((slot, vals, extras, raw_col))
                else:
                    bps = max(1, int(c["ask.bits-per-symbol"]))
                    vals = np.real(sym)
                    if st.any():
                        m = float(np.max(vals[st]))
                        ks.dec_vmax = m if ks.dec_vmax is None else \
                            ks.dec_vmax + 0.1 * (m - ks.dec_vmax)
                        ids = _decide_amplitude(
                            vals[st], bps,
                            vmax=max(ks.dec_vmax, 1e-12))
                    else:
                        ids = np.zeros(0, np.uint8)
                    extras = {"strobes": st, "symbols": ids}
                    msgs.append((slot, vals, extras, raw_col))
        return msgs
