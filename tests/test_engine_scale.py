"""Engine-at-scale drain machinery (r4 VERDICT items 1 and 5).

Covers the pieces that let the KernelAnalyzer serve ~1024 open
inspectors: bulk deferred configuration, the device power fast path,
the device symbol-rate squeeze, side-compactor drains for sections too
narrow for the packer, the threaded drain, and EMA-stable decision
ranges — all on small interpret-mode sessions (identical program on
TPU)."""

import numpy as np

from sigdigger_tpu.analyzer.kernel_engine import KernelAnalyzer
from sigdigger_tpu.analyzer.messages import MessageKind
from sigdigger_tpu.profiles import SourceProfile
from sigdigger_tpu.sources import Emitter, SynthBandSource
from sigdigger_tpu.sources.base import SignalSource
from sigdigger_tpu.types import AnalyzerParams, Channel

FS = 256_000
BLOCK = 32768


def make_engine(emitters, seed=1, **kw):
    prof = SourceProfile(type="synth", sample_rate=FS, freq=0.0)
    src = SynthBandSource(prof, emitters, seed=seed)
    params = AnalyzerParams()
    params.window_size = 4096
    kw.setdefault("decimation", 16)
    kw.setdefault("n_slots", 32)
    kw.setdefault("compact_cols", 32)
    return KernelAnalyzer(source=src, params=params,
                          block_size=BLOCK, interpret=True, **kw)


def samples_by_handle(an, steps):
    out: dict[int, list] = {}
    extras: dict[int, list] = {}
    for _ in range(steps):
        assert an.step()
        for m in an.poll():
            if m.kind == MessageKind.SAMPLES:
                out.setdefault(m.handle, []).append(m.samples)
                extras.setdefault(m.handle, []).append(m.extras)
    if an._drain_q is not None:
        an._drain_q.join()
        for m in an.poll():
            if m.kind == MessageKind.SAMPLES:
                out.setdefault(m.handle, []).append(m.samples)
                extras.setdefault(m.handle, []).append(m.extras)
    return out, extras


def mixed_opens(an):
    handles = {}
    handles["aud"] = [an.open_inspector(
        "audio", Channel(fc=-60e3 + i * 8e3, bw=8e3),
        config={"audio.demodulator": 2, "audio.volume": 1.0,
                "audio.sample-rate": an.audio_rate})
        for i in range(4)]
    handles["psk"] = [an.open_inspector(
        "psk", Channel(fc=40e3 + i * 8e3, bw=6e3),
        config={"afc.bits-per-symbol": 2,
                "clock.baud": an.channel_rate / 8.0})
        for i in range(2)]
    handles["pow"] = [an.open_inspector(
        "power", Channel(fc=0.0, bw=4e3),
        config={"power.integrate-samples": BLOCK // 16})]
    return handles


def test_bulk_config_equivalence():
    """bulk_config() defers constant uploads/compact refreshes but the
    resulting session is byte-identical to per-call configuration."""
    emitters = [Emitter(freq=-60e3, amplitude=1.0, fm_rate=300.0,
                        fm_dev=2e3),
                Emitter(freq=40e3, amplitude=1.0, kind="psk",
                        baud=2000.0, order=4, seed=5)]
    a = make_engine(emitters)
    ha = mixed_opens(a)
    b = make_engine(emitters)
    with b.bulk_config():
        hb = mixed_opens(b)
    a.poll()
    b.poll()
    sa, _ = samples_by_handle(a, 3)
    sb, _ = samples_by_handle(b, 3)
    for k in ("aud", "psk", "pow"):
        for h1, h2 in zip(ha[k], hb[k]):
            v1 = np.concatenate([np.atleast_1d(v) for v in sa[h1]])
            v2 = np.concatenate([np.atleast_1d(v) for v in sb[h2]])
            np.testing.assert_array_equal(v1, v2, err_msg=k)


def test_power_fast_path_matches_host_integration():
    """A power inspector with block-aligned integration rides the
    device block-power row (raw plane never drained); its RMS matches
    the host-integrated path on the same channel."""
    an = make_engine([Emitter(freq=10e3, amplitude=0.8)])
    block_out = BLOCK // 16
    h_fast = an.open_inspector(
        "power", Channel(fc=10e3, bw=4e3),
        config={"power.integrate-samples": block_out})
    h_host = an.open_inspector(
        "power", Channel(fc=10e3, bw=4e3),
        config={"power.integrate-samples": block_out // 2})
    ks_fast = an._kslots[h_fast]
    ks_host = an._kslots[h_host]
    slot_f = an._inspectors[h_fast]
    slot_h = an._inspectors[h_host]
    assert not an._needs_host_raw(slot_f, ks_fast)
    assert an._needs_host_raw(slot_h, ks_host)
    an.poll()
    out, _ = samples_by_handle(an, 4)
    v_fast = np.concatenate(out[h_fast])
    v_host = np.concatenate(out[h_host])
    assert len(v_fast) >= 3 and len(v_host) >= 6
    # stationary tone: both integrators converge to the same RMS
    assert abs(np.mean(v_fast[1:]) - np.mean(v_host[2:])) \
        < 0.02 * np.mean(v_host[2:])


def test_symbol_squeeze_equivalence():
    """symbol_group=4 drains the digital planes at quarter rate with
    the strobed symbols bit-identical to the full-rate drain."""
    emitters = [Emitter(freq=40e3, amplitude=1.0, kind="psk",
                        baud=2000.0, order=4, seed=9)]
    # AGC off: the squeezed drain estimates gain from the device
    # block-power row rather than the full-rate stream (documented
    # deviation) — with AGC off both paths are bit-identical
    cfgs = {"afc.bits-per-symbol": 2, "clock.baud": 2000.0,
            "agc.enabled": False, "agc.gain": 1.0}
    a = make_engine(emitters)
    ha = a.open_inspector("psk", Channel(fc=40e3, bw=6e3), config=cfgs)
    b = make_engine(emitters, symbol_group=4)
    assert b._buckets[16].squeeze is not None
    hb = b.open_inspector("psk", Channel(fc=40e3, bw=6e3), config=cfgs)
    a.poll()
    b.poll()
    sa, ea = samples_by_handle(a, 4)
    sb, eb = samples_by_handle(b, 4)
    for blk in range(4):
        st_a = ea[ha][blk]["strobes"]
        st_b = eb[hb][blk]["strobes"]
        assert len(st_b) == len(st_a) // 4
        assert st_a.sum() == st_b.sum()
        np.testing.assert_allclose(
            sa[ha][blk][st_a], sb[hb][blk][st_b], rtol=0, atol=1e-6)
        np.testing.assert_array_equal(
            ea[ha][blk]["symbols"][st_a],
            eb[hb][blk]["symbols"][st_b])


def test_side_compactor_digital_drain():
    """A wide session (17 audio + 2 psk → pack width 32, digital width
    8) routes the digital section through its own int16 compactor;
    the psk stream matches a single-inspector session bit-for-bit."""
    emitters = [Emitter(freq=-60e3 + i * 6e3, amplitude=0.6,
                        fm_rate=200.0 + 20 * i, fm_dev=1.5e3)
                for i in range(3)] + [
        Emitter(freq=40e3, amplitude=1.0, kind="psk", baud=2000.0,
                order=4, seed=11)]
    cfg = {"afc.bits-per-symbol": 2, "clock.baud": 2000.0}
    wide = make_engine(emitters)
    with wide.bulk_config():
        for i in range(17):
            wide.open_inspector(
                "audio", Channel(fc=-60e3 + (i % 3) * 6e3, bw=8e3),
                config={"audio.demodulator": 2, "audio.volume": 1.0,
                        "audio.sample-rate": wide.audio_rate})
        hw = wide.open_inspector("psk", Channel(fc=40e3, bw=6e3),
                                 config=cfg)
        wide.open_inspector("psk", Channel(fc=48e3, bw=6e3),
                            config=cfg)
    small = make_engine(emitters)
    hs = small.open_inspector("psk", Channel(fc=40e3, bw=6e3),
                              config=cfg)
    wide.poll()
    small.poll()
    # confirm the wide session actually used a side compactor
    wide.step()
    wide.poll()
    bucket = wide._buckets[16]
    assert any(k[0] == "digital" for k in bucket.sides), \
        "expected the digital section to leave the packer"
    sw, ew = samples_by_handle(wide, 3)
    ss, es = samples_by_handle(small, 4)
    for blk in range(3):
        np.testing.assert_allclose(sw[hw][blk], ss[hs][blk + 1],
                                   rtol=0, atol=1e-6)
        np.testing.assert_array_equal(ew[hw][blk]["strobes"],
                                      es[hs][blk + 1]["strobes"])


def test_drain_thread_matches_sync():
    """drain_thread=True moves fetch/demap/emission off the step path;
    the emitted message stream is identical to the synchronous
    engine's."""
    emitters = [Emitter(freq=-60e3, amplitude=1.0, fm_rate=300.0,
                        fm_dev=2e3),
                Emitter(freq=40e3, amplitude=1.0, kind="psk",
                        baud=2000.0, order=4, seed=5)]
    a = make_engine(emitters, pipeline_depth=2)
    ha = mixed_opens(a)
    b = make_engine(emitters, pipeline_depth=2, drain_thread=True)
    hb = mixed_opens(b)
    a.poll()
    b.poll()
    sa, _ = samples_by_handle(a, 4)
    sb, _ = samples_by_handle(b, 4)
    assert b._drain_worker is not None and b._drain_worker.is_alive()
    for k in ("aud", "psk", "pow"):
        for h1, h2 in zip(ha[k], hb[k]):
            v1 = np.concatenate([np.atleast_1d(v) for v in sa[h1]])
            v2 = np.concatenate([np.atleast_1d(v) for v in sb[h2]])
            np.testing.assert_array_equal(v1, v2, err_msg=k)


def test_kernel_checkpoint_resume_bit_exact(tmp_path):
    """save_checkpoint on the shipping KernelAnalyzer (r4 VERDICT
    item 3 — it used to raise AttributeError) serializes every bank
    carry: the restored session's output stream is bit-identical to
    the uninterrupted run."""
    from sigdigger_tpu.analyzer.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    prof0 = SourceProfile(type="synth", sample_rate=FS, freq=0.0)
    gen = SynthBandSource(prof0, [
        Emitter(freq=-60e3, amplitude=1.0, fm_rate=300.0, fm_dev=2e3),
        Emitter(freq=40e3, amplitude=1.0, kind="psk", baud=2000.0,
                order=4, seed=5)], seed=1)
    cap = tmp_path / "cap.cf32"
    np.asarray(gen.read(BLOCK * 8)).tofile(cap)

    def build():
        prof = SourceProfile(type="file", path=str(cap),
                             sample_rate=FS)
        params = AnalyzerParams()
        params.window_size = 4096
        return KernelAnalyzer(profile=prof, params=params,
                              block_size=BLOCK, decimation=16,
                              n_slots=32, compact_cols=32)

    def opens(an):
        h = {}
        h["aud"] = an.open_inspector(
            "audio", Channel(fc=-60e3, bw=8e3),
            config={"audio.demodulator": 2, "audio.volume": 1.0,
                    "audio.sample-rate": an.audio_rate})
        h["psk"] = an.open_inspector(
            "psk", Channel(fc=40e3, bw=6e3),
            config={"afc.bits-per-symbol": 2, "clock.baud": 2000.0})
        h["pow"] = an.open_inspector(
            "power", Channel(fc=40e3, bw=4e3),
            config={"power.integrate-samples": BLOCK // 16})
        return h

    a = build()
    ha = opens(a)
    a.poll()
    for _ in range(3):
        assert a.step()
    a.poll()
    ckpt = str(tmp_path / "state.sdckpt")
    save_checkpoint(a, ckpt)
    pos = a.source.position
    sa, ea = samples_by_handle(a, 3)          # blocks 4..6, original

    b = load_checkpoint(ckpt)
    assert b.source.position == pos
    assert len(b._inspectors) == 3
    sb, eb = samples_by_handle(b, 3)          # blocks 4..6, restored
    by_id_b = {b._inspectors[h].inspector_id: h for h in sb}
    for k in ("aud", "psk", "pow"):
        h1 = ha[k]
        h2 = by_id_b[a._inspectors[h1].inspector_id]
        for blk in range(3):
            np.testing.assert_array_equal(
                np.atleast_1d(sa[h1][blk]), np.atleast_1d(sb[h2][blk]),
                err_msg=f"{k} block {blk}")
            if k == "psk":
                np.testing.assert_array_equal(
                    ea[h1][blk]["strobes"], eb[h2][blk]["strobes"])
    # the PSD EMA resumed, not restarted
    np.testing.assert_allclose(a._spectrum.shifted(),
                               b._spectrum.shifted(), rtol=1e-5)


class _FskSource(SignalSource):
    """Deterministic phase-continuous 4-FSK + AWGN at fixed SNR."""

    LEVELS = np.array([-1.0, -1.0 / 3.0, 1.0 / 3.0, 1.0])

    def __init__(self, profile, fc, dev, sym_len, noise=0.05):
        super().__init__(profile)
        self._fc = fc
        self._dev = dev
        self._sym = sym_len
        self._noise = noise
        self._pos = 0
        self._phase = 0.0
        self._rng = np.random.default_rng(42)

    def _read_impl(self, n):
        t = np.arange(self._pos, self._pos + n)
        sym = (t // self._sym) % 4
        f = self._fc + self.LEVELS[sym] * self._dev
        dphi = 2.0 * np.pi * f / FS
        phi = self._phase + np.cumsum(dphi)
        self._phase = float(phi[-1] % (2.0 * np.pi))
        self._pos += n
        x = np.exp(1j * phi).astype(np.complex64)
        x += (self._noise * (self._rng.standard_normal(n)
                             + 1j * self._rng.standard_normal(n))
              ).astype(np.complex64)
        return x


def test_fsk_decider_range_is_stable_across_blocks():
    """Constant-SNR 4-FSK: the EMA-tracked decision span keeps the
    level→symbol-id mapping identical across block boundaries
    (reference Decider fixed min/max; r4 VERDICT weak #5)."""
    prof = SourceProfile(type="synth", sample_rate=FS, freq=0.0)
    # sps = 8 at channel rate fs/16: symbol = 128 input samples
    src = _FskSource(prof, fc=20e3, dev=3e3, sym_len=128)
    params = AnalyzerParams()
    params.window_size = 4096
    an = KernelAnalyzer(source=src, params=params, block_size=BLOCK,
                        decimation=16, interpret=True, n_slots=32,
                        compact_cols=32)
    h = an.open_inspector(
        "fsk", Channel(fc=20e3, bw=10e3),
        config={"fsk.bits-per-symbol": 2,
                "clock.baud": an.channel_rate / 8.0})
    an.poll()
    out, ext = samples_by_handle(an, 8)
    ks = an._kslots[h]
    assert ks.dec_span is not None
    per_block_maps = []
    for blk in range(4, 8):          # loops + span EMA settled
        vals = out[h][blk]
        st = ext[h][blk]["strobes"]
        ids = ext[h][blk]["symbols"]
        v = vals[st]
        span = ks.dec_span
        mapping = {}
        for tone, lo, hi in ((0, -1.2, -0.7), (1, -0.55, -0.12),
                             (2, 0.12, 0.55), (3, 0.7, 1.2)):
            sel = (v >= lo * span) & (v <= hi * span)
            if sel.any():
                u = np.unique(ids[sel])
                assert len(u) == 1, (blk, tone, u)
                mapping[tone] = int(u[0])
        per_block_maps.append(mapping)
    # the same physical tone decides to the same symbol id in every
    # block — no per-block range drift
    base = per_block_maps[0]
    assert base.keys() >= {0, 1, 2, 3}
    for m in per_block_maps[1:]:
        for tone, sid in m.items():
            assert base.get(tone, sid) == sid


def test_drain_thread_survives_control_churn():
    """Open/close/retune/reconfigure from a control thread while the
    engine streams with the threaded drain: no crashes, messages keep
    flowing, closed slots just stop producing (reference async
    inspector semantics under the r5 drain worker)."""
    import threading

    emitters = [Emitter(freq=-60e3, amplitude=1.0, fm_rate=300.0,
                        fm_dev=2e3),
                Emitter(freq=40e3, amplitude=1.0, kind="psk",
                        baud=2000.0, order=4, seed=5)]
    an = make_engine(emitters, pipeline_depth=2, drain_thread=True,
                     symbol_group=2)
    h0 = an.open_inspector(
        "audio", Channel(fc=-60e3, bw=8e3),
        config={"audio.demodulator": 2, "audio.volume": 1.0,
                "audio.sample-rate": an.audio_rate})
    an.poll()
    stop = threading.Event()
    errors: list = []

    def churn():
        import random
        rng = random.Random(3)
        handles = []
        try:
            while not stop.is_set():
                op = rng.random()
                if op < 0.35:
                    cls = "psk" if rng.random() < 0.5 else "audio"
                    cfg = ({"clock.baud": 2000.0} if cls == "psk"
                           else {"audio.demodulator": 2})
                    handles.append(an.open_inspector(
                        cls, Channel(fc=rng.uniform(-80e3, 80e3),
                                     bw=8e3), config=cfg))
                elif op < 0.6 and handles:
                    an.close_inspector(handles.pop())
                elif op < 0.8:
                    an.set_inspector_freq(h0, rng.uniform(-70e3, -50e3))
                else:
                    an.set_inspector_config(
                        h0, {"audio.volume": rng.uniform(0.2, 1.0),
                             "audio.squelch": rng.random() < 0.5})
        except Exception as e:  # noqa: BLE001 — the test's assertion
            errors.append(e)

    t = threading.Thread(target=churn)
    t.start()
    n_samples = 0
    try:
        for _ in range(8):
            assert an.step()
            for m in an.poll():
                if m.kind == MessageKind.SAMPLES:
                    n_samples += 1
    finally:
        stop.set()
        t.join(timeout=10)
    if an._drain_q is not None:
        an._drain_q.join()
    n_samples += sum(m.kind == MessageKind.SAMPLES for m in an.poll())
    assert not errors, errors
    assert n_samples >= 8          # the original inspector kept flowing


def test_kernel_checkpoint_multi_bucket_with_squeeze(tmp_path):
    """Checkpoint/resume across MULTIPLE decimation buckets with the
    symbol squeeze active: slots land back in their original buckets
    and columns, and the streams resume bit-exact."""
    from sigdigger_tpu.analyzer.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    prof0 = SourceProfile(type="synth", sample_rate=FS, freq=0.0)
    gen = SynthBandSource(prof0, [
        Emitter(freq=-60e3, amplitude=1.0, fm_rate=300.0, fm_dev=2e3),
        Emitter(freq=40e3, amplitude=1.0, kind="psk", baud=2000.0,
                order=4, seed=5)], seed=1)
    cap = tmp_path / "cap.cf32"
    np.asarray(gen.read(BLOCK * 8)).tofile(cap)

    def build():
        prof = SourceProfile(type="file", path=str(cap),
                             sample_rate=FS)
        params = AnalyzerParams()
        params.window_size = 4096
        return KernelAnalyzer(profile=prof, params=params,
                              block_size=BLOCK, decimation=16,
                              decimations=(16, 32), n_slots=32,
                              compact_cols=32, symbol_group=2)

    a = build()
    # wide audio -> fast bucket; narrow psk -> slow bucket
    h_aud = a.open_inspector(
        "audio", Channel(fc=-60e3, bw=12e3),
        config={"audio.demodulator": 2, "audio.volume": 1.0,
                "audio.sample-rate": a.audio_rate})
    h_psk = a.open_inspector(
        "psk", Channel(fc=40e3, bw=3e3),
        config={"afc.bits-per-symbol": 2, "clock.baud": 2000.0})
    assert a._kslots[h_aud].bucket.decimation != \
        a._kslots[h_psk].bucket.decimation
    a.poll()
    for _ in range(3):
        assert a.step()
    a.poll()
    ck = str(tmp_path / "mb.sdckpt")
    save_checkpoint(a, ck)
    sa, ea = samples_by_handle(a, 3)

    b = load_checkpoint(ck)
    assert len(b._inspectors) == 2
    sb, eb = samples_by_handle(b, 3)
    by_id = {b._inspectors[h].inspector_id: h for h in sb}
    for h1 in (h_aud, h_psk):
        h2 = by_id[a._inspectors[h1].inspector_id]
        for blk in range(3):
            np.testing.assert_array_equal(
                np.atleast_1d(sa[h1][blk]),
                np.atleast_1d(sb[h2][blk]))
