"""KernelAnalyzer — the dynamic analyzer engine on the Pallas path.

The VERDICT round-1 top gap: the full-featured analyzer must execute on
the TPU kernel set (interpret mode here; identical program on TPU),
with open/retune/close as constant updates, never a recompile
(reference Suscan/Analyzer.cpp:411-598 async inspector protocol;
SURVEY.md §7 "dynamic channel open/close without recompile")."""

import numpy as np
import pytest

from sigdigger_tpu.analyzer.kernel_engine import KernelAnalyzer
from sigdigger_tpu.analyzer.messages import (
    InspectorMessageKind,
    MessageKind,
)
from sigdigger_tpu.profiles import SourceProfile
from sigdigger_tpu.sources import Emitter, SynthBandSource
from sigdigger_tpu.types import AnalyzerParams, Channel

FS = 256_000


def make_engine(emitters, **kw):
    prof = SourceProfile(type="synth", sample_rate=FS, freq=0.0)
    src = SynthBandSource(prof, emitters, seed=1)
    params = AnalyzerParams()
    params.window_size = 4096
    kw.setdefault("decimation", 16)
    return KernelAnalyzer(source=src, params=params,
                          block_size=32768, interpret=True, **kw)


def drain(an, kinds=None):
    msgs = an.poll()
    if kinds is None:
        return msgs
    return [m for m in msgs if m.kind in kinds]


def tone_snr(a, f, rate, skip):
    a = np.asarray(a, np.float64)[skip:]
    a = a - a.mean()
    t = np.arange(skip, skip + len(a)) / rate
    s, c = np.sin(2 * np.pi * f * t), np.cos(2 * np.pi * f * t)
    fit = 2 * np.mean(a * s) * s + 2 * np.mean(a * c) * c
    return 10 * np.log10(np.mean(fit ** 2)
                         / max(np.mean((a - fit) ** 2), 1e-30))


def test_engine_psd_and_fm_audio_end_to_end():
    """File-style source → PSD messages + FM audio inspector, all on
    the kernel path."""
    fa, dev, f0 = 200.0, 2000.0, 60e3
    an = make_engine([Emitter(freq=f0, amplitude=1.0,
                               fm_rate=fa, fm_dev=dev)])
    h = an.open_inspector("audio", Channel(fc=f0, bw=12e3),
                          request_id=7,
                          config={"audio.demodulator": 2,
                                  "audio.volume": 1.0,
                                  "audio.sample-rate":
                                      int(an.audio_rate),
                                  "agc.enabled": False})
    msgs = drain(an)
    opens = [m for m in msgs if m.kind == MessageKind.INSPECTOR
             and m.inspector_kind == InspectorMessageKind.OPEN]
    assert len(opens) == 1 and opens[0].request_id == 7
    assert opens[0].equiv_rate == an.channel_rate

    audio = []
    psd_seen = 0
    for _ in range(20):
        assert an.step()
        for m in an.poll():
            if m.kind == MessageKind.PSD:
                psd_seen += 1
                freqs = np.linspace(-FS / 2, FS / 2, len(m.data),
                                    endpoint=False)
                peak = freqs[int(np.argmax(m.data))]
                # FM spectrum: the peak wanders within the deviation
                assert abs(peak - f0) < dev + 2 * FS / 4096
            elif m.kind == MessageKind.SAMPLES and m.handle == h:
                audio.append(m.samples)
    assert psd_seen >= 1
    a = np.concatenate(audio)
    assert tone_snr(a, fa, an.audio_rate, skip=512) > 25.0


def test_engine_am_ssb_and_power_slots():
    """AM + USB + power inspectors sharing one kernel-path engine."""
    fa = 300.0
    an = make_engine([
        Emitter(freq=50e3, amplitude=1.0, kind="am", am_rate=fa,
                am_index=0.5),
        Emitter(freq=-30e3 + 240.0, amplitude=0.7)])
    h_am = an.open_inspector("audio", Channel(fc=50e3, bw=8e3),
                             config={"audio.demodulator": 1,
                                     "audio.cutoff": 1000.0,
                                     "audio.volume": 1.0,
                                     "audio.sample-rate":
                                         int(an.audio_rate),
                                     "agc.enabled": False})
    h_usb = an.open_inspector("audio", Channel(fc=-30e3, bw=4e3),
                              config={"audio.demodulator": 3,
                                      "audio.cutoff": 1000.0,
                                      "audio.volume": 1.0,
                                      "audio.sample-rate":
                                          int(an.audio_rate),
                                      "agc.enabled": False})
    h_pw = an.open_inspector("power", Channel(fc=50e3, bw=8e3),
                             config={"power.integrate-samples": 256})
    out = {h_am: [], h_usb: [], h_pw: []}
    for _ in range(24):
        assert an.step()
        for m in an.poll():
            if m.kind == MessageKind.SAMPLES:
                out[m.handle].append(m.samples)
    am = np.concatenate(out[h_am])
    usb = np.concatenate(out[h_usb])
    pw = np.concatenate(out[h_pw])
    assert tone_snr(am, fa, an.audio_rate, skip=1536) > 20.0
    assert tone_snr(usb, 240.0, an.audio_rate, skip=512) > 20.0
    # AM channel power ≈ 1 + m²/2 ≈ 1.12 → RMS ≈ 1.06
    assert len(pw) > 4
    assert abs(np.mean(pw[2:]) - 1.06) < 0.15


def test_engine_psk_inspector():
    an = make_engine([Emitter(freq=-70e3, amplitude=1.0,
                               kind="psk", baud=2000.0, order=4,
                               seed=11)])
    h = an.open_inspector("psk", Channel(fc=-70e3, bw=6e3),
                          config={"afc.bits-per-symbol": 2,
                                  "clock.baud": 2000.0,
                                  "clock.gain": 0.08,
                                  "afc.loop-bw": 0.005})
    syms = []
    for _ in range(24):
        assert an.step()
        for m in an.poll():
            if m.kind == MessageKind.SAMPLES and m.handle == h:
                s = m.samples[m.extras["strobes"]]
                syms.append(s)
    got = np.concatenate(syms)
    assert len(got) > 0.8 * 2000 * 24 * 32768 / FS
    tail = got[len(got) // 2:]
    conc = np.abs(np.mean(np.exp(1j * np.angle(tail ** 4))))
    assert conc > 0.85, conc


def test_engine_open_retune_close_no_recompile():
    """The SURVEY §7 contract: inspector lifecycle never rebuilds any
    compiled kernel."""
    an = make_engine([Emitter(freq=10e3, amplitude=1.0)])
    calls = (an._audio_bank._call, an._raw_bank._call,
             an._rec_bank._call, an._spectrum._call)

    h1 = an.open_inspector("audio", Channel(fc=10e3, bw=4e3))
    h2 = an.open_inspector("psk", Channel(fc=-20e3, bw=4e3))
    an.step()
    an.set_inspector_freq(h1, -5e3)
    an.set_inspector_bandwidth(h1, 6e3)
    an.set_inspector_config(h1, {"audio.demodulator": 4,
                                 "audio.volume": 0.5})
    an.set_inspector_config(h2, {"clock.baud": 1000.0,
                                 "afc.bits-per-symbol": 3})
    an.step()
    an.close_inspector(h2)
    h3 = an.open_inspector("raw", Channel(fc=0.0, bw=4e3))
    an.step()
    an.close_inspector(h3)
    an.close_inspector(h1)
    an.step()
    assert (an._audio_bank._call, an._raw_bank._call,
            an._rec_bank._call, an._spectrum._call) == calls
    # acks all arrived
    kinds = [m.inspector_kind for m in an.poll()
             if m.kind == MessageKind.INSPECTOR]
    for want in (InspectorMessageKind.OPEN,
                 InspectorMessageKind.SET_FREQ,
                 InspectorMessageKind.SET_BANDWIDTH,
                 InspectorMessageKind.SET_CONFIG,
                 InspectorMessageKind.CLOSE):
        assert want in kinds


def test_engine_slot_exhaustion():
    an = make_engine([Emitter(freq=0.0, amplitude=1.0)], n_slots=8)
    for i in range(8):
        an.open_inspector("raw", Channel(fc=i * 1e3, bw=2e3))
    with pytest.raises(RuntimeError):
        an.open_inspector("raw", Channel(fc=99e3, bw=2e3))
    msgs = [m for m in an.poll() if m.kind == MessageKind.INSPECTOR]
    assert any(m.inspector_kind == InspectorMessageKind.WRONG_OBJECT
               for m in msgs)
    # closing one frees a slot
    an.close_inspector(1)
    an.open_inspector("raw", Channel(fc=99e3, bw=2e3))


def test_engine_estimators_and_spectrum_source():
    """Baud estimator + per-inspector secondary spectrum on the kernel
    path (raw tap feeds both)."""
    an = make_engine([Emitter(freq=40e3, amplitude=1.0, kind="psk",
                               baud=2000.0, order=4, seed=3)])
    h = an.open_inspector("psk", Channel(fc=40e3, bw=6e3),
                          config={"clock.baud": 2000.0})
    an.set_estimator(h, "baud", True)
    an.set_spectrum_source(h, 1)
    bauds, spectra = [], []
    for _ in range(10):
        an.step()
        for m in an.poll():
            if m.kind != MessageKind.INSPECTOR:
                continue
            if m.inspector_kind == InspectorMessageKind.ESTIMATOR:
                bauds.append(m.estimator_value)
            elif m.inspector_kind == InspectorMessageKind.SPECTRUM:
                spectra.append(m.spectrum_data)
    assert spectra and len(spectra[0]) >= 64
    assert bauds and any(abs(b - 2000.0) < 200.0 for b in bauds)


def test_engine_raw_inspector_passthrough():
    an = make_engine([Emitter(freq=20e3, amplitude=0.8)])
    h = an.open_inspector("raw", Channel(fc=20e3, bw=4e3),
                          config={"agc.enabled": False,
                                  "agc.gain": 2.0})
    cols = []
    for _ in range(8):
        an.step()
        for m in an.poll():
            if m.kind == MessageKind.SAMPLES and m.handle == h:
                cols.append(m.samples)
    y = np.concatenate(cols)
    assert y.dtype == np.complex64
    # 0.8 amplitude × gain 2 → |y| ≈ 1.6 at DC after settle
    assert abs(np.mean(np.abs(y[1024:])) - 1.6) < 0.1


def test_bucketed_decimation_different_equiv_rates():
    """A wide audio and a narrow digital inspector in ONE session get
    different equiv_rates (bucketed decimation classes; reference
    per-inspector decimation, Tasks/LPFTask.cpp:52-69)."""
    from sigdigger_tpu.analyzer.messages import MessageKind

    fa, dev = 200.0, 2000.0
    an = make_engine(
        [Emitter(freq=60e3, amplitude=1.0, fm_rate=fa, fm_dev=dev),
         Emitter(freq=-50e3, amplitude=0.8, kind="psk", order=4,
                 baud=500.0)],
        decimation=4, decimations=(4, 32))
    # wide audio channel -> fast bucket (fs/4); narrow psk -> fs/32
    h_a = an.open_inspector("audio", Channel(fc=60e3, bw=40e3),
                            config={"audio.demodulator": 2,
                                    "audio.volume": 1.0,
                                    "audio.sample-rate": FS / 32})
    h_p = an.open_inspector("psk", Channel(fc=-50e3, bw=2e3),
                            config={"afc.bits-per-symbol": 2,
                                    "clock.baud": 500.0})
    opens = {m.handle: m for m in drain(an)
             if m.kind == MessageKind.INSPECTOR}
    assert opens[h_a].equiv_rate == FS / 4
    assert opens[h_p].equiv_rate == FS / 32

    aud, nsym = [], 0
    for _ in range(4):
        assert an.step()
        for m in an.poll():
            if m.kind == MessageKind.SAMPLES and m.handle == h_a:
                aud.append(np.asarray(m.samples))
            elif m.kind == MessageKind.SAMPLES and m.handle == h_p:
                nsym += int(np.sum(m.extras.get("strobes", 0)))
    a = np.concatenate(aud)
    assert tone_snr(a, fa, FS / 32, skip=1024) > 20.0
    assert nsym > 50


def test_compact_drain_equals_full_drain():
    """Device-side active-column compaction must be drain-invariant:
    compact drains (kernels/compact.py) byte-equal the full-plane
    drain; the single-fetch int16 drain pack (kernels/drainpack.py)
    matches to its documented quantization steps."""
    def run(compact_cols, **kw):
        an = make_engine(
            [Emitter(freq=60e3, amplitude=1.0, fm_rate=300.0,
                     fm_dev=2000.0),
             Emitter(freq=-50e3, amplitude=1.0, kind="psk", order=4,
                     baud=2000.0, seed=9)],
            n_slots=128, compact_cols=compact_cols, **kw)
        h_a = an.open_inspector(
            "audio", Channel(fc=60e3, bw=12e3),
            config={"audio.demodulator": 2, "audio.volume": 1.0,
                    "audio.sample-rate": an.audio_rate})
        h_p = an.open_inspector(
            "psk", Channel(fc=-50e3, bw=6e3),
            config={"afc.bits-per-symbol": 2, "clock.baud": 2000.0,
                    # drain AGC would amplify the int16 pack's
                    # quantization noise past the documented steps
                    "agc.enabled": False, "agc.gain": 1.0})
        h_w = an.open_inspector("power", Channel(fc=60e3, bw=12e3))
        an.poll()
        out = {h_a: [], h_p: [], h_w: []}
        strobes = []
        for _ in range(4):
            assert an.step()
            for m in an.poll():
                if m.kind == MessageKind.SAMPLES:
                    out[m.handle].append(np.asarray(m.samples))
                    if m.handle == h_p:
                        strobes.append(np.asarray(m.extras["strobes"]))
        return ([np.concatenate(v) for v in out.values()],
                np.concatenate(strobes))

    full, st_full = run(compact_cols=0)
    comp, st_comp = run(compact_cols=8, drain_pack=False)
    for a, b in zip(full, comp):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)
    np.testing.assert_array_equal(st_full, st_comp)
    # single-fetch int16 pack: within the per-section quantization step
    # (audio/raw 1/4096, soft 1/8192), strobes exact
    pack, st_pack = run(compact_cols=8)
    for a, b in zip(full, pack):
        np.testing.assert_allclose(a, b, rtol=0, atol=2.5 / 4096.0)
    np.testing.assert_array_equal(st_full, st_pack)


def test_compact_fallback_when_active_exceeds_width():
    """More active slots than compact columns → full-plane fallback
    (still correct, just wider drains)."""
    an = make_engine(
        [Emitter(freq=60e3, amplitude=1.0, fm_rate=300.0,
                 fm_dev=2000.0)],
        n_slots=128, compact_cols=2)
    hs = [an.open_inspector(
        "audio", Channel(fc=50e3 + 4e3 * i, bw=8e3),
        config={"audio.demodulator": 2, "audio.volume": 1.0,
                "audio.sample-rate": an.audio_rate}) for i in range(3)]
    an.poll()
    assert not an._buckets[16].cmap          # fallback engaged
    assert an.step()
    got = {m.handle for m in an.poll()
           if m.kind == MessageKind.SAMPLES}
    assert set(hs) <= got
    for m_h in hs[1:]:
        an.close_inspector(m_h)
    an.poll()
    assert an._buckets[16].cmap              # active set fits again
    assert an.step()


def test_pipelined_step_equals_sync():
    """pipeline_depth=2 (overlapped dispatch/drain) must produce the
    SAME message payloads as the synchronous engine, just lagged one
    block and flushed at EOS."""
    def run(depth):
        an = make_engine(
            [Emitter(freq=60e3, amplitude=1.0, fm_rate=300.0,
                     fm_dev=2000.0),
             Emitter(freq=-50e3, amplitude=1.0, kind="psk", order=4,
                     baud=2000.0, seed=9)],
            n_slots=128, pipeline_depth=depth)
        h_a = an.open_inspector(
            "audio", Channel(fc=60e3, bw=12e3),
            config={"audio.demodulator": 2, "audio.volume": 1.0,
                    "audio.sample-rate": an.audio_rate})
        h_p = an.open_inspector(
            "psk", Channel(fc=-50e3, bw=6e3),
            config={"afc.bits-per-symbol": 2, "clock.baud": 2000.0})
        an.poll()
        out = {h_a: [], h_p: []}
        for _ in range(4):
            assert an.step()
            for m in an.poll():
                if m.kind == MessageKind.SAMPLES:
                    out[m.handle].append(np.asarray(m.samples))
        # EOS-equivalent: force the tail drain
        out2 = {k: list(v) for k, v in out.items()}
        for slot, samples, extras, raw in an._flush_pipeline():
            out2[slot.handle].append(np.asarray(samples))
        return [np.concatenate(v) for v in out2.values()]

    sync = run(1)
    piped = run(2)
    for a, b in zip(sync, piped):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)


def test_psd_shares_channelizer_upload():
    """decimation == taps == Bailey B: the engine's PSD must run off
    the channelizer's packed window buffer (PallasPSDFromXW — one H2D
    per block for PSD + banks) and still locate a CW tone exactly."""
    from sigdigger_tpu.kernels.fft import PallasPSDFromXW

    f0 = 60e3
    an = make_engine([Emitter(freq=f0, amplitude=1.0)], decimation=64)
    assert isinstance(an._spectrum, PallasPSDFromXW)
    assert an._psd_bucket is an._buckets[64]
    peaks = []
    for _ in range(6):
        assert an.step()
        for m in an.poll():
            if m.kind == MessageKind.PSD:
                freqs = np.linspace(-FS / 2, FS / 2, len(m.data),
                                    endpoint=False)
                peaks.append(freqs[int(np.argmax(m.data))])
    assert peaks and all(abs(p - f0) <= FS / 4096 for p in peaks)


def test_engine_i16_upload_equivalence():
    """in_i16=True (int16 packed uploads, in-kernel dequantization)
    must match the f32 engine to quantization accuracy on FM audio and
    place the PSD peak on the same bin."""
    fa, f0 = 400.0, 60e3

    def run(i16):
        an = make_engine([Emitter(freq=f0, amplitude=1.0, fm_rate=fa,
                                  fm_dev=2000.0),
                          Emitter(freq=-90e3, amplitude=2.0)],
                         decimation=64, in_i16=i16)
        h = an.open_inspector("audio", Channel(fc=f0, bw=12e3),
                              config={"audio.demodulator": 2,
                                      "audio.volume": 1.0,
                                      "audio.sample-rate":
                                          int(an.audio_rate)})
        an.poll()
        audio, peaks = [], []
        for _ in range(8):
            assert an.step()
            for m in an.poll():
                if m.kind == MessageKind.SAMPLES and m.handle == h:
                    audio.append(m.samples)
                elif m.kind == MessageKind.PSD:
                    peaks.append(int(np.argmax(m.data)))
        return np.concatenate(audio), peaks

    a32, p32 = run(False)
    a16, p16 = run(True)
    assert p32 == p16
    assert len(a32) == len(a16) > 256
    err = (a32 - a16)[64:]
    sig = np.mean(a32[64:] ** 2)
    assert 10 * np.log10(sig / max(np.mean(err ** 2), 1e-30)) > 40.0


def test_drainpack_status_precision_small_powers():
    """r3 advisor (high): the packed drain quantized power/squelch at
    S_SCALE=256, so channel powers below ~1/512 rounded to zero and raw
    AGC blew up to 1/sqrt(eps).  The 3-lane residual encoding must
    round-trip tiny powers at full f32-like precision."""
    from sigdigger_tpu.kernels.drainpack import (
        DrainPacker,
        DrainPackerConfig,
    )

    c, w = 16, 8
    cfg = DrainPackerConfig(n_rows=64, audio_rows=8, n_channels=c,
                            width=w, has_audio=True, has_digital=False,
                            has_raw=True)
    pk = DrainPacker(cfg, interpret=True)
    pk.set_mapping(list(range(w)))
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((8, c)).astype(np.float32) * 0.1
    y_re = rng.standard_normal((64, c)).astype(np.float32) * 0.01
    y_im = rng.standard_normal((64, c)).astype(np.float32) * 0.01
    # powers spanning 1e-1 .. 1e-9 — all far below the old 1/256 step
    pw = np.logspace(-1, -9, c).astype(np.float32)[None, :]
    sq = (pw * 0.5).astype(np.float32)
    import jax.numpy as jnp

    sec = pk.fetch(pk.dispatch(audio=jnp.asarray(audio),
                               sq=jnp.asarray(sq), pw=jnp.asarray(pw),
                               raw=(jnp.asarray(y_re),
                                    jnp.asarray(y_im))))
    np.testing.assert_allclose(sec["power"], pw[0, :w], rtol=1e-5,
                               atol=4e-12)
    np.testing.assert_allclose(sec["sq"], sq[0, :w], rtol=1e-5,
                               atol=4e-12)
    # AGC gain derived from the drained power must match the true gain
    g_true = 1.0 / np.sqrt(pw[0, :w])
    g_got = 1.0 / np.sqrt(np.maximum(sec["power"], 1e-18))
    np.testing.assert_allclose(g_got, g_true, rtol=1e-4)


def test_raw_agc_on_weak_channel_via_packed_drain():
    """End-to-end guard for the same finding: a weak (-40 dBFS) raw
    channel with agc.enabled=True must come out ~unit-RMS through the
    default packed-drain path, not saturated by a bogus 1/sqrt(eps)."""
    an = make_engine(
        [Emitter(freq=60e3, amplitude=0.01, fm_rate=300.0,
                 fm_dev=2000.0)],
        n_slots=128, compact_cols=8)
    h = an.open_inspector("raw", Channel(fc=60e3, bw=12e3),
                          config={"agc.enabled": True})
    an.poll()
    out = []
    for _ in range(4):
        assert an.step()
        for m in an.poll():
            if m.kind == MessageKind.SAMPLES and m.handle == h:
                out.append(np.asarray(m.samples))
    y = np.concatenate(out)[2048:]
    rms = np.sqrt(np.mean(np.abs(y) ** 2))
    assert 0.5 < rms < 2.0, f"AGC'd raw RMS {rms} (expected ~1)"


def test_drainpack_per_section_widths_and_bytes():
    """The packed drain compacts each SECTION at its own width
    (audio / digital / raw slots pack only their live columns, lane-
    grouped into one buffer) — a mixed session's drain buffer must
    shrink accordingly and still demap to the same payloads as the
    unpacked drain."""
    def emitters():
        return [Emitter(freq=60e3, amplitude=1.0, fm_rate=300.0,
                        fm_dev=2000.0),
                Emitter(freq=-50e3, amplitude=1.0, kind="psk",
                        order=4, baud=2000.0, seed=9)]

    def session(an):
        hs = {}
        hs["a"] = [an.open_inspector(
            "audio", Channel(fc=55e3 + 2e3 * i, bw=8e3),
            config={"audio.demodulator": 2, "audio.volume": 1.0,
                    "audio.sample-rate": an.audio_rate})
            for i in range(3)]
        hs["p"] = [an.open_inspector(
            "psk", Channel(fc=-50e3, bw=6e3),
            config={"afc.bits-per-symbol": 2, "clock.baud": 2000.0,
                    "agc.enabled": False, "agc.gain": 1.0})]
        hs["w"] = [an.open_inspector("power", Channel(fc=60e3,
                                                     bw=8e3))]
        an.poll()
        return hs

    def collect(an, hs, steps=3):
        out = {h: [] for v in hs.values() for h in v}
        for _ in range(steps):
            assert an.step()
            for m in an.poll():
                if m.kind == MessageKind.SAMPLES:
                    out[m.handle].append(np.asarray(m.samples))
        return {h: np.concatenate(v) for h, v in out.items()}

    an = make_engine(emitters(), n_slots=128, compact_cols=32)
    hs = session(an)
    got = collect(an, hs)
    # the lazily-built packer used per-section widths: 3 audio + 1
    # digital + 1 raw of 5 active -> every section packs at width 8,
    # not the 32-column compact width
    (packer,) = an._buckets[16].packers.values()
    assert packer.cfg.width == 8
    assert packer.cfg.audio_width == 8
    assert packer.cfg.digital_width == 8
    assert packer.cfg.raw_width == 8

    an2 = make_engine(emitters(), n_slots=128, compact_cols=32,
                      drain_pack=False)
    want = collect(an2, session(an2))
    for (h, a), (h2, b) in zip(sorted(got.items()),
                               sorted(want.items())):
        np.testing.assert_allclose(a, b, rtol=0, atol=2.5 / 4096.0)


def test_drainpack_lane_grouping_roundtrip():
    """Direct kernel test of the lane-grouped packing: sections
    narrower than the buffer width fold G consecutive time tiles into
    the lane groups of one output tile and must demap exactly."""
    import jax.numpy as jnp

    from sigdigger_tpu.kernels.drainpack import (
        DrainPacker,
        DrainPackerConfig,
    )

    c = 32
    cfg = DrainPackerConfig(n_rows=256, audio_rows=64, n_channels=c,
                            width=16, audio_width=16, digital_width=8,
                            raw_width=8, has_audio=True,
                            has_digital=True, has_raw=True)
    assert cfg.group("digital") == 2 and cfg.group("raw") == 2
    pk = DrainPacker(cfg, interpret=True)
    status = list(range(12))
    audio = [0, 2, 4]
    digital = [5, 6, 7, 8]
    raw = [9, 11]
    pk.set_mappings(status, audio=audio, digital=digital, raw=raw)

    rng = np.random.default_rng(7)
    a = rng.standard_normal((64, c)).astype(np.float32)
    planes = [rng.standard_normal((256, c)).astype(np.float32) * 0.3
              for _ in range(5)]
    strobe = (rng.random((256, c)) < 0.3).astype(np.float32)
    sq = rng.random((1, c)).astype(np.float32) * 0.01
    pw = rng.random((1, c)).astype(np.float32) * 0.01

    sec = pk.fetch(pk.dispatch(
        audio=jnp.asarray(a), sq=jnp.asarray(sq), pw=jnp.asarray(pw),
        dig=(jnp.asarray(planes[0]), jnp.asarray(planes[1]),
             jnp.asarray(strobe)),
        raw=(jnp.asarray(planes[3]), jnp.asarray(planes[4]))))

    assert sec["audio"].shape == (64, 16)
    assert sec["soft"].shape == (256, 8)
    assert sec["y_re"].shape == (256, 8)
    for w_col, ch in enumerate(audio):
        np.testing.assert_allclose(sec["audio"][:, w_col], a[:, ch],
                                   atol=1.5 / 4096.0)
    for w_col, ch in enumerate(digital):
        np.testing.assert_allclose(sec["soft"][:, w_col].real,
                                   planes[0][:, ch],
                                   atol=1.5 / 8192.0)
        np.testing.assert_array_equal(sec["strobe"][:, w_col],
                                      strobe[:, ch] > 0.5)
    for w_col, ch in enumerate(raw):
        np.testing.assert_allclose(sec["y_re"][:, w_col],
                                   planes[3][:, ch],
                                   atol=1.5 / 4096.0)
        np.testing.assert_allclose(sec["y_im"][:, w_col],
                                   planes[4][:, ch],
                                   atol=1.5 / 4096.0)
    np.testing.assert_allclose(sec["power"][:12], pw[0, :12],
                               rtol=1e-5, atol=4e-12)
    np.testing.assert_allclose(sec["sq"][:12], sq[0, :12],
                               rtol=1e-5, atol=4e-12)


def test_engine_i8_upload_equivalence():
    """in_i8=True (int8 packed uploads at 64 counts/unit): the engine
    must match the f32 path within the -36 dBFS quantization floor on
    FM audio and place the PSD peak on the same bin."""
    fa, f0 = 400.0, 60e3

    def run(i8):
        an = make_engine([Emitter(freq=f0, amplitude=0.7, fm_rate=fa,
                                  fm_dev=2000.0)],
                         decimation=64, in_i8=i8)
        h = an.open_inspector("audio", Channel(fc=f0, bw=12e3),
                              config={"audio.demodulator": 2,
                                      "audio.volume": 1.0,
                                      "audio.sample-rate":
                                          int(an.audio_rate)})
        an.poll()
        audio, peaks = [], []
        for _ in range(6):
            assert an.step()
            for m in an.poll():
                if m.kind == MessageKind.SAMPLES and m.handle == h:
                    audio.append(m.samples)
                elif m.kind == MessageKind.PSD:
                    peaks.append(int(np.argmax(m.data)))
        return np.concatenate(audio), peaks

    a32, p32 = run(False)
    a8, p8 = run(True)
    # PSD peaks stay within the FM deviation band around the carrier
    # (the exact in-band peak bin wanders with the EMA)
    k0 = int((f0 + FS / 2) / FS * 4096)
    band = int(2 * 2000.0 / FS * 4096) + 2
    for p in (*p32, *p8):
        assert abs(p - k0) <= band, (p, k0, band)
    err = (a32 - a8)[64:]
    sig = np.mean(a32[64:] ** 2)
    assert 10 * np.log10(sig / max(np.mean(err ** 2), 1e-30)) > 20.0


def test_close_inspector_with_blocks_in_flight():
    """pipeline_depth=2: closing a slot whose last block is still in
    flight must not crash the drain — the closed slot simply stops
    producing messages (reference close semantics)."""
    an = make_engine(
        [Emitter(freq=60e3, amplitude=1.0, fm_rate=300.0,
                 fm_dev=2000.0),
         Emitter(freq=-50e3, amplitude=1.0, kind="psk", order=4,
                 baud=2000.0, seed=9)],
        n_slots=128, pipeline_depth=2)
    h_a = an.open_inspector(
        "audio", Channel(fc=60e3, bw=12e3),
        config={"audio.demodulator": 2,
                "audio.sample-rate": an.audio_rate})
    h_p = an.open_inspector("psk", Channel(fc=-50e3, bw=6e3),
                            config={"clock.baud": 2000.0})
    an.poll()
    assert an.step()               # block 0 in flight
    an.close_inspector(h_p)        # close while in flight
    assert an.step()               # drains block 0 — must not raise
    assert an.step()
    msgs = an.poll()
    closed = [m for m in msgs
              if m.kind == MessageKind.SAMPLES and m.handle == h_p]
    assert not closed
    alive = [m for m in msgs
             if m.kind == MessageKind.SAMPLES and m.handle == h_a]
    assert alive


def test_open_inspector_after_steps():
    """Opening a psk/audio inspector AFTER the engine has stepped must
    work: the reset paths mutate bank state that has gone
    device-resident (np.asarray of a jax buffer is read-only — the
    materialize paths must copy)."""
    an = make_engine([Emitter(freq=60e3, amplitude=1.0, fm_rate=300.0,
                              fm_dev=2000.0),
                      Emitter(freq=-50e3, amplitude=1.0, kind="psk",
                              order=4, baud=2000.0, seed=9)])
    h0 = an.open_inspector("audio", Channel(fc=60e3, bw=12e3),
                           config={"audio.demodulator": 2,
                                   "audio.sample-rate": an.audio_rate})
    an.poll()
    for _ in range(2):
        assert an.step()
    # state is now device-resident; these opens reset per-slot state
    h1 = an.open_inspector("psk", Channel(fc=-50e3, bw=6e3),
                           config={"clock.baud": 2000.0})
    h2 = an.open_inspector("audio", Channel(fc=55e3, bw=8e3),
                           config={"audio.demodulator": 2,
                                   "audio.sample-rate": an.audio_rate})
    an.poll()
    got = set()
    for _ in range(3):
        assert an.step()
        got |= {m.handle for m in an.poll()
                if m.kind == MessageKind.SAMPLES}
    assert {h0, h1, h2} <= got
