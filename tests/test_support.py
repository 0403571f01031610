"""Support components: audio playback, SNR estimator, palettes,
averager, Library registries, Logger, checkpoint/resume."""

import time

import numpy as np

from sigdigger_tpu.audio import AudioFileSaver, AudioPlayback, NullAudioPlayer
from sigdigger_tpu.dsp.snr import SNREstimator
from sigdigger_tpu.library import AutoGain, Bookmark, Library, Location
from sigdigger_tpu.utils.averager import Averager
from sigdigger_tpu.utils.logger import Logger, Severity
from sigdigger_tpu.utils.palette import DEFAULT_PALETTES, Palette, build_gradient


def test_audio_playback_to_wav(tmp_path):
    path = str(tmp_path / "rec.wav")
    # deep ring: recording must not drop buffers (live audio would)
    pb = AudioPlayback(8000, player=AudioFileSaver(path, 8000),
                       max_buffers=64)
    t = np.arange(8000) / 8000.0
    pb.write(np.sin(2 * np.pi * 440 * t).astype(np.float32))
    pb.drain()
    pb.close()
    from sigdigger_tpu.io.wav import read_wav
    back, rate = read_wav(path)
    assert rate == 8000
    # full 20 ms buffers flushed (tail partial may be dropped)
    assert len(back) >= 8000 - pb.buffer_size
    spec = np.abs(np.fft.rfft(back[:4096, 0]))
    assert abs(np.argmax(spec) * 8000 / 4096 - 440) < 10


def test_audio_playback_gain_and_starvation():
    starved = []
    pb = AudioPlayback(48000, backend="null",
                       on_starvation=lambda: starved.append(1))
    pb.gain = 0.5
    pb.write(np.ones(48000, np.float32))
    pb.drain()
    time.sleep(0.3)  # worker hits empty queue after started
    pb.close()
    assert pb.starved and starved
    assert isinstance(pb._player, NullAudioPlayer)


def test_snr_estimator_bpsk():
    rng = np.random.default_rng(0)
    sigma = 0.1
    bits = rng.integers(0, 2, 4000)
    v = bits * 2.0 - 1.0 + rng.normal(0, sigma, 4000)
    est = SNREstimator(bps=1, alpha=0.3)
    res = est.fit(v, iters=200)
    # levels near ±1, sigma near 0.1 → SNR ≈ 20 dB
    assert abs(res.levels[0] + 1.0) < 0.1
    assert abs(res.levels[1] - 1.0) < 0.1
    assert abs(res.snr_db - 20.0) < 3.0


def test_snr_estimator_degenerate():
    est = SNREstimator(bps=1)
    res = est.fit(np.zeros(5))
    assert res.snr_db == 0.0 and not res.converged


def test_palette_gradient():
    g = build_gradient([(0.0, (0, 0, 0)), (1.0, (255, 255, 255))])
    assert g.shape == (256, 3)
    assert tuple(g[0]) == (0, 0, 0) and tuple(g[-1]) == (255, 255, 255)
    assert tuple(g[128]) == (128, 128, 128)
    p = DEFAULT_PALETTES["Gqrx"]
    assert p.lookup(0.0) == (0, 0, 0)
    assert p.lookup(1.0) == (255, 0, 0)
    q = Palette.from_dict(p.to_dict())
    assert np.array_equal(q.gradient, p.gradient)


def test_averager_semantics():
    av = Averager(alpha=0.5)
    a = av.feed(np.array([1.0, 2.0]))
    assert np.allclose(a, [1.0, 2.0])          # first feed copies
    b = av.feed(np.array([3.0, 4.0]))
    assert np.allclose(b, [2.0, 3.0])
    av.reset()
    assert av.data is None


def test_library_registries_and_persistence(tmp_path):
    lib = Library(config_dir=str(tmp_path / "cfg"))
    from sigdigger_tpu.profiles import SourceProfile
    lib.save_profile(SourceProfile(label="My SDR", sample_rate=2_000_000))
    assert lib.register_bookmark(Bookmark("ISS uplink", 145.990e6))
    assert not lib.register_bookmark(Bookmark("dup", 145.990e6))
    lib.register_location(Location("Home", 40.0, -75.0, 120.0))
    lib.register_autogain(AutoGain(
        "Normal", "rtlsdr",
        table=[{"LNA": 0.0}, {"LNA": 20.0}, {"LNA": 40.0}]))
    lib.push_recent("/tmp/a.cf32")
    lib.push_recent("/tmp/b.cf32")
    lib.push_recent("/tmp/a.cf32")
    assert lib.recent == ["/tmp/a.cf32", "/tmp/b.cf32"]
    lib.save()

    lib2 = Library(config_dir=str(tmp_path / "cfg"))
    lib2.load()
    assert "My SDR" in lib2.profiles
    assert lib2.profiles["My SDR"].sample_rate == 2_000_000
    assert 145.990e6 in lib2.bookmarks
    assert lib2.locations["Home"].latitude == 40.0
    ag = lib2.autogains["rtlsdr:Normal"]
    assert ag.gains_for_level(1) == {"LNA": 20.0}
    assert ag.gains_for_level(99) == {"LNA": 40.0}
    assert lib2.recent[0] == "/tmp/a.cf32"


def test_library_tle_registration():
    lib = Library(config_dir="/tmp/nonexistent-sigdigger-test")
    text = """ISS (ZARYA)
1 25544U 98067A   20001.00000000  .00016717  00000-0  10270-3 0  9000
2 25544  51.6416 247.4627 0006703 130.5360 325.0288 15.49512410 21390
"""
    # fix checksums
    lines = text.splitlines()
    fixed = [lines[0]]
    for ln in lines[1:]:
        body = ln[:68]
        s = sum(int(c) if c.isdigit() else 1 if c == "-" else 0
                for c in body)
        fixed.append(body + str(s % 10))
    assert lib.register_tle("\n".join(fixed)) == 1
    assert "ISS (ZARYA)" in lib.tle_sets


def test_logger():
    log = Logger()
    log.info("hello")
    log.error("bad", domain="dsp")
    assert log.worst_severity() == Severity.ERROR
    records = log.drain()
    assert len(records) == 2
    assert records[1].domain == "dsp"
    assert log.drain() == []


def test_checkpoint_resume(tmp_path):
    from sigdigger_tpu.analyzer import Analyzer, MessageKind
    from sigdigger_tpu.analyzer.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from sigdigger_tpu.profiles import SourceProfile
    from sigdigger_tpu.types import AnalyzerParams, Channel

    data = np.exp(2j * np.pi * 0.1 * np.arange(1 << 16)).astype(
        np.complex64)
    cap = tmp_path / "cap.cf32"
    data.tofile(cap)
    prof = SourceProfile(type="file", path=str(cap), sample_rate=1 << 16)
    an = Analyzer(profile=prof,
                  params=AnalyzerParams(window_size=1024,
                                        psd_update_interval=0.0))
    h = an.open_inspector("audio", Channel(fc=6553.6, bw=2000.0),
                          config={"audio.demodulator": 2})
    an.set_estimator(h, "offset", True)
    for _ in range(3):
        an.step()
    pos = an.source.position
    ckpt = str(tmp_path / "state.sdckpt")
    save_checkpoint(an, ckpt)

    an2 = load_checkpoint(ckpt)
    assert an2.source.position == pos
    assert len(an2._inspectors) == 1
    slot = next(iter(an2._inspectors.values()))
    assert slot.class_name == "audio"
    assert slot.inspector.config["audio.demodulator"] == 2
    assert "offset" in slot.estimators
    # resumes processing from the same offset
    assert an2.step()
    msgs = an2.poll()
    assert any(m.kind == MessageKind.SAMPLES for m in msgs)
