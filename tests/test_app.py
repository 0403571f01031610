"""LiveSession — the live application (VERDICT r3 Missing #1).

One command starts a live session (reference App/Application.cpp:
357-458 capture lifecycle, main.cpp:176-249); these tests drive it
end-to-end through the suscan-wire client exactly as a remote
SigDigger would: stream PSD, open an audio inspector, receive samples,
retune, and halt."""

import io
import os
import time

import numpy as np
import pytest

from sigdigger_tpu.analyzer.messages import (
    InspectorMessageKind,
    MessageKind,
)
from sigdigger_tpu.app import LiveSession, build_profile
from sigdigger_tpu.io.suscan_wire import SuscanWireClient
from sigdigger_tpu.types import AnalyzerParams, Channel


def small_params():
    p = AnalyzerParams()
    p.window_size = 512
    p.psd_update_interval = 0.0
    return p


def wait_for(cl, pred, timeout=20.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        m = cl.read(timeout=0.5)
        if m is not None and pred(m):
            return m
    return None


def test_live_session_end_to_end_through_wire():
    prof = build_profile("tonegen:8000,-50", rate=64_000,
                        throttle=False)
    sess = LiveSession(prof, params=small_params(), engine="generic",
                       block_size=4096, wire_port=0, control_port=0,
                       user="op", password="pw")
    sess.start()
    try:
        assert sess.wire_server is not None
        cl = SuscanWireClient("127.0.0.1",
                              sess.wire_server.address[1],
                              user="op", password="pw")
        # PSD streams with the tone at +8 kHz
        psd = wait_for(cl, lambda m: m.kind == MessageKind.PSD)
        assert psd is not None
        freqs = np.linspace(-32_000, 32_000, psd.fft_size,
                            endpoint=False)
        assert abs(freqs[np.argmax(psd.data)] - 8000.0) < 300.0

        # open an audio inspector through the wire, get samples back
        cl.open_inspector("audio", Channel(fc=8e3, bw=4e3),
                          request_id=5,
                          config={"audio.demodulator": 2,
                                  "audio.sample-rate": 8000.0})
        opened = wait_for(cl, lambda m: (
            m.kind == MessageKind.INSPECTOR
            and m.inspector_kind == InspectorMessageKind.OPEN))
        assert opened is not None and opened.request_id == 5
        h = opened.handle
        got = wait_for(cl, lambda m: (m.kind == MessageKind.SAMPLES
                                      and m.handle == h))
        assert got is not None and len(got.samples) > 0

        # retune through the wire and see the ack
        cl.set_inspector_freq(h, -8e3, request_id=6)
        ack = wait_for(cl, lambda m: (
            m.kind == MessageKind.INSPECTOR
            and m.inspector_kind == InspectorMessageKind.SET_FREQ))
        assert ack is not None and ack.lo == -8e3

        # REPL control surface drives the same analyzer
        import socket

        s = socket.create_connection(
            ("127.0.0.1", sess.control_server.address[1]), timeout=5)
        f = s.makefile("rw", newline="\n")
        f.write("get frequency\n")
        f.flush()
        assert f.readline().strip().startswith("frequency=")
        f.write("set frequency 145000000\n")
        f.flush()
        assert f.readline().strip() == "OK"
        deadline = time.time() + 5.0
        while time.time() < deadline and \
                sess.analyzer.profile.freq != 145e6:
            time.sleep(0.05)
        assert sess.analyzer.profile.freq == 145e6
        s.close()
        cl.close()
    finally:
        sess.halt()
    assert sess.analyzer is None


def test_live_session_kernel_engine_audio_and_sinks(tmp_path):
    """The kernel-engine session: audio chain → WAV sink, raw IQ
    recording tee, waterfall PNG — the full consumer set."""
    prof = build_profile("tonegen:30000,-40", rate=256_000,
                        throttle=False)
    params = AnalyzerParams()
    params.window_size = 4096
    params.psd_update_interval = 0.0
    wav = str(tmp_path / "audio.wav")
    rec = str(tmp_path / "raw.cf32")
    png = str(tmp_path / "wf.png")
    tty = io.StringIO()
    sess = LiveSession(
        prof, params=params, engine="kernel", block_size=32_768,
        audio={"fc": 30e3, "demod": 1, "rate": 8000.0, "bw": 12e3,
               "wav": wav, "backend": "null"},
        record_path=rec, waterfall_png=png, waterfall_interval=0.0,
        tty=True, tty_file=tty,
        engine_kw={"interpret": True, "decimation": 16})
    sess.start()
    deadline = time.time() + 60.0
    while time.time() < deadline and sess.messages_seen < 24:
        time.sleep(0.1)
    sess.halt()

    # every sink produced real output
    assert os.path.getsize(rec) > 8 * 32_768      # complex64 blocks
    from sigdigger_tpu.io.wav import read_wav

    audio, rate = read_wav(wav)
    assert rate == 8000 and len(audio) > 0
    assert os.path.getsize(png) > 100
    assert "\x1b[48;5;" in tty.getvalue()


def test_live_session_eos_and_restart(tmp_path):
    """File replay hits EOS → session reports it; restart() relaunches
    on the same profile (the reference RESTARTING path)."""
    path = tmp_path / "cap_1000Hz_64000sps.cf32"
    k = np.arange(1 << 15)
    x = (0.5 * np.exp(2j * np.pi * 1000 * k / 64_000)).astype(
        np.complex64)
    x.tofile(path)
    prof = build_profile(str(path), throttle=False)
    sess = LiveSession(prof, params=small_params(), engine="generic",
                       block_size=4096)
    sess.start()
    sess.run(duration=30.0)
    assert sess.eos.is_set()
    sess.restart()
    assert sess.analyzer is not None
    sess.run(duration=30.0)
    assert sess.eos.is_set()
    sess.halt()


def test_build_profile_specs():
    p = build_profile("tonegen:1500,-30", rate=48_000)
    assert p.type == "tonegen" and p.tone_freq == 1500.0
    assert p.noise_db == -30.0 and p.throttle
    p = build_profile("synth", rate=128_000, throttle=False)
    assert p.type == "synth" and not p.throttle
    p = build_profile("stdin")
    assert p.type == "stdin"
    prof = build_profile("/nonexistent/capture_48000sps.cf32")
    assert prof.sample_rate == 48_000
    from sigdigger_tpu.sources import make_source

    with pytest.raises(FileNotFoundError):
        make_source(prof)


def test_live_session_autosave(tmp_path, monkeypatch):
    """Config autosave (reference SIGDIGGER_AUTOSAVE_INTERVAL_MS +
    exit-time save): the session saves the Library periodically and
    at halt."""
    import time

    from sigdigger_tpu.app import LiveSession
    from sigdigger_tpu.library import Library
    from sigdigger_tpu.profiles import SourceProfile

    saves = []
    monkeypatch.setattr(Library, "save",
                        lambda self: saves.append(time.time()))
    prof = SourceProfile(type="tonegen", sample_rate=65536,
                         tone_freq=1000.0)
    sess = LiveSession(profile=prof, engine="generic",
                       autosave_interval=0.3)
    sess.start()
    try:
        deadline = time.time() + 5.0
        while not saves and time.time() < deadline:
            time.sleep(0.05)
        assert saves, "no periodic autosave"
        n = len(saves)
    finally:
        sess.halt()
    assert len(saves) > n - 1 and saves, "no exit-time save"


def test_live_session_web_spectrum():
    """Live web waterfall (headless MainSpectrum): /psd.json carries
    the running PSD and /waterfall.png renders the raster."""
    import json
    import time
    import urllib.request

    from sigdigger_tpu.app import LiveSession
    from sigdigger_tpu.profiles import SourceProfile

    prof = SourceProfile(type="tonegen", sample_rate=262_144,
                         tone_freq=50_000.0)
    sess = LiveSession(profile=prof, engine="generic", http_port=0)
    sess.start()
    try:
        port = sess.web_server.address[1]
        deadline = time.time() + 10.0
        meta = {}
        while time.time() < deadline:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/psd.json",
                    timeout=5) as r:
                meta = json.loads(r.read())
            if meta.get("rows", 0) > 0:
                break
            time.sleep(0.2)
        assert meta.get("rows", 0) > 0, meta
        assert abs(meta["peak_freq"] - 50_000.0) < 2_000.0
        assert len(meta["psd_db"]) == meta["fft_size"]
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/waterfall.png",
                timeout=5) as r:
            png = r.read()
        assert png.startswith(b"\x89PNG")
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=5) as r:
            assert b"sigdigger_tpu" in r.read()
    finally:
        sess.halt()


def test_live_session_web_control():
    """Control endpoints on the live web view (r4 VERDICT item 8):
    retune, inspector open/config/freq/bandwidth/close driven over
    HTTP against a running LiveSession."""
    import json
    import time
    import urllib.request

    from sigdigger_tpu.app import LiveSession
    from sigdigger_tpu.profiles import SourceProfile

    prof = SourceProfile(type="tonegen", sample_rate=262_144,
                         tone_freq=50_000.0)
    sess = LiveSession(profile=prof, engine="generic", http_port=0)
    sess.start()
    try:
        port = sess.web_server.address[1]
        base = f"http://127.0.0.1:{port}"

        def post(path, obj):
            req = urllib.request.Request(
                base + path, data=json.dumps(obj).encode(),
                method="POST")
            with urllib.request.urlopen(req, timeout=5) as r:
                return json.loads(r.read())

        def state():
            with urllib.request.urlopen(base + "/control/state",
                                        timeout=5) as r:
                return json.loads(r.read())

        out = post("/control/inspector/open",
                   {"class": "audio", "fc": 50_000.0, "bw": 12e3,
                    "config": {"audio.demodulator": 2,
                               "audio.volume": 1.0}})
        assert out["ok"]
        h = out["handle"]
        assert post("/control/inspector/config",
                    {"handle": h,
                     "config": {"audio.squelch": True,
                                "audio.squelch-level": 1e-9,
                                "audio.volume": 0.5}})["ok"]
        assert post("/control/tune", {"frequency": 10_000.0})["ok"]
        st = state()
        assert st["control"] is True
        assert st["frequency"] == 10_000.0
        assert any(i["handle"] == h and i["class"] == "audio"
                   for i in st["inspectors"])
        assert post("/control/inspector/freq",
                    {"handle": h, "freq": 20_000.0})["ok"]
        assert post("/control/inspector/bandwidth",
                    {"handle": h, "bw": 8e3})["ok"]
        st = state()
        insp = next(i for i in st["inspectors"] if i["handle"] == h)
        assert insp["lo"] == 20_000.0 and insp["bandwidth"] == 8e3
        # the session keeps producing spectrum after control traffic
        deadline = time.time() + 10.0
        rows = 0
        while time.time() < deadline and rows == 0:
            with urllib.request.urlopen(base + "/psd.json",
                                        timeout=5) as r:
                rows = json.loads(r.read()).get("rows", 0)
            time.sleep(0.2)
        assert rows > 0
        assert post("/control/inspector/close", {"handle": h})["ok"]
        assert not state()["inspectors"]
        # malformed requests surface as HTTP 400, not crashes
        try:
            post("/control/inspector/open", {"bw": 1e3})  # no fc
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        sess.halt()


def test_live_session_tty_keybindings():
    """The ANSI-terminal keybindings drive the engine: [ ] retune,
    a/c open/close the audio inspector, s toggles its squelch, q
    halts (headless MainSpectrum interactions — handle_key is the
    handler the raw-tty reader thread feeds)."""
    from sigdigger_tpu.app import LiveSession
    from sigdigger_tpu.profiles import SourceProfile

    prof = SourceProfile(type="tonegen", sample_rate=262_144,
                         tone_freq=50_000.0)
    sess = LiveSession(profile=prof, engine="generic")
    sess.start()
    try:
        an = sess.analyzer
        f0 = an.profile.freq
        assert sess.handle_key("]")
        assert an.profile.freq == f0 + an.sample_rate / 10
        assert sess.handle_key("[")
        assert an.profile.freq == f0
        assert sess.handle_key("a")
        assert len(an._inspectors) == 1
        h = next(iter(an._inspectors))
        assert sess.handle_key("s")
        # squelch applied on the open inspector
        assert an._inspectors[h].inspector.config["audio.squelch"] \
            is True
        assert sess.handle_key("s")
        assert an._inspectors[h].inspector.config["audio.squelch"] \
            is False
        assert sess.handle_key("c")
        assert len(an._inspectors) == 0
        assert not sess.handle_key("q")
        assert sess.eos.is_set()
    finally:
        sess.halt()
