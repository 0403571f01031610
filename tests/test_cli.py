"""CLI subcommands driven end-to-end."""

import json

import numpy as np
import pytest

from sigdigger_tpu.cli import main


@pytest.fixture
def fm_capture(tmp_path):
    fs = 256_000
    n = 1 << 17
    t = np.arange(n) / fs
    msg = np.sin(2 * np.pi * 600.0 * t)
    phase = 2 * np.pi * 50_000.0 * t + \
        2 * np.pi * 4000.0 * np.cumsum(msg) / fs
    x = (0.8 * np.exp(1j * phase)).astype(np.complex64)
    path = tmp_path / f"cap_100000000Hz_{fs}sps.cf32"
    x.tofile(path)
    return str(path), fs


def test_cli_info(fm_capture, capsys):
    path, fs = fm_capture
    assert main(["info", path]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["sample_rate"] == fs
    assert out["frequency"] == 100e6
    assert out["samples"] == 1 << 17


def test_cli_psd(fm_capture, tmp_path, capsys):
    path, fs = fm_capture
    csv = str(tmp_path / "psd.csv")
    assert main(["psd", path, "--fft", "1024", "-o", csv]) == 0
    out = capsys.readouterr().out
    peak = json.loads(out.splitlines()[-1])
    # FM spectrum peaks near carrier ± deviation (Bessel lobes)
    assert abs(peak["peak_freq_hz"] - 50_000.0) < 6000.0
    lines = open(csv).read().strip().splitlines()
    assert lines[0] == "freq_hz,psd_db" and len(lines) == 1025


def test_cli_demod_fm(fm_capture, tmp_path, capsys):
    path, fs = fm_capture
    wav = str(tmp_path / "audio.wav")
    assert main(["demod", path, "--freq", "50000", "--bw", "16000",
                 "--mode", "fm", "--audio-rate", "8000",
                 "-o", wav]) == 0
    from sigdigger_tpu.io.wav import read_wav
    audio, rate = read_wav(wav)
    assert rate == 8000
    a = audio[500:, 0]
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    f_pk = (np.argmax(spec[5:]) + 5) * rate / len(a)
    assert abs(f_pk - 600.0) < 25.0


def test_cli_rms(fm_capture, tmp_path, capsys):
    path, fs = fm_capture
    csv = str(tmp_path / "rms.csv")
    assert main(["rms", path, "--freq", "50000", "--bw", "32000",
                 "--integrate", "500", "-o", csv]) == 0
    lines = open(csv).read().strip().splitlines()
    assert lines[0] == "time_s,rms"
    vals = np.array([float(l.split(",")[1]) for l in lines[1:]])
    assert len(vals) > 10
    # steady tone of amplitude 0.8 → RMS ≈ 0.8 in the channel
    assert abs(np.median(vals[2:]) - 0.8) < 0.1


def test_cli_scan(capsys):
    assert main(["scan", "--fmin", "100e6", "--fmax", "104e6",
                 "--hops", "12", "--progressive",
                 "--emitters", "101.5e6", "102.5e6"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["hops"] == 12
    assert out["hot_bins"] > 0


def test_cli_doppler(tmp_path, capsys):
    tle = """ISS (ZARYA)
1 25544U 98067A   20001.00000000  .00016717  00000-0  10270-3 0  9000
2 25544  51.6416 247.4627 0006703 130.5360 325.0288 15.49512410 21390
"""
    lines = tle.splitlines()
    fixed = [lines[0]]
    for ln in lines[1:]:
        body = ln[:68]
        s = sum(int(c) if c.isdigit() else 1 if c == "-" else 0
                for c in body)
        fixed.append(body + str(s % 10))
    path = tmp_path / "iss.tle"
    path.write_text("\n".join(fixed))
    assert main(["doppler", str(path), "--freq", "437e6",
                 "--lat", "40", "--lon", "-75",
                 "--start", "1577836800", "--duration", "180",
                 "--step", "60"]) == 0
    out = capsys.readouterr().out
    assert out.count("dopp") == 3


def test_cli_live(tmp_path, capsys):
    """`live` starts a real session and halts after --duration
    (reference main.cpp one-binary entry; App capture lifecycle)."""
    wav = tmp_path / "live.wav"
    assert main(["live", "tonegen:8000,-50", "--rate", "64000",
                 "--fft", "512", "--engine", "generic",
                 "--no-throttle", "--audio", "8000", "--mode", "am",
                 "--audio-rate", "8000", "--audio-wav", str(wav),
                 "--duration", "3"]) == 0
    err = capsys.readouterr().err
    assert "live: tonegen" in err and "halted after" in err
    from sigdigger_tpu.io.wav import read_wav

    audio, rate = read_wav(str(wav))
    assert rate == 8000 and len(audio) > 0


def test_cli_remote_quickconnect(tmp_path):
    """Headless QuickConnect: `remote` connects to a live session's
    wire server, streams PSD peaks and records remote audio."""
    import contextlib
    import io
    import time

    from sigdigger_tpu import cli
    from sigdigger_tpu.app import LiveSession
    from sigdigger_tpu.profiles import SourceProfile

    prof = SourceProfile(type="tonegen", sample_rate=262_144,
                         tone_freq=40_000.0)
    sess = LiveSession(profile=prof, engine="generic", wire_port=0)
    sess.start()
    try:
        time.sleep(0.5)
        port = sess.wire_server.address[1]
        wav = str(tmp_path / "remote.wav")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = cli.main(["remote", "127.0.0.1", str(port),
                           "--audio", "40000", "--mode", "fm",
                           "--duration", "3", "-o", wav])
    finally:
        sess.halt()
    assert rc == 0
    assert "peak 0.0400 MHz" in buf.getvalue()
    from sigdigger_tpu.sources import guess_metadata, make_source

    src = make_source(guess_metadata(wav))
    assert src.total_samples > 1000
