"""Remote analyzer protocol + plugin loader + TLE downloader."""

import time

import numpy as np
import pytest

from sigdigger_tpu.analyzer import Analyzer, InspectorMessageKind, MessageKind
from sigdigger_tpu.io.remote_analyzer import (
    RemoteAnalyzerClient,
    RemoteAnalyzerServer,
)
from sigdigger_tpu.profiles import SourceProfile
from sigdigger_tpu.types import AnalyzerParams, Channel, SourceInfo


def make_analyzer():
    prof = SourceProfile(type="tonegen", sample_rate=1_024_000,
                         tone_freq=100_000.0, noise_db=-50.0)
    return Analyzer(profile=prof,
                    params=AnalyzerParams(window_size=1024,
                                          psd_update_interval=0.0))


def wait_for(client, pred, timeout=10.0):
    deadline = time.time() + timeout
    seen = []
    while time.time() < deadline:
        m = client.read(timeout=0.2)
        if m is not None:
            seen.append(m)
            if pred(m):
                return m, seen
    raise AssertionError(f"message not seen; got {[m.kind for m in seen]}")


def test_remote_analyzer_end_to_end():
    an = make_analyzer()
    srv = RemoteAnalyzerServer(an, token="s3cret")
    try:
        with pytest.raises(ConnectionError):
            RemoteAnalyzerClient(*srv.address, token="wrong")
        cli = RemoteAnalyzerClient(*srv.address, token="s3cret")
        assert cli.permissions == 0xFFFFFFFF

        # re-announce source info now that a client is connected (the
        # creation-time message was broadcast to an empty client list)
        an.emit_source_info()
        msg, _ = wait_for(cli, lambda m: m.kind == MessageKind.SOURCE_INFO)
        assert msg.info.sample_rate == 1_024_000

        # drive a few steps server-side; PSD rows flow to the client
        an.step()
        msg, _ = wait_for(cli, lambda m: m.kind == MessageKind.PSD)
        assert msg.data.shape == (1024,)
        freqs = np.linspace(-512_000, 512_000, 1024, endpoint=False)
        assert abs(freqs[np.argmax(msg.data)] - 100_000.0) < 2000

        # open an inspector remotely; ack + samples flow back
        cli.open_inspector("raw", Channel(fc=100_000.0, bw=20_000.0),
                           request_id=5,
                           config={"agc.enabled": False})
        deadline = time.time() + 10
        opened = None
        while time.time() < deadline and opened is None:
            an.step()
            for m in cli.poll():
                if m.kind == MessageKind.INSPECTOR and \
                        m.inspector_kind == InspectorMessageKind.OPEN:
                    opened = m
        assert opened is not None and opened.request_id == 5
        assert opened.equiv_rate > 0
        assert opened.config is not None and "agc.enabled" in \
            opened.config.schema

        an.step()
        msg, _ = wait_for(cli, lambda m: m.kind == MessageKind.SAMPLES)
        assert np.allclose(np.abs(msg.samples[64:]), 1.0, atol=0.05)

        cli.close_inspector(opened.handle)
        msg, _ = wait_for(
            cli, lambda m: m.kind == MessageKind.INSPECTOR and
            m.inspector_kind == InspectorMessageKind.CLOSE)
        cli.close()
    finally:
        srv.close()


def test_remote_permissions_gate():
    an = make_analyzer()
    srv = RemoteAnalyzerServer(an, permissions=0)  # nothing allowed
    try:
        cli = RemoteAnalyzerClient(*srv.address)
        assert cli.permissions == 0
        cli.set_frequency(1e6)
        time.sleep(0.3)
        assert an.profile.freq == 0.0   # gated
        cli.close()
    finally:
        srv.close()


def test_plugin_loader(tmp_path):
    from sigdigger_tpu.plugin import PluginLoader

    plug = tmp_path / "my_plugin.py"
    plug.write_text('''
PLUGIN_VERSION = "1.2"
PLUGIN_DESCRIPTION = "test plugin"

def plugin_entry(registry):
    registry.register_tool("hello", lambda: "world")
    registry.register_task("noop", object)
    registry.register_factory("inspection-widget", "fancy", dict)
''')
    bad = tmp_path / "broken.py"
    bad.write_text("def plugin_entry(r): raise RuntimeError('boom')\n")

    loader = PluginLoader()
    infos = loader.load_directory(str(tmp_path))
    by_name = {i.name: i for i in infos}
    assert by_name["my_plugin"].loaded
    assert by_name["my_plugin"].version == "1.2"
    assert not by_name["broken"].loaded
    assert "boom" in by_name["broken"].error
    assert loader.registry.tools["hello"]() == "world"
    assert loader.registry.factories("inspection-widget") == {
        "fancy": dict}


def test_tle_downloader_local_file(tmp_path):
    from sigdigger_tpu.library import Library
    from sigdigger_tpu.tasks.tle import TLEDownloaderTask

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
    path = tmp_path / "sat.tle"
    path.write_text("\n".join(fixed))
    lib = Library(config_dir=str(tmp_path / "cfg"))
    task = TLEDownloaderTask(f"file://{path}", library=lib)
    state = task.run()
    assert state.error is None and state.result == 1
    assert "ISS (ZARYA)" in lib.tle_sets


def test_tle_downloader_unreachable():
    from sigdigger_tpu.tasks.tle import TLEDownloaderTask

    task = TLEDownloaderTask("http://127.0.0.1:1/none.txt", timeout=0.5)
    state = task.run()
    assert state.error is not None   # graceful failure, no raise
