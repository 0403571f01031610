"""IO side-paths: data savers, socket forwarders, remote control, RMS
feeds, MAT writer."""

import socket
import threading
import time

import numpy as np

from sigdigger_tpu.io.datasaver import FileDataSaver, GenericDataSaver
from sigdigger_tpu.io.forwarder import SocketForwarder
from sigdigger_tpu.io.mat import write_mat
from sigdigger_tpu.io.remote import RemoteControlServer
from sigdigger_tpu.io.rmsviewer import RMSForwarder, RMSViewerServer
from sigdigger_tpu.utils.globalprop import GlobalProperty


def test_file_datasaver(tmp_path):
    path = str(tmp_path / "capture.raw")
    saver = FileDataSaver(path)
    data = (np.arange(10000) + 1j).astype(np.complex64)
    assert saver.write_complex(data)
    saver.close()
    back = np.fromfile(path, np.complex64)
    assert np.array_equal(back, data)
    assert saver.bytes_written == data.nbytes
    assert not saver.swamped


def test_datasaver_swamped():
    block = threading.Event()

    def slow_write(data: bytes) -> int:
        block.wait(5.0)
        return len(data)

    saver = GenericDataSaver(slow_write, max_buffer=1024)
    ok1 = saver.write(b"x" * 1000)
    ok2 = saver.write(b"x" * 1000)  # exceeds buffer while worker blocked
    assert ok1
    assert not ok2 and saver.swamped
    block.set()
    saver.close()


def test_tcp_forwarder():
    received = []
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def accept():
        conn, _ = srv.accept()
        while True:
            d = conn.recv(65536)
            if not d:
                break
            received.append(d)
        conn.close()

    t = threading.Thread(target=accept, daemon=True)
    t.start()
    fwd = SocketForwarder("127.0.0.1", port)
    data = np.arange(5000, dtype=np.complex64)
    fwd.write_complex(data)
    deadline = time.time() + 5
    while fwd.bytes_written < data.nbytes and time.time() < deadline:
        time.sleep(0.01)
    fwd.close()
    t.join(timeout=5)
    got = np.frombuffer(b"".join(received), np.complex64)
    assert np.array_equal(got, data)


def test_udp_forwarder():
    srv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    srv.bind(("127.0.0.1", 0))
    srv.settimeout(5.0)
    port = srv.getsockname()[1]
    fwd = SocketForwarder("127.0.0.1", port, udp=True)
    payload = bytes(range(256)) * 20  # 5120 B → 4 datagrams
    fwd.write(payload)
    got = b""
    while len(got) < len(payload):
        got += srv.recv(65536)
    fwd.close()
    assert got == payload


def client_lines(addr, lines):
    with socket.create_connection(addr, timeout=5.0) as s:
        f = s.makefile("rw", newline="\n")
        out = []
        for line in lines:
            f.write(line + "\n")
            f.flush()
            out.append(f.readline().strip())
        return out


def test_remote_control_server():
    GlobalProperty.clear_registry()
    GlobalProperty.register("frequency", 100e6)
    GlobalProperty.register("state", "running", writable=False)
    srv = RemoteControlServer()
    try:
        out = client_lines(srv.address, ["get frequency"])
        assert out == ["frequency=100000000.0"]
        out = client_lines(srv.address, ["set frequency 145e6",
                                         "get frequency"])
        assert out == ["OK", "frequency=145e6"]
        out = client_lines(srv.address, ["set state halted"])
        assert out[0].startswith("ERROR")
        out = client_lines(srv.address, ["get nope"])
        assert out[0].startswith("ERROR")
        out = client_lines(srv.address, ["bogus cmd here"])
        assert out[0].startswith("ERROR")
        # list returns both names (multiline reply read as 2 lines)
        with socket.create_connection(srv.address, timeout=5.0) as s:
            f = s.makefile("rw", newline="\n")
            f.write("list\n")
            f.flush()
            names = {f.readline().strip(), f.readline().strip()}
            assert names == {"frequency", "state"}
    finally:
        srv.close()


def test_global_property_listeners():
    GlobalProperty.clear_registry()
    p = GlobalProperty.register("gain", 0.0)
    seen = []
    p.on_change(lambda name, v: seen.append((name, v)))
    p.set(12.5)
    assert seen == [("gain", 12.5)]


def test_rms_feed_roundtrip():
    srv = RMSViewerServer()
    try:
        fwd = RMSForwarder(srv.address[0], srv.address[1], "test feed")
        for i in range(5):
            fwd.push(1000.0 + i, 0.5 * i)
        fwd.close()
        deadline = time.time() + 5
        while time.time() < deadline:
            if srv.feeds and len(srv.feeds[0].rows) == 5:
                break
            time.sleep(0.02)
        feed = srv.feeds[0]
        assert feed.description == "test feed"
        assert len(feed.rows) == 5
        assert feed.rows[2] == (1002.0, 1.0)
    finally:
        srv.close()


def test_mat_streaming_vs_scipy(tmp_path):
    from scipy.io import loadmat

    path = str(tmp_path / "stream.mat")
    from sigdigger_tpu.io.mat import MatFileWriter
    rng = np.random.default_rng(0)
    chunks = [
        (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
        for n in (100, 257, 63)
    ]
    with MatFileWriter(path, "iq", complex_data=True) as m:
        for c in chunks:
            m.write(c)
    md = loadmat(path)
    assert np.allclose(md["iq"].ravel(), np.concatenate(chunks),
                       atol=1e-6)

    # real matrix helper
    path2 = str(tmp_path / "real.mat")
    write_mat(path2, np.arange(10, dtype=np.float32), "Y")
    md2 = loadmat(path2)
    assert np.allclose(md2["Y"].ravel(), np.arange(10))
