"""suscan-wire protocol: golden byte vectors + live round-trips.

The golden vectors pin the exact wire image of the handshake, auth and
message encodings (VERDICT r2 #6): any change to the bytes is an
intentional, reviewed diff, and aligning the constants with a specific
suscan build is a WireSpec-only change.
"""

from __future__ import annotations

import hashlib
import struct
import threading
import time
import zlib

import numpy as np
import pytest

from sigdigger_tpu.analyzer.messages import (
    InspectorMessage,
    InspectorMessageKind,
    Message,
    MessageKind,
    PSDMessage,
    SamplesMessage,
    SourceInfoMessage,
    StatusMessage,
)
from sigdigger_tpu.io import cbor
from sigdigger_tpu.io.suscan_wire import (
    SPEC,
    CallType,
    SuscanWireClient,
    SuscanWireServer,
    auth_token,
    decode_call,
    decode_message,
    encode_call,
    encode_message,
    make_auth,
    make_hello,
    read_pdu,
    write_pdu,
)
from sigdigger_tpu.types import Channel, SourceInfo


# ---------------------------------------------------------------------------
# CBOR codec
# ---------------------------------------------------------------------------

class TestCBOR:
    @pytest.mark.parametrize("obj,expect", [
        (0, b"\x00"),
        (23, b"\x17"),
        (24, b"\x18\x18"),
        (256, b"\x19\x01\x00"),
        (-1, b"\x20"),
        (-100, b"\x38\x63"),
        (True, b"\xf5"),
        (False, b"\xf4"),
        (None, b"\xf6"),
        ("a", b"\x61\x61"),
        (b"\x01\x02", b"\x42\x01\x02"),
        ([1, 2], b"\x82\x01\x02"),
        ({1: 2}, b"\xa1\x01\x02"),
        (1.5, b"\xfb\x3f\xf8\x00\x00\x00\x00\x00\x00"),
    ])
    def test_golden_scalars(self, obj, expect):
        # RFC 8949 appendix-A vectors
        assert cbor.encode(obj) == expect
        assert cbor.decode(expect) == obj

    def test_float32(self):
        b = cbor.encode(np.float32(1.5))
        assert b == b"\xfa\x3f\xc0\x00\x00"
        assert cbor.decode(b) == 1.5

    def test_roundtrip_nested(self):
        obj = {"a": [1, -2, "x", b"\x00\xff", None, True],
               "b": {"c": 3.25}, "n": 2 ** 40}
        assert cbor.decode(cbor.encode(obj)) == obj

    def test_trailing_bytes_rejected(self):
        with pytest.raises(ValueError):
            cbor.decode(b"\x00\x00")

    def test_truncated_rejected(self):
        with pytest.raises(ValueError):
            cbor.decode(b"\x42\x01")


# ---------------------------------------------------------------------------
# PDU framing
# ---------------------------------------------------------------------------

class TestPDU:
    def test_golden_small_pdu(self):
        pdu = write_pdu(b"\x01\x02\x03")
        assert pdu == struct.pack(">II", SPEC.pdu_magic, 3) + b"\x01\x02\x03"

    def test_large_pdu_compresses(self):
        payload = b"\x00" * (SPEC.compress_threshold + 1)
        pdu = write_pdu(payload)
        magic, size = struct.unpack(">II", pdu[:8])
        assert magic == SPEC.pdu_magic_compressed
        assert size == len(pdu) - 8 < len(payload)
        assert zlib.decompress(pdu[8:]) == payload

    def test_read_pdu_roundtrip(self):
        import socket

        a, b = socket.socketpair()
        try:
            for payload in (b"xyz", b"\x07" * (SPEC.compress_threshold * 2)):
                a.sendall(write_pdu(payload))
                assert read_pdu(b) == payload
        finally:
            a.close()
            b.close()

    def test_bad_magic_rejected(self):
        import socket

        a, b = socket.socketpair()
        try:
            a.sendall(struct.pack(">II", 0xdeadbeef, 4) + b"abcd")
            with pytest.raises(ConnectionError):
                read_pdu(b)
        finally:
            a.close()
            b.close()


# ---------------------------------------------------------------------------
# handshake golden vectors
# ---------------------------------------------------------------------------

SALT = bytes(range(32))


class TestHandshake:
    def test_hello_golden(self):
        hello = make_hello("sigdigger-tpu", SALT)
        # [HELLO, major=0, minor=1, "sigdigger-tpu", mode=1, salt]
        expect = (b"\x86\x00\x00\x01\x6dsigdigger-tpu\x01\x58\x20" + SALT)
        assert hello == expect
        ct, fields = decode_call(hello)
        assert ct == CallType.HELLO
        assert fields == [0, 1, "sigdigger-tpu", 1, SALT]

    def test_auth_token_definition(self):
        # token = sha256(salt + sha256(password)) — password never on wire
        tok = auth_token(SALT, "hunter2")
        assert tok == hashlib.sha256(
            SALT + hashlib.sha256(b"hunter2").digest()).digest()
        auth = make_auth("op", SALT, "hunter2")
        assert auth == b"\x83\x01\x62op\x58\x20" + tok
        assert b"hunter2" not in auth

    def test_call_golden_set_frequency(self):
        call = encode_call(CallType.SET_FREQUENCY, 100e6, 0.0)
        assert call == (b"\x83\x07"
                        b"\xfb\x41\x97\xd7\x84\x00\x00\x00\x00"
                        b"\xfb\x00\x00\x00\x00\x00\x00\x00\x00")
        ct, fields = decode_call(call)
        assert ct == CallType.SET_FREQUENCY
        assert fields == [100e6, 0.0]


# ---------------------------------------------------------------------------
# message codec
# ---------------------------------------------------------------------------

class TestMessageCodec:
    def test_psd_golden(self):
        data = np.arange(4, dtype=np.float32)
        msg = PSDMessage(fft_size=4, sample_rate=1e6,
                         measured_sample_rate=1e6, frequency=100e6,
                         looped=False, data=data, timestamp=0.0)
        enc = encode_message(msg)
        # [MESSAGE, kind=0 (PSD), ts, [fft, fs, mfs, f0, looped, arr]]
        assert enc == (
            b"\x84\x05\x00"
            b"\xfb\x00\x00\x00\x00\x00\x00\x00\x00"
            b"\x86\x04"
            b"\xfb\x41\x2e\x84\x80\x00\x00\x00\x00"
            b"\xfb\x41\x2e\x84\x80\x00\x00\x00\x00"
            b"\xfb\x41\x97\xd7\x84\x00\x00\x00\x00"
            b"\xf4"
            b"\x83\x67float32\x81\x04\x50" + data.tobytes())
        ct, fields = decode_call(enc)
        assert ct == CallType.MESSAGE
        back = decode_message(fields)
        assert isinstance(back, PSDMessage)
        assert back.fft_size == 4 and back.frequency == 100e6
        np.testing.assert_array_equal(back.data, data)

    def test_samples_roundtrip(self):
        s = (np.arange(6) + 1j * np.arange(6)).astype(np.complex64)
        msg = SamplesMessage(inspector_id=3, handle=7, samples=s,
                             extras={"symbols": np.array([0, 1, 2],
                                                         np.int32)},
                             timestamp=time.time())
        back = decode_message(decode_call(encode_message(msg))[1])
        assert isinstance(back, SamplesMessage)
        assert back.inspector_id == 3 and back.handle == 7
        np.testing.assert_array_equal(back.samples, s)
        np.testing.assert_array_equal(back.extras["symbols"], [0, 1, 2])

    def test_inspector_open_roundtrip(self):
        spec = np.ones(8, np.float32)
        msg = InspectorMessage(
            inspector_kind=InspectorMessageKind.OPEN, request_id=12,
            handle=2, inspector_id=5, class_name="psk",
            equiv_rate=32e3, bandwidth=10e3, lo=-5e3,
            spectrum_data=spec, spectrum_rate=1.0,
            timestamp=1.0)
        back = decode_message(decode_call(encode_message(msg))[1])
        assert back.inspector_kind == InspectorMessageKind.OPEN
        assert back.request_id == 12 and back.class_name == "psk"
        assert back.equiv_rate == 32e3 and back.lo == -5e3
        np.testing.assert_array_equal(back.spectrum_data, spec)

    def test_status_and_terminal_kinds(self):
        back = decode_message(decode_call(encode_message(
            StatusMessage(code=-2, message="boom", timestamp=2.0)))[1])
        assert back.code == -2 and back.message == "boom"
        for kind in (MessageKind.EOS, MessageKind.HALT,
                     MessageKind.READ_ERROR):
            b2 = decode_message(decode_call(encode_message(
                Message(kind=kind, timestamp=0.0)))[1])
            assert b2.kind == kind

    def test_source_info_roundtrip(self):
        info = SourceInfo(sample_rate=2e6, frequency=433e6,
                          antenna="RX", seekable=True,
                          gains={"LNA": 20.0})
        back = decode_message(decode_call(encode_message(
            SourceInfoMessage(info=info, timestamp=0.0)))[1])
        assert back.info.sample_rate == 2e6
        assert back.info.antenna == "RX"
        assert back.info.gains == {"LNA": 20.0}


# ---------------------------------------------------------------------------
# live server/client round-trip over a real socket
# ---------------------------------------------------------------------------

def _make_analyzer():
    from sigdigger_tpu.analyzer.engine import Analyzer
    from sigdigger_tpu.profiles import SourceProfile
    from sigdigger_tpu.sources import ToneGenSource
    from sigdigger_tpu.types import AnalyzerParams

    prof = SourceProfile(type="tonegen", sample_rate=64_000,
                         tone_freq=8e3, freq=100e6)
    params = AnalyzerParams()
    params.window_size = 512
    return Analyzer(source=ToneGenSource(prof), params=params,
                    block_size=4096)


class TestLiveWire:
    def test_auth_and_stream_and_control(self):
        an = _make_analyzer()
        srv = SuscanWireServer(an, user="op", password="s3cret")
        try:
            with pytest.raises(ConnectionError):
                SuscanWireClient("127.0.0.1", srv.address[1],
                                 user="op", password="wrong")
            cl = SuscanWireClient("127.0.0.1", srv.address[1],
                                  user="op", password="s3cret")
            assert cl.server_name == "sigdigger-tpu"
            assert cl.permissions == SourceInfo.PERM_ALL
            assert cl.source_info.sample_rate == 64_000

            an.start()
            # PSD flows
            deadline = time.time() + 10.0
            got_psd = None
            while time.time() < deadline and got_psd is None:
                m = cl.read(timeout=0.5)
                if m is not None and m.kind == MessageKind.PSD:
                    got_psd = m
            assert got_psd is not None
            assert got_psd.fft_size == 512
            assert np.all(np.isfinite(got_psd.data))

            # inspector open round-trip through the wire
            cl.open_inspector("audio", Channel(fc=8e3, bw=4e3),
                              request_id=77,
                              config={"audio.demodulator": 2,
                                      "audio.sample-rate": 8000.0})
            deadline = time.time() + 10.0
            opened = None
            while time.time() < deadline and opened is None:
                m = cl.read(timeout=0.5)
                if (m is not None and m.kind == MessageKind.INSPECTOR
                        and m.inspector_kind ==
                        InspectorMessageKind.OPEN):
                    opened = m
            assert opened is not None and opened.request_id == 77
            assert opened.class_name == "audio"

            # a control call takes effect server-side
            cl.set_frequency(433e6)
            deadline = time.time() + 5.0
            while time.time() < deadline and an.profile.freq != 433e6:
                time.sleep(0.05)
            assert an.profile.freq == 433e6
            cl.close()
        finally:
            srv.close()
            an.halt()

    def test_permission_denied(self):
        an = _make_analyzer()
        srv = SuscanWireServer(
            an, permissions=SourceInfo.PERM_ALL
            & ~SourceInfo.PERM_SET_FREQ)
        try:
            cl = SuscanWireClient("127.0.0.1", srv.address[1])
            cl.set_frequency(1e6)
            deadline = time.time() + 5.0
            denied = None
            while time.time() < deadline and denied is None:
                m = cl.read(timeout=0.5)
                if (m is not None and m.kind == MessageKind.STATUS
                        and m.code == -11):
                    denied = m
            assert denied is not None
            assert "SET_FREQUENCY" in denied.message
            assert an.profile.freq != 1e6
            cl.close()
        finally:
            srv.close()
            an.halt()

    def test_sync_setters_roundtrip(self):
        an = _make_analyzer()
        srv = SuscanWireServer(an)
        try:
            cl = SuscanWireClient("127.0.0.1", srv.address[1])
            cl.set_gain("LNA", 30.0)
            cl.set_antenna("RX2")
            cl.set_ppm(1.5)
            cl.set_dc_remove(True)
            cl.set_agc(True)
            deadline = time.time() + 5.0
            while time.time() < deadline and not an.profile.agc:
                time.sleep(0.05)
            assert an.profile.gains["LNA"] == 30.0
            assert an.profile.antenna == "RX2"
            assert an.profile.ppm == 1.5
            assert an.profile.dc_remove and an.profile.agc
            cl.close()
        finally:
            srv.close()
            an.halt()


class TestRound4Fixes:
    """ADVICE r3 fixes: inflate bomb guard, send serialization,
    SET_IQ_REVERSE dispatch, watermark call."""

    @staticmethod
    def _stub_sock(data: bytes):
        class _Stub:
            def __init__(self, raw):
                self._raw = raw
                self._pos = 0

            def recv(self, n):
                chunk = self._raw[self._pos:self._pos + n]
                self._pos += len(chunk)
                return chunk

        return _Stub(data)

    def test_deflate_bomb_rejected(self):
        from sigdigger_tpu.io.suscan_wire import SPEC, read_pdu

        # 256 MB of zeros deflates to ~256 KB — passes the size check
        # but must be rejected at inflate time
        bomb = zlib.compress(b"\x00" * (SPEC.max_pdu_size * 4), 9)
        assert len(bomb) < SPEC.max_pdu_size
        sock = self._stub_sock(struct.pack(
            ">II", SPEC.pdu_magic_compressed, len(bomb)) + bomb)
        with pytest.raises(ConnectionError, match="oversized"):
            read_pdu(sock)

    def test_truncated_deflate_rejected(self):
        from sigdigger_tpu.io.suscan_wire import SPEC, read_pdu

        z = zlib.compress(b"hello world" * 100)[:-4]
        sock = self._stub_sock(struct.pack(
            ">II", SPEC.pdu_magic_compressed, len(z)) + z)
        with pytest.raises(ConnectionError):
            read_pdu(sock)

    def test_iq_reverse_and_watermark_calls(self):
        an = _make_analyzer()
        srv = SuscanWireServer(an)
        try:
            cl = SuscanWireClient("127.0.0.1", srv.address[1])
            cl.set_iq_reverse(True)
            deadline = time.time() + 5.0
            while time.time() < deadline and not an.profile.iq_reverse:
                time.sleep(0.05)
            assert an.profile.iq_reverse

            h = an.open_inspector("audio", Channel(fc=8e3, bw=4e3))
            cl.set_inspector_watermark(h, 9999, request_id=5)
            deadline = time.time() + 5.0
            while (time.time() < deadline
                   and an._inspectors[h].watermark != 9999):
                time.sleep(0.05)
            assert an._inspectors[h].watermark == 9999
            ack = None
            deadline = time.time() + 5.0
            while time.time() < deadline and ack is None:
                m = cl.read(timeout=0.5)
                if (m is not None and m.kind == MessageKind.INSPECTOR
                        and m.inspector_kind ==
                        InspectorMessageKind.SET_WATERMARK):
                    ack = m
            assert ack is not None and ack.request_id == 5
            cl.close()
        finally:
            srv.close()
            an.halt()

    def test_concurrent_ping_and_broadcast_framing(self):
        """PING floods while PSD PDUs broadcast: framing must survive
        (the r3 advisor found unsynchronized sendall interleaving)."""
        an = _make_analyzer()
        srv = SuscanWireServer(an)
        try:
            cl = SuscanWireClient("127.0.0.1", srv.address[1])
            an.start()
            stop = threading.Event()

            def pinger():
                i = 0
                while not stop.is_set():
                    cl._send(CallType.PING, i)
                    i += 1
                    time.sleep(0.001)

            t = threading.Thread(target=pinger, daemon=True)
            t.start()
            n_msgs = 0
            deadline = time.time() + 6.0
            while time.time() < deadline and n_msgs < 40:
                m = cl.read(timeout=0.5)
                if m is not None:
                    n_msgs += 1
            stop.set()
            t.join(timeout=2.0)
            # the link must still be alive and framed
            assert n_msgs >= 40
            cl.close()
        finally:
            srv.close()
            an.halt()
