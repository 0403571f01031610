"""Minimal deterministic CBOR (RFC 8949) codec.

The suscan remote-analyzer protocol serializes its call payloads with a
compact CBOR subset (the suscan C sources are not present in the
reference tree; the serialization discipline here follows the public
CBOR standard).  This codec implements exactly the subset the wire
protocol needs, deterministically:

- unsigned / negative integers (shortest form),
- byte strings, UTF-8 text strings (definite length),
- arrays and maps (definite length),
- floats: float32 values encode as IEEE-754 single (0xfa), Python
  floats as double (0xfb),
- ``False`` / ``True`` / ``None`` simple values.

Determinism matters: the golden byte vectors in
``tests/test_suscan_wire.py`` pin every handshake/message encoding so
any change to the wire image is an intentional, reviewed diff.
"""

from __future__ import annotations

import struct
from typing import Any

import numpy as np

_MAJOR_UINT = 0
_MAJOR_NINT = 1
_MAJOR_BYTES = 2
_MAJOR_TEXT = 3
_MAJOR_ARRAY = 4
_MAJOR_MAP = 5
_SIMPLE_FALSE = b"\xf4"
_SIMPLE_TRUE = b"\xf5"
_SIMPLE_NULL = b"\xf6"
_FLOAT32 = b"\xfa"
_FLOAT64 = b"\xfb"


def _head(major: int, arg: int) -> bytes:
    mb = major << 5
    if arg < 24:
        return bytes([mb | arg])
    if arg < 0x100:
        return bytes([mb | 24, arg])
    if arg < 0x10000:
        return bytes([mb | 25]) + struct.pack(">H", arg)
    if arg < 0x100000000:
        return bytes([mb | 26]) + struct.pack(">I", arg)
    return bytes([mb | 27]) + struct.pack(">Q", arg)


def encode(obj: Any) -> bytes:
    """Encode ``obj`` to canonical CBOR bytes."""
    out = bytearray()
    _encode_into(obj, out)
    return bytes(out)


def _encode_into(obj: Any, out: bytearray) -> None:
    if obj is None:
        out += _SIMPLE_NULL
    elif obj is True:
        out += _SIMPLE_TRUE
    elif obj is False:
        out += _SIMPLE_FALSE
    elif isinstance(obj, np.float32):
        out += _FLOAT32 + struct.pack(">f", float(obj))
    elif isinstance(obj, float):
        out += _FLOAT64 + struct.pack(">d", obj)
    elif isinstance(obj, (int, np.integer)):
        v = int(obj)
        if v >= 0:
            out += _head(_MAJOR_UINT, v)
        else:
            out += _head(_MAJOR_NINT, -1 - v)
    elif isinstance(obj, (bytes, bytearray, memoryview)):
        b = bytes(obj)
        out += _head(_MAJOR_BYTES, len(b)) + b
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        out += _head(_MAJOR_TEXT, len(b)) + b
    elif isinstance(obj, (list, tuple)):
        out += _head(_MAJOR_ARRAY, len(obj))
        for item in obj:
            _encode_into(item, out)
    elif isinstance(obj, dict):
        out += _head(_MAJOR_MAP, len(obj))
        for k, v in obj.items():
            _encode_into(k, out)
            _encode_into(v, out)
    else:
        raise TypeError(f"CBOR: unsupported type {type(obj)!r}")


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise ValueError("CBOR: truncated input")
        b = self.buf[self.pos:self.pos + n]
        self.pos += n
        return b

    def byte(self) -> int:
        return self.take(1)[0]


def _read_arg(r: _Reader, info: int) -> int:
    if info < 24:
        return info
    if info == 24:
        return r.byte()
    if info == 25:
        return struct.unpack(">H", r.take(2))[0]
    if info == 26:
        return struct.unpack(">I", r.take(4))[0]
    if info == 27:
        return struct.unpack(">Q", r.take(8))[0]
    raise ValueError(f"CBOR: unsupported additional info {info}")


def _decode_one(r: _Reader) -> Any:
    ib = r.byte()
    major, info = ib >> 5, ib & 0x1F
    if major == _MAJOR_UINT:
        return _read_arg(r, info)
    if major == _MAJOR_NINT:
        return -1 - _read_arg(r, info)
    if major == _MAJOR_BYTES:
        return r.take(_read_arg(r, info))
    if major == _MAJOR_TEXT:
        return r.take(_read_arg(r, info)).decode("utf-8")
    if major == _MAJOR_ARRAY:
        return [_decode_one(r) for _ in range(_read_arg(r, info))]
    if major == _MAJOR_MAP:
        return {_decode_one(r): _decode_one(r)
                for _ in range(_read_arg(r, info))}
    if major == 7:
        if info == 20:
            return False
        if info == 21:
            return True
        if info == 22:
            return None
        if info == 26:
            return float(struct.unpack(">f", r.take(4))[0])
        if info == 27:
            return struct.unpack(">d", r.take(8))[0]
    raise ValueError(f"CBOR: unsupported item 0x{ib:02x}")


def decode(buf: bytes) -> Any:
    """Decode a single CBOR item; trailing bytes are an error."""
    r = _Reader(buf)
    obj = _decode_one(r)
    if r.pos != len(buf):
        raise ValueError(f"CBOR: {len(buf) - r.pos} trailing bytes")
    return obj
