"""MessagePack codec for the engine's value domain — pure Python.

Mirrors the reference's msgpack codec (`library/models/codec/msgpack.js`):
Sets ride in extension type 72 (ref msgpack.js:67-69, the tested convention);
this implementation adds ext 73 for ordered/arbitrary-key Maps, ext 74 for
URL, and the standard timestamp ext -1 for Date.  BigInts outside int64 use
ext 75 (big-endian two's-complement).  Extension payloads are themselves
msgpack-encoded values.

Format per the public spec: https://github.com/msgpack/msgpack/blob/master/spec.md
"""

from __future__ import annotations

import datetime as _dt
import struct
from typing import Any, Iterator

from ..values import PMap, PSet, Undefined, URLValue

EXT_SET = 72  # ref msgpack.js:67-69
EXT_MAP = 73
EXT_URL = 74
EXT_BIGINT = 75
EXT_UNDEFINED = 76
EXT_TIMESTAMP = -1  # msgpack spec timestamp extension


class MsgpackError(ValueError):
    pass


# --------------------------------------------------------------------------
# encode
# --------------------------------------------------------------------------


def _ext(out: list[bytes], code: int, payload: bytes) -> None:
    n = len(payload)
    c = code & 0xFF
    if n == 1:
        out.append(struct.pack(">BB", 0xD4, c))
    elif n == 2:
        out.append(struct.pack(">BB", 0xD5, c))
    elif n == 4:
        out.append(struct.pack(">BB", 0xD6, c))
    elif n == 8:
        out.append(struct.pack(">BB", 0xD7, c))
    elif n == 16:
        out.append(struct.pack(">BB", 0xD8, c))
    elif n < 0x100:
        out.append(struct.pack(">BBB", 0xC7, n, c))
    elif n < 0x10000:
        out.append(struct.pack(">BHB", 0xC8, n, c))
    else:
        out.append(struct.pack(">BIB", 0xC9, n, c))
    out.append(payload)


def _encode(out: list[bytes], v: Any) -> None:
    if v is None:
        out.append(b"\xc0")
    elif v is Undefined:
        _ext(out, EXT_UNDEFINED, b"\x00")
    elif isinstance(v, bool):
        out.append(b"\xc3" if v else b"\xc2")
    elif isinstance(v, int):
        if 0 <= v < 0x80:
            out.append(bytes([v]))
        elif -0x20 <= v < 0:
            out.append(struct.pack("b", v))
        elif 0 <= v < 0x100:
            out.append(struct.pack(">BB", 0xCC, v))
        elif 0 <= v < 0x10000:
            out.append(struct.pack(">BH", 0xCD, v))
        elif 0 <= v < 0x100000000:
            out.append(struct.pack(">BI", 0xCE, v))
        elif 0 <= v < (1 << 64):
            out.append(struct.pack(">BQ", 0xCF, v))
        elif -0x80 <= v < 0:
            out.append(struct.pack(">Bb", 0xD0, v))
        elif -0x8000 <= v < 0:
            out.append(struct.pack(">Bh", 0xD1, v))
        elif -0x80000000 <= v < 0:
            out.append(struct.pack(">Bi", 0xD2, v))
        elif -(1 << 63) <= v < 0:
            out.append(struct.pack(">Bq", 0xD3, v))
        else:  # bignum
            nbytes = (v.bit_length() + 8) // 8  # +1 bit for sign
            _ext(out, EXT_BIGINT, v.to_bytes(nbytes, "big", signed=True))
    elif isinstance(v, float):
        out.append(b"\xcb" + struct.pack(">d", v))
    elif isinstance(v, str):
        b = v.encode("utf-8")
        n = len(b)
        if n < 32:
            out.append(bytes([0xA0 | n]))
        elif n < 0x100:
            out.append(struct.pack(">BB", 0xD9, n))
        elif n < 0x10000:
            out.append(struct.pack(">BH", 0xDA, n))
        else:
            out.append(struct.pack(">BI", 0xDB, n))
        out.append(b)
    elif isinstance(v, (bytes, bytearray, memoryview)):
        b = bytes(v)
        n = len(b)
        if n < 0x100:
            out.append(struct.pack(">BB", 0xC4, n))
        elif n < 0x10000:
            out.append(struct.pack(">BH", 0xC5, n))
        else:
            out.append(struct.pack(">BI", 0xC6, n))
        out.append(b)
    elif isinstance(v, (list, tuple)):
        n = len(v)
        if n < 16:
            out.append(bytes([0x90 | n]))
        elif n < 0x10000:
            out.append(struct.pack(">BH", 0xDC, n))
        else:
            out.append(struct.pack(">BI", 0xDD, n))
        for x in v:
            _encode(out, x)
    elif isinstance(v, dict):
        _encode_map(out, list(v.items()))
    elif isinstance(v, PMap):
        inner: list[bytes] = []
        _encode_map(inner, v.entries)
        _ext(out, EXT_MAP, b"".join(inner))
    elif isinstance(v, (PSet, set, frozenset)):
        members = v.members if isinstance(v, PSet) else list(v)
        inner = []
        _encode(inner, members)
        _ext(out, EXT_SET, b"".join(inner))
    elif isinstance(v, _dt.datetime):
        ts = v.timestamp() if v.tzinfo else v.replace(tzinfo=_dt.timezone.utc).timestamp()
        sec = int(ts // 1)
        nsec = int(round((ts - sec) * 1e9))
        if nsec == 0 and 0 <= sec < 0x100000000:
            _ext(out, EXT_TIMESTAMP, struct.pack(">I", sec))
        else:
            data64 = (nsec << 34) | (sec & 0x3FFFFFFFF)
            if sec >= 0 and (sec >> 34) == 0:
                _ext(out, EXT_TIMESTAMP, struct.pack(">Q", data64))
            else:
                _ext(out, EXT_TIMESTAMP, struct.pack(">Iq", nsec, sec))
    elif isinstance(v, URLValue):
        inner = []
        _encode(inner, v.href)
        _ext(out, EXT_URL, b"".join(inner))
    else:
        raise MsgpackError(f"cannot msgpack-encode {type(v)!r}")


def _encode_map(out: list[bytes], entries) -> None:
    n = len(entries)
    if n < 16:
        out.append(bytes([0x80 | n]))
    elif n < 0x10000:
        out.append(struct.pack(">BH", 0xDE, n))
    else:
        out.append(struct.pack(">BI", 0xDF, n))
    for k, x in entries:
        _encode(out, k)
        _encode(out, x)


def encode(value: Any) -> bytes:
    out: list[bytes] = []
    _encode(out, value)
    return b"".join(out)


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise MsgpackError("truncated msgpack")
        b = self.buf[self.pos:self.pos + n]
        self.pos += n
        return b

    def byte(self) -> int:
        return self.take(1)[0]


#: maximum container nesting — a few-KB bomb of nested single-element
#: arrays (or depth-resetting nested ext containers) otherwise dies with
#: RecursionError, outside the MsgpackError (ValueError) contract (the
#: avro kernel lesson).  Each level costs ~2 interpreter frames, so the
#: cap must sit well under CPython's 1000-frame default.
_MAX_DEPTH = 256


def _decode_nested(payload: bytes, depth: int) -> Any:
    """decode() twin that PRESERVES the nesting depth across ext-payload
    boundaries — calling the public decode() here would reset the depth
    counter and reopen the bomb through nested Set/Map/URL exts."""
    r = _Reader(bytes(payload))
    v = _decode(r, depth)
    if r.pos != len(r.buf):
        raise MsgpackError(f"trailing bytes after msgpack item at {r.pos}")
    return v


def _decode_ext(code: int, payload: bytes, depth: int = 0) -> Any:
    if code >= 0x80:
        code -= 0x100  # signed ext code
    if code == EXT_TIMESTAMP:
        # spec timestamp ext is EXACTLY 4/8/12 bytes; anything else must
        # raise MsgpackError, not struct.error (which is NOT a ValueError)
        if len(payload) == 4:
            sec, nsec = struct.unpack(">I", payload)[0], 0
        elif len(payload) == 8:
            d = struct.unpack(">Q", payload)[0]
            nsec, sec = d >> 34, d & 0x3FFFFFFFF
        elif len(payload) == 12:
            nsec, sec = struct.unpack(">Iq", payload)
        else:
            raise MsgpackError(
                f"timestamp ext payload is {len(payload)} bytes "
                "(spec allows 4/8/12)")
        try:
            return _dt.datetime.fromtimestamp(
                sec + nsec / 1e9, tz=_dt.timezone.utc)
        except (OverflowError, OSError, ValueError):
            # int64 seconds reach ±9e18 — far outside datetime's range;
            # keep the crafted-input contract (MsgpackError, not OS/Overflow)
            raise MsgpackError(f"timestamp ext out of range: {sec}")
    if code == EXT_SET:
        inner = _decode_nested(payload, depth + 1)
        if type(inner) is not list:
            raise MsgpackError(
                f"ext {EXT_SET} (set) payload is {type(inner).__name__}")
        return PSet(inner)
    if code == EXT_MAP:
        inner = _decode_nested(payload, depth + 1)
        if isinstance(inner, PMap):
            return PMap(inner.entries)
        if not isinstance(inner, dict):
            raise MsgpackError(
                f"ext {EXT_MAP} (map) payload is {type(inner).__name__}")
        return PMap(inner.items())
    if code == EXT_URL:
        inner = _decode_nested(payload, depth + 1)
        if type(inner) is not str:
            raise MsgpackError(
                f"ext {EXT_URL} (URL) payload is {type(inner).__name__}")
        return URLValue(inner)
    if code == EXT_BIGINT:
        return int.from_bytes(payload, "big", signed=True)
    if code == EXT_UNDEFINED:
        return Undefined
    raise MsgpackError(f"unknown ext type {code}")


def _decode(r: _Reader, depth: int = 0) -> Any:
    if depth > _MAX_DEPTH:
        raise MsgpackError(f"nesting deeper than {_MAX_DEPTH}")
    b = r.byte()
    if b < 0x80:
        return b
    if b >= 0xE0:
        return b - 0x100
    if 0x80 <= b < 0x90:
        return _finish_map(r, b & 0x0F, depth)
    if 0x90 <= b < 0xA0:
        return [_decode(r, depth + 1) for _ in range(b & 0x0F)]
    if 0xA0 <= b < 0xC0:
        return r.take(b & 0x1F).decode("utf-8")
    if b == 0xC0:
        return None
    if b == 0xC2:
        return False
    if b == 0xC3:
        return True
    if b == 0xC4:
        return r.take(r.byte())
    if b == 0xC5:
        return r.take(struct.unpack(">H", r.take(2))[0])
    if b == 0xC6:
        return r.take(struct.unpack(">I", r.take(4))[0])
    if b in (0xC7, 0xC8, 0xC9):
        n = (r.byte() if b == 0xC7 else
             struct.unpack(">H", r.take(2))[0] if b == 0xC8 else
             struct.unpack(">I", r.take(4))[0])
        code = r.byte()
        return _decode_ext(code, r.take(n), depth)
    if b == 0xCA:
        return struct.unpack(">f", r.take(4))[0]
    if b == 0xCB:
        return struct.unpack(">d", r.take(8))[0]
    if b == 0xCC:
        return r.byte()
    if b == 0xCD:
        return struct.unpack(">H", r.take(2))[0]
    if b == 0xCE:
        return struct.unpack(">I", r.take(4))[0]
    if b == 0xCF:
        return struct.unpack(">Q", r.take(8))[0]
    if b == 0xD0:
        return struct.unpack("b", r.take(1))[0]
    if b == 0xD1:
        return struct.unpack(">h", r.take(2))[0]
    if b == 0xD2:
        return struct.unpack(">i", r.take(4))[0]
    if b == 0xD3:
        return struct.unpack(">q", r.take(8))[0]
    if b in (0xD4, 0xD5, 0xD6, 0xD7, 0xD8):
        n = {0xD4: 1, 0xD5: 2, 0xD6: 4, 0xD7: 8, 0xD8: 16}[b]
        code = r.byte()
        return _decode_ext(code, r.take(n), depth)
    if b == 0xD9:
        return r.take(r.byte()).decode("utf-8")
    if b == 0xDA:
        return r.take(struct.unpack(">H", r.take(2))[0]).decode("utf-8")
    if b == 0xDB:
        return r.take(struct.unpack(">I", r.take(4))[0]).decode("utf-8")
    if b == 0xDC:
        return [_decode(r, depth + 1) for _ in range(struct.unpack(">H", r.take(2))[0])]
    if b == 0xDD:
        return [_decode(r, depth + 1) for _ in range(struct.unpack(">I", r.take(4))[0])]
    if b == 0xDE:
        return _finish_map(r, struct.unpack(">H", r.take(2))[0], depth)
    if b == 0xDF:
        return _finish_map(r, struct.unpack(">I", r.take(4))[0], depth)
    raise MsgpackError(f"bad msgpack byte 0x{b:02x}")


def _finish_map(r: _Reader, n: int, depth: int = 0) -> Any:
    pairs = [(_decode(r, depth + 1), _decode(r, depth + 1)) for _ in range(n)]
    if all(isinstance(k, str) for k, _ in pairs):
        return dict(pairs)
    return PMap(pairs)


def decode(data: bytes) -> Any:
    r = _Reader(bytes(data))
    v = _decode(r)
    if r.pos != len(r.buf):
        raise MsgpackError(f"trailing bytes after msgpack item at {r.pos}")
    return v


def decode_seq(data: bytes) -> Iterator[Any]:
    """Decode concatenated top-level items (entries stream, ref
    msgpack.js:76-81)."""
    r = _Reader(bytes(data))
    while r.pos < len(r.buf):
        yield _decode(r)


def encode_seq(values) -> bytes:
    return b"".join(encode(v) for v in values)
