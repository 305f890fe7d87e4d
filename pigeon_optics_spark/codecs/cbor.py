"""CBOR codec (RFC 8949) for the engine's value domain — pure Python.

The reference stores records as CBOR (`library/models/base-data-model.js:302-316`
uses the npm `cbor` codec with `useTag259ForMaps`, ref
`library/models/codec/cbor.js:6-7`).  This is a from-scratch implementation
over the public RFC, covering exactly the engine's value domain (SURVEY §1.3):

- null / bool / int (incl. bignum via tags 2/3) / float64 (NaN/±Inf native)
- text strings (utf-8), byte strings (Buffer)
- arrays, string-keyed objects (major type 5 maps with text keys)
- ``Map`` (ordered, arbitrary keys)  → tag 259 (the convention the reference
  enables; payload is a map)
- ``Set``                            → tag 258 (finite set)
- ``Date``                           → tag 1 (epoch seconds, float)
- ``URL``                            → tag 32 (URI text string)
- ``undefined``                      → simple(23)

Encoding uses definite lengths and preserves map insertion order.  Multiple
top-level items are concatenated (CBOR sequences) for entries streams.
"""

from __future__ import annotations

import datetime as _dt
import math
import struct
from typing import Any, Iterator

from ..values import PMap, PSet, Undefined, URLValue

TAG_DATE_EPOCH = 1
TAG_POS_BIGNUM = 2
TAG_NEG_BIGNUM = 3
TAG_URI = 32
TAG_SET = 258
TAG_MAP = 259  # ref codec/cbor.js:6-7 (useTag259ForMaps)


class CBORError(ValueError):
    pass


# --------------------------------------------------------------------------
# encode
# --------------------------------------------------------------------------


def _head(major: int, arg: int) -> bytes:
    if arg < 24:
        return bytes([(major << 5) | arg])
    if arg < 0x100:
        return bytes([(major << 5) | 24, arg])
    if arg < 0x10000:
        return struct.pack(">BH", (major << 5) | 25, arg)
    if arg < 0x100000000:
        return struct.pack(">BI", (major << 5) | 26, arg)
    return struct.pack(">BQ", (major << 5) | 27, arg)


def _encode_int(out: list[bytes], v: int) -> None:
    if v >= 0:
        if v < (1 << 64):
            out.append(_head(0, v))
        else:
            out.append(_head(6, TAG_POS_BIGNUM))
            b = v.to_bytes((v.bit_length() + 7) // 8 or 1, "big")
            out.append(_head(2, len(b)))
            out.append(b)
    else:
        m = -1 - v
        if m < (1 << 64):
            out.append(_head(1, m))
        else:
            out.append(_head(6, TAG_NEG_BIGNUM))
            b = m.to_bytes((m.bit_length() + 7) // 8 or 1, "big")
            out.append(_head(2, len(b)))
            out.append(b)


def _encode(out: list[bytes], v: Any) -> None:
    if v is None:
        out.append(b"\xf6")
    elif v is Undefined:
        out.append(b"\xf7")
    elif isinstance(v, bool):
        out.append(b"\xf5" if v else b"\xf4")
    elif isinstance(v, int):
        _encode_int(out, v)
    elif isinstance(v, float):
        out.append(b"\xfb" + struct.pack(">d", v))
    elif isinstance(v, str):
        b = v.encode("utf-8")
        out.append(_head(3, len(b)))
        out.append(b)
    elif isinstance(v, (bytes, bytearray, memoryview)):
        b = bytes(v)
        out.append(_head(2, len(b)))
        out.append(b)
    elif isinstance(v, (list, tuple)):
        out.append(_head(4, len(v)))
        for x in v:
            _encode(out, x)
    elif isinstance(v, dict):
        out.append(_head(5, len(v)))
        for k, x in v.items():
            _encode(out, k)
            _encode(out, x)
    elif isinstance(v, PMap):
        out.append(_head(6, TAG_MAP))
        out.append(_head(5, len(v.entries)))
        for k, x in v.entries:
            _encode(out, k)
            _encode(out, x)
    elif isinstance(v, (PSet, set, frozenset)):
        members = v.members if isinstance(v, PSet) else list(v)
        out.append(_head(6, TAG_SET))
        out.append(_head(4, len(members)))
        for x in members:
            _encode(out, x)
    elif isinstance(v, _dt.datetime):
        ts = v.timestamp() if v.tzinfo else v.replace(tzinfo=_dt.timezone.utc).timestamp()
        out.append(_head(6, TAG_DATE_EPOCH))
        out.append(b"\xfb" + struct.pack(">d", ts))
    elif isinstance(v, URLValue):
        out.append(_head(6, TAG_URI))
        b = v.href.encode("utf-8")
        out.append(_head(3, len(b)))
        out.append(b)
    else:
        raise CBORError(f"cannot CBOR-encode {type(v)!r}")


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
            raise CBORError("truncated CBOR")
        b = self.buf[self.pos:self.pos + n]
        self.pos += n
        return b

    def byte(self) -> int:
        return self.take(1)[0]

    def peek(self) -> int:
        # bounds-checked peek: a truncated stream inside an
        # indefinite-length container must raise CBORError, not the
        # IndexError a raw buf[pos] gives (the contract every caller
        # handles is CBORError/ValueError)
        if self.pos >= len(self.buf):
            raise CBORError("truncated CBOR")
        return self.buf[self.pos]


def _read_arg(r: _Reader, info: int) -> int | None:
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
    if info == 31:
        return None  # indefinite
    raise CBORError(f"bad additional info {info}")


#: maximum container nesting — a 3 KB bomb of nested single-element
#: arrays otherwise dies with RecursionError, outside the CBORError
#: (ValueError) contract every caller handles (the avro kernel lesson).
#: Each level costs ~2 interpreter frames (call + listcomp), so the cap
#: must sit well under CPython's 1000-frame default
_MAX_DEPTH = 256


def _decode(r: _Reader, depth: int = 0) -> Any:
    if depth > _MAX_DEPTH:
        raise CBORError(f"nesting deeper than {_MAX_DEPTH}")
    ib = r.byte()
    major, info = ib >> 5, ib & 0x1F
    if major == 0:
        n = _read_arg(r, info)
        if n is None:  # 0x1f: "indefinite-length integer" is malformed
            raise CBORError("indefinite length on an integer (major 0)")
        return n
    if major == 1:
        n = _read_arg(r, info)
        if n is None:  # 0x3f would otherwise escape as TypeError (-1 - None)
            raise CBORError("indefinite length on an integer (major 1)")
        return -1 - n
    if major == 2 or major == 3:
        n = _read_arg(r, info)
        if n is None:  # indefinite-length string: concat chunks
            # RFC 8949 §3.2.3: every chunk must be a definite-length
            # string of the SAME major type — anything else is malformed.
            want = bytes if major == 2 else str
            chunks = []
            while True:
                head = r.peek()
                if head == 0xFF:
                    r.pos += 1
                    break
                # chunks must be DEFINITE-length strings of the same
                # major type (RFC 8949 §3.2.3) — enforce on the header so
                # a nested indefinite chunk (also malformed) is rejected
                # too, not just foreign-type chunks
                if (head >> 5) != major or (head & 0x1F) == 31:
                    raise CBORError(
                        f"indefinite-length string chunk has header "
                        f"0x{head:02x}, expected definite major {major}")
                c = _decode(r, depth + 1)
                if type(c) is not want:
                    raise CBORError(
                        f"indefinite-length string chunk is "
                        f"{type(c).__name__}, expected {want.__name__}")
                chunks.append(c)
            if major == 2:
                return b"".join(chunks)
            return "".join(chunks)
        b = r.take(n)
        return b if major == 2 else b.decode("utf-8")
    if major == 4:
        n = _read_arg(r, info)
        if n is None:
            items = []
            while r.peek() != 0xFF:
                items.append(_decode(r, depth + 1))
            r.pos += 1
            return items
        return [_decode(r, depth + 1) for _ in range(n)]
    if major == 5:
        n = _read_arg(r, info)
        pairs = []
        if n is None:
            while r.peek() != 0xFF:
                pairs.append((_decode(r, depth + 1), _decode(r, depth + 1)))
            r.pos += 1
        else:
            pairs = [(_decode(r, depth + 1), _decode(r, depth + 1)) for _ in range(n)]
        if all(isinstance(k, str) for k, _ in pairs):
            return dict(pairs)
        return PMap(pairs)  # non-string keys: surface as Map
    if major == 6:
        tag = _read_arg(r, info)
        if tag is None:  # 0xdf: indefinite-length tag number is malformed
            raise CBORError("indefinite length on a tag (major 6)")
        inner = _decode(r, depth + 1)
        # each known tag requires a specific payload shape — a crafted
        # stream with the wrong one must raise CBORError, not escape as
        # TypeError/OverflowError from the conversion (same contract
        # class as the indefinite-string chunk check above)
        if tag == TAG_DATE_EPOCH:
            if type(inner) not in (int, float) or isinstance(inner, bool):
                raise CBORError(
                    f"tag 1 (epoch date) payload is {type(inner).__name__}")
            try:
                return _dt.datetime.fromtimestamp(
                    float(inner), tz=_dt.timezone.utc)
            except (OverflowError, OSError, ValueError):
                raise CBORError(f"tag 1 epoch out of range: {inner!r}")
        if tag == TAG_POS_BIGNUM or tag == TAG_NEG_BIGNUM:
            if type(inner) is not bytes:
                raise CBORError(
                    f"tag {tag} (bignum) payload is {type(inner).__name__}")
            n = int.from_bytes(inner, "big")
            return n if tag == TAG_POS_BIGNUM else -1 - n
        if tag == TAG_URI:
            if type(inner) is not str:
                raise CBORError(
                    f"tag 32 (URI) payload is {type(inner).__name__}")
            return URLValue(inner)
        if tag == TAG_SET:
            if type(inner) is not list:
                raise CBORError(
                    f"tag 258 (set) payload is {type(inner).__name__}")
            return PSet(inner)
        if tag == TAG_MAP:
            if isinstance(inner, PMap):
                return inner
            if not isinstance(inner, dict):
                raise CBORError(
                    f"tag 259 (map) payload is {type(inner).__name__}")
            return PMap(inner.items())
        return inner  # unknown tag: unwrap
    if major == 7:
        if info == 20:
            return False
        if info == 21:
            return True
        if info == 22:
            return None
        if info == 23:
            return Undefined
        if info == 25:  # float16
            return _decode_f16(struct.unpack(">H", r.take(2))[0])
        if info == 26:
            return struct.unpack(">f", r.take(4))[0]
        if info == 27:
            return struct.unpack(">d", r.take(8))[0]
        if info < 24:
            return info  # simple value
        if info == 24:
            return r.byte()
    raise CBORError(f"bad CBOR item (major={major}, info={info})")


def _decode_f16(h: int) -> float:
    sign = -1.0 if h & 0x8000 else 1.0
    exp = (h >> 10) & 0x1F
    frac = h & 0x3FF
    if exp == 0:
        return sign * frac * 2.0 ** -24
    if exp == 31:
        return sign * (float("inf") if frac == 0 else float("nan"))
    return sign * (1 + frac / 1024.0) * 2.0 ** (exp - 15)


def decode(data: bytes) -> Any:
    r = _Reader(bytes(data))
    v = _decode(r)
    if r.pos != len(r.buf):
        raise CBORError(f"trailing bytes after CBOR item at {r.pos}")
    return v


def decode_seq(data: bytes) -> Iterator[Any]:
    """Decode a CBOR sequence (concatenated top-level items — the entries
    stream form, ref cbor.js:40)."""
    r = _Reader(bytes(data))
    while r.pos < len(r.buf):
        yield _decode(r)


def encode_seq(values) -> bytes:
    return b"".join(encode(v) for v in values)
