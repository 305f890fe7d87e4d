"""Pure-Python Avro Object Container File reader.

Closes the documented Avro-source gap (VERDICT r5 "What's missing" #3):
the ``spark-avro`` DataSource module is not deployable in this container,
but the Avro CORE library ships on Spark's classpath — so fixtures can be
authored by the AUTHORITATIVE JVM implementation (via py4j, driver-side)
and decoded executor-side by this reader inside ``mapInPandas``, the same
plumbing shape as the repo's other container kernels (tar/WebP/MP3/...).

Implements the OCF grammar (Avro 1.12 spec, "Object Container Files"):
magic ``Obj\\x01``, file-metadata map (``avro.schema`` JSON,
``avro.codec``), 16-byte sync marker, then blocks of
``(record_count, byte_size, payload, sync)``.  Codecs: ``null`` and
``deflate`` (raw DEFLATE, no zlib header).  Datum grammar: zigzag-varint
ints/longs, little-endian IEEE float/double, length-prefixed
bytes/string, records, enums, fixed, unions, and block-encoded
arrays/maps (including the negative-count + byte-size form).

Strictness stance (the tar/TIFF lesson): truncation, bad magic, a sync
marker mismatch, or an unsupported codec RAISE ``ValueError`` — never a
silently short result.
"""

from __future__ import annotations

import json
import struct
import zlib

_MAGIC = b"Obj\x01"


class _Buf:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def take(self, n: int) -> bytes:
        if n < 0:
            # a negative declared size would REWIND the cursor — with a
            # crafted 2-byte tail that re-reads the sync marker forever
            raise ValueError(f"avro: negative size {n} at {self.pos}")
        if self.pos + n > len(self.data):
            raise ValueError(
                f"avro: truncated — need {n} bytes at offset {self.pos}, "
                f"have {len(self.data) - self.pos}")
        out = self.data[self.pos:self.pos + n]
        self.pos += n
        return out

    def at_end(self) -> bool:
        return self.pos >= len(self.data)


def _read_long(buf: _Buf) -> int:
    """Zigzag varint (int and long share the wire format)."""
    shift = 0
    acc = 0
    while True:
        b = buf.take(1)[0]
        if shift == 63 and b & 0x7E:
            # the 10th byte sits at shift 63: only its LOW bit fits in
            # 64 bits — any higher payload bit silently yields an
            # integer beyond int64 range, which the JVM reader rejects
            raise ValueError("avro: varint overflows 64 bits")
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 63:
            # the 10th byte reads at shift 63; a continuation bit on it
            # would demand an 11th byte — over the spec's 10-byte cap
            raise ValueError("avro: varint longer than 10 bytes")
    return (acc >> 1) ^ -(acc & 1)


def _read_bytes(buf: _Buf) -> bytes:
    n = _read_long(buf)
    if n < 0:
        raise ValueError(f"avro: negative bytes length {n}")
    return buf.take(n)


#: Per-block cap on items whose datum encoding is ZERO bytes wide (an
#: all-``null`` array, an empty record, ``fixed`` of size 0).  Items that
#: consume at least one byte are bounded by the input itself (``take``
#: raises on truncation), but a zero-width item with a crafted count like
#: 2**40 would loop forever appending — the executor-hang class.  Real
#: zero-width collections carry no information; 64k is far beyond any
#: legitimate file.
_ZERO_WIDTH_ITEM_CAP = 65536


def _read_blocks(buf: _Buf, read_item):
    """Array/map block encoding: series of counts (negative count =>
    abs(count) items preceded by a byte size), terminated by 0."""
    items = []
    zero_width = 0
    while True:
        n = _read_long(buf)
        if n == 0:
            return items
        if n < 0:
            _read_long(buf)  # block byte size — present, unused
            n = -n
        before = buf.pos
        items.append(read_item())
        if buf.pos == before:
            # zero-width is schema-static (every item of this block
            # decodes identically from zero bytes), so one probe item
            # proves this block can't be bounded by input bytes.  The
            # cap is CUMULATIVE across blocks: many small counts (3
            # bytes each) amplify exactly like one big one
            zero_width += n
            if zero_width > _ZERO_WIDTH_ITEM_CAP:
                raise ValueError(
                    f"avro: {zero_width} zero-width items across blocks "
                    f"exceed cap {_ZERO_WIDTH_ITEM_CAP}")
        for _ in range(n - 1):
            items.append(read_item())


#: Maximum datum nesting.  Avro legally permits RECURSIVE named types
#: (a record referencing itself through a union), so a few hundred
#: crafted bytes can nest arbitrarily deep — unbounded recursion dies
#: with RecursionError, outside the loud-ValueError contract.  200
#: levels is far beyond any legitimate payload.
_MAX_DATUM_DEPTH = 200


def read_datum(schema, buf: _Buf, depth: int = 0):
    """Decode one datum per ``schema`` (the parsed-JSON form: str for
    primitives/named refs, dict for complex, list for unions)."""
    if depth > _MAX_DATUM_DEPTH:
        raise ValueError(
            f"avro: datum nested deeper than {_MAX_DATUM_DEPTH} "
            "(recursive-schema bomb)")
    if isinstance(schema, list):  # union: zigzag branch index first
        idx = _read_long(buf)
        if not 0 <= idx < len(schema):
            raise ValueError(f"avro: union branch {idx} of {len(schema)}")
        return read_datum(schema[idx], buf, depth + 1)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {f["name"]: read_datum(f["type"], buf, depth + 1)
                    for f in schema["fields"]}
        if t == "enum":
            idx = _read_long(buf)
            symbols = schema["symbols"]
            if not 0 <= idx < len(symbols):
                raise ValueError(f"avro: enum index {idx}")
            return symbols[idx]
        if t == "fixed":
            return buf.take(schema["size"])
        if t == "array":
            item = schema["items"]
            return _read_blocks(
                buf, lambda: read_datum(item, buf, depth + 1))
        if t == "map":
            val = schema["values"]
            return dict(_read_blocks(
                buf, lambda: (_read_bytes(buf).decode("utf-8"),
                              read_datum(val, buf, depth + 1))))
        schema = t  # {"type": "long"} primitive wrapper form
    if schema == "null":
        return None
    if schema == "boolean":
        return buf.take(1)[0] != 0
    if schema in ("int", "long"):
        return _read_long(buf)
    if schema == "float":
        return struct.unpack("<f", buf.take(4))[0]
    if schema == "double":
        return struct.unpack("<d", buf.take(8))[0]
    if schema == "bytes":
        return _read_bytes(buf)
    if schema == "string":
        return _read_bytes(buf).decode("utf-8")
    raise ValueError(f"avro: unsupported schema {schema!r}")


def _resolve_names(schema, names: dict, ns: str | None = None):
    """Replace named-type REFERENCES (the writer serializes the second
    use of a record/enum/fixed as just a name string) with the registered
    definition, walking the tree once up front so read_datum never sees
    an unresolved name.

    Names follow the Avro spec: a definition registers under its FULLNAME
    (``namespace`` attribute + '.' + name; a dotted ``name`` IS the
    fullname; with neither, the enclosing definition's namespace is
    inherited).  A reference resolves first as a fullname, then relative
    to the current namespace — so a JVM-written OCF using namespaced
    schemas (the common real-world shape) round-trips."""
    if isinstance(schema, list):
        return [_resolve_names(s, names, ns) for s in schema]
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "enum", "fixed"):
            name = schema["name"]
            if "." in name:
                this_ns, simple = name.rsplit(".", 1)
            else:
                this_ns = schema.get("namespace", ns)
                simple = name
            full = f"{this_ns}.{simple}" if this_ns else simple
            names[full] = schema
            if t == "record":
                schema["fields"] = [
                    {**f, "type": _resolve_names(f["type"], names, this_ns)}
                    for f in schema["fields"]]
            return schema
        if t == "array":
            schema["items"] = _resolve_names(schema["items"], names, ns)
            return schema
        if t == "map":
            schema["values"] = _resolve_names(schema["values"], names, ns)
            return schema
        return schema
    if isinstance(schema, str):
        # JVM resolution order: an undotted reference binds to the
        # CURRENT namespace first (so a same-simple-name type in the
        # null namespace can't shadow it), then the bare name; a dotted
        # reference is a fullname and hits the registry directly
        if "." not in schema and ns and f"{ns}.{schema}" in names:
            return names[f"{ns}.{schema}"]
        if schema in names:
            return names[schema]
    return schema


def avro_file_records(data: bytes):
    """Decode a whole OCF: returns ``(schema_dict, codec, records)``."""
    buf = _Buf(data)
    if buf.take(4) != _MAGIC:
        raise ValueError("avro: bad magic (not an Object Container File)")
    meta = dict(_read_blocks(
        buf, lambda: (_read_bytes(buf).decode("utf-8"), _read_bytes(buf))))
    if "avro.schema" not in meta:
        raise ValueError("avro: file metadata lacks avro.schema")
    try:
        schema = _resolve_names(
            json.loads(meta["avro.schema"].decode("utf-8")), {})
    except (KeyError, TypeError, AttributeError, RecursionError) as e:
        # parseable-JSON-but-malformed schema (a record without "fields",
        # a non-dict where a definition belongs, a nesting bomb blowing
        # the json/resolve recursion): same loud-ValueError contract as
        # every other byte error, not a stray KeyError/RecursionError
        raise ValueError(f"avro: malformed schema: {e!r}") from e
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec!r}")
    sync = buf.take(16)
    records = []
    zero_width = 0
    while not buf.at_end():
        n = _read_long(buf)
        size = _read_long(buf)
        payload = buf.take(size)
        if buf.take(16) != sync:
            raise ValueError("avro: block sync marker mismatch")
        if codec == "deflate":
            try:
                payload = zlib.decompress(payload, -15)  # raw DEFLATE
            except zlib.error as e:
                raise ValueError(f"avro: corrupt deflate block: {e}") from e
        if n < 0:
            raise ValueError(f"avro: negative block record count {n}")
        pbuf = _Buf(payload)
        if n:
            # same zero-width hang class as _read_blocks: a top-level
            # schema of "null" (or an empty record) decodes from zero
            # bytes, so a crafted block count like 2^40 would loop
            # forever here — probe one datum, then bound
            try:
                records.append(read_datum(schema, pbuf))
                if pbuf.pos == 0:
                    # cumulative across the FILE's blocks, like
                    # _read_blocks: many small zero-width counts amplify
                    # exactly like one big one
                    zero_width += n
                    if zero_width > _ZERO_WIDTH_ITEM_CAP:
                        raise ValueError(
                            f"avro: {zero_width} zero-width datums "
                            f"across blocks exceed cap "
                            f"{_ZERO_WIDTH_ITEM_CAP}")
                for _ in range(n - 1):
                    records.append(read_datum(schema, pbuf))
            except (KeyError, TypeError, AttributeError,
                    RecursionError) as e:
                # an enum without "symbols", a fixed without (or with a
                # non-int) "size": malformed input, same ValueError
                # contract as truncation
                raise ValueError(f"avro: malformed schema: {e!r}") from e
        if not pbuf.at_end():
            raise ValueError(
                f"avro: {len(payload) - pbuf.pos} undecoded bytes left in "
                "block (count/size disagreement)")
    return schema, codec, records
