"""Pure-Python Avro OCF reader vs the AUTHORITATIVE JVM Avro library
(org.apache.avro on Spark's classpath, driven via py4j): round-trips over
every supported type, both codecs, and the strictness negatives."""

import struct
import tempfile

import pytest

from pigeon_optics_spark.sources.avro_reader import (
    _Buf,
    avro_file_records,
    read_datum,
)

_SCHEMA = """{
  "type": "record", "name": "T", "fields": [
    {"name": "id", "type": "long"},
    {"name": "small", "type": "int"},
    {"name": "flag", "type": "boolean"},
    {"name": "f", "type": "float"},
    {"name": "d", "type": "double"},
    {"name": "s", "type": "string"},
    {"name": "b", "type": "bytes"},
    {"name": "maybe", "type": ["null", "string"]},
    {"name": "tags", "type": {"type": "array", "items": "string"}},
    {"name": "kv", "type": {"type": "map", "values": "long"}},
    {"name": "color", "type": {"type": "enum", "name": "C",
                               "symbols": ["RED", "GREEN", "BLUE"]}},
    {"name": "fx", "type": {"type": "fixed", "name": "F4", "size": 4}}
  ]
}"""


def _jvm_write(spark, codec: str, rows: list[dict]) -> bytes:
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(_SCHEMA)
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    dfw = jvm.org.apache.avro.file.DataFileWriter(writer)
    if codec == "deflate":
        dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(5))
    fd, path = tempfile.mkstemp(suffix=".avro")
    import os
    os.close(fd)
    dfw.create(schema, jvm.java.io.File(path))
    enum_schema = schema.getField("color").schema()
    fixed_schema = schema.getField("fx").schema()
    for r in rows:
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("id", jvm.java.lang.Long.valueOf(r["id"]))
        rec.put("small", jvm.java.lang.Integer.valueOf(r["small"]))
        rec.put("flag", r["flag"])
        rec.put("f", jvm.java.lang.Float.valueOf(repr(r["f"])))
        rec.put("d", jvm.java.lang.Double.valueOf(repr(r["d"])))
        rec.put("s", r["s"])
        rec.put("b", jvm.java.nio.ByteBuffer.wrap(bytearray(r["b"])))
        rec.put("maybe", r["maybe"])
        arr = jvm.java.util.ArrayList()
        for t in r["tags"]:
            arr.add(t)
        rec.put("tags", arr)
        m = jvm.java.util.HashMap()
        for k, v in r["kv"].items():
            m.put(k, jvm.java.lang.Long.valueOf(v))
        rec.put("kv", m)
        rec.put("color", jvm.org.apache.avro.generic.GenericData
                .EnumSymbol(enum_schema, r["color"]))
        rec.put("fx", jvm.org.apache.avro.generic.GenericData
                .Fixed(fixed_schema, bytearray(r["fx"])))
        dfw.append(rec)
    dfw.close()
    try:
        return open(path, "rb").read()
    finally:
        os.unlink(path)


_ROWS = [
    {"id": 2**40 + 7, "small": -3, "flag": True, "f": 1.5, "d": 0.1,
     "s": "héllo", "b": b"\x00\xff", "maybe": None,
     "tags": ["a", "b", "c"], "kv": {"x": 1, "y": -2},
     "color": "GREEN", "fx": b"ABCD"},
    {"id": -1, "small": 0, "flag": False, "f": -0.25, "d": 2.0**53,
     "s": "", "b": b"", "maybe": "yes",
     "tags": [], "kv": {}, "color": "RED", "fx": b"\x00\x01\x02\x03"},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip_against_jvm_writer(spark, codec):
    data = _jvm_write(spark, codec, _ROWS)
    schema, got_codec, records = avro_file_records(data)
    assert got_codec == codec
    assert len(records) == 2
    for want, got in zip(_ROWS, records):
        assert got["id"] == want["id"]
        assert got["small"] == want["small"]
        assert got["flag"] == want["flag"]
        assert got["f"] == struct.unpack("<f", struct.pack(
            "<f", want["f"]))[0]
        assert got["d"] == want["d"]
        assert got["s"] == want["s"]
        assert got["b"] == want["b"]
        assert got["maybe"] == want["maybe"]
        assert got["tags"] == want["tags"]
        assert got["kv"] == want["kv"]
        assert got["color"] == want["color"]
        assert got["fx"] == want["fx"]


def test_strictness_negatives(spark):
    data = _jvm_write(spark, "deflate", _ROWS)
    with pytest.raises(ValueError, match="magic"):
        avro_file_records(b"NOPE" + data[4:])
    with pytest.raises(ValueError, match="truncated"):
        avro_file_records(data[:-5])
    # flip a byte inside the trailing sync marker -> mismatch, not silence
    corrupt = data[:-3] + bytes([data[-3] ^ 0xFF]) + data[-2:]
    with pytest.raises(ValueError, match="sync|truncated"):
        avro_file_records(corrupt)


def test_unsupported_codec_refuses():
    # hand-build a header that claims snappy
    import json
    def zz(n):
        n = (n << 1) ^ (n >> 63)
        out = bytearray()
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)
    def bs(b):
        return zz(len(b)) + b
    meta = (zz(2)
            + bs(b"avro.schema") + bs(json.dumps("long").encode())
            + bs(b"avro.codec") + bs(b"snappy")
            + zz(0))
    blob = b"Obj\x01" + meta + b"S" * 16
    with pytest.raises(ValueError, match="codec"):
        avro_file_records(blob)


def test_varint_guard():
    with pytest.raises(ValueError, match="varint"):
        read_datum("long", _Buf(b"\xff" * 11))


from hypothesis import given, settings
from hypothesis import strategies as st

_H_ROW = st.fixed_dictionaries({
    "id": st.integers(-2**62, 2**62),
    "small": st.integers(-2**31, 2**31 - 1),
    "flag": st.booleans(),
    "f": st.floats(allow_nan=False, allow_infinity=False, width=32),
    "d": st.floats(allow_nan=False, allow_infinity=False, width=64),
    "s": st.text(max_size=12),
    "b": st.binary(max_size=12),
    "maybe": st.one_of(st.none(), st.text(max_size=6)),
    "tags": st.lists(st.text(max_size=4), max_size=5),
    "kv": st.dictionaries(st.text(min_size=1, max_size=4),
                          st.integers(-2**40, 2**40), max_size=4),
    "color": st.sampled_from(["RED", "GREEN", "BLUE"]),
    "fx": st.binary(min_size=4, max_size=4),
})


@settings(max_examples=10, deadline=None)
@given(rows=st.lists(_H_ROW, min_size=1, max_size=5),
       deflate=st.booleans())
def test_property_roundtrip_random_values(spark, rows, deflate):
    """Random values of every supported type through the AUTHORITATIVE
    JVM writer must decode exactly (both codecs)."""
    data = _jvm_write(spark, "deflate" if deflate else "null", rows)
    _schema, _codec, records = avro_file_records(data)
    assert len(records) == len(rows)
    for want, got in zip(rows, records):
        for k in ("id", "small", "flag", "d", "s", "b", "maybe",
                  "tags", "kv", "color", "fx"):
            assert got[k] == want[k], k
        assert got["f"] == struct.unpack("<f", struct.pack(
            "<f", want["f"]))[0]


def test_negative_block_size_terminates(spark):
    """A crafted tail (count 0, NEGATIVE zigzag block size) must raise,
    not rewind the cursor into an infinite re-read of the sync marker."""
    data = _jvm_write(spark, "null", _ROWS[:1])
    with pytest.raises(ValueError, match="negative size"):
        avro_file_records(data + b"\x00\x23")


def test_named_type_reference_resolves(spark):
    """The writer serializes the SECOND use of a named type as a bare
    name string — the reader must resolve it."""
    jvm = spark._jvm
    sch = ('{"type":"record","name":"R","fields":['
           '{"name":"a","type":{"type":"fixed","name":"F4","size":4}},'
           '{"name":"b","type":"F4"}]}')
    schema = jvm.org.apache.avro.Schema.Parser().parse(sch)
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    dfw = jvm.org.apache.avro.file.DataFileWriter(writer)
    fd, path = tempfile.mkstemp(suffix=".avro")
    import os
    os.close(fd)
    dfw.create(schema, jvm.java.io.File(path))
    fx = schema.getField("a").schema()
    rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
    rec.put("a", jvm.org.apache.avro.generic.GenericData
            .Fixed(fx, bytearray(b"AAAA")))
    rec.put("b", jvm.org.apache.avro.generic.GenericData
            .Fixed(fx, bytearray(b"BBBB")))
    dfw.append(rec)
    dfw.close()
    try:
        _s, _c, records = avro_file_records(open(path, "rb").read())
    finally:
        os.unlink(path)
    assert records == [{"a": b"AAAA", "b": b"BBBB"}]


def test_crash_safety_fuzz_only_value_error():
    """The multimodal byte-walkers' crash-safety fuzz, applied to the
    avro kernel with its loud-failure contract: on ANY input the reader
    either returns or raises ValueError — never KeyError / TypeError /
    struct.error / a hang.  Feeds (a) random bytes, (b) truncations of a
    valid file at every length, (c) single-byte corruptions."""
    import random

    sch = ('{"type":"record","name":"T","fields":['
           '{"name":"i","type":"long"},'
           '{"name":"s","type":"string"},'
           '{"name":"u","type":["null","double"]},'
           '{"name":"e","type":{"type":"enum","name":"E",'
           '"symbols":["A","B"]}},'
           '{"name":"x","type":{"type":"fixed","name":"X","size":2}},'
           '{"name":"a","type":{"type":"array","items":"int"}}]}')
    payload = (_zz(7) + _zz(2) + b"hi" + _zz(1) +
               struct.pack("<d", 1.5) + _zz(0) + b"XY" +
               _zz(2) + _zz(3) + _zz(-4) + _zz(0))
    valid = _ocf(sch, [(1, payload)])
    assert avro_file_records(valid)[2] == [
        {"i": 7, "s": "hi", "u": 1.5, "e": "A", "x": b"XY", "a": [3, -4]}]

    def try_one(b):
        try:
            avro_file_records(b)
        except ValueError:
            pass  # the documented loud-failure contract

    rng = random.Random(42)
    for _ in range(300):
        try_one(bytes(rng.randrange(256)
                      for _ in range(rng.randrange(0, 200))))
    for cut in range(len(valid)):
        try_one(valid[:cut])
    for _ in range(500):
        b = bytearray(valid)
        b[rng.randrange(len(b))] = rng.randrange(256)
        try_one(bytes(b))


@pytest.mark.parametrize("sch,blocks", [
    ('{"type":"record","name":"T"}', [(1, b"")]),             # no fields
    ('{"type":"enum","name":"E"}', [(1, b"\x00")]),           # no symbols
    ('{"type":"fixed","name":"X"}', [(1, b"AB")]),            # no size
    ('{"type":"fixed","name":"X","size":"2"}', [(1, b"AB")]),  # str size
    ('{"type":"array"}', [(1, b"\x00")]),                     # no items
    ('5', [(1, b"")]),                                        # non-schema
])
def test_malformed_schema_is_value_error(sch, blocks):
    """Parseable-JSON-but-malformed schemas must honor the loud
    ValueError contract — not escape as KeyError/TypeError."""
    with pytest.raises(ValueError):
        avro_file_records(_ocf(sch, blocks))


def test_missing_schema_key_is_value_error():
    def zz(n):
        n = (n << 1) ^ (n >> 63)
        out = bytearray()
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)
    blob = b"Obj\x01" + zz(0) + b"S" * 16
    with pytest.raises(ValueError, match="avro.schema"):
        avro_file_records(blob)


def test_varint_ten_byte_cap():
    # exactly 10 bytes (9 continuations + terminator) is legal...
    v = read_datum("long", _Buf(b"\xff" * 9 + b"\x01"))
    assert isinstance(v, int)
    # ...but a continuation bit on the 10th byte demands an 11th: refuse
    with pytest.raises(ValueError, match="varint"):
        read_datum("long", _Buf(b"\xff" * 10 + b"\x01"))


def test_varint_64bit_overflow_refused():
    """A 10th byte with any payload bit above bit 0 encodes an integer
    beyond int64 range — the JVM reader rejects it; so must we."""
    with pytest.raises(ValueError, match="overflows 64 bits"):
        read_datum("long", _Buf(b"\xff" * 9 + b"\x7f"))
    # the int64 boundary itself stays legal: zigzag(2**64-1) = -2**63
    assert read_datum("long", _Buf(b"\xff" * 9 + b"\x01")) == -(2**63)


def _zz(n: int) -> bytes:
    n = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def test_zero_width_item_block_count_bounded():
    """A crafted block count like 2**40 over a ZERO-byte-wide item type
    (array of null) would loop forever appending — the executor-hang
    class.  The reader must refuse, not hang."""
    arr_of_null = {"type": "array", "items": "null"}
    with pytest.raises(ValueError, match="zero-width"):
        read_datum(arr_of_null, _Buf(_zz(2**40) + _zz(0)))
    # ...while a sane zero-width block still decodes
    got = read_datum(arr_of_null, _Buf(_zz(3) + _zz(0)))
    assert got == [None, None, None]
    # byte-consuming items are bounded by the input itself: a huge count
    # over longs dies on truncation, never a hang
    arr_of_long = {"type": "array", "items": "long"}
    with pytest.raises(ValueError, match="truncated"):
        read_datum(arr_of_long, _Buf(_zz(2**40) + _zz(1) * 4))


@settings(max_examples=8, deadline=None)
@given(data=st.data())
def test_property_namespaced_schema_shapes(spark, data):
    """Random namespace placement (root attr / dotted name / inherited /
    absent) with a reused named type referenced by fullname or relative
    name — parsed and serialized by the AUTHORITATIVE JVM parser, so the
    reader's fullname registration/resolution is fuzzed against whatever
    normal form the JVM actually writes into OCF metadata."""
    ns_style = data.draw(st.sampled_from(
        ["attr", "dotted", "none"]), label="ns_style")
    ref_style = data.draw(st.sampled_from(
        ["full", "relative"]), label="ref_style")
    deep = data.draw(st.booleans(), label="reuse_inside_child")
    ns = "org.test.fuzz"
    if ns_style == "attr":
        rec_name = '"name":"Rec","namespace":"%s"' % ns
    elif ns_style == "dotted":
        rec_name = '"name":"%s.Rec"' % ns
    else:
        rec_name = '"name":"Rec"'
        ns = ""
    ref = f"{ns}.F8" if (ref_style == "full" and ns) else "F8"
    reuse_field = '{"name":"b","type":"%s"}' % ref
    if deep:
        reuse_field = ('{"name":"b","type":{"type":"record","name":"Kid",'
                       '"fields":[{"name":"x","type":"%s"}]}}' % ref)
    sch = ('{"type":"record",%s,"fields":['
           '{"name":"a","type":{"type":"fixed","name":"F8","size":8}},'
           '%s]}' % (rec_name, reuse_field))
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(sch)
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    dfw = jvm.org.apache.avro.file.DataFileWriter(writer)
    fd, path = tempfile.mkstemp(suffix=".avro")
    import os
    os.close(fd)
    dfw.create(schema, jvm.java.io.File(path))
    fx = schema.getField("a").schema()

    def _fixed(b):
        return jvm.org.apache.avro.generic.GenericData.Fixed(
            fx, bytearray(b))

    rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
    rec.put("a", _fixed(b"AAAAAAAA"))
    if deep:
        kid_schema = schema.getField("b").schema()
        kid = jvm.org.apache.avro.generic.GenericData.Record(kid_schema)
        kid.put("x", _fixed(b"XXXXXXXX"))
        rec.put("b", kid)
    else:
        rec.put("b", _fixed(b"BBBBBBBB"))
    dfw.append(rec)
    dfw.close()
    try:
        _s, _c, records = avro_file_records(open(path, "rb").read())
    finally:
        os.unlink(path)
    want_b = {"x": b"XXXXXXXX"} if deep else b"BBBBBBBB"
    assert records == [{"a": b"AAAAAAAA", "b": want_b}]


def _ocf(schema_json: str, blocks: list[bytes]) -> bytes:
    """Hand-build a minimal OCF (null codec) around pre-encoded blocks of
    (count, size, payload) triples for crafted-input tests."""
    def bs(b):
        return _zz(len(b)) + b
    meta = (_zz(2)
            + bs(b"avro.schema") + bs(schema_json.encode())
            + bs(b"avro.codec") + bs(b"null")
            + _zz(0))
    sync = b"S" * 16
    out = b"Obj\x01" + meta + sync
    for count, payload in blocks:
        out += _zz(count) + _zz(len(payload)) + payload + sync
    return out


def test_zero_width_file_block_count_bounded():
    """The TOP-LEVEL block record loop has the same hang class as array
    blocks: schema "null" decodes from zero bytes, so a crafted block
    count of 2^40 over an empty payload must raise, not loop forever."""
    from pigeon_optics_spark.sources.avro_reader import avro_file_records
    with pytest.raises(ValueError, match="zero-width"):
        avro_file_records(_ocf('"null"', [(2**40, b"")]))
    # a sane zero-width block still decodes
    _s, _c, recs = avro_file_records(_ocf('"null"', [(3, b"")]))
    assert recs == [None, None, None]
    # a NEGATIVE block record count is a loud error, not silently empty
    with pytest.raises(ValueError, match="negative block record count"):
        avro_file_records(_ocf('"null"', [(-2, b"")]))


def test_zero_width_cap_is_cumulative_across_blocks():
    """Many small zero-width block counts amplify exactly like one big
    one (each count header is ~3 bytes), so the cap must be cumulative —
    a per-block cap is bypassed by repetition."""
    from pigeon_optics_spark.sources.avro_reader import avro_file_records
    # array datum: two blocks of 65536 nulls each -> cumulative 131072
    arr = {"type": "array", "items": "null"}
    two_blocks = _zz(65536) + _zz(65536) + _zz(0)
    with pytest.raises(ValueError, match="zero-width"):
        read_datum(arr, _Buf(two_blocks))
    # file level: two OCF blocks of 65536 zero-width datums each
    with pytest.raises(ValueError, match="zero-width"):
        avro_file_records(_ocf('"null"', [(65536, b""), (65536, b"")]))


def test_recursive_schema_depth_bounded():
    """Avro legally permits recursive named types; ~250 crafted bytes of
    nested union-branch-1 previously died with RecursionError — outside
    the loud-ValueError contract.  The datum decoder is depth-bounded."""
    from pigeon_optics_spark.sources.avro_reader import avro_file_records
    sch = ('{"type":"record","name":"N","fields":['
           '{"name":"x","type":["null","N"]}]}')
    # 300 levels of branch-1 nesting, then branch-0 (null) terminates
    payload = b"\x02" * 300 + b"\x00"
    with pytest.raises(ValueError, match="nested deeper"):
        avro_file_records(_ocf(sch, [(1, payload)]))
    # a sane recursive datum (3 levels) still decodes
    _s, _c, recs = avro_file_records(_ocf(sch, [(1, b"\x02\x02\x00")]))
    assert recs == [{"x": {"x": {"x": None}}}]


def test_undotted_ref_binds_current_namespace_first():
    """JVM resolution order: an undotted reference inside namespace `ns`
    binds to `ns.F4`, even when a DIFFERENT type named `F4` exists in the
    null namespace.  Binding to the wrong one here reads the wrong byte
    width — silent corruption, not an error."""
    from pigeon_optics_spark.sources.avro_reader import avro_file_records
    sch = ('[{"type":"fixed","name":"F4","size":2},'
           '{"type":"record","name":"ns.Rec","fields":['
           '{"name":"a","type":{"type":"fixed","name":"F4","size":4}},'
           '{"name":"b","type":"F4"}]}]')
    # one datum: union branch 1 (Rec), a=4 bytes, b=4 bytes
    payload = b"\x02" + b"AAAA" + b"BBBB"
    _s, _c, recs = avro_file_records(_ocf(sch, [(1, payload)]))
    assert recs == [{"a": b"AAAA", "b": b"BBBB"}]


def test_namespaced_schema_roundtrip(spark):
    """Avro named-type references in namespaced schemas serialize as
    FULLNAMES (e.g. "com.example.F4") — the common real-world shape; the
    reader must register definitions under their fullname (honoring
    enclosing-record namespace inheritance) and resolve both fullname
    and relative references."""
    jvm = spark._jvm
    sch = ('{"type":"record","name":"Rec","namespace":"com.example",'
           '"fields":['
           '{"name":"a","type":{"type":"fixed","name":"F4","size":4}},'
           '{"name":"b","type":"com.example.F4"},'
           '{"name":"c","type":"F4"},'
           '{"name":"child","type":{"type":"record","name":"Child",'
           '"fields":[{"name":"x","type":"F4"}]}},'
           '{"name":"child2","type":"Child"}]}')
    schema = jvm.org.apache.avro.Schema.Parser().parse(sch)
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    dfw = jvm.org.apache.avro.file.DataFileWriter(writer)
    fd, path = tempfile.mkstemp(suffix=".avro")
    import os
    os.close(fd)
    dfw.create(schema, jvm.java.io.File(path))
    fx = schema.getField("a").schema()
    child_schema = schema.getField("child").schema()

    def _fixed(b):
        return jvm.org.apache.avro.generic.GenericData.Fixed(
            fx, bytearray(b))

    rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
    rec.put("a", _fixed(b"AAAA"))
    rec.put("b", _fixed(b"BBBB"))
    rec.put("c", _fixed(b"CCCC"))
    ch = jvm.org.apache.avro.generic.GenericData.Record(child_schema)
    ch.put("x", _fixed(b"XXXX"))
    rec.put("child", ch)
    ch2 = jvm.org.apache.avro.generic.GenericData.Record(child_schema)
    ch2.put("x", _fixed(b"YYYY"))
    rec.put("child2", ch2)
    dfw.append(rec)
    dfw.close()
    try:
        _s, _c, records = avro_file_records(open(path, "rb").read())
    finally:
        os.unlink(path)
    assert records == [{"a": b"AAAA", "b": b"BBBB", "c": b"CCCC",
                        "child": {"x": b"XXXX"},
                        "child2": {"x": b"YYYY"}}]
