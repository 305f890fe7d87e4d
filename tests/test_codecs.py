"""M3 codec tests — roundtrip corpus in the style of the reference's
``test/test-models-codec.js:8-56`` (fixed value corpus × every codec ×
value/stream/entries modes), plus dispatch tests (``codec/index.js:19-49``).
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from pigeon_optics_spark.codecs import CODECS, codec_for
from pigeon_optics_spark.codecs.jsonml import is_jsonml
from pigeon_optics_spark.values import (
    PMap,
    PSet,
    Undefined,
    URLValue,
    canonical_json,
)

JSONML_DOC = ["root", {"attr": "value", "n": "1"},
              "text ", ["child", {"a": "b"}, "inner"], " tail"]

# the fixed corpus (ref test-models-codec.js:8-56: bools, ints, floats,
# extended constants, buffers, sets, maps, nested, unicode incl emoji)
CORPUS = [
    None,
    True,
    False,
    0,
    1,
    -1,
    123456789,
    -(2 ** 40),
    2 ** 70,            # bignum
    -(2 ** 70),
    0.5,
    -3.25,
    1e300,
    float("nan"),
    float("inf"),
    float("-inf"),
    "",
    "hello world",
    "emoji 🐦✨ and ünïcödé ωμέγα",
    "line\nbreaks\tand tabs",
    b"",
    b"\x00\x01\xfe\xff binary",
    [],
    [1, 2, 3],
    [None, [None, [None]]],
    {"a": 1, "b": [True, "x"], "c": {"d": None}},
    {"type": "not-a-tag-collision"},
    PSet([1, "two", [3]]),
    PMap([(1, "one"), ("k", {"v": 2}), ([1, 2], "list-key")]),
    dt.datetime(2020, 5, 17, 12, 30, 15, 500000, tzinfo=dt.timezone.utc),
    URLValue("https://example.com/path?q=1"),
    JSONML_DOC,
    {"nested": PSet([PMap([("k", b"\x01")])]), "arr": [2 ** 60, float("inf")]},
]

VALUE_CODECS = ["json", "json5", "jsonl", "cbor", "yaml", "msgpack", "xml"]


def same(a, b) -> bool:
    return canonical_json(a) == canonical_json(b)


@pytest.mark.parametrize("name", VALUE_CODECS)
@pytest.mark.parametrize("idx", range(len(CORPUS)))
def test_roundtrip_value(name, idx):
    codec = CODECS[name]
    v = CORPUS[idx]
    out = codec.decode(codec.encode(v))
    assert same(out, v), f"{name} corpus[{idx}]: {v!r} -> {out!r}"


@pytest.mark.parametrize("name", VALUE_CODECS)
def test_roundtrip_stream(name):
    codec = CODECS[name]
    out = list(codec.decode_iterable(codec.encode_iterable(CORPUS)))
    assert len(out) == len(CORPUS)
    for got, want in zip(out, CORPUS):
        assert same(got, want), f"{name}: {want!r} -> {got!r}"


@pytest.mark.parametrize("name", VALUE_CODECS + ["html"])
def test_roundtrip_entries(name):
    codec = CODECS[name]
    if name == "html":
        pytest.skip("html codec has no entries mode")
    entries = [
        {"id": "abc", "version": 3, "hash": "ab" * 32, "data": {"tags": ["x"]}},
        {"id": "def", "version": 5, "hash": "cd" * 32,
         "data": PSet(["a", "b"])},
        {"id": "stub", "version": 1, "hash": "ef" * 32},  # ?at= stub: no data
    ]
    got = list(codec.decode_entries(codec.encode_entries(iter(entries))))
    assert len(got) == 3
    for g, w in zip(got, entries):
        assert g["id"] == w["id"]
        assert int(g["version"]) == w["version"]
        assert g["hash"] == w["hash"]
        if "data" in w:
            assert same(g["data"], w["data"])
        else:
            assert "data" not in g or g["data"] is None


def test_undefined_roundtrip():
    for name in ("json", "cbor", "msgpack", "xml"):
        codec = CODECS[name]
        assert codec.decode(codec.encode(Undefined)) is Undefined


def test_html_roundtrips_markup():
    codec = CODECS["html"]
    doc = ["html", ["head", ["title", "T"]],
           ["body", {"class": "c"}, ["p", "hello ", ["b", "bold"], " tail"],
            ["img", {"src": "x.png"}]]]
    got = codec.decode(codec.encode(doc))
    assert same(got, doc)


def test_html_rejects_non_markup():
    with pytest.raises(ValueError):
        CODECS["html"].encode({"not": "markup"})


def test_json5_tolerant_decode():
    c = CODECS["json5"]
    src = b"""{
      // comment
      unquoted: 'single',
      hex: 0xFF, /* block */
      trailing: [1, 2, 3,],
      inf: Infinity, nan: NaN, frac: .5,
    }"""
    v = c.decode(src)
    assert v["unquoted"] == "single"
    assert v["hex"] == 255
    assert v["trailing"] == [1, 2, 3]
    assert v["inf"] == float("inf") and math.isnan(v["nan"]) and v["frac"] == 0.5


def test_yaml_external_native_dates():
    # valid external YAML with unquoted dates/timestamps must decode into the
    # engine's Date domain (tz-aware UTC datetime), not crash (the reference's
    # YAML codec surfaces these as Date values)
    import datetime as dt

    c = CODECS["yaml"]
    v = c.decode(b"when: 2024-03-01\nstamp: 2024-03-01 12:30:00\n"
                 b"stamped_tz: 2024-03-01 12:30:00+02:00\n"
                 b"nested:\n  - 2020-01-01\nblob: !!binary aGk=\n")
    assert v["when"] == dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc)
    assert v["stamp"] == dt.datetime(2024, 3, 1, 12, 30, tzinfo=dt.timezone.utc)
    assert v["stamped_tz"] == dt.datetime(2024, 3, 1, 10, 30, tzinfo=dt.timezone.utc)
    assert v["nested"][0] == dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc)
    assert v["blob"] == b"hi"
    # and the engine's own encode→decode of the result roundtrips
    assert c.decode(c.encode(v)) == v


def test_yaml_external_native_date_keys():
    # unquoted dates/timestamps in KEY position load as datetime.date/datetime
    # keys — the string-keyed value domain must stringify them (ISO 8601)
    # instead of crashing json.dumps inside tagged_to_value
    c = CODECS["yaml"]
    v = c.decode(b"2024-01-01: x\n2024-03-01 12:30:00: y\n"
                 b"? !!binary aGk=\n: z\n7: int-key\n")
    assert v["2024-01-01"] == "x"
    assert v["2024-03-01T12:30:00"] == "y"
    assert v["aGk="] == "z"
    assert v["7"] == "int-key"
    assert c.decode(c.encode(v)) == v


def test_yaml_native_key_collision_refused():
    # int 7 and string "7" both stringify to "7" — last-one-wins would
    # silently drop a value, so the decode must refuse instead (ADVICE r4)
    c = CODECS["yaml"]
    with pytest.raises(ValueError, match="collide"):
        c.decode(b'7: a\n"7": b\n')
    with pytest.raises(ValueError, match="collide"):
        c.decode(b'2024-01-01: a\n"2024-01-01": b\n')


def test_codec_dispatch():
    assert codec_for("application/json").name == "json"
    assert codec_for("application/json; charset=utf-8").name == "json"
    assert codec_for(".cbor").name == "cbor"
    assert codec_for("yaml").name == "yaml"
    assert codec_for("text/html").name == "html"
    assert codec_for("application/x-ndjson").name == "jsonl"
    assert codec_for("application/vnd.thing+json").name == "json"
    with pytest.raises(KeyError):
        codec_for("application/octet-stream")


def test_is_jsonml():
    assert is_jsonml(JSONML_DOC)
    assert not is_jsonml({"a": 1})
    assert not is_jsonml([1, 2])
    assert not is_jsonml([])


def test_xml_mixed_content_preserved():
    codec = CODECS["xml"]
    xml = b'<doc a="1" b="2">pre<span>mid</span>post</doc>'
    v = codec.decode(xml)
    assert v == ["doc", {"a": "1", "b": "2"}, "pre", ["span", "mid"], "post"]
    assert codec.encode(v) == xml


def test_js_literal_pretty_printer():
    """Encode-only display codec (ref codec/javascript.js:12-18)."""
    import datetime as dtm

    from pigeon_optics_spark.codecs.jsliteral import to_js_literal

    out = to_js_literal({
        "name": "x", "n": 3, "big": 2 ** 60, "inf": float("inf"),
        "buf": b"\x01", "when": dtm.datetime(2020, 1, 1, tzinfo=dtm.timezone.utc),
        "tags": PSet(["a"]), "m": PMap([(1, "one")]),
        "odd key": [1, 2],
    })
    assert 'name: "x"' in out and "n: 3" in out
    assert "1152921504606846976n" in out          # BigInt suffix
    assert "Infinity" in out
    assert "Buffer.from('01', 'hex')" in out
    assert "new Date(1577836800000)" in out
    assert 'new Set([\n' in out and "new Map(" in out
    assert '"odd key"' in out                     # non-identifier key quoted
    assert to_js_literal([]) == "[]" and to_js_literal({}) == "{}"
    assert to_js_literal(Undefined) == "undefined"


# ---------------------------------------------------------------------------
# nesting-bomb crash safety (the avro-kernel lesson applied to every codec):
# a few KB of nested containers must surface as the ValueError contract,
# never RecursionError (an executor-task-killing class at scale)
# ---------------------------------------------------------------------------


def test_cbor_nesting_bomb_is_value_error():
    from pigeon_optics_spark.codecs import cbor

    with pytest.raises(cbor.CBORError, match="nesting"):
        cbor.decode(b"\x81" * 3000 + b"\x00")
    # sane depth still decodes
    assert cbor.decode(b"\x81" * 50 + b"\x00") is not None


def test_msgpack_nesting_bomb_is_value_error():
    import struct

    from pigeon_optics_spark.codecs import msgpack

    with pytest.raises(msgpack.MsgpackError, match="nesting"):
        msgpack.decode(b"\x91" * 3000 + b"\x00")
    # the ext-container path must NOT reset the depth budget: nested
    # ext-Set envelopes (code 72) bombed via the recursive decode() call
    b = b"\x90"
    for _ in range(1500):
        if len(b) < 256:
            b = b"\xc7" + bytes([len(b)]) + bytes([72]) + b
        else:
            b = b"\xc8" + struct.pack(">H", len(b)) + bytes([72]) + b
    with pytest.raises(msgpack.MsgpackError, match="nesting"):
        msgpack.decode(b)
    assert msgpack.decode(b"\x91" * 50 + b"\x00") is not None


def test_json5_nesting_bomb_is_value_error():
    from pigeon_optics_spark.codecs import json5

    with pytest.raises(json5.JSON5Error, match="nesting"):
        json5.loads("[" * 3000 + "]" * 3000)
    assert json5.loads("[" * 50 + "]" * 50) is not None


def test_json_codec_nesting_bomb_is_value_error():
    """json.loads (third-party surface) RecursionErrors on deep input —
    the Codec dispatch wraps it to the ValueError contract, including the
    LAZY decode_iterable path (generators raise during iteration)."""
    from pigeon_optics_spark.codecs import codec_for

    bomb = ("[" * 3000 + "]" * 3000).encode()
    j = codec_for("json")
    with pytest.raises(ValueError, match="nested too deeply"):
        j.decode(bomb)
    with pytest.raises(ValueError, match="nested too deeply"):
        list(j.decode_iterable(bomb))


def test_xml_html_decode_depth_bounded():
    """A ~15 KB hostile XML/HTML file previously decoded into a
    5000-deep JsonML value that blew object_hash / value_to_tagged
    downstream at store ingest — the decode boundary now caps nesting
    like every other codec."""
    from pigeon_optics_spark.codecs import jsonml

    bomb = "<a>" * 5000 + "</a>" * 5000
    with pytest.raises(jsonml.XMLError, match="nested deeper"):
        jsonml.xml_to_jsonml(bomb)
    with pytest.raises(jsonml.XMLError, match="nested deeper"):
        jsonml.html_to_jsonml(bomb)
    assert jsonml.xml_to_jsonml("<a>" * 200 + "</a>" * 200) is not None


def test_jsonml_serializer_depth_bounded():
    """Deep JsonML values (e.g. from decoded foreign data) must raise
    XMLError from the serializers, and is_jsonml must stay a pure
    boolean predicate at ANY depth (iterative walk)."""
    from pigeon_optics_spark.codecs import jsonml

    deep = ["a"]
    for _ in range(5000):
        deep = ["a", deep]
    assert jsonml.is_jsonml(deep)        # deep but VALID: no crash
    assert not jsonml.is_jsonml(["a", [0]])
    with pytest.raises(jsonml.XMLError, match="nested deeper"):
        jsonml.jsonml_to_xml(deep)
    with pytest.raises(jsonml.XMLError, match="nested deeper"):
        jsonml.jsonml_to_html(deep)


def test_cbor_indefinite_string_rejects_foreign_chunk():
    """RFC 8949 §3.2.3: indefinite-length string chunks must be
    definite-length strings of the SAME major type.  A crafted stream
    embedding e.g. an int chunk previously hit ``c.encode()`` and raised
    AttributeError, escaping the CBORError contract (ADVICE r8)."""
    from pigeon_optics_spark.codecs import cbor

    # 0x7f = indefinite text string, 0x01 = unsigned int chunk, 0xff = break
    with pytest.raises(cbor.CBORError, match="chunk"):
        cbor.decode(b"\x7f\x01\xff")
    # 0x5f = indefinite byte string with a text-string chunk (0x61 'a')
    with pytest.raises(cbor.CBORError, match="chunk"):
        cbor.decode(b"\x5f\x61a\xff")
    # well-formed streams still concatenate
    assert cbor.decode(b"\x7f\x61a\x61b\xff") == "ab"
    assert cbor.decode(b"\x5f\x41a\x41b\xff") == b"ab"


def test_cbor_malformed_crafted_streams_stay_cbor_error():
    """Crafted-stream sweep over the decoder's remaining escape hatches
    (the r8 chunk fix's class, applied to the whole kernel): every
    malformed input must raise CBORError — never IndexError, TypeError,
    OverflowError, or silently decode."""
    from pigeon_optics_spark.codecs import cbor

    cases = {
        # truncated stream inside an indefinite container previously hit
        # the raw buf[pos] peek -> IndexError
        b"\x5f": "truncated",            # indefinite bytes, EOF before break
        b"\x7f\x61a": "truncated",       # indefinite text, chunk then EOF
        b"\x9f\x01": "truncated",        # indefinite array, item then EOF
        b"\xbf\x61a\x01": "truncated",   # indefinite map, pair then EOF
        # indefinite length where it is malformed: major 0 previously
        # decoded SILENTLY to None; major 1 escaped as TypeError (-1-None);
        # tag escaped by unwrapping
        b"\x1f": "indefinite",
        b"\x3f": "indefinite",
        b"\xdf\x01": "indefinite",
        # nested indefinite chunk inside an indefinite string (chunks must
        # be definite per RFC 8949 §3.2.3)
        b"\x7f\x7f\x61a\xff\xff": "chunk",
        # tag payload type confusion: previously TypeError from the
        # conversion (float([]), int.from_bytes(str), PSet(int), ...)
        b"\xc1\x80": "tag 1",            # date with array payload
        b"\xc1\x61a": "tag 1",           # date with text payload
        b"\xc2\x61a": "bignum",          # pos bignum with text payload
        b"\xc3\x01": "bignum",           # neg bignum with int payload
        b"\xd8\x20\x01": "URI",          # tag 32 with int payload
        b"\xd9\x01\x02\x01": "set",      # tag 258 with int payload
        b"\xd9\x01\x03\x01": "map",      # tag 259 with int payload
        # date payload out of the representable range: previously
        # OverflowError/OSError from fromtimestamp
        b"\xc1\xfb\x47\xf0\x00\x00\x00\x00\x00\x00": "out of range",
    }
    for raw, frag in cases.items():
        with pytest.raises(cbor.CBORError, match=frag):
            cbor.decode(raw)

    # well-formed neighbours of every rejected shape still decode
    assert cbor.decode(b"\x9f\x01\xff") == [1]
    assert cbor.decode(b"\xbf\x61a\x01\xff") == {"a": 1}
    assert cbor.decode(b"\xc2\x41\x05") == 5          # bignum, bytes payload
    assert cbor.decode(b"\xc1\x00").timestamp() == 0  # epoch 0
    assert cbor.decode(b"\xd9\x01\x02\x82\x01\x02").members == [1, 2]


def test_msgpack_malformed_ext_payloads_stay_msgpack_error():
    """Crafted ext payloads must raise MsgpackError — previously
    struct.error (NOT a ValueError) for off-spec timestamp lengths,
    OverflowError for int64-range epochs, TypeError for a set ext
    wrapping an int, AttributeError for a map ext wrapping a list
    (the CBOR kernel's crafted-stream class, applied here)."""
    import struct
    from pigeon_optics_spark.codecs import msgpack

    cases = {
        b"\xd4\xff\x00": "timestamp",          # ts ext, 1-byte payload
        b"\xc7\x03\xff\x00\x00\x00": "timestamp",  # ts ext, 3-byte payload
        # 12-byte ts with sec = 2^62: out of datetime range
        b"\xc7\x0c\xff" + b"\x00" * 4 + struct.pack(">q", 1 << 62):
            "out of range",
        b"\xd4\x48\x05": "set",                # set ext wrapping int
        b"\xd5\x49\x91\x01": "map",            # map ext wrapping list [1]
        b"\xd4\x4a\x05": "URL",                # URL ext wrapping int
    }
    for raw, frag in cases.items():
        with pytest.raises(msgpack.MsgpackError, match=frag):
            msgpack.decode(raw)

    # well-formed neighbours still decode
    from pigeon_optics_spark.values import PSet, PMap, URLValue
    assert msgpack.decode(msgpack.encode(PSet([1, 2]))).members == [1, 2]
    assert msgpack.decode(msgpack.encode(PMap([(1, "a")]))).entries == [(1, "a")]
    assert msgpack.decode(msgpack.encode(URLValue("http://x/"))).href == "http://x/"
    import datetime as dt
    d = dt.datetime(2020, 1, 2, tzinfo=dt.timezone.utc)
    assert msgpack.decode(msgpack.encode(d)) == d


def test_tagged_json_malformed_envelopes_stay_value_error():
    """The {type, data} tag envelope is a WIRE form (JSON/JSON5/YAML
    decode all pass through tagged_to_value), so crafted payloads must
    raise ValueError — previously: unknown constant -> KeyError, Date
    with huge/string payload -> OverflowError/TypeError, Set wrapping
    an int -> TypeError, object wrapping an int -> AttributeError,
    BigInteger wrapping a dict -> TypeError."""
    from pigeon_optics_spark.codecs import codec_for

    j = codec_for("json")
    bad = [
        b'{"type": "constant", "data": "NotAConstant"}',
        b'{"type": "constant", "data": 5}',
        b'{"type": "BigInteger", "data": {}}',
        b'{"type": "BigInteger", "data": "xyz"}',
        b'{"type": "Buffer", "data": 5}',
        b'{"type": "Date", "data": "soon"}',
        b'{"type": "Date", "data": 1e300}',
        b'{"type": "Date", "data": true}',
        b'{"type": "URL", "data": []}',
        b'{"type": "Set", "data": 5}',
        b'{"type": "Map", "data": 5}',
        b'{"type": "Map", "data": [[1]]}',
        b'{"type": "Map", "data": [5]}',
        b'{"type": "object", "data": 5}',
    ]
    for raw in bad:
        with pytest.raises(ValueError):
            j.decode(raw)

    # well-formed neighbours still decode
    from pigeon_optics_spark.values import Undefined
    assert j.decode(b'{"type": "constant", "data": "undefined"}') is Undefined
    assert j.decode(b'{"type": "BigInteger", "data": "9007199254740993"}') \
        == 9007199254740993
    assert j.decode(b'{"type": "Date", "data": 0}').timestamp() == 0
    assert j.decode(b'{"type": "Unknowable", "data": 5}') \
        == {"type": "Unknowable", "data": 5}


def test_arbitrary_xml_crafted_and_exact_dates():
    """Crafted arbitrary-XML escapes + the Date exactness parity fix:
    - <map><entry/></map> previously raised IndexError
    - an astronomical <date> previously raised OverflowError
    - the Date ENCODER used float timestamp()*1000, which loses a
      millisecond past 2^31 epoch seconds — an XML round-trip changed
      the value (and its content hash) while CBOR/JSON round-tripped
      exactly (the values._dt_to_ms lesson)
    - jsonml_to_html(non-node) previously raised TypeError."""
    import datetime as dt
    from pigeon_optics_spark.codecs import codec_for
    from pigeon_optics_spark.codecs.jsonml import (
        XMLError, arbitrary_jsonml_to_value, jsonml_to_html,
        value_to_arbitrary_jsonml)
    from pigeon_optics_spark.values import object_hash

    with pytest.raises(XMLError, match="entry"):
        arbitrary_jsonml_to_value(["map", ["entry"]])
    with pytest.raises(XMLError, match="out of range"):
        arbitrary_jsonml_to_value(["date", str(10**20)])
    with pytest.raises(XMLError, match="not a JsonML node"):
        jsonml_to_html(5)
    with pytest.raises(XMLError, match="not a JsonML node"):
        jsonml_to_html(["p", 7])

    # the property-fuzz counterexample from the values fix: sub-ms float
    # drift appears once epoch seconds cross 2^31
    d = dt.datetime(2038, 2, 1, 0, 0, 0, 444000, tzinfo=dt.timezone.utc)
    xml = codec_for("xml")
    rt = xml.decode(xml.encode(d))
    assert rt == d
    assert object_hash(rt) == object_hash(d)
    assert arbitrary_jsonml_to_value(value_to_arbitrary_jsonml(d)) == d


def test_html_malformed_declaration_stays_value_error():
    """stdlib html.parser raises bare AssertionError from _markupbase on
    malformed markup declarations — found by the codec fuzz on '<![;'.
    The decoder must keep the ValueError contract."""
    from pigeon_optics_spark.codecs.jsonml import XMLError, html_to_jsonml

    for bad in ("<![;", "<!foo<", "<![CDATA"):
        try:
            html_to_jsonml(bad)
        except XMLError:
            pass  # rejecting is fine
        # tolerant parses are fine too — just never a non-ValueError


def test_arbitrary_xml_illegal_characters_roundtrip():
    """XML 1.0 cannot carry C0 controls (except \\t\\n\\r), surrogates, or
    U+FFFE/FFFF at all — not even as character references.  The encoder
    previously emitted them raw, producing XML that expat refused to
    re-parse (fuzz finding: dict key '\\x08').  They now ride hex-encoded
    with encoding="hex" / name-hex, round-tripping exactly."""
    from pigeon_optics_spark.codecs import codec_for
    from pigeon_optics_spark.values import URLValue, object_hash

    xml = codec_for("xml")
    cases = [
        {"\x08": None},                 # the fuzz counterexample
        "\x00\x1f\x0b",                 # C0 controls as a string value
        {"k": "a\x01b"},
        URLValue("http://x/\x02"),
        {"a￾": ["\x07"]},
        "plain \t\n\r text stays",       # legal controls stay readable
    ]
    for v in cases:
        rt = xml.decode(xml.encode(v))
        assert object_hash(rt) == object_hash(v), v
    # the readable form is preserved for legal text (no gratuitous hex)
    assert b"plain" in xml.encode("plain \t\n\r text stays")
    assert b"encoding=\"hex\"" in xml.encode("\x08")
