"""Property fuzz over the pure-Python codec kernels.

The contract every ingest caller relies on (``codecs/__init__`` dispatch,
``json_dirty_ingest``-style gates, the store's entries streams): a decoder
given ARBITRARY bytes either returns a value or raises a ``ValueError``
subclass (CBORError/MsgpackError/JSON5Error/XMLError).  Nothing else —
no IndexError from a raw buffer peek, no struct.error from an off-spec
ext length, no TypeError/OverflowError from a tag-payload conversion,
no RecursionError from a nesting bomb.  The r8 ADVICE item (a foreign
chunk type escaping as AttributeError) and this session's sweep found
six more escapes in exactly this class; this fuzz pins the whole class
shut going forward.

Two generators per kernel: raw random bytes (cheap, shallow), and
MUTATED VALID encodings (byte flips/truncations/insertions on real
domain values) — mutations reach deep decoder states that random bytes
almost never hit (inside tags, ext payloads, container bodies).
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings, strategies as st

from pigeon_optics_spark.codecs import cbor, json5, jsonml, msgpack
from pigeon_optics_spark.values import PMap, PSet, Undefined, URLValue

# a corpus of domain values whose encodings exercise every major type /
# ext: ints (small/64-bit/bignum), floats, strings, bytes, arrays, maps,
# Map/Set/Date/URL/undefined, nesting
_CORPUS = [
    None, True, 0, 23, 255, 2**40, 2**70, -(2**70), -1.5, float("inf"),
    "héllo", "", b"\x00\xff" * 3, [1, [2, [3]]],
    {"a": 1, "b": [True, None]},
    PMap([(1, "x"), ("y", 2)]),
    PSet([1, "a", [2]]),
    dt.datetime(2021, 6, 1, 12, 30, tzinfo=dt.timezone.utc),
    URLValue("https://example.com/p?q=1"),
    Undefined,
    {"deep": [{"s": PSet([PMap([("k", [1, 2])])])}]},
]


def _mutations(encode):
    """Valid encodings of the corpus, for hypothesis to mutate."""
    return [encode(v) for v in _CORPUS]


def _mutate(data: bytes, edits) -> bytes:
    b = bytearray(data)
    for pos, kind, val in edits:
        if not b:
            break
        i = pos % len(b)
        if kind == 0:      # flip a byte
            b[i] = val
        elif kind == 1:    # truncate
            del b[i:]
        else:              # insert a byte
            b.insert(i, val)
    return bytes(b)


_EDITS = st.lists(
    st.tuples(st.integers(0, 2**16), st.integers(0, 2), st.integers(0, 255)),
    min_size=1, max_size=4)


def _assert_contract(decode, data):
    try:
        decode(data)
    except ValueError:
        pass  # CBORError/MsgpackError/... all subclass ValueError
    # any OTHER exception propagates and fails the test


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=64))
def test_cbor_random_bytes_contract(data):
    _assert_contract(cbor.decode, data)


@settings(max_examples=300, deadline=None)
@given(st.sampled_from(_mutations(cbor.encode)), _EDITS)
def test_cbor_mutated_valid_contract(base, edits):
    _assert_contract(cbor.decode, _mutate(base, edits))


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=64))
def test_msgpack_random_bytes_contract(data):
    _assert_contract(msgpack.decode, data)


@settings(max_examples=300, deadline=None)
@given(st.sampled_from(_mutations(msgpack.encode)), _EDITS)
def test_msgpack_mutated_valid_contract(base, edits):
    _assert_contract(msgpack.decode, _mutate(base, edits))


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=64))
def test_json5_random_text_contract(text):
    _assert_contract(json5.loads, text)


@settings(max_examples=200, deadline=None)
@given(st.text(
    alphabet="<>/= \"'abxml?!-&;#[]CDATA", max_size=80))
def test_xml_random_markup_contract(text):
    _assert_contract(jsonml.xml_to_jsonml, text)
    _assert_contract(jsonml.html_to_jsonml, text)


def test_fuzz_corpus_roundtrips():
    """The corpus itself must round-trip both binary kernels — otherwise
    the mutation fuzz is mutating garbage."""
    for v in _CORPUS:
        assert cbor.decode(cbor.encode(v)) == v or v != v  # NaN-safe
        assert msgpack.decode(msgpack.encode(v)) == v or v != v


_TAG_TYPES = st.sampled_from(
    ["constant", "BigInteger", "Buffer", "Date", "URL", "Set", "Map",
     "object", "Unknowable"])
_TAG_PAYLOAD = st.recursive(
    st.one_of(st.none(), st.booleans(), st.integers(-2**70, 2**70),
              st.floats(allow_nan=False), st.text(max_size=8)),
    lambda inner: st.one_of(
        st.lists(inner, max_size=3),
        st.dictionaries(st.text(max_size=4), inner, max_size=3)),
    max_leaves=8)


@settings(max_examples=300, deadline=None)
@given(_TAG_TYPES, _TAG_PAYLOAD)
def test_tagged_envelope_fuzz_contract(t, d):
    """Arbitrary {type, data} envelopes through the JSON codec either
    decode or raise ValueError — the wire-form twin of the binary fuzz."""
    import json as _json
    from pigeon_optics_spark.codecs import codec_for

    raw = _json.dumps({"type": t, "data": d}).encode()
    _assert_contract(codec_for("json").decode, raw)


_ARB_VALUES = st.recursive(
    st.one_of(
        st.none(), st.booleans(), st.integers(-2**70, 2**70),
        st.floats(allow_nan=False), st.text(max_size=8),
        st.binary(max_size=8),
        st.datetimes(
            min_value=dt.datetime(1, 1, 2), max_value=dt.datetime(9999, 12, 30),
            timezones=st.just(dt.timezone.utc)).map(
            lambda d: d.replace(microsecond=(d.microsecond // 1000) * 1000))),
    lambda inner: st.one_of(
        st.lists(inner, max_size=3),
        st.dictionaries(st.text(max_size=4), inner, max_size=3)),
    max_leaves=6)


@settings(max_examples=200, deadline=None)
@given(_ARB_VALUES.filter(lambda v: not jsonml.is_jsonml(v)))
def test_arbitrary_xml_roundtrip_property(v):
    """Any domain value round-trips the arbitrary-XML codec EXACTLY —
    including Dates at any year (the float-ms drift class) and bignums.

    JsonML-SHAPED top-level values (e.g. ``['a', '']``) are filtered out:
    those dispatch to the DOCUMENT encoding, whose round-trip is lossy by
    XML semantics (empty text dropped, adjacent text merged) — covered
    separately by the document tests; here every example must exercise
    the arbitrary codec."""
    from pigeon_optics_spark.codecs import codec_for
    from pigeon_optics_spark.values import object_hash

    xml = codec_for("xml")
    rt = xml.decode(xml.encode(v))
    assert object_hash(rt) == object_hash(v)


# direct JsonML generator (filtering _ARB_VALUES finds ~0 JsonML shapes):
# legal tags, optional attr dict, text children that INCLUDE XML-illegal
# and XML-special characters, nested elements and comments
_JSONML_TEXT = st.text(
    alphabet=st.sampled_from("ab<>&\"'\t\n\r\x00\x08\x0b\x1f\ud800 é-]"),
    max_size=6)
_JSONML = st.recursive(
    st.builds(lambda t, txt: [t, *txt],
              st.sampled_from(["a", "div", "x-y", "ns:tag"]),
              st.lists(_JSONML_TEXT, max_size=2)),
    lambda inner: st.builds(
        lambda t, attrs, kids: [t, attrs, *kids],
        st.sampled_from(["a", "b", "#comment"]),
        st.dictionaries(st.sampled_from(["id", "k"]), _JSONML_TEXT,
                        max_size=2),
        st.lists(st.one_of(_JSONML_TEXT, inner), max_size=3)),
    max_leaves=6).filter(jsonml.is_jsonml)


@settings(max_examples=150, deadline=None)
@given(_JSONML)
def test_jsonml_shaped_values_still_roundtrip_or_raise(v):
    """JsonML-shaped values take the document path; if the document is
    not XML-1.0-representable (illegal char in text/comment) the encoder
    must FALL BACK to the arbitrary encoding and round-trip exactly —
    never emit output the decoder refuses (the r8 ADVICE class:
    ``['a', 'b\\x08c']`` used to emit raw \\x08)."""
    from pigeon_optics_spark.codecs import codec_for
    from pigeon_optics_spark.values import object_hash

    xml = codec_for("xml")
    raw = xml.encode(v)
    rt = xml.decode(raw)  # must never raise on re-parse
    assert isinstance(rt, list)
    if b"pigeon-optics:arbitrary" in raw:
        # the encoder fell back to the arbitrary encoding — that path
        # promises EXACT round-trip (the document path is lossy by XML
        # semantics, so no exactness claim is made there).  Plain ==
        # (not object_hash): lone surrogates round-trip the codec but
        # are outside canonical_json's UTF-8 hash contract.
        assert rt == v


def test_jsonml_with_illegal_char_falls_back_to_arbitrary():
    """The specific ADVICE repro: a JsonML-shaped value whose text child
    carries an XML-1.0-illegal char must round-trip EXACTLY via the
    arbitrary fallback (encode used to emit raw \\x08, which expat then
    refused to parse)."""
    from pigeon_optics_spark.codecs import codec_for

    xml = codec_for("xml")
    for v in (["a", "b\x08c"], ["a", {"k": "v"}, "\x00"],
              ["#document", ["a", "\x1f"]],
              ["a", ["#comment", "x\x0by"]],
              ["#comment", "rootless"], ["#cdata-section", "x"],
              ["#document", ["a"], ["b"]], ["#document", "bare text"]):
        rt = xml.decode(xml.encode(v))
        assert rt == v, v


def test_jsonml_xml_grammar_bodies_fall_back_to_arbitrary():
    """XML *grammar* (not illegal-char) violations in comment/CDATA
    bodies (r9 ADVICE): '--' inside or trailing '-' in a comment forms
    '<!--x--y-->' / '--->' which expat refuses; ']]>' inside CDATA
    terminates the section early.  All must route to the arbitrary
    fallback and round-trip exactly."""
    from pigeon_optics_spark.codecs import codec_for

    xml = codec_for("xml")
    for v in (["a", ["#comment", "x--y"]],
              ["a", ["#comment", "ends-"]],
              ["a", ["#comment", "-"]],
              ["a", ["#cdata-section", "x]]>y"]],
              ["#document", ["a", ["#cdata-section", "]]>"]]]):
        rt = xml.decode(xml.encode(v))
        assert rt == v, v
