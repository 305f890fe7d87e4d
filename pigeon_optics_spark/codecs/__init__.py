"""M3 — the multi-format codec layer (SURVEY §2.1 file-format sources/sinks).

The reference negotiates 8 codecs by media type or file extension
(`library/models/codec/index.js:19-49`): JSON, JSON5, CBOR, JSON-lines,
YAML, msgpack, XML (as JsonML), HTML.  Each supports value encode/decode
plus streaming *entries* forms used by import/export.  This package
re-implements the capability over public formats:

- ``Codec.encode/decode``: one value ⇄ bytes
- ``Codec.encode_iterable/decode_iterable``: stream of values ⇄ bytes
  (array framing for JSON, NDJSON lines, YAML multi-doc, CBOR/msgpack
  sequences, XML document list)
- ``Codec.encode_entries/decode_entries``: export envelopes
  ``{id, version, hash, data}`` (ref export-controller.js:25-41, XML wrapper
  ref codec/xml/entries-encoder.js:7-32)
- ``codec_for(media_type_or_ext)``: the dispatch table

JSON5 is decode-only on the wire (encoded output is pretty JSON, matching
the reference).  HTML round-trips markup (JsonML) documents; arbitrary
values ride the `pigeon-optics:arbitrary` typed-element fallback in XML.
"""

from __future__ import annotations

import io
import json
from typing import Any, Callable, Iterable, Iterator

import yaml as _yaml

from ..values import tagged_to_value, value_to_tagged
from . import cbor as _cbor
from . import json5 as _json5
from . import msgpack as _msgpack
from .jsonml import (
    ARBITRARY_NS,
    XMLError,
    arbitrary_jsonml_to_value,
    html_to_jsonml,
    is_jsonml,
    jsonml_to_html,
    jsonml_to_xml,
    value_to_arbitrary_jsonml,
    xml_to_jsonml,
)

__all__ = ["Codec", "codec_for", "CODECS", "is_jsonml"]


def _bound_decode(fn):
    """Wrap a byte-decode entry point so a nesting bomb that blows the
    interpreter stack in a THIRD-PARTY parser (json.loads, yaml) surfaces
    as the ValueError contract every caller handles — the hand-written
    kernels (cbor/msgpack/json5/avro) carry their own explicit depth
    caps, this is the belt for the parsers we don't control."""
    def wrapped(data):
        try:
            return fn(data)
        except RecursionError as e:
            raise ValueError(
                f"decode: input nested too deeply for the parser: {e}"
            ) from e
    return wrapped


def _bound_decode_iter(fn):
    """_bound_decode for LAZY decode entry points: generators raise
    during iteration, not at call time, so the guard must live inside
    the consuming loop."""
    def wrapped(data):
        try:
            yield from fn(data)
        except RecursionError as e:
            raise ValueError(
                f"decode: input nested too deeply for the parser: {e}"
            ) from e
    return wrapped


class Codec:
    """One wire format.  All byte-level; text formats use UTF-8."""

    def __init__(self, name: str, extensions: tuple[str, ...],
                 media_types: tuple[str, ...],
                 encode: Callable[[Any], bytes],
                 decode: Callable[[bytes], Any],
                 encode_iterable: Callable[[Iterable[Any]], bytes],
                 decode_iterable: Callable[[bytes], Iterator[Any]],
                 encode_entries: Callable[[Iterable[dict]], bytes] | None = None,
                 decode_entries: Callable[[bytes], Iterator[dict]] | None = None,
                 binary: bool = False):
        self.name = name
        self.extensions = extensions
        self.media_types = media_types
        self.encode = encode
        self.decode = _bound_decode(decode)
        self.encode_iterable = encode_iterable
        self.decode_iterable = _bound_decode_iter(decode_iterable)
        self.encode_entries = encode_entries or (
            lambda entries: encode_iterable(list(entries)))
        self.decode_entries = _bound_decode_iter(decode_entries) \
            if decode_entries else self.decode_iterable
        self.binary = binary

    def __repr__(self):
        return f"Codec({self.name})"


# --------------------------------------------------------------------------
# JSON / JSON5
# --------------------------------------------------------------------------


def _json_encode(v: Any) -> bytes:
    return json.dumps(value_to_tagged(v), indent=2, ensure_ascii=False,
                      allow_nan=False).encode("utf-8")


def _json_decode(data: bytes) -> Any:
    return tagged_to_value(json.loads(data.decode("utf-8")))


def _json_encode_iterable(values: Iterable[Any]) -> bytes:
    # streaming array framing (ref json.js:109-128): emit per element
    buf = io.BytesIO()
    buf.write(b"[")
    first = True
    for v in values:
        if not first:
            buf.write(b",\n")
        else:
            buf.write(b"\n")
            first = False
        buf.write(json.dumps(value_to_tagged(v), ensure_ascii=False,
                             allow_nan=False).encode("utf-8"))
    buf.write(b"\n]\n" if not first else b"]\n")
    return buf.getvalue()


def _json_decode_iterable(data: bytes) -> Iterator[Any]:
    parsed = json.loads(data.decode("utf-8"))
    if not isinstance(parsed, list):
        raise ValueError("JSON stream must be an array")
    for node in parsed:
        yield tagged_to_value(node)


def _json5_decode(data: bytes) -> Any:
    return tagged_to_value(_json5.loads(data.decode("utf-8")))


# --------------------------------------------------------------------------
# JSON-lines
# --------------------------------------------------------------------------


def _jsonl_encode_iterable(values: Iterable[Any]) -> bytes:
    out = io.BytesIO()
    for v in values:
        out.write(json.dumps(value_to_tagged(v), ensure_ascii=False,
                             allow_nan=False).encode("utf-8"))
        out.write(b"\n")
    return out.getvalue()


def _jsonl_decode_iterable(data: bytes) -> Iterator[Any]:
    for line in data.decode("utf-8").splitlines():
        if line.strip():
            yield tagged_to_value(json.loads(line))


# --------------------------------------------------------------------------
# YAML (multi-doc streams delimited the standard way; ref yaml.js:50-53 uses
# the '...' end-of-document marker)
# --------------------------------------------------------------------------


def _yaml_encode(v: Any) -> bytes:
    return _yaml.safe_dump(value_to_tagged(v), allow_unicode=True,
                           sort_keys=False).encode("utf-8")


def _yaml_native_nodes_to_tagged(node: Any) -> Any:
    """Pre-walk a ``yaml.safe_load`` tree converting YAML-native scalar types
    (unquoted dates/timestamps → datetime.date/datetime, !!binary → bytes)
    into their tagged-JSON envelopes so external YAML decodes into the engine
    value domain instead of crashing ``tagged_to_value`` (the reference's
    YAML codec surfaces these as Date values in the record domain)."""
    import base64 as _b64
    import datetime as _dt

    if isinstance(node, _dt.datetime):
        ms = int(node.timestamp() * 1000) if node.tzinfo else int(
            node.replace(tzinfo=_dt.timezone.utc).timestamp() * 1000)
        return {"type": "Date", "data": ms}
    if isinstance(node, _dt.date):
        d = _dt.datetime(node.year, node.month, node.day, tzinfo=_dt.timezone.utc)
        return {"type": "Date", "data": int(d.timestamp() * 1000)}
    if isinstance(node, bytes):
        return {"type": "Buffer", "data": _b64.b64encode(node).decode("ascii")}
    if isinstance(node, list):
        return [_yaml_native_nodes_to_tagged(v) for v in node]
    if isinstance(node, dict):
        # YAML mapping keys may themselves be native scalars (an unquoted
        # ``2024-01-01: x`` loads a datetime.date KEY) — the value domain is
        # string-keyed, so stringify deterministically: ISO 8601 for
        # date/datetime, base64 for bytes, json.dumps' coercion for the rest
        def _key(k: Any) -> str:
            if isinstance(k, str):
                return k
            if isinstance(k, (_dt.datetime, _dt.date)):
                return k.isoformat()
            if isinstance(k, bytes):
                return _b64.b64encode(k).decode("ascii")
            if k is True or k is False or k is None:
                return {True: "true", False: "false", None: "null"}[k]
            return str(k)  # int/float — json.dumps' own key coercion

        out: dict[str, Any] = {}
        for k, v in node.items():
            sk = _key(k)
            if sk in out:
                # stringification can collapse distinct YAML keys (int 7 vs
                # "7", date 2024-01-01 vs the literal string): last-one-wins
                # would silently drop data, so refuse the decode (ADVICE r4)
                raise ValueError(
                    f"YAML mapping keys collide after stringification: {sk!r}")
            out[sk] = _yaml_native_nodes_to_tagged(v)
        return out
    return node


def _yaml_decode(data: bytes) -> Any:
    return tagged_to_value(
        _yaml_native_nodes_to_tagged(_yaml.safe_load(data.decode("utf-8"))))


def _yaml_encode_iterable(values: Iterable[Any]) -> bytes:
    out = io.BytesIO()
    for v in values:
        out.write(_yaml.safe_dump(value_to_tagged(v), allow_unicode=True,
                                  sort_keys=False, explicit_start=True,
                                  explicit_end=True).encode("utf-8"))
    return out.getvalue()


def _yaml_decode_iterable(data: bytes) -> Iterator[Any]:
    for doc in _yaml.safe_load_all(data.decode("utf-8")):
        yield tagged_to_value(_yaml_native_nodes_to_tagged(doc))


# --------------------------------------------------------------------------
# XML / HTML
# --------------------------------------------------------------------------


def _xml_documentable(v: list) -> bool:
    """Can this JsonML value serialize to a WELL-FORMED XML document —
    one the expat decoder will re-read?  A bare ``['#comment', …]`` /
    ``['#cdata-section', …]`` root, or a ``#document`` with zero or
    multiple element children (or non-whitespace top-level text), emits
    a rootless fragment expat refuses — the same silent-break class as
    the illegal-character case, caught structurally instead of by
    parse-failure."""
    tag = v[0]
    if tag != "#document":
        return not tag.startswith("#")
    kids = v[1:]
    if kids and isinstance(kids[0], dict):
        kids = kids[1:]
    elems = [c for c in kids
             if isinstance(c, list) and not c[0].startswith("#")]
    texts = [c for c in kids if isinstance(c, str)]
    # at document level only ONE element plus comments/whitespace is
    # well-formed (CDATA or a nested #document there is not)
    specials_ok = all(c[0] == "#comment" for c in kids
                      if isinstance(c, list) and c[0].startswith("#"))
    return (len(elems) == 1 and specials_ok
            and all(t.strip() == "" for t in texts))


def _xml_encode(v: Any) -> bytes:
    if is_jsonml(v) and _xml_documentable(v):
        try:
            return jsonml_to_xml(v).encode("utf-8")
        except XMLError:
            # JsonML-SHAPED but not XML-1.0-REPRESENTABLE (e.g. a text or
            # comment child carrying \x08): fall back to the arbitrary
            # encoding, which hex-escapes — mirroring the reference's
            # pxml.encode try / parb.encode fallback
            # (ref codec/xml/encode.js).  Decode dispatches on the
            # arbitrary xmlns wrapper, so round-trip is exact.
            pass
    wrapped = ["arbitrary", {"xmlns": ARBITRARY_NS}, value_to_arbitrary_jsonml(v)]
    return jsonml_to_xml(wrapped).encode("utf-8")


def _xml_decode(data: bytes) -> Any:
    root = xml_to_jsonml(data.decode("utf-8"))
    if (isinstance(root, list) and root and root[0] == "arbitrary"
            and len(root) >= 2 and isinstance(root[1], dict)
            and root[1].get("xmlns") == ARBITRARY_NS):
        kids = [c for c in root[2:] if not isinstance(c, str)]
        return arbitrary_jsonml_to_value(kids[0]) if kids else None
    return root


def _xml_encode_iterable(values: Iterable[Any]) -> bytes:
    out = io.BytesIO()
    out.write(b"<list>")
    for v in values:
        out.write(b"<item>")
        out.write(_xml_encode(v))
        out.write(b"</item>")
    out.write(b"</list>")
    return out.getvalue()


def _xml_decode_iterable(data: bytes) -> Iterator[Any]:
    root = xml_to_jsonml(data.decode("utf-8"))
    if not (isinstance(root, list) and root[0] == "list"):
        yield _xml_decode(data)
        return
    for item in root[1:]:
        if isinstance(item, str):
            continue
        kids = [c for c in item[1:] if not isinstance(c, str)]
        if kids:
            node = kids[0]
            if (isinstance(node, list) and node[0] == "arbitrary"):
                inner = [c for c in node[2:] if not isinstance(c, str)]
                yield arbitrary_jsonml_to_value(inner[0]) if inner else None
            else:
                yield node
        else:
            yield "".join(c for c in item[1:] if isinstance(c, str))


def _xml_encode_entries(entries: Iterable[dict]) -> bytes:
    """The reference's export wrapper:
    ``<export xmlns="pigeon-optics:export"><record id= version= hash=>…``
    (ref codec/xml/entries-encoder.js:7-32)."""
    out = io.BytesIO()
    out.write(b'<export xmlns="pigeon-optics:export">')
    for e in entries:
        rec: list[Any] = ["record", {
            "id": str(e["id"]),
            **({"version": str(e["version"])} if "version" in e else {}),
            **({"hash": str(e["hash"])} if "hash" in e else {}),
        }]
        if "data" in e and e["data"] is not None:
            data = e["data"]
            rec.append(data if is_jsonml(data)
                       else ["arbitrary", {"xmlns": ARBITRARY_NS},
                             value_to_arbitrary_jsonml(data)])
        out.write(jsonml_to_xml(rec).encode("utf-8"))
    out.write(b"</export>")
    return out.getvalue()


def _xml_decode_entries(data: bytes) -> Iterator[dict]:
    root = xml_to_jsonml(data.decode("utf-8"))
    if not (isinstance(root, list) and root[0] == "export"):
        raise ValueError("not a pigeon-optics:export document")
    for rec in root[1:]:
        if isinstance(rec, (str, dict)) or rec[0] != "record":
            continue
        attrs = rec[1] if len(rec) > 1 and isinstance(rec[1], dict) else {}
        kids = [c for c in rec[1:] if not isinstance(c, (str, dict))]
        entry: dict[str, Any] = {"id": attrs.get("id", "")}
        if "version" in attrs:
            entry["version"] = int(attrs["version"])
        if "hash" in attrs:
            entry["hash"] = attrs["hash"]
        if kids:
            node = kids[0]
            if isinstance(node, list) and node[0] == "arbitrary":
                inner = [c for c in node[2:] if not isinstance(c, str)]
                entry["data"] = arbitrary_jsonml_to_value(inner[0]) if inner else None
            else:
                entry["data"] = node
        yield entry


def _html_encode(v: Any) -> bytes:
    if is_jsonml(v):
        return jsonml_to_html(v).encode("utf-8")
    raise ValueError("HTML codec encodes markup (JsonML) documents only")


def _html_decode(data: bytes) -> Any:
    return html_to_jsonml(data.decode("utf-8"))


# --------------------------------------------------------------------------
# envelope helpers shared by value-stream codecs
# --------------------------------------------------------------------------


def _entries_as_values(entries: Iterable[dict]) -> Iterator[Any]:
    for e in entries:
        out = {"id": e["id"]}
        for k in ("version", "hash"):
            if k in e:
                out[k] = e[k]
        if "data" in e:
            out["data"] = e["data"]
        yield out


def _make_entries_codec(encode_iterable, decode_iterable):
    def enc(entries: Iterable[dict]) -> bytes:
        return encode_iterable(_entries_as_values(entries))

    def dec(data: bytes) -> Iterator[dict]:
        for v in decode_iterable(data):
            yield v

    return enc, dec


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

CODECS: dict[str, Codec] = {}


def _register(c: Codec) -> Codec:
    CODECS[c.name] = c
    return c


json_codec = _register(Codec(
    "json", (".json",), ("application/json", "text/json"),
    _json_encode, _json_decode, _json_encode_iterable, _json_decode_iterable,
    *_make_entries_codec(_json_encode_iterable, _json_decode_iterable)))

json5_codec = _register(Codec(
    "json5", (".json5",), ("application/json5", "text/json5"),
    _json_encode, _json5_decode, _json_encode_iterable,
    _json_decode_iterable,
    *_make_entries_codec(_json_encode_iterable, _json_decode_iterable)))

jsonl_codec = _register(Codec(
    "jsonl", (".jsonl", ".ndjson", ".jsonlines"),
    ("application/jsonlines", "application/x-ndjson", "application/x-jsonlines"),
    lambda v: _jsonl_encode_iterable([v]),
    lambda d: next(_jsonl_decode_iterable(d)),
    _jsonl_encode_iterable, _jsonl_decode_iterable,
    *_make_entries_codec(_jsonl_encode_iterable, _jsonl_decode_iterable)))

cbor_codec = _register(Codec(
    "cbor", (".cbor",), ("application/cbor",),
    _cbor.encode, _cbor.decode, _cbor.encode_seq, _cbor.decode_seq,
    *_make_entries_codec(_cbor.encode_seq, _cbor.decode_seq),
    binary=True))

yaml_codec = _register(Codec(
    "yaml", (".yaml", ".yml"), ("application/yaml", "text/yaml", "application/x-yaml"),
    _yaml_encode, _yaml_decode, _yaml_encode_iterable, _yaml_decode_iterable,
    *_make_entries_codec(_yaml_encode_iterable, _yaml_decode_iterable)))

msgpack_codec = _register(Codec(
    "msgpack", (".msgpack", ".mp"), ("application/msgpack", "application/x-msgpack"),
    _msgpack.encode, _msgpack.decode, _msgpack.encode_seq, _msgpack.decode_seq,
    *_make_entries_codec(_msgpack.encode_seq, _msgpack.decode_seq),
    binary=True))

xml_codec = _register(Codec(
    "xml", (".xml",), ("application/xml", "text/xml"),
    _xml_encode, _xml_decode, _xml_encode_iterable, _xml_decode_iterable,
    _xml_encode_entries, _xml_decode_entries))

html_codec = _register(Codec(
    "html", (".html", ".htm"), ("text/html",),
    _html_encode, _html_decode,
    lambda vs: b"".join(_html_encode(v) for v in vs),
    lambda d: iter([_html_decode(d)])))


def codec_for(media_type_or_ext: str) -> Codec:
    """Dispatch by media type or file extension (ref codec/index.js:19-49)."""
    key = media_type_or_ext.strip().lower()
    if ";" in key:  # media type parameters
        key = key.split(";", 1)[0].strip()
    for c in CODECS.values():
        if key == c.name or key in c.media_types:
            return c
        for ext in c.extensions:
            if key == ext or key == ext.lstrip("."):
                return c
        if "/" in key:
            suffix = key.rsplit("+", 1)[-1]  # e.g. application/foo+json
            if suffix == c.name:
                return c
    raise KeyError(f"no codec for {media_type_or_ext!r}")
