"""XML ⇄ JsonML and HTML codecs.

The reference represents markup as JsonML nested arrays
``[tag, {attrs}?, ...children]`` ("PigeonMark", ref
`library/models/codec/xml/encode.js:10-24`, decode `xml/decode.js:9-16`),
with a `pigeonmark-arbitrary` fallback that round-trips *non-document*
structured values through typed XML elements.  This module re-implements
both over Python's stdlib (expat for XML, html.parser for HTML) — no code
is taken from the reference.

JsonML node forms:
- element: ``[tag, {attrs}, ...children]`` (attrs object optional)
- text: plain string child
- document root: ``['#document', ...]`` when there's a prolog / multiple roots

Wire-format divergence from the reference (documented, deliberate): strings
and dict keys containing XML-1.0-ILLEGAL characters (C0 controls except
\\t\\n\\r, lone surrogates, U+FFFE/U+FFFF) are emitted in the arbitrary
encoding as hex-encoded UTF-8 — ``<string encoding="hex">…`` /
``<prop name-hex="…">``.  The reference's pigeonmark-arbitrary has no such
escape and emits the raw character, producing XML its own parser cannot
re-read; the alternative to diverging was silently unparseable output.
XML produced here for such strings is therefore not decodable by the
reference implementation; documents in the reference's format (which never
uses ``encoding="hex"``) decode here unchanged.  Similarly, a JsonML-shaped
*document* whose text carries an illegal character is encoded via the
arbitrary fallback (the serializer raises XMLError and the codec entry
point falls back), where the reference would emit the raw byte.
"""

from __future__ import annotations

import datetime as _dt
import html as _html
import html.parser
import xml.parsers.expat
from typing import Any

from ..values import PMap, PSet, Undefined, URLValue

ARBITRARY_NS = "pigeon-optics:arbitrary"


class XMLError(ValueError):
    pass


import re as _re

# XML Name production (simplified): letters/underscore start, then
# letters/digits/dot/dash/underscore/colon.  '#document'/'#comment'/
# '#cdata-section' are the special node tags.
_NAME_RE = _re.compile(r"^[A-Za-z_][\w.:-]*$")
_TAG_RE = _re.compile(r"^(?:#document|#comment|#cdata-section|[A-Za-z_][\w.:-]*)$")


def is_jsonml(v: Any) -> bool:
    """Shape test: ``[tag, ...]`` where tag is a legal XML name (or special
    node), the optional 2nd element is an attr dict, and children are strings
    or JsonML (ref pigeonmark-utils isPigeonMark).  The tag-name check
    matters: ``['0']`` is a plain one-element array, not markup — treating
    arbitrary strings as tags would emit unparseable XML like ``<0/>``."""
    # iterative walk (explicit stack): a deep hostile tree must yield a
    # BOOLEAN (or the serializer's loud XMLError), never a RecursionError
    stack = [v]
    while stack:
        node = stack.pop()
        if not (isinstance(node, list) and node and isinstance(node[0], str)
                and _TAG_RE.match(node[0])):
            return False
        rest = node[1:]
        if rest and isinstance(rest[0], dict):
            if not all(isinstance(k, str) and _NAME_RE.match(k)
                       and isinstance(x, str)
                       for k, x in rest[0].items()):
                return False
            rest = rest[1:]
        for c in rest:
            if not isinstance(c, str):
                stack.append(c)
    return True


# --------------------------------------------------------------------------
# JsonML → XML text
# --------------------------------------------------------------------------


def _esc_text(s: str) -> str:
    # \r must ride as a character reference: XML end-of-line normalization
    # folds a literal CR (or CRLF) in text content to LF on PARSE, so raw
    # CR would silently change the value on round-trip (fuzz finding —
    # the attribute escaper already guarded this)
    if _XML_ILLEGAL_RE.search(s):
        # XML 1.0 cannot carry these AT ALL (not even as charrefs);
        # emitting them raw produces output expat refuses to re-parse.
        # Raise loudly — the whole-value encoder falls back to the
        # arbitrary encoding (which hex-escapes), mirroring the
        # reference's pxml.encode try / parb.encode fallback.
        raise XMLError(
            f"string contains XML-1.0-illegal character: {s!r:.80}")
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace("\r", "&#13;"))


def _esc_attr(s: str) -> str:
    # tab/newline/cr must ride as character references — XML attribute-value
    # normalization would otherwise fold them to spaces on parse
    return (_esc_text(s).replace('"', "&quot;").replace("\t", "&#9;")
            .replace("\n", "&#10;").replace("\r", "&#13;"))


#: maximum JsonML nesting the serializers will walk — a deep hostile
#: value (e.g. from decoded foreign data) otherwise dies with
#: RecursionError, outside the XMLError (ValueError) contract (the
#: codec-kernel lesson; each level costs ~1-2 interpreter frames)
_MAX_DEPTH = 256


def _node_to_xml(node: Any, out: list[str], depth: int = 0) -> None:
    if depth > _MAX_DEPTH:
        raise XMLError(f"JsonML nested deeper than {_MAX_DEPTH}")
    if isinstance(node, str):
        out.append(_esc_text(node))
        return
    if not is_jsonml(node):
        raise XMLError(f"not a JsonML node: {node!r}")
    tag = node[0]
    rest = node[1:]
    attrs: dict[str, str] = {}
    if rest and isinstance(rest[0], dict):
        attrs = rest[0]
        rest = rest[1:]
    if tag == "#document":
        for c in rest:
            _node_to_xml(c, out, depth + 1)
        return
    if tag == "#comment":
        body = "".join(str(c) for c in rest)
        if _XML_ILLEGAL_RE.search(body):
            raise XMLError("comment contains XML-1.0-illegal character")
        # XML 1.0 grammar: Comment ::= '<!--' ((Char - '-') | ('-'
        # (Char - '-')))* '-->' — '--' inside, or a trailing '-'
        # (which would form '--->'), is unparseable by expat.  Raise so
        # _xml_encode falls back to the arbitrary encoding, preserving
        # the never-emit-undecodable-output invariant.
        if "--" in body or body.endswith("-"):
            raise XMLError("comment body contains '--' or ends in '-'")
        out.append(f"<!--{body}-->")
        return
    if tag == "#cdata-section":
        body = "".join(str(c) for c in rest)
        if _XML_ILLEGAL_RE.search(body):
            raise XMLError("CDATA contains XML-1.0-illegal character")
        # ']]>' terminates a CDATA section early; the suffix would be
        # parsed as markup (or rejected).  Route to the fallback.
        if "]]>" in body:
            raise XMLError("CDATA body contains ']]>'")
        out.append(f"<![CDATA[{body}]]>")
        return
    out.append(f"<{tag}")
    for k, v in attrs.items():
        out.append(f' {k}="{_esc_attr(v)}"')
    if rest:
        out.append(">")
        for c in rest:
            _node_to_xml(c, out, depth + 1)
        out.append(f"</{tag}>")
    else:
        out.append("/>")


def jsonml_to_xml(root: Any) -> str:
    out: list[str] = []
    _node_to_xml(root, out)
    return "".join(out)


# --------------------------------------------------------------------------
# XML text → JsonML  (expat; attribute order preserved)
# --------------------------------------------------------------------------


def xml_to_jsonml(text: str | bytes) -> Any:
    p = xml.parsers.expat.ParserCreate()
    p.ordered_attributes = True
    p.buffer_text = True
    root_children: list[Any] = []
    # stack of (node, base_len): children of `node` live at index >= base_len
    stack: list[tuple[list[Any], int]] = []

    def start(tag, attr_list):
        if len(stack) >= _MAX_DEPTH:
            # same cap as every other codec's decode: a deep hostile
            # document would otherwise produce a value that blows
            # object_hash / value_to_tagged downstream at store ingest
            raise XMLError(f"XML nested deeper than {_MAX_DEPTH}")
        attrs = {attr_list[i]: attr_list[i + 1] for i in range(0, len(attr_list), 2)}
        node: list[Any] = [tag, attrs] if attrs else [tag]
        (stack[-1][0] if stack else root_children).append(node)
        stack.append((node, len(node)))

    def end(tag):
        stack.pop()

    def chars(data):
        if stack:
            node, base = stack[-1]
            if len(node) > base and isinstance(node[-1], str):
                node[-1] += data
            else:
                node.append(data)
        elif data.strip() != "":  # ignore inter-element ws at document level
            root_children.append(data)

    def comment(data):
        (stack[-1][0] if stack else root_children).append(["#comment", data])

    p.StartElementHandler = start
    p.EndElementHandler = end
    p.CharacterDataHandler = chars
    p.CommentHandler = comment
    try:
        p.Parse(text if isinstance(text, str) else text.decode("utf-8"), True)
    except xml.parsers.expat.ExpatError as e:
        raise XMLError(f"XML parse error: {e}") from e
    if len(root_children) == 1:
        return root_children[0]
    return ["#document", *root_children]


# --------------------------------------------------------------------------
# arbitrary values ⇄ JsonML (the pigeonmark-arbitrary fallback:
# ref codec/xml/decode.js:9-16 — non-document data round-trips through
# typed elements)
# --------------------------------------------------------------------------


#: characters XML 1.0 cannot carry AT ALL (not even as character
#: references): C0 controls except \t\n\r, surrogates, U+FFFE/U+FFFF.
#: A string containing one rides as hex-encoded UTF-8 (surrogatepass) in
#: an ``encoding="hex"`` element — emitting it raw produced XML that
#: expat refuses to re-parse (found by the arbitrary-roundtrip fuzz on
#: the dict key '\\x08'), silently breaking round-trip + content hash.
_XML_ILLEGAL_RE = _re.compile(
    "[\x00-\x08\x0b\x0c\x0e-\x1f\ud800-\udfff￾￿]")


def _hex_str(s: str) -> str:
    return s.encode("utf-8", "surrogatepass").hex()


def _unhex_str(text: str) -> str:
    return bytes.fromhex(text).decode("utf-8", "surrogatepass")


def value_to_arbitrary_jsonml(v: Any) -> Any:
    if v is None:
        return ["null"]
    if v is Undefined:
        return ["undefined"]
    if isinstance(v, bool):
        return ["true"] if v else ["false"]
    if isinstance(v, int):
        return ["number", str(v)]
    if isinstance(v, float):
        return ["number", repr(v)]
    if isinstance(v, str):
        if _XML_ILLEGAL_RE.search(v):
            return ["string", {"encoding": "hex"}, _hex_str(v)]
        return ["string", v] if v else ["string"]
    if isinstance(v, (bytes, bytearray, memoryview)):
        return ["buffer", bytes(v).hex()] if v else ["buffer"]
    if isinstance(v, _dt.datetime):
        # exact integer epoch-ms via the shared conversion — the local
        # float path (timestamp()*1000) loses a millisecond past 2^31
        # epoch seconds, so an XML round-trip would CHANGE the value (and
        # its content hash) while every other codec round-trips exactly
        # (the values._dt_to_ms lesson, applied to this encoder too)
        from ..values import _dt_to_ms
        return ["date", str(_dt_to_ms(v))]
    if isinstance(v, URLValue):
        if _XML_ILLEGAL_RE.search(v.href):
            return ["url", {"encoding": "hex"}, _hex_str(v.href)]
        return ["url", v.href]
    if isinstance(v, (list, tuple)):
        return ["array", *[value_to_arbitrary_jsonml(x) for x in v]]
    if isinstance(v, (PSet, set, frozenset)):
        members = v.members if isinstance(v, PSet) else list(v)
        return ["set", *[value_to_arbitrary_jsonml(x) for x in members]]
    if isinstance(v, PMap):
        return ["map", *[["entry", value_to_arbitrary_jsonml(k),
                          value_to_arbitrary_jsonml(x)] for k, x in v.entries]]
    if isinstance(v, dict):
        return ["object", *[
            ["prop",
             ({"name-hex": _hex_str(k)} if _XML_ILLEGAL_RE.search(k)
              else {"name": k}),
             value_to_arbitrary_jsonml(x)]
            for k, x in v.items()]]
    raise XMLError(f"cannot encode {type(v)!r} as arbitrary XML")


def _children(node: list) -> list:
    rest = node[1:]
    if rest and isinstance(rest[0], dict):
        rest = rest[1:]
    return rest


def _attrs(node: list) -> dict:
    rest = node[1:]
    return rest[0] if rest and isinstance(rest[0], dict) else {}


def arbitrary_jsonml_to_value(node: Any) -> Any:
    if isinstance(node, str):
        return node
    tag = node[0]
    kids = _children(node)
    text = "".join(c for c in kids if isinstance(c, str))
    if tag == "null":
        return None
    if tag == "undefined":
        return Undefined
    if tag == "true":
        return True
    if tag == "false":
        return False
    if tag == "number":
        return int(text) if text.lstrip("+-").isdigit() else float(text)
    if tag == "string":
        if _attrs(node).get("encoding") == "hex":
            return _unhex_str(text)
        return text
    if tag == "buffer":
        return bytes.fromhex(text)
    if tag == "date":
        # exact ms (timedelta, not /1000.0 float) + bounded: a crafted
        # <date> with an astronomical epoch must raise XMLError, not
        # OverflowError (the crafted-input contract every codec holds)
        try:
            return _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc) \
                + _dt.timedelta(milliseconds=int(text))
        except OverflowError:
            raise XMLError(f"date epoch ms out of range: {text!r}")
    if tag == "url":
        if _attrs(node).get("encoding") == "hex":
            return URLValue(_unhex_str(text))
        return URLValue(text)
    if tag == "array":
        return [arbitrary_jsonml_to_value(c) for c in kids if not isinstance(c, str)]
    if tag == "set":
        return PSet(arbitrary_jsonml_to_value(c) for c in kids if not isinstance(c, str))
    if tag == "map":
        pairs = []
        for entry in kids:
            if isinstance(entry, str):
                continue
            ek = [c for c in _children(entry) if not isinstance(c, str)]
            if len(ek) < 2:
                # crafted <map><entry/></map> previously escaped as
                # IndexError; the entry element needs key + value children
                raise XMLError(
                    f"map entry needs 2 element children, got {len(ek)}")
            pairs.append((arbitrary_jsonml_to_value(ek[0]),
                          arbitrary_jsonml_to_value(ek[1])))
        return PMap(pairs)
    if tag == "object":
        out = {}
        for prop in kids:
            if isinstance(prop, str):
                continue
            pa = _attrs(prop)
            name = (_unhex_str(pa["name-hex"]) if "name-hex" in pa
                    else pa.get("name", ""))
            pv = [c for c in _children(prop) if not isinstance(c, str)]
            out[name] = arbitrary_jsonml_to_value(pv[0]) if pv else "".join(
                c for c in _children(prop) if isinstance(c, str))
        return out
    raise XMLError(f"unknown arbitrary tag {tag!r}")


# --------------------------------------------------------------------------
# HTML (encode JsonML → HTML; decode HTML → JsonML)
# --------------------------------------------------------------------------

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
RAW_TEXT_ELEMENTS = frozenset(("script", "style"))


def _node_to_html(node: Any, out: list[str], depth: int = 0) -> None:
    if depth > _MAX_DEPTH:
        raise XMLError(f"JsonML nested deeper than {_MAX_DEPTH}")
    if isinstance(node, str):
        out.append(_esc_text(node))
        return
    if not (isinstance(node, list) and node and isinstance(node[0], str)):
        # mirror the XML serializer's contract: a non-node (int, dict,
        # malformed list) raises XMLError, not TypeError from node[0]
        raise XMLError(f"not a JsonML node: {node!r}")
    tag = node[0]
    rest = node[1:]
    attrs: dict[str, str] = {}
    if rest and isinstance(rest[0], dict):
        attrs = rest[0]
        rest = rest[1:]
    if tag == "#document":
        out.append("<!DOCTYPE html>")
        for c in rest:
            _node_to_html(c, out, depth + 1)
        return
    if tag == "#comment":
        out.append(f"<!--{''.join(str(c) for c in rest)}-->")
        return
    out.append(f"<{tag}")
    for k, v in attrs.items():
        out.append(f' {k}="{_esc_attr(v)}"')
    out.append(">")
    if tag.lower() in VOID_ELEMENTS:
        return
    if tag.lower() in RAW_TEXT_ELEMENTS:
        for c in rest:
            out.append(str(c))  # raw text, unescaped
    else:
        for c in rest:
            _node_to_html(c, out, depth + 1)
    out.append(f"</{tag}>")


def jsonml_to_html(root: Any) -> str:
    out: list[str] = []
    _node_to_html(root, out)
    return "".join(out)


class _HTMLToJsonML(html.parser.HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root_children: list[Any] = []
        # stack of (node, base_len): children live at index >= base_len
        self.stack: list[tuple[list[Any], int]] = []

    def _target(self) -> list:
        return self.stack[-1][0] if self.stack else self.root_children

    def handle_starttag(self, tag, attrs):
        if len(self.stack) >= _MAX_DEPTH:
            # same cap as every other codec's decode (see xml_to_jsonml)
            raise XMLError(f"HTML nested deeper than {_MAX_DEPTH}")
        node: list[Any] = [tag]
        if attrs:
            node.append({k: (v if v is not None else "") for k, v in attrs})
        self._target().append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append((node, len(node)))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i][0][0] == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if self.stack:
            node, base = self.stack[-1]
            if len(node) > base and isinstance(node[-1], str):
                node[-1] += data
            else:
                node.append(data)
        elif data.strip() != "":
            self.root_children.append(data)

    def handle_comment(self, data):
        self._target().append(["#comment", data])


def html_to_jsonml(text: str | bytes) -> Any:
    p = _HTMLToJsonML()
    try:
        p.feed(text if isinstance(text, str) else text.decode("utf-8"))
        p.close()
    except AssertionError as e:
        # stdlib _markupbase raises bare AssertionError on malformed
        # markup declarations ('<![;' — found by the codec fuzz); keep
        # the decoder's ValueError contract
        raise XMLError(f"HTML parse error: {e}") from e
    kids = p.root_children
    if len(kids) == 1:
        return kids[0]
    return ["#document", *kids]
