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
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


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
        out.append(f"<!--{''.join(str(c) for c in rest)}-->")
        return
    if tag == "#cdata-section":
        out.append(f"<![CDATA[{''.join(str(c) for c in rest)}]]>")
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
        return ["string", v] if v else ["string"]
    if isinstance(v, (bytes, bytearray, memoryview)):
        return ["buffer", bytes(v).hex()] if v else ["buffer"]
    if isinstance(v, _dt.datetime):
        ms = int((v.timestamp() if v.tzinfo
                  else v.replace(tzinfo=_dt.timezone.utc).timestamp()) * 1000)
        return ["date", str(ms)]
    if isinstance(v, URLValue):
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
        return ["object", *[["prop", {"name": k}, value_to_arbitrary_jsonml(x)]
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
        return text
    if tag == "buffer":
        return bytes.fromhex(text)
    if tag == "date":
        return _dt.datetime.fromtimestamp(int(text) / 1000.0, tz=_dt.timezone.utc)
    if tag == "url":
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
            pairs.append((arbitrary_jsonml_to_value(ek[0]),
                          arbitrary_jsonml_to_value(ek[1])))
        return PMap(pairs)
    if tag == "object":
        out = {}
        for prop in kids:
            if isinstance(prop, str):
                continue
            name = _attrs(prop).get("name", "")
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
    p.feed(text if isinstance(text, str) else text.decode("utf-8"))
    p.close()
    kids = p.root_children
    if len(kids) == 1:
        return kids[0]
    return ["#document", *kids]
