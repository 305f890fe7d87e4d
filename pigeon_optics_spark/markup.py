"""The ``Markup`` toolkit exposed inside lens code (SURVEY §2.5).

The reference gives sandboxed lens code an XML/JsonML helper object
(`library/workers/environment.js/markup.js:12-34`; behavior tests
`test/test-workers-javascript-environment.js:24-118`):

- ``Markup.select(root, selector)`` — CSS-selector query over a JsonML tree
- ``Markup.get.text(node)`` / ``Markup.get.attribute(node, name)`` /
  ``Markup.get.tag(node)`` / ``Markup.get.children(node)``
- ``Markup.set.attribute(node, name, value)`` (mutates)
- ``Markup.toXML(node)`` / ``Markup.toHTML(node)``
- ``Markup.isPigeonMark(value)`` — shape test

The CSS engine here is a from-scratch subset: tag, ``*``, ``#id``,
``.class``, ``[attr]``, ``[attr=value]``, compound simple selectors,
descendant (whitespace) and child (``>``) combinators, comma groups.
"""

from __future__ import annotations

import re
from typing import Any, Iterator

from .codecs.jsonml import is_jsonml, jsonml_to_html, jsonml_to_xml

_TOKEN_RE = re.compile(
    r"\s*(?P<comb>[>,])\s*"
    r"|(?P<ws>\s+)"
    r"|(?P<simple>(?:[\w-]+|\*)?(?:[#.][\w-]+|\[[\w-]+(?:=(?:\"[^\"]*\"|'[^']*'|[^\]]*))?\])*)"
)

_PART_RE = re.compile(
    r"(?P<tag>^[\w-]+|\*)"
    r"|#(?P<id>[\w-]+)"
    r"|\.(?P<cls>[\w-]+)"
    r"|\[(?P<attr>[\w-]+)(?:=(?P<q>[\"']?)(?P<val>.*?)(?P=q))?\]"
)


def _attrs(node: list) -> dict:
    return node[1] if len(node) > 1 and isinstance(node[1], dict) else {}


def _children(node: list) -> list:
    rest = node[1:]
    if rest and isinstance(rest[0], dict):
        rest = rest[1:]
    return rest


class _Simple:
    """One compound simple selector (tag#id.class[attr=val])."""

    def __init__(self, text: str):
        self.tag: str | None = None
        self.id: str | None = None
        self.classes: list[str] = []
        self.attrs: list[tuple[str, str | None]] = []
        for m in _PART_RE.finditer(text):
            if m.group("tag"):
                self.tag = None if m.group("tag") == "*" else m.group("tag")
            elif m.group("id"):
                self.id = m.group("id")
            elif m.group("cls"):
                self.classes.append(m.group("cls"))
            elif m.group("attr"):
                self.attrs.append((m.group("attr"), m.group("val")))

    def matches(self, node: Any) -> bool:
        if not (isinstance(node, list) and node and isinstance(node[0], str)):
            return False
        a = _attrs(node)
        if self.tag is not None and node[0] != self.tag:
            return False
        if self.id is not None and a.get("id") != self.id:
            return False
        if self.classes:
            have = (a.get("class") or "").split()
            if any(c not in have for c in self.classes):
                return False
        for name, val in self.attrs:
            if name not in a:
                return False
            if val is not None and a[name] != val:
                return False
        return True


def _parse_selector(selector: str) -> list[list[tuple[str, _Simple]]]:
    """→ list of groups; each group is [(combinator, simple)] with
    combinator ∈ {'descendant', 'child'} (first entry 'descendant')."""
    groups: list[list[tuple[str, _Simple]]] = [[]]
    pending = "descendant"
    for m in _TOKEN_RE.finditer(selector):
        if m.group("comb") == ",":
            groups.append([])
            pending = "descendant"
        elif m.group("comb") == ">":
            pending = "child"
        elif m.group("ws"):
            if pending != "child":
                pending = "descendant"
        elif m.group("simple"):
            groups[-1].append((pending, _Simple(m.group("simple"))))
            pending = "descendant"
    return [g for g in groups if g]


def _walk(node: Any) -> Iterator[Any]:
    # iterative pre-order (explicit stack): a deeply nested JsonML value
    # must never blow the recursion limit inside the lens sandbox (the
    # codec nesting-bomb discipline applied here — review finding)
    stack = [node]
    while stack:
        cur = stack.pop()
        if isinstance(cur, list) and cur and isinstance(cur[0], str):
            yield cur
            stack.extend(reversed(_children(cur)))


def _match_chain(node: Any, chain: list[tuple[str, _Simple]],
                 parents: dict[int, Any]) -> bool:
    """Does ``node`` match the full selector chain (right-to-left walk
    using the caller's parent map)?"""
    comb, last = chain[-1]
    if not last.matches(node):
        return False
    if len(chain) == 1:
        return True
    return _match_rest(node, chain[:-1], comb, parents)


def _match_rest(node: Any, chain: list[tuple[str, _Simple]], comb: str,
                parents: dict[int, Any]) -> bool:
    _, simple = chain[-1]
    cur = parents.get(id(node))
    while cur is not None:
        if simple.matches(cur):
            if len(chain) == 1:
                return True
            if _match_rest(cur, chain[:-1], chain[-1][0], parents):
                return True
        if comb == "child":
            return False  # only the direct parent may satisfy a child combinator
        cur = parents.get(id(cur))
    return False


def _parent_map(root: Any) -> dict[int, Any]:
    parents: dict[int, Any] = {}
    if isinstance(root, list):
        stack = [root]
        while stack:
            node = stack.pop()
            for c in _children(node):
                if isinstance(c, list):
                    parents[id(c)] = node
                    stack.append(c)
    return parents


def select(root: Any, selector: str) -> list:
    """All elements in document order matching the CSS selector."""
    groups = _parse_selector(selector)
    # ONE parent map per call (lazy — only multi-step chains need it):
    # rebuilding the full O(n) map inside _match_chain for every matching
    # candidate made multi-step selectors O(n^2) (review finding)
    parents = (_parent_map(root)
               if any(len(chain) > 1 for chain in groups) else {})
    out = []
    seen: set[int] = set()
    for node in _walk(root):
        if id(node) in seen:
            continue
        for chain in groups:
            if chain and _match_chain(node, chain, parents):
                out.append(node)
                seen.add(id(node))
                break
    return out


# --------------------------------------------------------------------------
# get / set / serialize
# --------------------------------------------------------------------------


def _text_of(node: Any) -> str:
    if isinstance(node, str):
        return node
    if not isinstance(node, list):
        return ""
    parts: list[str] = []
    stack = [node]
    while stack:
        cur = stack.pop()
        if isinstance(cur, str):
            parts.append(cur)
        elif isinstance(cur, list):
            stack.extend(reversed(_children(cur)))
    return "".join(parts)


class _Get:
    @staticmethod
    def text(node: Any) -> str:
        return _text_of(node)

    @staticmethod
    def attribute(node: Any, name: str) -> str | None:
        return _attrs(node).get(name)

    @staticmethod
    def tag(node: Any) -> str | None:
        return node[0] if isinstance(node, list) and node else None

    @staticmethod
    def children(node: Any) -> list:
        return [c for c in _children(node) if isinstance(c, list)]

    @staticmethod
    def childNodes(node: Any) -> list:
        return list(_children(node))


class _Set:
    @staticmethod
    def attribute(node: list, name: str, value: str) -> list:
        if len(node) > 1 and isinstance(node[1], dict):
            node[1][name] = value
        else:
            node.insert(1, {name: value})
        return node


class Markup:
    """Namespace object handed to lens code (ref markup.js:12-34)."""

    select = staticmethod(select)
    get = _Get
    set = _Set
    toXML = staticmethod(jsonml_to_xml)
    toHTML = staticmethod(jsonml_to_html)
    isPigeonMark = staticmethod(is_jsonml)
