"""JSON5 decoder — tolerant JSON parser for the reference's ``application/
json5`` input codec (`library/models/codec/json.js:56-63` parses uploads with
npm `json5`).  Decode-only, like the reference (it serializes JSON5 output
via the pretty JSON printer).

Supported beyond JSON (per the public json5.org spec): ``//`` and ``/* */``
comments, trailing commas, single-quoted strings, unquoted identifier keys,
hex integers, leading/trailing decimal points, explicit ``+``, ``Infinity``
``-Infinity`` ``NaN``, multi-line strings with escaped newlines.
"""

from __future__ import annotations

import re
from typing import Any

_ID_RE = re.compile(r"[A-Za-z_$][A-Za-z0-9_$]*")
_HEX_RE = re.compile(r"[+-]?0[xX][0-9a-fA-F]+")
_NUM_RE = re.compile(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?")

_ESCAPES = {'"': '"', "'": "'", "\\": "\\", "/": "/", "b": "\b", "f": "\f",
            "n": "\n", "r": "\r", "t": "\t", "v": "\v", "0": "\0", "\n": ""}


class JSON5Error(ValueError):
    pass


class _Parser:
    #: maximum container nesting — a few-KB '[[[[...' bomb otherwise
    #: dies with RecursionError, outside the JSON5Error (ValueError)
    #: contract (the codec-kernel lesson; each level costs ~2 frames)
    MAX_DEPTH = 256

    def __init__(self, text: str):
        self.s = text
        self.i = 0
        self.depth = 0

    def err(self, msg: str) -> JSON5Error:
        return JSON5Error(f"{msg} at offset {self.i}")

    def ws(self) -> None:
        s, n = self.s, len(self.s)
        while self.i < n:
            c = s[self.i]
            if c in " \t\n\r\f\v   ﻿":
                self.i += 1
            elif s.startswith("//", self.i):
                j = s.find("\n", self.i)
                self.i = n if j < 0 else j + 1
            elif s.startswith("/*", self.i):
                j = s.find("*/", self.i + 2)
                if j < 0:
                    raise self.err("unterminated comment")
                self.i = j + 2
            else:
                return

    def peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def value(self) -> Any:
        self.ws()
        c = self.peek()
        if c in "{[":
            self.depth += 1
            if self.depth > self.MAX_DEPTH:
                raise self.err(f"nesting deeper than {self.MAX_DEPTH}")
            try:
                return self.obj() if c == "{" else self.arr()
            finally:
                self.depth -= 1
        if c in "\"'":
            return self.string(c)
        for lit, v in (("true", True), ("false", False), ("null", None)):
            if self.s.startswith(lit, self.i):
                self.i += len(lit)
                return v
        for lit, v in (("Infinity", float("inf")), ("+Infinity", float("inf")),
                       ("-Infinity", float("-inf")), ("NaN", float("nan")),
                       ("+NaN", float("nan")), ("-NaN", float("nan"))):
            if self.s.startswith(lit, self.i):
                self.i += len(lit)
                return v
        m = _HEX_RE.match(self.s, self.i)
        if m:
            self.i = m.end()
            return int(m.group(0), 16)
        m = _NUM_RE.match(self.s, self.i)
        if m:
            self.i = m.end()
            t = m.group(0)
            if re.fullmatch(r"[+-]?\d+", t):
                return int(t)
            return float(t)
        raise self.err(f"unexpected character {c!r}")

    def string(self, quote: str) -> str:
        self.i += 1
        out = []
        s, n = self.s, len(self.s)
        while self.i < n:
            c = s[self.i]
            if c == quote:
                self.i += 1
                return "".join(out)
            if c == "\\":
                self.i += 1
                e = s[self.i] if self.i < n else ""
                if e == "u":
                    code = s[self.i + 1:self.i + 5]
                    out.append(chr(int(code, 16)))
                    self.i += 5
                elif e == "x":
                    out.append(chr(int(s[self.i + 1:self.i + 3], 16)))
                    self.i += 3
                elif e == "\r":
                    self.i += 1
                    if self.i < n and s[self.i] == "\n":
                        self.i += 1
                elif e in _ESCAPES:
                    out.append(_ESCAPES[e])
                    self.i += 1
                else:
                    out.append(e)
                    self.i += 1
            else:
                out.append(c)
                self.i += 1
        raise self.err("unterminated string")

    def obj(self) -> dict:
        self.i += 1  # {
        out: dict[str, Any] = {}
        while True:
            self.ws()
            if self.peek() == "}":
                self.i += 1
                return out
            c = self.peek()
            if c in "\"'":
                key = self.string(c)
            else:
                m = _ID_RE.match(self.s, self.i)
                if not m:
                    raise self.err("expected object key")
                key = m.group(0)
                self.i = m.end()
            self.ws()
            if self.peek() != ":":
                raise self.err("expected ':'")
            self.i += 1
            out[key] = self.value()
            self.ws()
            if self.peek() == ",":
                self.i += 1
            elif self.peek() == "}":
                self.i += 1
                return out
            else:
                raise self.err("expected ',' or '}'")

    def arr(self) -> list:
        self.i += 1  # [
        out: list[Any] = []
        while True:
            self.ws()
            if self.peek() == "]":
                self.i += 1
                return out
            out.append(self.value())
            self.ws()
            if self.peek() == ",":
                self.i += 1
            elif self.peek() == "]":
                self.i += 1
                return out
            else:
                raise self.err("expected ',' or ']'")


def loads(text: str) -> Any:
    p = _Parser(text)
    v = p.value()
    p.ws()
    if p.i != len(p.s):
        raise p.err("trailing content")
    return v
