"""JS-literal pretty-printer — encode-only display codec (ref
`library/models/codec/javascript.js:12-18`; the reference renders record
values as JavaScript literals for its UI, never parses them back.  The
sibling v8 serializer is disabled for safety in the reference and is
deliberately absent here).
"""

from __future__ import annotations

import datetime as _dt
import json
import math
from typing import Any

from ..values import PMap, PSet, Undefined, URLValue


def _indent(level: int) -> str:
    return "  " * level


def to_js_literal(v: Any, level: int = 0) -> str:
    pad, pad_in = _indent(level), _indent(level + 1)
    if v is None:
        return "null"
    if v is Undefined:
        return "undefined"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        return repr(v)
    if isinstance(v, int):
        return f"{v}n" if abs(v) >= (1 << 53) else str(v)
    if isinstance(v, str):
        return json.dumps(v, ensure_ascii=False)
    if isinstance(v, (bytes, bytearray, memoryview)):
        return f"Buffer.from('{bytes(v).hex()}', 'hex')"
    if isinstance(v, _dt.datetime):
        ms = int((v.timestamp() if v.tzinfo
                  else v.replace(tzinfo=_dt.timezone.utc).timestamp()) * 1000)
        return f"new Date({ms})"
    if isinstance(v, URLValue):
        return f"new URL({json.dumps(v.href)})"
    if isinstance(v, (list, tuple)):
        if not v:
            return "[]"
        inner = ",\n".join(pad_in + to_js_literal(x, level + 1) for x in v)
        return f"[\n{inner}\n{pad}]"
    if isinstance(v, (PSet, set, frozenset)):
        members = v.members if isinstance(v, PSet) else list(v)
        return f"new Set({to_js_literal(list(members), level)})"
    if isinstance(v, PMap):
        pairs = [[k, x] for k, x in v.entries]
        return f"new Map({to_js_literal(pairs, level)})"
    if isinstance(v, dict):
        if not v:
            return "{}"
        _ID = __import__("re").compile(r"^[A-Za-z_$][A-Za-z0-9_$]*$")
        parts = []
        for k, x in v.items():
            key = k if isinstance(k, str) and _ID.match(k) else json.dumps(
                str(k), ensure_ascii=False)
            parts.append(f"{pad_in}{key}: {to_js_literal(x, level + 1)}")
        return "{\n" + ",\n".join(parts) + f"\n{pad}}}"
    raise TypeError(f"cannot render {type(v)!r} as a JS literal")
