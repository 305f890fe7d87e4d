"""The fixed type-directed merge-reduce — the reference's only aggregate
function (ref ``library/utility/reduce.js:13-53``; golden tests
``test/test-utility-reduce.js:7-88``).

Semantics, by (left, right) type pair (dispatch ref reduce.js:14-18):

- Set,  Set   → union                       (:21-23)
- Array,Array → concatenation               (:24-26)
- number,number → addition (incl. bigints)  (:27-29)
- Map,  Map   → recursive per-key merge     (:30-38)
- Object,Object → recursive per-key merge   (:39-47)
- Date, Date  → max                         (:48-49)
- anything else (strings, Buffers, booleans, mixed types) → last wins (:50-51)

The fold is a *pairwise left fold in emission order* (ref lens.js:207-211) —
NOT associative for the last-wins cases, so the engine folds sequentially per
key in a deterministic total order (see lens.py) instead of tree-reducing.

Booleans are NOT numbers here (JS ``typeof true === 'boolean'`` → default
last-wins), even though Python ``bool`` subclasses ``int``.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from .values import PMap, PSet, canonical_json

__all__ = ["merge2", "merge_into", "fold"]


def _is_number(v: Any) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def merge2(left: Any, right: Any) -> Any:
    """Merge two values per the reference's type dispatch."""
    if isinstance(left, PSet) and isinstance(right, PSet):
        return PSet(list(left.members) + list(right.members))  # PSet dedupes
    if isinstance(left, list) and isinstance(right, list):
        return left + right
    if _is_number(left) and _is_number(right):
        return left + right
    if isinstance(left, PMap) and isinstance(right, PMap):
        merged: dict[str, tuple[Any, Any]] = {}
        order: list[str] = []
        for k, v in left.entries:
            ck = canonical_json(k)
            if ck not in merged:
                order.append(ck)
            merged[ck] = (k, v)
        for k, v in right.entries:
            ck = canonical_json(k)
            if ck in merged:
                merged[ck] = (merged[ck][0], merge2(merged[ck][1], v))
            else:
                order.append(ck)
                merged[ck] = (k, v)
        return PMap(merged[ck] for ck in order)
    if isinstance(left, dict) and isinstance(right, dict):
        out = dict(left)
        for k, v in right.items():
            out[k] = merge2(out[k], v) if k in out else v
        return out
    if isinstance(left, _dt.datetime) and isinstance(right, _dt.datetime):
        return max(left, right)
    return right  # strings, Buffers, booleans, mixed types: last wins


def merge_into(acc: Any, right: Any) -> Any:
    """Like :func:`merge2` but may MUTATE ``acc`` (and return it).

    Only safe when the caller owns ``acc`` exclusively (e.g. the lens reduce
    fold, where every value is freshly parsed from JSON).  Makes hot-key
    folds linear: Set union appends behind a persistent dedup index, arrays
    extend, objects merge in place — a key accumulating n singleton
    emissions costs O(n) instead of the O(n^2) of copy-per-merge.
    (PMap keeps the copying merge — per-merge key re-canonicalization makes
    an in-place variant no better without an index cache; Maps are rare as
    hot accumulators.)
    """
    if isinstance(acc, PSet) and isinstance(right, PSet):
        acc.update(right)
        return acc
    if isinstance(acc, list) and isinstance(right, list):
        acc.extend(right)
        return acc
    if isinstance(acc, dict) and isinstance(right, dict):
        for k, v in right.items():
            acc[k] = merge_into(acc[k], v) if k in acc else v
        return acc
    return merge2(acc, right)


def fold(values: list[Any]) -> Any:
    """Pairwise left fold in the given order (ref lens.js:207-211)."""
    if not values:
        raise ValueError("fold of empty list")
    acc = values[0]
    for v in values[1:]:
        acc = merge2(acc, v)
    return acc
