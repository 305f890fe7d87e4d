"""Merge-reduce golden semantics (FIXTURES F2, ref test/test-utility-reduce.js:7-88)."""

import datetime as dt

from pigeon_optics_spark.reduce import fold, merge2
from pigeon_optics_spark.values import PMap, PSet


def test_arrays_concat():
    assert merge2([1, 2], [3, 4]) == [1, 2, 3, 4]
    assert fold([[1], [2], [3]]) == [1, 2, 3]


def test_numbers_add():
    assert merge2(1, 2) == 3
    assert merge2(1.5, 2.25) == 3.75
    assert merge2(2**70, 1) == 2**70 + 1  # bigint add
    assert fold([1, 1, 1, 1]) == 4  # the count idiom


def test_sets_union():
    assert merge2(PSet([1, 2]), PSet([2, 3])) == PSet([1, 2, 3])


def test_strings_last_wins():
    assert merge2("a", "b") == "b"
    assert fold(["x", "y", "z"]) == "z"


def test_buffers_last_wins():
    assert merge2(b"a", b"b") == b"b"


def test_booleans_last_wins():
    # JS typeof true === 'boolean' → default branch, NOT number-add
    assert merge2(True, False) is False
    assert merge2(True, True) is True


def test_mixed_types_last_wins():
    assert merge2(5, "five") == "five"
    assert merge2([1], PSet([1])) == PSet([1])
    assert merge2({"a": 1}, [2]) == [2]


def test_dates_max():
    d1 = dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc)
    d2 = dt.datetime(2021, 1, 1, tzinfo=dt.timezone.utc)
    assert merge2(d1, d2) == d2
    assert merge2(d2, d1) == d2


def test_objects_recursive_merge():
    out = merge2({"a": 1, "b": [1], "s": "old"}, {"a": 2, "b": [2], "s": "new", "c": 9})
    assert out == {"a": 3, "b": [1, 2], "s": "new", "c": 9}


def test_maps_recursive_merge():
    m1 = PMap([(1, 10), ("k", [1])])
    m2 = PMap([(1, 5), ("k", [2]), (2, "x")])
    out = merge2(m1, m2)
    assert out == PMap([(1, 15), ("k", [1, 2]), (2, "x")])


def test_complex_object_accumulator():
    # ref test-utility-reduce.js:67-87 — object containing Set fields +
    # numeric counters accumulates correctly
    docs = [
        {"count": 1, "tags": PSet(["a"]), "last": "one"},
        {"count": 1, "tags": PSet(["b"]), "last": "two"},
        {"count": 1, "tags": PSet(["a", "c"]), "last": "three"},
    ]
    out = fold(docs)
    assert out == {"count": 3, "tags": PSet(["a", "b", "c"]), "last": "three"}


def test_fold_order_sensitivity():
    # last-wins is order-sensitive: the engine must fold in deterministic order
    assert fold(["a", "b"]) == "b"
    assert fold(["b", "a"]) == "a"
