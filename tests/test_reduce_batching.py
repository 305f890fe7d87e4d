"""The reduce fold's hardest path: one out_id group SPLIT ACROSS Arrow
batches inside a partition.  ``reduce_outputs`` streams sorted batches and
carries the accumulator over the batch boundary; with the default 10k-row
batches small tests never exercise the carry, so this test forces 2-row
batches and checks both the split-group merge and the fold ORDER (last-wins
depends on it)."""

from __future__ import annotations

import json

import pytest

from pigeon_optics_spark.lens import reduce_outputs
from pigeon_optics_spark.values import natural_pad, tagged_to_value, value_to_tagged


@pytest.fixture()
def tiny_batches(spark):
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    yield spark
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def _emissions(spark, rows):
    data = [(oid, 0, natural_pad(rid), rid, emit_idx,
             json.dumps(value_to_tagged(v), ensure_ascii=False))
            for oid, rid, emit_idx, v in rows]
    return spark.createDataFrame(
        data, "out_id string, input_idx int, nat_key string, src_rid string, "
              "emit_idx int, value string")


def test_group_split_across_arrow_batches(tiny_batches):
    spark = tiny_batches
    # 7 emissions for ONE key (crosses several 2-row batches) + neighbors
    rows = ([("big", f"r{i}", 0, i) for i in range(7)]
            + [("a-first", "r0", 0, 100), ("z-last", "r0", 0, 200)])
    out = {r["record_id"]: tagged_to_value(json.loads(r["value"]))
           for r in reduce_outputs(_emissions(spark, rows), num_partitions=1).collect()}
    assert out == {"big": sum(range(7)), "a-first": 100, "z-last": 200}


def test_last_wins_order_stable_across_batches(tiny_batches):
    spark = tiny_batches
    # strings don't merge — LAST in (input_idx, nat_key, emit_idx) order wins;
    # record ids chosen so natural order differs from lexicographic
    rows = [("k", "r10", 0, "from-r10"), ("k", "r2", 0, "from-r2"),
            ("k", "r1", 0, "from-r1"), ("k", "r1", 1, "from-r1-second")]
    out = reduce_outputs(_emissions(spark, rows), num_partitions=1).collect()
    assert len(out) == 1
    # natural order: r1(emit0), r1(emit1), r2, r10 → r10's value wins
    assert tagged_to_value(json.loads(out[0]["value"])) == "from-r10"


def test_nat_key_collision_tiebreak(tiny_batches):
    spark = tiny_batches
    # 'a01' and 'a1' pad to identical nat_keys — the raw record id must
    # break the tie so last-wins is run-deterministic ('a01' < 'a1' raw)
    assert natural_pad("a01") == natural_pad("a1")
    rows = [("k", "a1", 0, "from-a1"), ("k", "a01", 0, "from-a01")]
    for _ in range(3):  # stable across repeated runs
        out = reduce_outputs(_emissions(spark, rows), num_partitions=1).collect()
        assert tagged_to_value(json.loads(out[0]["value"])) == "from-a1"


def test_many_groups_many_partitions(tiny_batches):
    spark = tiny_batches
    rows = [(f"k{g}", f"r{i}", 0, 1) for g in range(20) for i in range(5)]
    out = {r["record_id"]: tagged_to_value(json.loads(r["value"]))
           for r in reduce_outputs(_emissions(spark, rows)).collect()}
    assert out == {f"k{g}": 5 for g in range(20)}
