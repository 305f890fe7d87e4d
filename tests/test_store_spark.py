"""M1 Spark-path tests: read_df / write_entries_df (distributed MERGE path)."""

import json

from pigeon_optics_spark.store import DatasetStore
from pigeon_optics_spark.values import value_to_tagged


def test_read_df_resolves_latest(spark, tmp_path):
    store = DatasetStore(str(tmp_path / "s"))
    store.create("a", "d")
    store.write_entries("a", "d", [("r1", {"x": 1}), ("r2", {"x": 2})])
    store.write("a", "d", "r1", {"x": 10})
    store.delete_record("a", "d", "r2")
    df = store.read_df(spark, "a", "d")
    rows = {r["record_id"]: json.loads(r["value"]) for r in df.collect()}
    assert rows == {"r1": {"x": 10}}


def test_write_entries_df_merge_and_suppression(spark, tmp_path):
    store = DatasetStore(str(tmp_path / "s"))
    store.create("a", "d")
    store.write_entries("a", "d", [("r1", {"x": 1}), ("r2", {"x": 2})])

    batch = spark.createDataFrame(
        [("r1", json.dumps(value_to_tagged({"x": 1}))),   # identical → suppressed
         ("r2", json.dumps(value_to_tagged({"x": 99}))),  # changed
         ("r3", json.dumps(value_to_tagged({"x": 3})))],  # new
        schema="record_id string, value string",
    )
    store.write_entries_df(spark, "a", "d", batch)
    recs = {r["id"]: r for r in store.iterate("a", "d", fast_read=True)}
    assert recs["r1"]["version"] == 1  # suppressed, untouched
    assert recs["r2"]["version"] == 2
    assert recs["r3"]["version"] == 2
    assert recs["r2"]["value"] == {"x": 99}


def test_write_entries_df_overwrite(spark, tmp_path):
    store = DatasetStore(str(tmp_path / "s"))
    store.create("a", "d")
    store.write_entries("a", "d", [("r1", {"x": 1}), ("r2", {"x": 2})])
    batch = spark.createDataFrame(
        [("r2", json.dumps(value_to_tagged({"x": 2}))),
         ("r4", json.dumps(value_to_tagged({"x": 4})))],
        schema="record_id string, value string",
    )
    store.write_entries_df(spark, "a", "d", batch, overwrite=True)
    recs = {r["id"]: r for r in store.iterate("a", "d", fast_read=True)}
    assert set(recs) == {"r2", "r4"}
    assert recs["r2"]["version"] == 1  # identical content keeps old version
    assert recs["r4"]["version"] == 2


def test_python_datasource_matches_read_df_with_tombstones(spark, tmp_path):
    """The pigeon_optics DataSource must equal read_df through a history
    with updates AND deletes (tombstones must not resurrect through the
    bucket-partitioned resolution), at a bucket count that forces
    multi-partition reads."""
    from pigeon_optics_spark.sources.pigeon_datasource import (
        PigeonDataSource,
    )
    from pigeon_optics_spark.store import DatasetStore

    store = DatasetStore(str(tmp_path / "ds"))
    store.create("a", "c")
    store.write_entries("a", "c",
                        [(f"r{i}", {"v": i}) for i in range(50)])
    store.write_entries("a", "c",
                        [(f"r{i}", {"v": i * 10}) for i in range(0, 50, 2)])
    store.delete_record("a", "c", "r4")
    store.delete_record("a", "c", "r5")

    try:
        spark.dataSource.register(PigeonDataSource)
    except Exception:
        pass
    via_source = (spark.read.format("pigeon_optics")
                  .option("root", store.root)
                  .option("author", "a").option("name", "c")
                  .option("buckets", "4")
                  .load())
    want = {(r["record_id"], r["value"], r["version"])
            for r in store.read_df(spark, "a", "c").collect()}
    got = {(r["record_id"], r["value"], r["version"])
           for r in via_source.collect()}
    assert got == want
    assert len(got) == 48 and not any(r[0] in ("r4", "r5") for r in got)


def test_stream_reader_offsets_and_replay(tmp_path):
    """PigeonStreamReader unit semantics: initial read drains everything
    and advances the offset; incremental read returns only new segments;
    readBetweenOffsets (the checkpoint-recovery replay path) returns
    exactly the half-open segment range."""
    from pigeon_optics_spark.sources.pigeon_datasource import (
        PigeonStreamReader,
    )
    from pigeon_optics_spark.store import DatasetStore

    store = DatasetStore(str(tmp_path / "ds"))
    store.create("a", "c")
    store.write_entries("a", "c", [("r1", {"v": 1}), ("r2", {"v": 2})])
    store.write_entries("a", "c", [("r1", {"v": 10})])
    store.write_entries("a", "c", [("r2", None)])   # tombstone batch

    rdr = PigeonStreamReader({"root": store.root, "author": "a",
                              "name": "c"})
    start = rdr.initialOffset()
    rows, off1 = rdr.read(start)
    rows = list(rows)
    assert len(rows) == 4 and off1["seq"] >= 3
    assert sum(1 for r in rows if r[6]) == 1          # one tombstone
    # no new data -> empty batch, offset unchanged
    empty, off_same = rdr.read(off1)
    assert list(empty) == [] and off_same == off1
    # new segment -> incremental
    store.write_entries("a", "c", [("r4", {"v": 4})])
    inc, off2 = rdr.read(off1)
    inc = list(inc)
    assert [r[0] for r in inc] == ["r4"] and off2["seq"] > off1["seq"]
    # recovery replay of the middle range only
    seqs = sorted({r[5] for r in rows})
    mid = list(rdr.readBetweenOffsets({"seq": seqs[0]},
                                      {"seq": seqs[1]}))
    assert [r[0] for r in mid] == ["r1"] and mid[0][1] is not None
