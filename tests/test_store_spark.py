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


def test_pushdown_reader_prunes_buckets_and_filters(tmp_path):
    """PigeonPushdownReader unit semantics: record_id EqualTo/In filters
    are consumed (intersecting), everything else is handed back to Spark;
    partitions() plans only the ids' buckets; a contradictory constraint
    plans a single no-op partition; the default reader must NOT override
    pushFilters (a session with the pushdown conf off would refuse it)."""
    import zlib

    from pyspark.sql.datasource import EqualTo, In, IsNotNull

    from pigeon_optics_spark.sources.pigeon_datasource import (
        PigeonPushdownReader,
        PigeonSegmentReader,
    )
    from pigeon_optics_spark.store import DatasetStore

    assert "pushFilters" not in PigeonSegmentReader.__dict__

    store = DatasetStore(str(tmp_path / "ds"))
    store.create("a", "c")
    store.write_entries("a", "c", [(f"r{i}", {"v": i}) for i in range(40)])
    opts = {"root": store.root, "author": "a", "name": "c", "buckets": "8"}

    rdr = PigeonPushdownReader(opts)
    residual = list(rdr.pushFilters([
        In(("record_id",), ("r1", "r2", "r3")),
        IsNotNull(("value",)),            # not ours -> back to Spark
    ]))
    assert residual == [IsNotNull(("value",))]
    parts = rdr.partitions()
    want_buckets = {zlib.crc32(f"r{i}".encode()) % 8 for i in (1, 2, 3)}
    assert {p.idx for p in parts} == want_buckets
    got = sorted(r[0] for p in parts for r in rdr.read(p))
    assert got == ["r1", "r2", "r3"]

    # repeated constraints intersect; EqualTo + In -> singleton
    rdr2 = PigeonPushdownReader(opts)
    list(rdr2.pushFilters([In(("record_id",), ("r1", "r2")),
                           EqualTo(("record_id",), "r2")]))
    assert sorted(r[0] for p in rdr2.partitions()
                  for r in rdr2.read(p)) == ["r2"]

    # contradictory -> one empty partition, zero rows
    rdr3 = PigeonPushdownReader(opts)
    list(rdr3.pushFilters([EqualTo(("record_id",), "r1"),
                           EqualTo(("record_id",), "r2")]))
    parts3 = rdr3.partitions()
    assert len(parts3) == 1
    assert list(rdr3.read(parts3[0])) == []

    # a non-string comparand is not ours either (Spark keeps it)
    rdr4 = PigeonPushdownReader(opts)
    f = EqualTo(("record_id",), 7)
    assert list(rdr4.pushFilters([f])) == [f]
    assert rdr4._ids is None


def test_staged_write_seq_last_wins_and_null_delete(tmp_path):
    """_StagedStoreWrite._apply unit semantics: a batch carrying a seq
    column reduces to each record's highest-seq row before the write
    (update then tombstone in ONE commit applies in log order), and a
    NULL value deletes.  Without seq, null-delete still applies."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pigeon_optics_spark.sources.pigeon_datasource import (
        _PartStaged,
        _StagedStoreWrite,
    )
    from pigeon_optics_spark.store import DatasetStore
    from pigeon_optics_spark.values import value_to_tagged

    store = DatasetStore(str(tmp_path / "ds"))
    store.create("a", "c")
    store.write_entries("a", "c", [("keep", {"v": 0}), ("gone", {"v": 1}),
                                   ("flip", {"v": 2})])

    def tag(v):
        return json.dumps(value_to_tagged(v))

    w = _StagedStoreWrite({"root": store.root, "author": "a", "name": "c"},
                          overwrite=False)
    part = str(tmp_path / "part.parquet")
    pq.write_table(pa.Table.from_pydict({
        "record_id": ["flip", "flip", "gone", "flip"],
        # stale update (seq 1), real update (seq 5), tombstone LAST (seq 9)
        "value": [tag({"v": 99}), tag({"v": 5}), None, None],
        "seq": [1, 5, 9, 9]}), part)
    w._apply([_PartStaged(part, 4)])
    recs = {r["id"]: r["value"] for r in store.iterate("a", "c",
                                                       fast_read=True)}
    assert recs == {"keep": {"v": 0}}  # flip deleted by its seq-9 tombstone

    # without seq: plain null-delete + upsert
    store.write_entries("a", "c", [("x", {"v": 1}), ("y", {"v": 2})])
    w2 = _StagedStoreWrite({"root": store.root, "author": "a", "name": "c"},
                           overwrite=False)
    part2 = str(tmp_path / "part2.parquet")
    pq.write_table(pa.Table.from_pydict({
        "record_id": ["x", "y"],
        "value": [None, tag({"v": 20})]}), part2)
    w2._apply([_PartStaged(part2, 2)])
    recs = {r["id"]: r["value"] for r in store.iterate("a", "c",
                                                       fast_read=True)}
    assert recs == {"keep": {"v": 0}, "y": {"v": 20}}


def test_register_views_sql_and_name_folding(spark, tmp_path):
    """register_views: names fold to [A-Za-z0-9_], views are queryable
    via spark.sql, and re-registration after new writes sees new state
    (views are lazy plans over read_df)."""
    from pigeon_optics_spark.store import DatasetStore

    store = DatasetStore(str(tmp_path / "v"))
    store.create("au-thor", "data.set")
    store.write_entries("au-thor", "data.set", [("r1", {"x": 1})])
    views = store.register_views(spark)
    assert views == ["po_au_thor_data_set"]
    assert spark.sql("SELECT COUNT(*) n FROM po_au_thor_data_set") \
        .first()["n"] == 1
    store.write_entries("au-thor", "data.set", [("r2", {"x": 2})])
    store.register_views(spark)
    assert spark.sql("SELECT COUNT(*) n FROM po_au_thor_data_set") \
        .first()["n"] == 2


def test_datasource_missing_collection_errors(spark, tmp_path):
    """Reading a nonexistent collection through the connector surfaces
    the store's own error at planning, not a silent empty result."""
    import pytest

    from pigeon_optics_spark.sources.pigeon_datasource import (
        PigeonDataSource,
    )
    from pigeon_optics_spark.store import DatasetStore

    store = DatasetStore(str(tmp_path / "m"))
    try:
        spark.dataSource.register(PigeonDataSource)
    except Exception:
        pass
    with pytest.raises(Exception, match="no such collection"):
        (spark.read.format("pigeon_optics")
         .option("root", store.root)
         .option("author", "a").option("name", "nope")
         .load().collect())


def test_staged_write_abort_cleans_staging(tmp_path):
    """abort() removes the staging directory so failed epochs leave no
    files the store could misread."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pigeon_optics_spark.sources.pigeon_datasource import (
        _StagedStoreWrite,
    )
    from pigeon_optics_spark.store import DatasetStore

    store = DatasetStore(str(tmp_path / "ab"))
    store.create("a", "c")
    w = _StagedStoreWrite({"root": store.root, "author": "a", "name": "c"},
                          overwrite=False)
    os.makedirs(w._stage, exist_ok=True)
    pq.write_table(pa.Table.from_pydict(
        {"record_id": ["r"], "value": ["{}"]}),
        os.path.join(w._stage, "part.parquet"))
    assert os.path.isdir(w._stage)
    w.abort([])
    assert not os.path.isdir(w._stage)


def test_batch_feed_read_is_raw_log_with_tombstones(spark, tmp_path):
    """Batch read with option feed=changes must return the 7-column
    FEED_SCHEMA raw log (every seq, tombstones included) — previously
    reader() ignored the option and crashed with a 5-vs-7 column arity
    mismatch against the schema() branch."""
    from pigeon_optics_spark.sources.pigeon_datasource import (
        PigeonDataSource,
    )

    store = DatasetStore(str(tmp_path / "ds"))
    store.create("a", "c")
    store.write_entries("a", "c", [("r1", {"v": 1}), ("r2", {"v": 2})])
    store.write_entries("a", "c", [("r1", {"v": 10})])
    store.delete_record("a", "c", "r2")

    try:
        spark.dataSource.register(PigeonDataSource)
    except Exception:
        pass
    feed = (spark.read.format("pigeon_optics")
            .option("root", store.root)
            .option("author", "a").option("name", "c")
            .option("feed", "changes")
            .load())
    assert set(feed.columns) == {"record_id", "value", "hash", "links",
                                 "version", "seq", "deleted"}
    rows = feed.collect()
    assert len(rows) == 4                       # every log row, no resolution
    assert sum(1 for r in rows if r["deleted"]) == 1
    # the exact raw log: seq 1 holds both inserts, seq 2 the update,
    # seq 3 the tombstone (seqs are 1-based; read_delta_df(since=0) is
    # the engine twin but the explicit set also pins the numbering)
    got = {(r["record_id"], r["seq"], r["deleted"]) for r in rows}
    assert got == {("r1", 1, False), ("r2", 1, False),
                   ("r1", 2, False), ("r2", 3, True)}


def test_stream_reader_requires_feed_option():
    """A stream without feed=changes would emit 7-column rows against the
    5-column resolved-set schema — refuse loudly at reader construction."""
    import pytest

    from pigeon_optics_spark.sources.pigeon_datasource import (
        PigeonDataSource,
    )

    ds = PigeonDataSource({"root": "/nonexistent", "author": "a",
                           "name": "c"})
    with pytest.raises(ValueError, match="feed"):
        ds.simpleStreamReader(None)


def test_stream_reader_compaction_guard(tmp_path):
    """A checkpointed offset that predates base_seq must raise (the
    dropped segments' tombstones are unrecoverable — same rule as
    store.read_delta_df), while a FRESH stream (offset -1) bootstraps
    from the base segment."""
    import pytest

    from pigeon_optics_spark.sources.pigeon_datasource import (
        PigeonStreamReader,
    )

    store = DatasetStore(str(tmp_path / "ds"))
    store.create("a", "c")
    store.write_entries("a", "c", [("r1", {"v": 1}), ("r2", {"v": 2})])
    store.write_entries("a", "c", [("r2", None)])      # tombstone
    store.write_entries("a", "c", [("r3", {"v": 3})])
    store.compact("a", "c")

    rdr = PigeonStreamReader({"root": store.root, "author": "a",
                              "name": "c"})
    # resuming from inside the compacted-away range: loud refusal
    with pytest.raises(ValueError, match="base_seq"):
        rdr.read({"seq": 0})
    with pytest.raises(ValueError, match="base_seq"):
        list(rdr.readBetweenOffsets({"seq": 0}, {"seq": 99}))
    # fresh bootstrap: full state from the base segment, no tombstones
    rows, off = rdr.read(rdr.initialOffset())
    rows = list(rows)
    assert {r[0] for r in rows} == {"r1", "r3"}
    assert not any(r[6] for r in rows)
    # and the post-bootstrap offset tails normally
    store.write_entries("a", "c", [("r4", {"v": 4})])
    inc, _ = rdr.read(off)
    assert [r[0] for r in list(inc)] == ["r4"]


def test_read_path_df_dedup_keeps_distinct_record_paths(spark, tmp_path):
    """Two record-level paths into the SAME collection must both resolve
    — the old collection-keyed dedup silently dropped the second."""
    from pigeon_optics_spark.vfs import read_path_df

    store = DatasetStore(str(tmp_path / "ds"))
    store.create("a", "c")
    store.write_entries("a", "c", [("x", {"v": 1}), ("y", {"v": 2}),
                                   ("z", {"v": 3})])
    got = {r["record_id"] for r in read_path_df(
        spark, store,
        ["/datasets/a:c/records/x", "/datasets/a:c/records/y"]).collect()}
    assert got == {"x", "y"}
    # identical paths still dedup first-seen-wins
    got2 = [r["record_id"] for r in read_path_df(
        spark, store,
        ["/datasets/a:c/records/x", "/datasets/a:c/records/x"]).collect()]
    assert got2 == ["x"]


def test_write_entries_df_batch_contract(spark, tmp_path):
    """write_entries_df mirrors write_entries' batch rules: duplicate ids
    in one batch (nondeterministic latest-wins) and null ids refuse."""
    import pytest

    from pigeon_optics_spark.store import StoreError

    store = DatasetStore(str(tmp_path / "ds"))
    store.create("a", "c")
    dup = spark.createDataFrame(
        [("k", '{"v":1}'), ("k", '{"v":2}')], "record_id string, value string")
    with pytest.raises(StoreError, match="duplicate"):
        store.write_entries_df(spark, "a", "c", dup)
    # null/empty ids fail via the per-row raise_error riding the write
    # job (the maxRecordSize-guard pattern) — a Spark-side exception
    # whose message names the problem
    bad = spark.createDataFrame(
        [(None, '{"v":1}')], "record_id string, value string")
    with pytest.raises(Exception, match="invalid record id"):
        store.write_entries_df(spark, "a", "c", bad)
    # assume_unique_ids skips only the DUP aggregation, not the id rules
    with pytest.raises(Exception, match="invalid record id"):
        store.write_entries_df(spark, "a", "c", bad,
                               assume_unique_ids=True)


def test_driver_compact_handles_directory_segments(spark, tmp_path):
    """Driver-side compact() on a collection whose segments are
    DIRECTORIES (distributed writes) previously died with
    IsADirectoryError mid-cleanup."""
    store = DatasetStore(str(tmp_path / "ds"))
    store.create("a", "c")
    df = spark.createDataFrame(
        [(str(i), '{"v":%d}' % i) for i in range(10)],
        "record_id string, value string")
    store.write_entries_df(spark, "a", "c", df)
    store.write_entries("a", "c", [("5", None)])      # tombstone
    store.compact("a", "c")
    got = {r["id"] for r in store.iterate("a", "c")}
    assert got == {str(i) for i in range(10)} - {"5"}


def test_dup_check_post_write_aborts_before_commit(spark, tmp_path):
    """The duplicate-id gate runs on the STAGED parquet (ADVICE r8 — no
    second evaluation of the upstream lineage) and aborts BEFORE the
    segment commits: no version bump, no stray stage dir, no change
    event."""
    import os

    import pytest

    from pigeon_optics_spark.store import StoreError

    store = DatasetStore(str(tmp_path / "ds"))
    store.create("a", "c")
    changes = os.path.join(str(tmp_path / "ds"), "changes")
    feed_before = sorted(f for f in os.listdir(changes) if f.endswith(".json"))
    ver_before = store.get_meta("a", "c").version
    dup = spark.createDataFrame(
        [("k", '{"v":1}'), ("k", '{"v":2}'), ("j", '{"v":3}')],
        "record_id string, value string")
    with pytest.raises(StoreError, match="duplicate"):
        store.write_entries_df(spark, "a", "c", dup)
    assert store.get_meta("a", "c").version == ver_before
    coll_dir = store._dir(store._meta("datasets", "a", "c"))
    assert not [d for d in os.listdir(coll_dir) if d.startswith("_stage_")]
    assert list(store.iterate("a", "c")) == []
    # events feed saw nothing from the aborted batch
    feed_after = sorted(f for f in os.listdir(changes) if f.endswith(".json"))
    assert feed_after == feed_before


def test_dup_check_ignores_fully_suppressed_duplicates(spark, tmp_path):
    """Post-suppression semantics: duplicate ids whose extra copies are
    all hash-suppressed leave at most one staged row at this seq, so the
    stored outcome is deterministic and the batch is accepted."""
    store = DatasetStore(str(tmp_path / "ds"))
    store.create("a", "c")
    store.write_entries("a", "c", [("k", {"v": 1})])
    # one copy identical to current (suppressed), one new value (written)
    from pigeon_optics_spark.values import canonical_json
    cur = canonical_json({"v": 1})
    dup = spark.createDataFrame(
        [("k", cur), ("k", '{"v":2}')], "record_id string, value string")
    store.write_entries_df(spark, "a", "c", dup)
    assert store.read("a", "c", "k") == {"v": 2}


def test_change_feed_sweeps_stale_tmp_orphans(tmp_path):
    """A crash between open and os.replace leaves a .tmp in changes/;
    the next emit sweeps orphans older than a minute but leaves fresh
    ones (a concurrent emitter mid-write) alone (ADVICE r8)."""
    import os

    store = DatasetStore(str(tmp_path / "ds"))
    changes = os.path.join(str(tmp_path / "ds"), "changes")
    stale = os.path.join(changes, "111_dead.json.tmp")
    fresh = os.path.join(changes, "222_live.json.tmp")
    for p in (stale, fresh):
        with open(p, "w") as f:
            f.write("{")
    os.utime(stale, (1.0, 1.0))          # ancient mtime → crash debris
    store.create("a", "c")
    store.write_entries("a", "c", [("k", {"v": 1})])   # emits a change event
    left = {f for f in os.listdir(changes) if f.endswith(".tmp")}
    assert left == {"222_live.json.tmp"}


def test_batch_write_evaluates_lineage_once(spark, tmp_path):
    """The dup-id guard must not re-evaluate the input DataFrame's
    upstream lineage (ADVICE r8: the pre-write count/count_distinct
    aggregation ran the whole — possibly expensive — plan a second
    time).  A counting UDF in the record_id derivation proves the plan
    runs exactly once per row even WITH the dup check enabled."""
    from pyspark.sql import functions as F

    acc = spark.sparkContext.accumulator(0)

    @F.udf("string")
    def tag_id(v):
        acc.add(1)
        return str(v)

    store = DatasetStore(str(tmp_path / "ds"))
    store.create("a", "c")
    base = spark.range(64).select(
        tag_id("id").alias("record_id"),
        F.concat(F.lit('{"v":'), F.col("id").cast("string"), F.lit("}"))
        .alias("value"))
    store.write_entries_df(spark, "a", "c", base)   # dup check ON
    assert acc.value == 64, (
        f"lineage evaluated {acc.value / 64:.1f}x (expected once)")
    assert len(list(store.iterate("a", "c"))) == 64
