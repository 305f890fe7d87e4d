"""M5 tests: change feed, reactive lens cascade, SSE-style subscription,
meta VFS, readPath (ref lens.js:351-367, update-events.js, meta-vfs.js,
read-path.js)."""

from __future__ import annotations

import time

import pytest

from pigeon_optics_spark.lens import build_lens, create_lens
from pigeon_optics_spark.store import DatasetStore
from pigeon_optics_spark.streaming import (
    boot_broadcast,
    lens_input_map,
    read_changes_df,
    read_changes_stream,
    rebuild_affected,
    subscribe,
)
from pigeon_optics_spark.vfs import (
    iterate_path,
    meta_records,
    path_exists,
    read_path_df,
)


@pytest.fixture()
def store(tmp_path):
    return DatasetStore(str(tmp_path / "store"))


def test_change_feed_batch(spark, store):
    store.create("a", "d")
    store.write("a", "d", "r1", {"x": 1})
    store.write("a", "d", "r2", {"x": 2})
    df = read_changes_df(spark, store)
    rows = df.orderBy("ts").collect()
    assert [r.version for r in rows] == [1, 2]
    assert all(r.path == "/datasets/a:d" for r in rows)


def test_subscribe_yields_initial_and_updates(store):
    store.create("a", "d")
    store.write("a", "d", "r1", {"x": 1})
    events = list(subscribe(store, collection_path="/datasets/a:d",
                            max_events=2, timeout=2.0))
    assert events[0].get("initial") and events[0]["version"] == 1
    assert events[1]["version"] == 1 and "initial" not in events[1]


def test_boot_broadcast(store):
    store.create("a", "d1")
    store.create("a", "d2")
    store.write("a", "d2", "r", {"v": 1})
    events = boot_broadcast(store)
    assert [(e["path"], e["version"]) for e in events] == [
        ("/datasets/a:d1", 0), ("/datasets/a:d2", 1)]


def test_lens_input_map(store):
    store.create("a", "src")
    create_lens(store, "a", "l1", inputs=["/datasets/a:src"], code="pass")
    create_lens(store, "a", "l2", inputs=["/datasets/a:src", "/lenses/a:l1"],
                code="pass")
    imap = lens_input_map(store)
    assert set(imap["/datasets/a:src"]) == {("a", "l1"), ("a", "l2")}
    assert imap["/lenses/a:l1"] == [("a", "l2")]


def test_reactive_cascade(spark, store):
    """write → lens A rebuild → cascades into lens B reading A's output."""
    store.create("t", "nums")
    store.write_entries("t", "nums", [("r1", {"n": 1}), ("r2", {"n": 2})])
    create_lens(store, "t", "doubler", inputs=["/datasets/t:nums"],
                code="output(path.recordID, {'d': data['n'] * 2})")
    create_lens(store, "t", "sum-of-doubles", inputs=["/lenses/t:doubler"],
                code="output('total', data['d'])")
    built = rebuild_affected(spark, store, ["/datasets/t:nums"])
    assert [b["lens"] for b in built] == ["t:doubler", "t:sum-of-doubles"]
    assert store.read("t", "sum-of-doubles", "total", source="lenses") == 6
    # idempotent: nothing fresh → no cascade past round 1, no version churn
    built2 = rebuild_affected(spark, store, ["/datasets/t:nums"])
    assert [b["records_changed"] for b in built2] == [False]
    # an actual change propagates end-to-end
    store.write("t", "nums", "r3", {"n": 10})
    rebuild_affected(spark, store, ["/datasets/t:nums"])
    assert store.read("t", "sum-of-doubles", "total", source="lenses") == 26


def test_streaming_foreachbatch_cascade(spark, store, tmp_path):
    """The continuous path: Structured Streaming tails changes/ and the
    foreachBatch driver rebuilds the DAG."""
    store.create("t", "nums")
    create_lens(store, "t", "doubler", inputs=["/datasets/t:nums"],
                code="output(path.recordID, {'d': data['n'] * 2})")
    batches = []
    # use the plain cascade as the batch body (run_reactive wires the same)
    stream = (read_changes_stream(spark, store).writeStream
              .option("checkpointLocation", str(tmp_path / "ckpt"))
              .trigger(processingTime="500 milliseconds")
              .foreachBatch(lambda df, _id: batches.append(
                  rebuild_affected(spark, store,
                                   [r["path"] for r in df.select("path").collect()])))
              .start())
    try:
        store.write("t", "nums", "r1", {"n": 21})
        deadline = time.time() + 60
        while time.time() < deadline:
            if store.exists("t", "doubler", "r1", source="lenses"):
                break
            time.sleep(0.5)
        assert store.read("t", "doubler", "r1", source="lenses") == {"d": 42}
    finally:
        stream.stop()


def test_meta_vfs(spark, store):
    store.create("a", "d")
    create_lens(store, "a", "l", inputs=["/datasets/a:d"], code="pass")
    recs = meta_records(store)
    assert recs["authors"] == ["a"]
    assert recs["datasets"] == ["a:d"]
    assert recs["lenses"] == ["a:l"] and "a:lens-cache.l" not in recs["lenses"]
    assert recs["stats"]["datasets"] == 1
    assert "cbor" in recs["formats"]
    assert path_exists(store, "/meta/system:system/records/authors")
    assert not path_exists(store, "/meta/system:system/records/nope")
    vals = list(iterate_path(store, "/meta/system:system", fast_read=True))
    assert [v["id"] for v in vals] == sorted(
        ["authors", "datasets", "lenses", "stats", "settings", "formats"])


def test_read_path_df_union_and_selector(spark, store):
    store.create("a", "d1")
    store.create("a", "d2")
    store.write("a", "d1", "r1", {"v": 1})
    store.write("a", "d2", "r2", {"v": 2})
    df = read_path_df(spark, store,
                      ["/datasets/a:d1", "/datasets/a:d2", "/datasets/a:d1"])
    rows = {r.record_id: r for r in df.collect()}
    assert set(rows) == {"r1", "r2"}  # duplicate path skipped
    assert rows["r2"].collection == "/datasets/a:d2"
    one = read_path_df(spark, store, "/datasets/a:d1/records/r1").collect()
    assert len(one) == 1 and one[0].record_id == "r1"
    meta = read_path_df(spark, store, "/meta/system:system/records/stats").collect()
    assert len(meta) == 1 and meta[0].source == "meta"


def test_register_sql_views_full_sql_surface(spark, tmp_path):
    """Store collections become ordinary SQL tables: a join between a
    dataset view and a lens-shaped second dataset through spark.sql."""
    from pigeon_optics_spark.store import DatasetStore
    from pigeon_optics_spark.vfs import register_sql_views

    store = DatasetStore(str(tmp_path / "sqlviews"))
    store.create("alice", "people")
    store.write_entries("alice", "people",
                        [(f"p{i}", {"age": 20 + i}) for i in range(5)])
    store.create("alice", "pets")
    store.write_entries("alice", "pets",
                        [(f"x{i}", {"owner": f"p{i % 2}"}) for i in range(4)])

    views = register_sql_views(spark, store)
    assert "datasets_alice_people" in views
    assert "datasets_alice_pets" in views

    out = spark.sql("""
        SELECT p.record_id, COUNT(*) AS n_pets
        FROM datasets_alice_people p
        JOIN datasets_alice_pets q
          ON get_json_object(q.value, '$.owner') = p.record_id
        GROUP BY p.record_id
        ORDER BY p.record_id
    """).collect()
    assert [(r["record_id"], r["n_pets"]) for r in out] == \
        [("p0", 2), ("p1", 2)]

    # snapshot semantics: a later write is NOT visible until re-register
    store.write_entries("alice", "pets", [("x9", {"owner": "p0"})])
    n = spark.sql("SELECT COUNT(*) AS n FROM datasets_alice_pets").collect()
    assert n[0]["n"] == 4
    register_sql_views(spark, store)
    n = spark.sql("SELECT COUNT(*) AS n FROM datasets_alice_pets").collect()
    assert n[0]["n"] == 5


def test_register_sql_views_collision_disambiguates(spark, tmp_path):
    from pigeon_optics_spark.store import DatasetStore
    from pigeon_optics_spark.vfs import register_sql_views

    store = DatasetStore(str(tmp_path / "collide"))
    store.create("bob", "my-set")
    store.write_entries("bob", "my-set", [("a", 1)])
    store.create("bob", "my_set")
    store.write_entries("bob", "my_set", [("b", 2), ("c", 3)])

    views = register_sql_views(spark, store)
    # both collide on 'datasets_bob_my_set' -> both get hash suffixes
    assert len(views) == 2 and len(set(views)) == 2
    assert all(v.startswith("datasets_bob_my_set_") for v in views)
    counts = sorted(
        spark.sql(f"SELECT COUNT(*) AS n FROM {v}").collect()[0]["n"]
        for v in views)
    assert counts == [1, 2]  # each view bound to its OWN collection


def test_meta_paths_other_than_system_fail_like_missing_collections(spark, store):
    """The VFS is mounted ONLY at /meta/system:system.  Both read paths
    previously served the system records for ANY /meta/{a}:{n} (under a
    fabricated collection path), while path_exists said False — a reader
    could 'read' a collection that does not exist (review finding)."""
    from pigeon_optics_spark.store import StoreError

    assert not path_exists(store, "/meta/foo:bar")
    with pytest.raises(StoreError, match="no such collection"):
        read_path_df(spark, store, "/meta/foo:bar")
    with pytest.raises(StoreError, match="no such collection"):
        list(iterate_path(store, "/meta/foo:bar", fast_read=True))
    # the real mount still serves
    assert read_path_df(spark, store, "/meta/system:system").count() == 6
