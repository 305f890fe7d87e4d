"""Concurrent driver-side writes must serialize per collection without
clobbering (the reference's queued-mutation property,
test/test-models-fs-objects.js:102-113)."""

from __future__ import annotations

import threading

import pytest

from pigeon_optics_spark.store import DatasetStore


@pytest.fixture()
def store(tmp_path):
    return DatasetStore(str(tmp_path / "store"))


def test_concurrent_writes_serialize(store):
    store.create("a", "d")
    n_threads, per_thread = 8, 10
    errors = []

    def writer(t):
        try:
            for i in range(per_thread):
                store.write_entries("a", "d", [(f"t{t}-r{i}", {"t": t, "i": i})])
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(t,)) for t in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errors == []
    meta = store.get_meta("a", "d")
    # every batch got a distinct seq and bumped the version exactly once
    assert meta.version == n_threads * per_thread
    assert meta.last_seq == n_threads * per_thread
    ids = store.list_record_ids("a", "d")
    assert len(ids) == n_threads * per_thread
    # all rows readable and correct
    assert store.read("a", "d", "t3-r7") == {"t": 3, "i": 7}


def test_concurrent_writes_different_collections_parallel(store):
    store.create("a", "d1")
    store.create("a", "d2")
    errors = []

    def writer(name):
        try:
            for i in range(20):
                store.write_entries("a", name, [(f"r{i}", {"i": i})])
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    t1 = threading.Thread(target=writer, args=("d1",))
    t2 = threading.Thread(target=writer, args=("d2",))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert errors == []
    assert store.get_meta("a", "d1").version == 20
    assert store.get_meta("a", "d2").version == 20


def test_parallel_attachment_writes(tmp_path):
    """10 parallel attachment writes (ref test-models-attachments.js:68-99):
    content-addressing makes concurrent adds idempotent and atomic."""
    from pigeon_optics_spark.attachments import AttachmentStore

    att = AttachmentStore(str(tmp_path / "blobs"))
    urls, errors = [], []

    def add(i):
        try:
            # half the threads write the SAME content (rename race path)
            data = b"shared" if i % 2 == 0 else b"unique-%d" % i
            urls.append(att.add(data))
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=add, args=(i,)) for i in range(10)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    assert len(att.list_hashes()) == 6  # 1 shared + 5 unique
    for u in urls:
        assert att.has(u)


def test_leftover_stage_dir_ignored(tmp_path, spark):
    """A crashed distributed write leaves a _stage_* directory; readers and
    subsequent writes must ignore it (the staged dir only becomes a segment
    via the atomic rename)."""
    import os

    from pigeon_optics_spark.store import DatasetStore

    store = DatasetStore(str(tmp_path / "store"))
    store.create("a", "d")
    store.write("a", "d", "r1", {"v": 1})
    seg_dir = os.path.join(str(tmp_path / "store"), "records", "datasets", "a", "d")
    crash = os.path.join(seg_dir, "_stage_deadbeef")
    os.makedirs(crash)
    with open(os.path.join(crash, "part-00000.parquet"), "wb") as f:
        f.write(b"not a parquet file")
    # reads skip the junk
    assert store.read("a", "d", "r1") == {"v": 1}
    assert store.read_df(spark, "a", "d").count() == 1
    # writes still work and get the right seq
    store.write("a", "d", "r2", {"v": 2})
    assert store.get_meta("a", "d").last_seq == 2


def _proc_writer(root, t, n):
    # separate DatasetStore INSTANCE per call — the cross-instance path
    from pigeon_optics_spark.store import DatasetStore

    s = DatasetStore(root)
    for i in range(n):
        s.write_entries("a", "d", [(f"p{t}-r{i}", {"t": t, "i": i})])


def test_cross_process_writers_serialize(tmp_path):
    """Two PROCESSES (and thus two DatasetStore instances with separate
    catalog caches) writing one collection must serialize through the
    root flock: every batch gets a distinct seq, no segment file is
    overwritten, nothing resurrects.  Before the _txn flock this lost
    updates (instance-cached last_seq collided)."""
    import multiprocessing as mp

    from pigeon_optics_spark.store import DatasetStore

    root = str(tmp_path / "xp")
    DatasetStore(root).create("a", "d")
    n_procs, per = 4, 12
    ctx = mp.get_context("spawn")
    procs = [ctx.Process(target=_proc_writer, args=(root, t, per))
             for t in range(n_procs)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
        assert p.exitcode == 0
    fresh = DatasetStore(root)
    meta = fresh.get_meta("a", "d")
    assert meta.last_seq == n_procs * per
    ids = fresh.list_record_ids("a", "d")
    assert len(ids) == n_procs * per
    assert fresh.read("a", "d", "p2-r7") == {"t": 2, "i": 7}
