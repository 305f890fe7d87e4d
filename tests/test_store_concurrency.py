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
