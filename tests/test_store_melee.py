"""Cross-process melee over ONE collection: shared ids, interleaved
deletes, and a concurrent compactor.

The existing cross-process test (test_store_concurrency) proves seq
allocation serializes for DISJOINT ids.  This one attacks the harder
surface: multiple processes upserting and deleting the SAME ids while a
fourth process repeatedly compacts the segment log out from under them.
Per-id final values are racy by design, so the assertions are the
serialization INVARIANTS any interleaving must satisfy:

- every committed change bumped the collection version EXACTLY once
  (version == total successful ops reported by the writers);
- last_seq == successful ops + compactions (compaction allocates one
  seq for its base segment);
- each surviving id's value is one of the values actually written to it
  (no torn/merged rows, no cross-id leakage);
- record versions are coherent (1 <= v <= collection version) and the
  store remains fully readable through a FRESH instance;
- one more compaction changes nothing observable.

A lost-update, a segment-number collision, a compaction folding a
mid-flight write, or a resurrection all break one of these.
"""

from __future__ import annotations

import multiprocessing as mp
import random
import time

from pigeon_optics_spark.store import DatasetStore
from pigeon_optics_spark.values import natural_sort_key

IDS = [f"r{i}" for i in range(6)]


def _writer(root: str, t: int, n_ops: int, q) -> None:
    rng = random.Random(1000 + t)
    s = DatasetStore(root)
    ok = 0
    for i in range(n_ops):
        rid = rng.choice(IDS)
        if rng.random() < 0.25:
            try:
                s.delete_record("a", "d", rid)
                ok += 1
            except KeyError:
                pass  # raced with another deleter: no commit, no bump
        else:
            # unique value per (proc, op): hash suppression can never
            # swallow a write, so every upsert is a real change
            s.write("a", "d", rid, {"p": t, "op": i})
            ok += 1
        if rng.random() < 0.3:
            time.sleep(0.002)
    q.put(ok)


def _compactor(root: str, rounds: int) -> None:
    s = DatasetStore(root)
    for _ in range(rounds):
        s.compact("a", "d")
        time.sleep(0.01)


def test_cross_process_melee_shared_ids(tmp_path):
    root = str(tmp_path / "melee")
    DatasetStore(root).create("a", "d")

    n_writers, n_ops, n_compacts = 3, 12, 3
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [ctx.Process(target=_writer, args=(root, t, n_ops, q))
             for t in range(n_writers)]
    procs.append(ctx.Process(target=_compactor, args=(root, n_compacts)))
    for p in procs:
        p.start()
    for p in procs:
        p.join()
        assert p.exitcode == 0
    total_ok = sum(q.get() for _ in range(n_writers))
    assert total_ok >= n_writers  # sanity: the melee actually ran

    fresh = DatasetStore(root)
    meta = fresh.get_meta("a", "d")
    assert meta.version == total_ok, \
        f"version {meta.version} != {total_ok} successful ops"
    assert meta.last_seq == total_ok + n_compacts

    recs = list(fresh.iterate("a", "d", fast_read=True))
    assert [r["id"] for r in recs] == sorted(
        (r["id"] for r in recs), key=natural_sort_key)
    for r in recs:
        v = r["value"]
        # a value is exactly one writer's (proc, op) payload — anything
        # else is a torn or merged row
        assert set(v) == {"p", "op"} and 0 <= v["p"] < n_writers \
            and 0 <= v["op"] < n_ops, v
        assert 1 <= r["version"] <= meta.version

    # a final compaction is observationally invisible
    before = {r["id"]: (r["value"], r["version"], r["hash"])
              for r in fresh.iterate("a", "d", fast_read=True)}
    fresh.compact("a", "d")
    after = {r["id"]: (r["value"], r["version"], r["hash"])
             for r in fresh.iterate("a", "d", fast_read=True)}
    assert after == before
    assert fresh.get_meta("a", "d").version == meta.version
