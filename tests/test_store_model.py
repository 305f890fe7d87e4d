"""Model-based randomized test of the dataset store's driver surface.

The store's contract (SURVEY §2.1; ref base-data-model.js semantics) is
a versioned map: whatever interleaving of single writes, batch upserts,
null-deletes, whole-collection overwrites, record deletes, and
compactions ran, the observable state must equal a plain dict that
applied the same operations — plus the versioning laws:

- collection version bumps iff SOMETHING changed (hash suppression:
  rewriting an identical value is a no-op end to end);
- a record's version is the collection version at its last real change;
- iterate() yields natural-sort order, read()/exists() agree with it;
- compact() never changes observable state (only the segment layout);
- historical `as_of_seq` states replay the model's history (checked
  against snapshots taken at every version bump).

The existing store tests pin each law on hand-built scenarios; this one
drives seeded random interleavings so bookkeeping bugs BETWEEN the laws
(a tombstone surviving compaction, suppression bumping versions, a
batch mixing deletes+upserts corrupting natural order) show up as a
model diff.  Driver-side only (no Spark) except the as_of_seq replay.
"""

from __future__ import annotations

import random

import pytest

from pigeon_optics_spark.store import DatasetStore, StoreError
from pigeon_optics_spark.values import natural_sort_key


def _state(store: DatasetStore) -> dict:
    return {r["id"]: r["value"] for r in
            store.iterate("a", "d", fast_read=True)}


def _versions(store: DatasetStore) -> dict:
    return {r["id"]: r["version"] for r in store.iterate("a", "d")}


@pytest.mark.parametrize("seed", [3, 17, 42])
def test_store_random_ops_match_model(tmp_path, seed):
    rng = random.Random(seed)
    ids = [f"r{i}" for i in range(8)] + ["r-2", "R10"]  # natural-sort spice
    values = [{"v": i} for i in range(4)] + [
        {"s": "x"}, {"nested": {"a": [1, 2]}}]

    store = DatasetStore(str(tmp_path / "s"))
    store.create("a", "d")
    model: dict[str, dict] = {}
    model_versions: dict[str, int] = {}
    history: list[tuple[int, dict]] = []  # (seq, state) at each real change

    def apply_model(entries, *, overwrite=False):
        """The model twin of write_entries: returns True iff it changed."""
        changed = False
        if overwrite:
            for rid in list(model):
                if rid not in dict(entries):
                    del model[rid]
                    model_versions.pop(rid, None)
                    changed = True
        for rid, v in entries:
            if v is None:
                if rid in model:
                    del model[rid]
                    model_versions.pop(rid, None)
                    changed = True
            elif model.get(rid) != v:
                model[rid] = v
                model_versions[rid] = None  # filled after we know the bump
                changed = True
        return changed

    for _step in range(60):
        op = rng.random()
        before_version = store.get_meta("a", "d").version
        if op < 0.45:  # single write
            rid, v = rng.choice(ids), rng.choice(values)
            store.write("a", "d", rid, v)
            changed = apply_model([(rid, v)])
        elif op < 0.65:  # batch upsert, possibly with a null-delete mixed in
            batch: dict[str, dict | None] = {}
            for _ in range(rng.randint(1, 4)):
                rid = rng.choice(ids)
                if rid in model and rng.random() < 0.25:
                    batch[rid] = None
                else:
                    batch[rid] = rng.choice(values)
            store.write_entries("a", "d", sorted(batch.items()))
            changed = apply_model(sorted(batch.items()))
        elif op < 0.75:  # delete one existing record
            if not model:
                continue
            rid = rng.choice(sorted(model))
            store.delete_record("a", "d", rid)
            changed = apply_model([(rid, None)])
        elif op < 0.85:  # whole-collection overwrite with a random subset
            keep = {rid: model[rid] for rid in model if rng.random() < 0.6}
            if rng.random() < 0.5 and keep:
                rid = rng.choice(sorted(keep))
                keep[rid] = rng.choice(values)
            store.write_entries("a", "d", sorted(keep.items()), overwrite=True)
            changed = apply_model(sorted(keep.items()), overwrite=True)
        else:  # compact: must be observationally invisible
            store.compact("a", "d")
            changed = False

        meta = store.get_meta("a", "d")
        if changed:
            assert meta.version == before_version + 1, \
                f"step {_step}: change did not bump exactly once"
            for rid, v in model_versions.items():
                if v is None:
                    model_versions[rid] = meta.version
            history.append((meta.last_seq, dict(model)))
        else:
            assert meta.version == before_version, \
                f"step {_step}: no-op bumped the version"

        assert _state(store) == model, f"step {_step}: state diverged"
        assert _versions(store) == model_versions, \
            f"step {_step}: record versions diverged"

    # ---- ordering + point APIs on the final state ----
    got_order = [r["id"] for r in store.iterate("a", "d")]
    assert got_order == sorted(model, key=natural_sort_key)
    for rid in ids:
        assert store.exists("a", "d", rid) == (rid in model)
        if rid in model:
            assert store.read("a", "d", rid) == model[rid]
        else:
            with pytest.raises(KeyError):
                store.read("a", "d", rid)

    # identical rewrite of the ENTIRE final state: full hash suppression
    v0 = store.get_meta("a", "d").version
    if model:
        store.write_entries("a", "d", sorted(model.items()))
        assert store.get_meta("a", "d").version == v0
        assert _versions(store) == model_versions


@pytest.mark.parametrize("seed", [7])
def test_store_random_history_replays_as_of_seq(spark, tmp_path, seed):
    """Time travel: every historical state recorded by the model during a
    random op sequence is reconstructed exactly by read_df(as_of_seq) —
    up to the compaction horizon (compaction folds history, so this
    sequence never compacts)."""
    import json

    rng = random.Random(seed)
    ids = [f"r{i}" for i in range(5)]
    store = DatasetStore(str(tmp_path / "s"))
    store.create("a", "d")
    model: dict[str, dict] = {}
    history: list[tuple[int, dict]] = []

    for _step in range(12):
        rid = rng.choice(ids)
        if rid in model and rng.random() < 0.3:
            store.delete_record("a", "d", rid)
            del model[rid]
        else:
            v = {"v": rng.randint(0, 3)}
            if model.get(rid) == v:
                continue  # suppressed: no new seq, skip the snapshot
            store.write("a", "d", rid, v)
            model[rid] = v
        history.append((store.get_meta("a", "d").last_seq, dict(model)))

    for seq, want in history:
        rows = store.read_df(spark, "a", "d", as_of_seq=seq) \
            .select("record_id", "value").collect()
        got = {r["record_id"]: json.loads(r["value"]) for r in rows}
        assert got == want, f"as_of_seq={seq} diverged"
