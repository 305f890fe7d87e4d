"""Model-based differential test of the incremental lens engine.

THE load-bearing property of the lens build (SURVEY §3.2; ref
lens.js:134-137 delta semantics): after ANY sequence of writes, deletes,
overwrites, and interleaved incremental builds, the lens output
collection is a pure function of the CURRENT input state — identical to
building the same lens ONCE on a fresh store that holds only the final
dataset content.  The existing suite pins single scenarios (freshness,
deletion pruning, version keeping); this test drives RANDOM operation
sequences through both paths and compares the full output maps, so any
delta-scan bookkeeping bug (missed tombstone, stale cache row, wrong
version guard, overwrite fallback miss) surfaces as a map diff.

Seeded random, not hypothesis: each scenario costs several Spark jobs,
so shrinking is impractical — a failing seed is directly replayable.
"""

from __future__ import annotations

import random

import pytest

from pigeon_optics_spark.lens import build_lens, create_lens
from pigeon_optics_spark.store import DatasetStore

# exercises BOTH reduce idioms over shared out-ids: Set-union
# (distinct-collect) and number addition (count/sum), plus multi-output
# flatMap — the reference's two tested aggregate behaviours
CODE = """
for tag in data.get('tags', []):
    output(tag, Set([path.recordID]))
    output('count:' + tag, 1)
output('total', len(data.get('tags', [])))
"""

_TAGS = ["cat", "dog", "emu", "fox"]


def _rand_value(rng: random.Random) -> dict:
    return {"tags": sorted(rng.sample(_TAGS, rng.randint(0, len(_TAGS))))}


def _outputs(store: DatasetStore, name: str) -> dict:
    return {r["id"]: r["value"] for r in
            store.iterate("a", name, source="lenses", fast_read=True)}


def _canon(m: dict) -> dict:
    from pigeon_optics_spark.values import canonical_json
    return {k: canonical_json(v) for k, v in m.items()}


@pytest.mark.parametrize("seed,rounds", [(11, 4), (23, 4), (47, 10)])
def test_incremental_equals_fresh_rebuild(spark, tmp_path, seed, rounds):
    """rounds=10 (seed 47) drives the sequence across the emit-log
    compaction bound (>8 segments) AND a mid-history stale-floor-era
    migration (marker + floors deleted after round 5, as if the store
    predated the r10 sidecar), so floor bookkeeping, compaction, and the
    migration path are all exercised under random op interleaving."""
    rng = random.Random(seed)
    ids = [f"r{i}" for i in range(6)]

    inc = DatasetStore(str(tmp_path / f"inc{seed}"))
    inc.create("a", "d")
    create_lens(inc, "a", "l", inputs=["/datasets/a:d"], code=CODE)

    live: dict[str, dict] = {}  # the model's current dataset state
    for _round in range(rounds):
        # a batch of 3-5 random ops against the incremental store
        for _ in range(rng.randint(3, 5)):
            rid = rng.choice(ids)
            if rid in live and rng.random() < 0.3:
                inc.delete_record("a", "d", rid)
                del live[rid]
            else:
                v = _rand_value(rng)
                inc.write("a", "d", rid, v)
                live[rid] = v
        # occasionally overwrite the whole collection (base segment) —
        # the delta-scan FALLBACK path (base segments drop keys silently)
        if _round == 2:
            items = sorted(live.items())
            inc.write_entries("a", "d", items, overwrite=True)
        if _round == 5:
            # pre-floor-era simulation: drop the marker and every floor
            # file; the next build must fold the log once and stay exact
            import os
            import shutil

            from pigeon_optics_spark.lens import (_STALE_MARKER, _STALE_RE,
                                                  _emit_dir)
            d = _emit_dir(inc, "a", "l")
            marker = os.path.join(d, _STALE_MARKER)
            if os.path.exists(marker):
                os.remove(marker)
            for f in list(os.listdir(d)):
                if _STALE_RE.match(f):
                    p = os.path.join(d, f)
                    # floor sidecars are dirs (Spark write) or single
                    # files (the r11 driver-side pyarrow write)
                    shutil.rmtree(p, ignore_errors=True) if os.path.isdir(p) \
                        else os.remove(p)
        build_lens(spark, inc, "a", "l")

    # fresh store: ONLY the final dataset content, built once
    fresh = DatasetStore(str(tmp_path / f"fresh{seed}"))
    fresh.create("a", "d")
    if live:
        fresh.write_entries("a", "d", sorted(live.items()))
    create_lens(fresh, "a", "l", inputs=["/datasets/a:d"], code=CODE)
    build_lens(spark, fresh, "a", "l")

    got, want = _canon(_outputs(inc, "l")), _canon(_outputs(fresh, "l"))
    assert got == want, {
        "only_incremental": {k: got[k] for k in got.keys() - want.keys()},
        "only_fresh": {k: want[k] for k in want.keys() - got.keys()},
        "diff": {k: (got[k], want[k]) for k in got.keys() & want.keys()
                 if got[k] != want[k]},
    }


def test_incremental_equals_fresh_after_empty_final_state(spark, tmp_path):
    """Degenerate tail: every record deleted ⇒ the lens output collection
    must drain to empty, exactly like a fresh build over nothing."""
    inc = DatasetStore(str(tmp_path / "inc-empty"))
    inc.create("a", "d")
    create_lens(inc, "a", "l", inputs=["/datasets/a:d"], code=CODE)
    inc.write("a", "d", "r1", {"tags": ["cat"]})
    inc.write("a", "d", "r2", {"tags": ["dog", "cat"]})
    build_lens(spark, inc, "a", "l")
    assert _outputs(inc, "l")  # sanity: non-empty mid-state
    inc.delete_record("a", "d", "r1")
    inc.delete_record("a", "d", "r2")
    build_lens(spark, inc, "a", "l")
    assert _outputs(inc, "l") == {}
