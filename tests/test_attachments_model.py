"""Model-based randomized test of the attachment store + GC.

Contract (ref attachments.js / fs/blob.js semantics): a content-addressed
blob map where GC deletes exactly the blobs no live record references.
Random interleavings of blob adds (bytes + stream paths), record writes/
deletes that reference blobs, and GC rounds must keep these laws:

- content addressing: add() is idempotent, url encodes sha256(data),
  read() round-trips bit-exactly, has() agrees with the model;
- GC deletes EXACTLY the unreferenced blobs (never a referenced one —
  deleting a live blob breaks every record pointing at it; never fewer
  — leaks accumulate forever at 100 TB);
- the store rejects a record whose links reference an absent blob
  (the attachment_checker contract), so model and store can never
  disagree about which references are live;
- after every GC the remaining blob set == the model's live+young set.
"""

from __future__ import annotations

import hashlib
import io
import random

import pytest

from pigeon_optics_spark.attachments import AttachmentStore
from pigeon_optics_spark.store import DatasetStore, StoreError


@pytest.mark.parametrize("seed", [5, 29])
def test_attachment_gc_random_ops_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    att = AttachmentStore(str(tmp_path / f"att{seed}"))
    store = DatasetStore(str(tmp_path / f"st{seed}"),
                         attachment_checker=att.has)
    store.create("a", "d")

    blobs: dict[str, bytes] = {}     # model: hash -> data (ever added)
    on_disk: set[str] = set()        # model: hashes currently stored
    refs: dict[str, str] = {}        # model: record_id -> blob hash
    ids = [f"r{i}" for i in range(6)]

    for step in range(40):
        op = rng.random()
        if op < 0.35:  # add a blob (maybe a duplicate), both write paths
            data = bytes([rng.randrange(256)]) * rng.randint(1, 30)
            if rng.random() < 0.5:
                url = att.add(data)
            else:
                url = att.add_stream(io.BytesIO(data))
            h = hashlib.sha256(data).hexdigest()
            assert url.startswith(f"hash://sha256/{h}")
            assert att.has(h) and att.read(h) == data
            blobs[h] = data
            on_disk.add(h)
        elif op < 0.7:  # write a record referencing a random KNOWN blob
            if not blobs:
                continue
            rid = rng.choice(ids)
            h = rng.choice(sorted(blobs))
            if h not in on_disk:
                # referenced blob was GC'd earlier (it was unreferenced
                # then) — the checker must REFUSE this write
                with pytest.raises(StoreError):
                    store.write("a", "d", rid,
                                {"file": f"hash://sha256/{h}"})
                continue
            store.write("a", "d", rid, {"file": f"hash://sha256/{h}"})
            refs[rid] = h
        elif op < 0.85:  # delete a record (drops its reference)
            if not refs:
                continue
            rid = rng.choice(sorted(refs))
            store.delete_record("a", "d", rid)
            del refs[rid]
        else:  # GC with zero grace: exact live-set semantics
            live = set(refs.values())
            deleted = set(att.gc(spark, store, grace_seconds=0.0))
            assert deleted == on_disk - live, f"step {step}"
            on_disk -= deleted
            assert set(att.list_hashes()) == on_disk, f"step {step}"
            for h in live:
                assert att.has(h), f"step {step}: GC deleted live blob {h}"
            # GC'd hashes stay in `blobs` so a later record write
            # referencing one exercises the checker-refusal branch above
        # continuous invariant: every referenced blob readable
        for rid, h in refs.items():
            assert att.read(h) == blobs[h]

    # final sweep: delete all records, GC must drain everything
    for rid in sorted(refs):
        store.delete_record("a", "d", rid)
    att.gc(spark, store, grace_seconds=0.0)
    assert att.list_hashes() == []
