"""M4 attachments + M3 import/export integration tests.

Models the reference's suites: attachment write/has/GC
(`test/test-models-attachments.js:68-99`), missing-attachment rejection
(`test/test-models-dataset.js`), cid resolution
(`test/test-utility-record-structure.js:17-99`), flat-file/zip export
(`export-controller.js`).
"""

from __future__ import annotations

import io
import os

import pytest

from pigeon_optics_spark.attachments import AttachmentStore
from pigeon_optics_spark.codecs import CODECS
from pigeon_optics_spark.sources import (
    export_collection_bytes,
    export_collection_stream,
    export_distributed,
    export_zip_archive,
    import_entries_bytes,
    import_files_df,
)
from pigeon_optics_spark.store import DatasetStore, StoreError
from pigeon_optics_spark.values import resolve_cid_links


@pytest.fixture()
def att(tmp_path):
    return AttachmentStore(str(tmp_path / "blobs"))


@pytest.fixture()
def store(tmp_path, att):
    return DatasetStore(str(tmp_path / "store"), attachment_checker=att.checker())


def test_attachment_roundtrip(att):
    url = att.add(b"hello blob", mime="text/plain")
    assert url.startswith("hash://sha256/") and "?type=text/plain" in url
    assert att.has(url)
    assert att.read(url) == b"hello blob"
    # idempotent
    url2 = att.add(b"hello blob")
    assert url2.split("?")[0] == url.split("?")[0]
    assert len(att.list_hashes()) == 1


def test_attachment_stream_write(att):
    url = att.add_stream(io.BytesIO(b"x" * 100_000))
    assert att.read(url) == b"x" * 100_000


def test_write_rejects_missing_attachment(store, att):
    present = att.add(b"present")
    store.create("a", "d")
    store.write("a", "d", "ok", {"file": present})  # fine
    missing = "hash://sha256/" + "0" * 64
    with pytest.raises(StoreError, match="attachments missing"):
        store.write("a", "d", "bad", {"file": missing})


def test_cid_resolution(att):
    url = att.add(b"uploaded", mime="image/png")
    v = {"pic": "cid:photo.png", "untouched": "cid:unknown", "n": 1}
    out = resolve_cid_links(v, {"photo.png": url})
    assert out["pic"] == url
    assert out["untouched"] == "cid:unknown"


def test_gc_removes_orphans(spark, store, att):
    kept = att.add(b"kept blob")
    orphan_url = att.add(b"orphan blob")
    store.create("a", "d")
    store.write("a", "d", "r1", {"file": kept})
    deleted = att.gc(spark, store)
    assert [AttachmentStore.normalize(orphan_url)] == deleted
    assert att.has(kept) and not att.has(orphan_url)
    # deleting the record frees the blob on the next sweep
    store.delete_record("a", "d", "r1")
    deleted2 = att.gc(spark, store)
    assert AttachmentStore.normalize(kept) in deleted2


def test_gc_grace_window_protects_young_blobs(spark, store, att):
    url = att.add(b"young orphan")
    store.create("a", "d")
    assert att.gc(spark, store, grace_seconds=3600) == []
    assert att.has(url)
    assert att.gc(spark, store) == [AttachmentStore.normalize(url)]


def test_gc_inventory_is_distributed_and_pruned(spark, store, att):
    # The inventory side must be a binaryFile listing scan with the blob
    # CONTENT column pruned away (at 100 TB reading content to list names
    # would be a full-store read), and the sweep itself must contain no
    # driver-side materialization — gc_df is lazy until consumed.
    att.add(b"one")
    att.add(b"two")
    plan = att.inventory_df(spark)._jdf.queryExecution().executedPlan().toString()
    assert "binaryFile" in plan or "BinaryFile" in plan
    assert "content" not in plan.lower().split("readschema")[-1][:200]
    store.create("a", "d")
    sweep = att.gc_df(spark, store)  # no deletes yet: lazy
    assert len(att.list_hashes()) == 2
    out = {r["hash"]: r["deleted"] for r in sweep.collect()}
    assert all(out.values()) and len(out) == 2
    assert att.list_hashes() == []


def test_import_files_df(spark, store, tmp_path):
    d = tmp_path / "up"
    d.mkdir()
    (d / "rec1.json").write_bytes(CODECS["json"].encode({"a": 1}))
    (d / "rec2.yaml").write_bytes(CODECS["yaml"].encode({"b": [True]}))
    (d / "rec3.cbor").write_bytes(CODECS["cbor"].encode({"c": "✓"}))
    (d / "skip.unknown").write_bytes(b"???")
    df = import_files_df(spark, str(d)).orderBy("record_id")
    rows = {r.record_id: r for r in df.collect()}
    assert rows["rec1"].value == '{"a": 1}'
    assert rows["rec3"]._error is None
    assert rows["skip"]._error is not None and rows["skip"].value is None
    good = df.where("_error is null").select("record_id", "value")
    store.create("up", "files")
    store.write_entries_df(spark, "up", "files", good)
    assert store.read("up", "files", "rec2") == {"b": [True]}


def test_import_entries_bytes():
    payload = CODECS["jsonl"].encode_entries([
        {"id": "x", "data": {"n": 1}},
        {"id": "y", "data": {"n": 2}},
    ])
    entries = import_entries_bytes(payload, "jsonl")
    assert entries == [("x", {"n": 1}), ("y", {"n": 2})]


@pytest.mark.parametrize("fmt", ["json", "jsonl", "cbor", "msgpack", "yaml", "xml"])
def test_flat_file_export_roundtrip(store, fmt):
    store.create("a", "d")
    store.write_entries("a", "d", [("r2", {"v": 2}), ("r10", {"v": 10}),
                                   ("r1", {"v": 1})])
    data = export_collection_bytes(store, "a", "d", fmt)
    codec = CODECS[fmt]
    entries = list(codec.decode_entries(data))
    # natural-sort order r1, r2, r10 (ref base-data-model.js:46)
    assert [e["id"] for e in entries] == ["r1", "r2", "r10"]
    assert all("hash" in e and int(e["version"]) == 1 for e in entries)
    assert entries[2]["data"] == {"v": 10}


def test_export_at_stubs_stale(store):
    store.create("a", "d")
    store.write_entries("a", "d", [("old", {"v": 1})])   # version 1
    store.write_entries("a", "d", [("new", {"v": 2})])   # version 2
    entries = list(CODECS["jsonl"].decode_entries(
        export_collection_bytes(store, "a", "d", "jsonl", at=2)))
    by_id = {e["id"]: e for e in entries}
    assert "data" not in by_id["old"] or by_id["old"]["data"] is None
    assert by_id["new"]["data"] == {"v": 2}
    # stream variant concatenates to the same content
    streamed = b"".join(export_collection_stream(store, "a", "d", "jsonl", at=2))
    assert streamed == export_collection_bytes(store, "a", "d", "jsonl", at=2)


def test_zip_export_with_attachments(store, att, tmp_path):
    url = att.add(b"blob body", mime="text/plain")
    store.create("a", "d")
    store.write_entries("a", "d", [("r1", {"file": url}), ("r2", {"file": url})])
    data = export_zip_archive(store, "a", "d", "json", attachments=att)
    import zipfile

    zf = zipfile.ZipFile(io.BytesIO(data))
    names = sorted(zf.namelist())
    h = AttachmentStore.normalize(url)
    # attachment appears ONCE despite two linking records (dedup,
    # ref export-controller.js:43-91)
    assert names == [f"attachments/{h}", "records/r1.json", "records/r2.json"]
    assert zf.read(f"attachments/{h}") == b"blob body"


def test_export_distributed_jsonl(spark, store, tmp_path):
    store.create("a", "d")
    store.write_entries("a", "d", [(f"r{i}", {"i": i}) for i in range(50)])
    df = store.read_df(spark, "a", "d")
    out = str(tmp_path / "exp")
    n_files = export_distributed(df, out, "jsonl")
    assert n_files >= 1
    # the concatenation of all parts is one valid entries stream with all rows
    whole = b"".join(open(os.path.join(out, f), "rb").read()
                     for f in sorted(os.listdir(out)))
    entries = list(CODECS["jsonl"].decode_entries(whole))
    assert {e["id"] for e in entries} == {f"r{i}" for i in range(50)}
    assert all(e["data"] == {"i": int(e["id"][1:])} for e in entries)


def test_spool_orphan_sweep_and_add_cleanup(tmp_path):
    """r8 hardening: (a) stale .tmp spool files (crash debris between
    mkstemp and os.replace) are swept by gc's maintenance pass while a
    fresh concurrent spool survives; (b) a failed add() write cleans up
    its own spool instead of leaking it."""
    import os

    from pigeon_optics_spark.attachments import AttachmentStore

    att = AttachmentStore(str(tmp_path / "blobs"))
    stale = os.path.join(att.root, "dead123.tmp")
    fresh = os.path.join(att.root, "live456.tmp")
    for p in (stale, fresh):
        with open(p, "wb") as f:
            f.write(b"partial")
    os.utime(stale, (1.0, 1.0))
    removed = att.sweep_spool_orphans()
    assert removed == 1
    left = {e for e in os.listdir(att.root) if e.endswith(".tmp")}
    assert left == {"live456.tmp"}

    # add() cleanup: force the replace to fail by making root read-only
    # is platform-fragile; instead simulate a write failure via a
    # monkeypatched os.replace
    import pigeon_optics_spark.attachments as mod
    orig = mod.os.replace
    try:
        def boom(*a, **k):
            raise OSError("simulated replace failure")
        mod.os.replace = boom
        try:
            att.add(b"new blob bytes")
        except OSError:
            pass
        else:
            raise AssertionError("expected simulated failure")
    finally:
        mod.os.replace = orig
    tmps = {e for e in os.listdir(att.root) if e.endswith(".tmp")}
    assert tmps == {"live456.tmp"}, f"spool leaked: {tmps}"


def test_zip_export_refuses_traversal_record_ids(tmp_path):
    """r8 hardening: a record id with '..' segments, an absolute prefix,
    or a drive-letter prefix must refuse zip export loudly (zip-slip —
    extraction tools would write outside the target dir); benign nested
    ids ('a/b') still export as folder entries."""
    import zipfile as _zf
    from io import BytesIO

    import pytest

    from pigeon_optics_spark.sources.files import export_zip_archive
    from pigeon_optics_spark.store import DatasetStore

    store = DatasetStore(str(tmp_path / "ds"))
    store.create("a", "d")
    store.write_entries("a", "d", [("ok", {"v": 1}), ("a/b", {"v": 2})])
    blob = export_zip_archive(store, "a", "d", "json")
    names = set(_zf.ZipFile(BytesIO(blob)).namelist())
    assert names == {"records/ok.json", "records/a/b.json"}

    for bad in ("../evil", "x/../../evil", "/abs", "\\abs",
                "c:evil", "a\\..\\b"):
        store2 = DatasetStore(str(tmp_path / f"ds_{abs(hash(bad))}"))
        store2.create("a", "d")
        store2.write_entries("a", "d", [(bad, {"v": 1})])
        with pytest.raises(ValueError, match="traversal"):
            export_zip_archive(store2, "a", "d", "json")
