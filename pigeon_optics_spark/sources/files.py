"""File import/export: multipart-style file ingestion, flat-file export in
any codec, ``?at=`` incremental export, zip archive export.

Reference surfaces re-expressed Spark-first:

- **multipart/file import** (ref `library/controllers/dataset-controller.js:
  249-298`, `library/utility/multipart-files.js:31-100`): each uploaded file
  becomes one record — filename minus extension is the recordID, the
  extension picks the codec.  Here: ``spark.read.format('binaryFile')`` over
  a glob + an Arrow-batched decode UDF → ``(record_id, value)`` rows ready
  for ``DatasetStore.write_entries_df``.  Decoding is per-file data
  parallelism — at 100 TB this is the "many small docs" ingest path.
- **entries-file import**: one body holding many entries (ref
  `parse-request-body.js:40-65`) — decoded via the codec's entries reader.
- **flat-file export** (ref `export-controller.js:109-130`): records in
  natural-sort order, each as an ``{id, version, hash, data}`` envelope;
  with ``at`` given, records whose ``version < at`` are stubbed without
  ``data`` (the pull-sync protocol, ref `export-controller.js:25-41`).
- **zip archive export** (ref `export-controller.js:43-91`):
  ``records/{id}.{ext}`` entries plus deduplicated ``attachments/{hash}``.
- **distributed export**: for concatenable stream codecs (jsonl, yaml
  multi-doc, cbor/msgpack sequences) each partition writes one valid
  entries file — the cluster-scale path (JSON-array / XML framing need a
  single stream, so they stay driver-side).
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Any, Iterator

from ..codecs import Codec, codec_for
from ..values import HASH_URL_RE, natural_sort_key, tagged_to_value, value_to_tagged

CONCATENABLE = frozenset(("jsonl", "yaml", "cbor", "msgpack"))


# --------------------------------------------------------------------------
# import
# --------------------------------------------------------------------------


def import_files_df(spark, path_glob: str):
    """Read files as records: ``(record_id, value)`` with tagged-JSON value.

    record_id = basename minus extension; codec chosen per file extension.
    Files with unknown extensions are skipped (reported in ``_error``).
    """
    import pandas as pd

    raw = spark.read.format("binaryFile").load(path_glob) \
        .select("path", "content")

    def decode_batch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rids, vals, errs = [], [], []
            for row in pdf.itertuples(index=False):
                base = os.path.basename(row.path)
                stem, ext = os.path.splitext(base)
                try:
                    codec = codec_for(ext)
                    value = codec.decode(bytes(row.content))
                    rids.append(stem)
                    vals.append(json.dumps(value_to_tagged(value),
                                           ensure_ascii=False))
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — per-file error capture
                    rids.append(stem)
                    vals.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame({"record_id": rids, "value": vals, "_error": errs})

    return raw.mapInPandas(decode_batch,
                           schema="record_id string, value string, _error string")


def import_entries_bytes(data: bytes, media_type_or_ext: str) -> list[tuple[str, Any]]:
    """One request body holding many entries → ``[(record_id, value), ...]``.

    Accepts the envelope form ({id, data}) or, for map-shaped codecs, a
    top-level object of ``{record_id: value}``.
    """
    codec = codec_for(media_type_or_ext)
    out: list[tuple[str, Any]] = []
    for entry in codec.decode_entries(data):
        if isinstance(entry, dict) and "id" in entry:
            out.append((str(entry["id"]), entry.get("data")))
        elif isinstance(entry, dict):
            out.extend((str(k), v) for k, v in entry.items())
        else:
            raise ValueError(f"entry without id: {entry!r}")
    return out


# --------------------------------------------------------------------------
# export
# --------------------------------------------------------------------------


def _envelopes(store, author: str, name: str, *, source: str = "datasets",
               at: int | None = None) -> Iterator[dict]:
    """Envelope stream in natural-sort order; ``version < at`` ⇒ data
    stubbed out (ref export-controller.js:31,34-40)."""
    for rec in store.iterate(author, name, source=source, fast_read=True):
        env = {"id": rec["id"], "version": rec["version"], "hash": rec["hash"]}
        if at is None or rec["version"] >= at:
            env["data"] = rec["value"]
        yield env


def export_collection_bytes(store, author: str, name: str,
                            media_type_or_ext: str, *,
                            source: str = "datasets",
                            at: int | None = None) -> bytes:
    """Whole-collection flat-file export in one buffer (HTTP download
    semantics)."""
    codec = codec_for(media_type_or_ext)
    return codec.encode_entries(_envelopes(store, author, name, source=source, at=at))


def export_collection_stream(store, author: str, name: str,
                             media_type_or_ext: str, *,
                             source: str = "datasets",
                             at: int | None = None) -> Iterator[bytes]:
    """Chunked export stream (constant memory) for concatenable codecs;
    single-buffer fallback for framed codecs (json array, xml wrapper)."""
    codec = codec_for(media_type_or_ext)
    if codec.name in CONCATENABLE:
        for env in _envelopes(store, author, name, source=source, at=at):
            yield codec.encode_entries([env])
    else:
        yield export_collection_bytes(store, author, name, media_type_or_ext,
                                      source=source, at=at)


def _zip_entry_name(record_id: str, ext: str) -> str:
    """``records/{id}{ext}`` with the zip-slip class refused loudly: a
    record id is an arbitrary store key (the path layer percent-escapes
    them, but ids like ``../x`` are perfectly writable), and putting one
    raw into an archive entry makes extraction tools write OUTSIDE the
    target directory.  Absolute paths, drive-letter prefixes, and ``..``
    segments (under either separator) raise instead of silently
    rewriting — a renamed entry could no longer round-trip as the id."""
    segs = record_id.replace("\\", "/").split("/")
    if record_id.startswith(("/", "\\")) or ".." in segs \
            or (len(record_id) > 1 and record_id[1] == ":"):
        raise ValueError(
            f"record id {record_id!r} cannot be a zip entry name "
            "(path traversal)")
    return f"records/{record_id}{ext}"


def export_zip_archive(store, author: str, name: str,
                       media_type_or_ext: str = "json", *,
                       source: str = "datasets",
                       attachments=None) -> bytes:
    """Zip of ``records/{id}.{ext}`` (+ deduplicated ``attachments/{hash}``
    when an attachment store is given) — ref export-controller.js:43-91."""
    codec: Codec = codec_for(media_type_or_ext)
    ext = codec.extensions[0]
    buf = io.BytesIO()
    seen_hashes: set[str] = set()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for rec in store.iterate(author, name, source=source, fast_read=True):
            zf.writestr(_zip_entry_name(rec["id"], ext),
                        codec.encode(rec["value"]))
            if attachments is not None:
                for url in rec["links"]:
                    m = HASH_URL_RE.match(url)
                    if not m:
                        continue
                    h = m.group(1)
                    if h not in seen_hashes and attachments.has(h):
                        seen_hashes.add(h)
                        zf.writestr(f"attachments/{h}", attachments.read(h))
    return buf.getvalue()


def export_distributed(df, out_dir: str, media_type_or_ext: str) -> int:
    """Cluster-scale export: each partition writes ONE valid entries file
    ``part-{pid}.{ext}`` into ``out_dir``.  Only stream-concatenable codecs
    (jsonl / yaml / cbor / msgpack) — their entries files concatenate into
    a valid whole, so a directory of parts is equivalent to one file.

    ``df`` columns: record_id, value (tagged JSON), hash, version.
    Returns number of files written.
    """
    codec = codec_for(media_type_or_ext)
    if codec.name not in CONCATENABLE:
        raise ValueError(f"{codec.name} export needs a single stream; "
                         "use export_collection_bytes")
    os.makedirs(out_dir, exist_ok=True)
    ext = codec.extensions[0]
    name, encode_entries = codec.name, codec.encode_entries

    def write_partition(pid: int, rows) -> Iterator[tuple[int, int]]:
        # sort within partition for deterministic file contents; partition
        # the input by range(record_id) upstream for globally ordered parts
        entries = sorted(
            ({"id": r.record_id, "version": r.version, "hash": r.hash,
              "data": tagged_to_value(json.loads(r.value))} for r in rows),
            key=lambda e: natural_sort_key(e["id"]))
        if not entries:
            return
        payload = encode_entries(entries)
        path = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        with open(path, "wb") as f:
            f.write(payload)
        yield (pid, len(entries))

    written = (df.select("record_id", "value", "hash", "version").rdd
               .mapPartitionsWithIndex(write_partition).collect())
    return len(written)
