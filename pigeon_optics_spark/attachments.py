"""M4 — content-addressed attachment blob store + reference-counting GC.

Reference semantics (`library/models/attachments.js`, SURVEY §1.1, §2.1):

- blobs are stored under their sha256 hex digest; writes hash while
  streaming to a temp file, then rename into place (atomic, idempotent)
  (ref attachments.js:22-50, hashing tee fs/blob.js:68-91);
- records reference blobs via ``hash://sha256/<hex>?type=<mime>`` URIs
  (ref record-structure.js:22-26); the store's write path extracts these
  into the ``links`` column and REJECTS writes whose attachments are absent
  (ref base-data-model.js:185-188 — wired via ``DatasetStore.attachment_checker``);
- ``cid:<name>`` references in uploaded values are rewritten to hash URLs
  at import (ref record-structure.js:44-72 → ``values.resolve_cid_links``);
- GC: a blob is garbage once no live record links it.  The reference walks
  per-blob "linkers" lists (attachments.js:161-195); at Spark scale this is
  one anti-join: blob inventory EXCEPT the distinct explode of every
  collection's ``links`` (SURVEY §2.3 "attachment GC anti-join").
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from typing import BinaryIO, Iterator

from .values import HASH_URL_RE

MAX_ATTACHMENT_SIZE = 1 << 30  # 1 GB, ref package.json defaults.maxAttachmentSize


class AttachmentStore:
    """Local/posix directory of sha256-named blobs (on a cluster: an object
    store prefix; the naming scheme and GC join are unchanged)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, hash_hex: str) -> str:
        return os.path.join(self.root, hash_hex)

    @staticmethod
    def normalize(hash_or_url: str) -> str:
        m = HASH_URL_RE.match(hash_or_url)
        if m:
            return m.group(1)
        h = hash_or_url.lower()
        if len(h) != 64 or any(c not in "0123456789abcdef" for c in h):
            raise ValueError(f"not a sha256 hex or hash URL: {hash_or_url!r}")
        return h

    # -- writes ------------------------------------------------------------

    def add(self, data: bytes, *, mime: str | None = None) -> str:
        """Store a blob, return its ``hash://sha256/...`` URL."""
        if len(data) > MAX_ATTACHMENT_SIZE:
            raise ValueError("attachment exceeds 1GB limit")
        h = hashlib.sha256(data).hexdigest()
        path = self._path(h)
        if not os.path.exists(path):  # content-addressed: idempotent
            fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
            try:
                with os.fdopen(fd, "wb") as f:
                    f.write(data)
                os.replace(tmp, path)  # write-then-rename, attachments.js:38-43
            except Exception:
                # mirror add_stream's cleanup: a failed write (disk full)
                # must not leave a spool orphan behind
                if os.path.exists(tmp):
                    os.remove(tmp)
                raise
        return self.url(h, mime=mime)

    def add_stream(self, stream: BinaryIO, *, mime: str | None = None,
                   chunk: int = 1 << 16) -> str:
        """Streaming write: hash while spooling to temp, rename to the digest
        (the reference's hashing tee, fs/blob.js:68-91)."""
        hasher = hashlib.sha256()
        total = 0
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                while True:
                    buf = stream.read(chunk)
                    if not buf:
                        break
                    total += len(buf)
                    if total > MAX_ATTACHMENT_SIZE:
                        raise ValueError("attachment exceeds 1GB limit")
                    hasher.update(buf)
                    f.write(buf)
            h = hasher.hexdigest()
            os.replace(tmp, self._path(h))
        except Exception:
            if os.path.exists(tmp):
                os.remove(tmp)
            raise
        return self.url(h, mime=mime)

    @staticmethod
    def url(hash_hex: str, *, mime: str | None = None) -> str:
        return f"hash://sha256/{hash_hex}" + (f"?type={mime}" if mime else "")

    # -- reads -------------------------------------------------------------

    def has(self, hash_or_url: str) -> bool:
        try:
            return os.path.exists(self._path(self.normalize(hash_or_url)))
        except ValueError:
            return False

    def read(self, hash_or_url: str) -> bytes:
        with open(self._path(self.normalize(hash_or_url)), "rb") as f:
            return f.read()

    def list_hashes(self) -> list[str]:
        return sorted(h for h in os.listdir(self.root)
                      if len(h) == 64 and not h.endswith(".tmp"))

    def checker(self):
        """An ``attachment_checker`` for :class:`DatasetStore`: rejects record
        writes whose hash links point at absent blobs."""
        return self.has

    # -- GC ----------------------------------------------------------------

    def live_links_df(self, spark, store):
        """DISTINCT blob hashes referenced by any live record across every
        collection — the GC join's build side."""
        from pyspark.sql import functions as F

        dfs = []
        for meta in store._catalog.values():  # noqa: SLF001 — engine-internal
            df = store.read_df(spark, meta.author, meta.name, source=meta.source)
            dfs.append(df.select(F.explode("links").alias("url")))
        if not dfs:
            from .store import empty_local_df
            return empty_local_df(spark, "hash string")
        allu = dfs[0]
        for d in dfs[1:]:
            allu = allu.unionByName(d)
        return allu.select(
            F.regexp_extract("url", r"^hash://sha256/([0-9a-f]{64})", 1).alias("hash")
        ).where(F.col("hash") != "").distinct()

    def inventory_df(self, spark):
        """Blob inventory as a DataFrame — the GC join's probe side.

        Listed with the ``binaryFile`` source so the scan is distributed
        (on a cluster this is the object-store listing); only ``path`` and
        ``modificationTime`` are projected, so column pruning keeps blob
        CONTENT out of the scan entirely.  Non-blob names (.tmp spool
        files) are filtered by the 64-hex shape.
        """
        from pyspark.sql import functions as F

        if not any(e for e in os.listdir(self.root) if not e.endswith(".tmp")):
            from .store import empty_local_df
            return empty_local_df(spark, "hash string, mtime double")
        df = spark.read.format("binaryFile").load(self.root)
        return (df.select(
                    F.element_at(F.split("path", "/"), -1).alias("hash"),
                    (F.unix_millis("modificationTime") / F.lit(1000.0))
                    .alias("mtime"))
                .where(F.col("hash").rlike("^[0-9a-f]{64}$")))

    def gc_df(self, spark, store, *, grace_seconds: float = 0.0):
        """The GC sweep as a DataFrame of ``(hash, deleted)``.

        ``blob inventory LEFT ANTI JOIN live links`` — both sides are
        DataFrames (distributed listing vs records scan) and the join
        shuffles only hash strings.  Deletes execute EXECUTOR-SIDE inside
        a ``mapInPandas`` pass when the result is consumed, so no orphan
        list ever materializes on the driver; at 100 TB the caller writes
        this result to a reporting table instead of collecting it.
        ``grace_seconds`` protects blobs younger than the window
        (upload-before-reference race, the reference's hold/release,
        attachments.js:117-152) — enforced against the file's CURRENT
        mtime at delete time, not the listing snapshot.  Deletion is
        idempotent (content-addressed names), so a retried task re-deleting
        its partition is harmless.
        """
        orphans = self.inventory_df(spark).join(
            self.live_links_df(spark, store), "hash", "left_anti")
        root, grace = self.root, grace_seconds

        def _delete(batches):
            import os as _os
            import time as _time

            import pandas as _pd

            for pdf in batches:
                done = []
                for h in pdf["hash"]:
                    path = _os.path.join(root, h)
                    try:
                        if grace and _time.time() - _os.path.getmtime(path) < grace:
                            done.append(False)
                            continue
                        _os.remove(path)
                        done.append(True)
                    except OSError:
                        done.append(False)
                yield _pd.DataFrame({"hash": pdf["hash"], "deleted": done})

        return orphans.select("hash").mapInPandas(
            _delete, "hash string, deleted boolean")

    def sweep_spool_orphans(self, *, max_age_seconds: float = 3600.0) -> int:
        """Remove ``.tmp`` spool files older than ``max_age_seconds`` — the
        crash-debris sweep (a process dying between mkstemp and os.replace
        leaves its spool behind forever; listings/GC skip .tmp but nothing
        else deletes them — the change-feed orphan class).  The age bound
        keeps a CONCURRENT writer's in-flight spool safe.  Returns the
        number removed."""
        import time

        now = time.time()
        removed = 0
        for entry in os.listdir(self.root):
            if not entry.endswith(".tmp"):
                continue
            p = os.path.join(self.root, entry)
            try:
                if now - os.path.getmtime(p) > max_age_seconds:
                    os.remove(p)
                    removed += 1
            except OSError:
                pass  # a concurrent sweep/replace already handled it
        return removed

    def gc(self, spark, store, *, grace_seconds: float = 0.0) -> list[str]:
        """Delete unreferenced blobs; returns the deleted hashes, sorted.

        Small-store convenience wrapper: runs :meth:`gc_df` (deletes still
        happen executor-side) and collects the per-blob outcomes — bounded
        by the orphan count, fine for a local store, not the 100 TB path
        (use :meth:`gc_df` and sink the result there).  Also sweeps stale
        ``.tmp`` spool orphans (GC is the store's maintenance pass)."""
        self.sweep_spool_orphans()
        return sorted(r["hash"] for r in self.gc_df(
            spark, store, grace_seconds=grace_seconds).collect() if r["deleted"])

    def iterate(self) -> Iterator[tuple[str, int]]:
        for h in self.list_hashes():
            yield h, os.path.getsize(self._path(h))
