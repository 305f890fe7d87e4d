"""Native Spark connector for the store: the Spark 4 Python DataSource API.

``spark.read.format("pigeon_optics")`` makes a :class:`DatasetStore`
collection a first-class Catalyst source — the "custom connector" surface
(SURVEY §2.1 sources) expressed the way a production integration ships it,
instead of the library-call path (``store.read_df``).

Semantics: the reader reproduces the store's own latest-wins resolution
(segments in seq order, max-seq row wins, tombstones drop — store.py
``read_df``) so both paths are interchangeable; the driver gate pins them
against the same DuckDB oracle.

Scale shape: ``partitions()`` hashes record ids into ``buckets`` input
partitions; each partition scans the segment log column-pruned and keeps
only its bucket's rows, so resolution state per task is
O(records/buckets) and tasks parallelize like any other scan.

Filter pushdown (``option("pushdown", "true")`` + the session conf
``spark.sql.python.filterPushdown.enabled``): record_id EqualTo/In
predicates prune the BUCKET partitions at planning time and reach the
parquet scan as row-group filters — a point lookup through the connector
plans O(1) partitions and skips non-matching row groups by statistics,
instead of resolving the whole collection and filtering after.  Pushing a
record_id predicate below latest-wins resolution is semantics-preserving
because resolution is per-record: dropping other records' rows (including
their tombstones) cannot change the kept record's resolved row.  The
pushdown reader is an opt-in SUBCLASS because Spark refuses a reader that
implements ``pushFilters`` while the conf is disabled — the default
reader must stay inert for sessions that never opt in.
"""

from __future__ import annotations

import zlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

SCHEMA = ("record_id string, value string, hash string, "
          "links array<string>, version long")

#: change-feed mode (option feed=changes): raw log rows incl. tombstones —
#: the store's CDF shape (read_delta_df), tailable as a stream
FEED_SCHEMA = ("record_id string, value string, hash string, "
               "links array<string>, version long, seq long, "
               "deleted boolean")


class _Bucket(InputPartition):
    def __init__(self, idx: int, n: int, segments: list[str],
                 ids: frozenset | None = None):
        self.idx = idx
        self.n = n
        self.segments = segments
        #: pushed record_id constraint (None = unconstrained)
        self.ids = ids


class PigeonDataSource(DataSource):
    """Options: ``root`` (store directory), ``author``, ``name``,
    ``source`` (default datasets), ``buckets`` (default 8)."""

    @classmethod
    def name(cls) -> str:
        return "pigeon_optics"

    def schema(self) -> str:
        if self.options.get("feed") == "changes":
            return FEED_SCHEMA
        return SCHEMA

    def reader(self, schema) -> "PigeonSegmentReader":
        if self.options.get("feed") == "changes":
            # batch CDF read must match the FEED_SCHEMA that schema()
            # declared for this option — a resolved-set reader here would
            # crash with a 5-vs-7 column arity mismatch
            return PigeonFeedReader(self.options)
        if self.options.get("pushdown") == "true":
            return PigeonPushdownReader(self.options)
        return PigeonSegmentReader(self.options)

    def simpleStreamReader(self, schema) -> "PigeonStreamReader":
        if self.options.get("feed") != "changes":
            # schema() returned the 5-column resolved-set SCHEMA, but the
            # stream reader emits 7-column feed rows — and a stream of
            # the RESOLVED set has no incremental semantics to offer.
            # Refuse loudly instead of crashing with an arity mismatch.
            raise ValueError(
                "pigeon_optics streaming requires option('feed', "
                "'changes'): the stream source tails the change log; "
                "the resolved record set is a batch read")
        return PigeonStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> "PigeonWriter":
        return PigeonWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "PigeonStreamWriter":
        return PigeonStreamWriter(self.options, overwrite)


class PigeonSegmentReader(DataSourceReader):
    def __init__(self, options):
        # planning runs on the driver: resolve the segment list through the
        # store itself (catalog base_seq, staged-file exclusion) so the
        # connector can never drift from the engine's own segment rule
        from ..store import DatasetStore

        store = DatasetStore(options["root"])
        meta = store._meta(options.get("source", "datasets"),  # noqa: SLF001
                           options["author"], options["name"])
        self.segments = store._segments(meta)  # noqa: SLF001
        self.n_buckets = int(options.get("buckets", "8"))

    def partitions(self):
        return [_Bucket(i, self.n_buckets, self.segments)
                for i in range(self.n_buckets)]

    def read(self, partition: _Bucket):
        import pyarrow.parquet as pq

        # pushed record_id constraint reaches the parquet scan: row groups
        # whose record_id min/max statistics exclude every wanted id are
        # skipped entirely (pyarrow evaluates the filter against stats)
        pq_filter = (None if partition.ids is None
                     else [("record_id", "in", sorted(partition.ids))])
        state: dict[str, tuple] = {}
        for path in partition.segments:      # seq order (driver-resolved)
            table = pq.read_table(path, columns=[
                "record_id", "value", "hash", "links", "version",
                "seq", "deleted"], filters=pq_filter)
            # one segment path = one seq (store._segments contract), so
            # cross-segment ordering comes from the driver-resolved path
            # list alone; part files within a segment need no ordering
            rows = table.to_pylist()
            for row in rows:
                rid = row["record_id"]
                if zlib.crc32(rid.encode("utf-8")) % partition.n \
                        != partition.idx:
                    continue
                if partition.ids is not None and rid not in partition.ids:
                    continue
                if row["deleted"]:
                    state.pop(rid, None)
                else:
                    state[rid] = (rid, row["value"], row["hash"],
                                  list(row["links"] or []), row["version"])
        yield from state.values()


class PigeonPushdownReader(PigeonSegmentReader):
    """record_id predicate pushdown (``option("pushdown", "true")``).

    ``pushFilters`` keeps EqualTo / In filters on record_id (intersecting
    repeated constraints) and hands everything else back to Spark.  The
    kept ids prune ``partitions()`` to the buckets that can contain them —
    a point lookup plans ONE input partition instead of ``buckets`` — and
    travel in the partition so ``read`` can push them into the parquet
    row-group filter.  Contradictory constraints (empty intersection)
    plan a single no-op partition.
    """

    def __init__(self, options):
        super().__init__(options)
        self._ids: frozenset | None = None

    def _constrain(self, ids) -> None:
        new = frozenset(ids)
        self._ids = new if self._ids is None else (self._ids & new)

    def pushFilters(self, filters):
        for f in filters:
            if (isinstance(f, EqualTo) and f.attribute == ("record_id",)
                    and isinstance(f.value, str)):
                self._constrain({f.value})
            elif (isinstance(f, In) and f.attribute == ("record_id",)
                    and all(isinstance(v, str) for v in f.value)):
                self._constrain(f.value)
            else:
                yield f                      # Spark re-evaluates this one

    def partitions(self):
        if self._ids is None:
            return super().partitions()
        if not self._ids:
            return [_Bucket(0, self.n_buckets, [], ids=self._ids)]
        buckets = sorted({zlib.crc32(i.encode("utf-8")) % self.n_buckets
                          for i in self._ids})
        return [_Bucket(b, self.n_buckets, self.segments, ids=self._ids)
                for b in buckets]


class PigeonFeedReader(PigeonSegmentReader):
    """Batch read of the RAW change feed (``option("feed", "changes")``):
    every log row including tombstones, in the 7-column FEED_SCHEMA —
    the batch twin of the streaming source, same shape as
    ``store.read_delta_df`` from the beginning of the retained log.
    record_id pushdown is a resolution-time optimization and does not
    apply to the raw log surface."""

    def read(self, partition: _Bucket):
        import pyarrow.parquet as pq

        for path in partition.segments:      # seq order (driver-resolved)
            for row in pq.read_table(path, columns=[
                    "record_id", "value", "hash", "links", "version",
                    "seq", "deleted"]).to_pylist():
                rid = row["record_id"]
                if zlib.crc32(rid.encode("utf-8")) % partition.n \
                        != partition.idx:
                    continue
                yield (rid, row["value"], row["hash"],
                       list(row["links"] or []), row["version"],
                       row["seq"], row["deleted"])


def _seq_of(path: str) -> int | None:
    """Segment seq from the path, via the engine's own canonical parse
    (``store.DatasetStore._seg_seq``) — a second ad-hoc parse here would
    silently desynchronize the stream offsets from the store's segment
    rule if the naming ever changed.  None for non-segment names."""
    import os

    from ..store import DatasetStore

    return DatasetStore._seg_seq(os.path.basename(path.rstrip("/")))


class PigeonStreamReader(SimpleDataSourceStreamReader):
    """The store's segment log as a STREAMING source (the reference's
    change feed, SURVEY §2.9, surfaced through the native API):
    ``spark.readStream.format("pigeon_optics").option("feed", "changes")``
    tails raw log rows — updates AND tombstones — with offsets = the last
    processed segment seq, so restarts resume exactly where the
    checkpoint left off and re-runs never re-emit a segment.

    The simple-reader variant reads on the driver per micro-batch — the
    right tier for a change LOG (bounded rows per batch by compaction's
    contract); a partition-parallel DataSourceStreamReader over segment
    row-groups is the named production upgrade for firehose ingest."""

    def __init__(self, options):
        self._options = dict(options)

    def _segments_after(self, seq: int) -> list[tuple[int, str]]:
        from ..store import DatasetStore

        o = self._options
        store = DatasetStore(o["root"])
        meta = store._meta(o.get("source", "datasets"),  # noqa: SLF001
                           o["author"], o["name"])
        if -1 < seq < meta.base_seq:
            # same guard as store.read_delta_df (store.py:525): a
            # compaction/overwrite dropped the segments between this
            # checkpoint offset and base_seq — their tombstones are
            # unrecoverable, so silently resuming would leave a follower
            # keeping deleted records forever.  A FRESH stream (offset
            # -1) is fine: replaying the base segment bootstraps the
            # full state into an empty follower.
            raise ValueError(
                f"pigeon_optics stream: checkpoint offset {seq} predates "
                f"base_seq {meta.base_seq} (compaction/overwrite dropped "
                "the in-between segments and their tombstones); "
                "re-bootstrap the follower with a fresh checkpoint")
        return sorted((s, p) for p in store._segments(meta)  # noqa: SLF001
                      if (s := _seq_of(p)) is not None and s > seq)

    @staticmethod
    def _rows_of(path: str):
        import pyarrow.parquet as pq

        for row in pq.read_table(path).to_pylist():
            yield (row["record_id"], row["value"], row["hash"],
                   list(row["links"] or []), row["version"], row["seq"],
                   row["deleted"])

    def initialOffset(self) -> dict:
        return {"seq": -1}

    def read(self, start: dict):
        segs = self._segments_after(int(start["seq"]))
        if not segs:
            return iter([]), start
        rows = [r for _s, p in segs for r in self._rows_of(p)]
        return iter(rows), {"seq": max(s for s, _p in segs)}

    def readBetweenOffsets(self, start: dict, end: dict):
        lo, hi = int(start["seq"]), int(end["seq"])
        return iter([r for s, p in self._segments_after(lo) if s <= hi
                     for r in self._rows_of(p)])

    def commit(self, end: dict) -> None:
        pass


class _PartStaged(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class _StagedStoreWrite:
    """Shared write machinery for the batch and streaming writers:
    executors stage their partition's (record_id, value[, seq]) rows as
    parquet parts; the commit callback routes the staged rows through the
    engine's own ``write_entries`` transaction, so hashing, link
    extraction, change-suppression, version stamping, and the
    segment/catalog update are the store's — the connector adds an API
    surface, never a second write semantics.

    Commit runs in a session-less Python worker
    (``SparkSession.getActiveSession()`` is None there — learned live),
    so it reads the staged parts with pure pyarrow and uses the store's
    DRIVER write path; fine under the bounded-batch contract, and the
    named production upgrade is executor-side hashing into full
    segment-schema parts + a metadata-only staged-segment promotion in
    commit.  ``abort`` removes the staging directory; a commit that
    never runs leaves only unreferenced staged files (the store ignores
    non-segment names).

    Row semantics mirror the engine: a NULL ``value`` is a DELETE (the
    reference's null⇒tombstone merge rule), and when the input carries a
    ``seq`` column — e.g. replicating another store's change feed — the
    batch is reduced to each record's highest-seq row before the write,
    so one micro-batch that contains both an update and a later tombstone
    for the same record applies in log order, not partition order."""

    def __init__(self, options, overwrite: bool):
        import os
        import uuid

        self._options = dict(options)
        self._overwrite = overwrite
        self._stage = os.path.join(
            options["root"], "_dswrite_" + uuid.uuid4().hex[:12])

    def write(self, iterator) -> _PartStaged:
        import os
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = [r.asDict() for r in iterator]
        os.makedirs(self._stage, exist_ok=True)
        path = os.path.join(self._stage, f"part_{uuid.uuid4().hex}.parquet")
        cols = {
            "record_id": [r["record_id"] for r in rows],
            "value": [r["value"] for r in rows]}
        if rows and "seq" in rows[0]:
            cols["seq"] = [r["seq"] for r in rows]
        table = pa.Table.from_pydict(cols)
        pq.write_table(table, path)
        return _PartStaged(path, len(rows))

    def _apply(self, messages) -> None:
        import json
        import shutil

        import pyarrow.parquet as pq

        from ..store import DatasetStore
        from ..values import tagged_to_value

        o = self._options
        store = DatasetStore(o["root"])
        staged = []
        for m in messages:
            if m is None:
                continue
            staged.extend(pq.read_table(m.path).to_pylist())
        if staged and "seq" in staged[0]:
            last: dict[str, dict] = {}
            for row in staged:
                cur = last.get(row["record_id"])
                if cur is None or row["seq"] >= cur["seq"]:
                    last[row["record_id"]] = row
            staged = list(last.values())
        entries = [
            (row["record_id"],
             None if row["value"] is None
             else tagged_to_value(json.loads(row["value"])))
            for row in staged]
        store.write_entries(
            o["author"], o["name"], entries,
            source=o.get("source", "datasets"),
            overwrite=self._overwrite)
        shutil.rmtree(self._stage, ignore_errors=True)

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(self._stage, ignore_errors=True)


class PigeonWriter(_StagedStoreWrite, DataSourceWriter):
    """``df.write.format("pigeon_optics")`` — the batch WRITE half."""

    def commit(self, messages) -> None:
        self._apply(messages)


class PigeonStreamWriter(_StagedStoreWrite, DataSourceStreamWriter):
    """``df.writeStream.format("pigeon_optics")`` — the STREAMING sink
    half of the connector: every micro-batch commits through the store's
    write transaction.  Change-suppression makes an epoch REPLAY after a
    commit-then-crash benign for unchanged rows (the re-send suppresses
    to the same version); a replayed batch whose rows changed upstream is
    the same at-least-once surface every idempotent-by-content sink has.
    Paired with the ``feed=changes`` stream READER this is store→store
    replication: the reference's SSE change feed (§2.9) driving a
    follower store, expressed as one native ``readStream → writeStream``.

    Each epoch re-stages into the writer's staging directory and commit
    consumes exactly the staged paths in its messages, so a failed epoch
    leaves only unreferenced files that ``abort`` sweeps."""

    def commit(self, messages, batchId: int) -> None:
        self._apply(messages)

    def abort(self, messages, batchId: int) -> None:
        _StagedStoreWrite.abort(self, messages)
