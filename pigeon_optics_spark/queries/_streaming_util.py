"""Shared harness for REAL Structured Streaming gates (r6, VERDICT r5
item 4).

The 22 streaming gates that predate this module each carry their own
scaffold — those are driver-row-pinned and deliberately NOT migrated (the
r5 wave-14b udfs incident showed a late-round cross-cutting refactor can
red dozens of pinned gates at once).  Every streaming gate added from r6
on uses this harness instead of re-inlining the pattern.

The pattern it packages (evolved across the 22 existing runs):

1. **Forced multi-batch sources** — a source directory written as N
   sequential single-file appends (strictly increasing mtimes), streamed
   with ``maxFilesPerTrigger=1`` so ``availableNow`` replays N ordered
   micro-batches.  Time-quartile slicing makes every keyed fold cross a
   batch boundary mid-stream; a doubled source makes at-least-once
   delivery real for dedup gates.
2. **Collapse guard** — a run that coalesces into fewer data batches than
   the source promises (maxFilesPerTrigger ignored, files merged) must
   FAIL loudly, never silently green a degenerate single-batch run.
3. **Scoped shuffle partitions** — stateful operators initialize one
   state store per shuffle partition per operator; 32 partitions cost
   ~100 s of local store init for a 10k-row fixture
   (events_stream_stream_join lesson), so runs scope
   ``spark.sql.shuffle.partitions`` down around the query and restore it.
4. **Memory-sink naming** — unique query names per run (re-registration
   under one Spark session would silently read a stale table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import tracked_mkdtemp as _tracked_mkdtemp

#: process-wide query-name sequence (memory sink tables are per-session
#: global; a reused name would read a previous run's rows)
_SEQ = [0]

#: cache key -> source directory, built once per process.  The key is
#: whatever the caller passes as ``cache_key`` (plus builder parameters):
#: it MUST include every input that changes the DataFrame's contents —
#: in gate code that means the sf_dir, e.g. ``("my_gate", sf_dir)``.  A
#: key without the sf_dir would silently replay the first SF's source
#: against a later SF's oracle in any multi-SF process.
_SRC_CACHE: dict[tuple, str] = {}


def unique_name(prefix: str) -> str:
    _SEQ[0] += 1
    return f"{prefix}_{_SEQ[0]}"


def sliced_source(df: DataFrame, order_col, n_slices: int = 4,
                  cache_key: tuple | None = None) -> str:
    """Write ``df`` as ``n_slices`` sequential single-file appends sliced
    by quantiles of ``order_col`` (a numeric Column expression), so a
    ``maxFilesPerTrigger=1`` stream replays them as ordered micro-batches.
    Returns the source directory.  ``cache_key`` reuses a directory for
    repeated gate runs in one process — it must include the sf_dir (see
    ``_SRC_CACHE``).

    Refuses loudly instead of degrading silently: NULLs in ``order_col``
    would fall out of every slice predicate (the NULL-testdata class),
    and tied quantile cuts would produce an empty slice that later trips
    the collapse guard on a healthy run.
    """
    if cache_key is not None and (cache_key, n_slices) in _SRC_CACHE:
        return _SRC_CACHE[(cache_key, n_slices)]
    probs = [i / n_slices for i in range(1, n_slices)]
    agg = df.agg(
        F.percentile(order_col, F.lit(probs)).alias("p"),
        F.sum(F.when(order_col.isNull(), 1).otherwise(0)).alias("nn"),
    ).first()
    cuts, n_null = agg["p"], agg["nn"]
    if n_null:
        raise ValueError(
            f"sliced_source: order_col has {n_null} NULLs — they would "
            "vanish from every slice; filter or coalesce them first")
    if len(set(cuts)) != len(cuts):
        raise ValueError(
            f"sliced_source: tied quantile cuts {cuts} — order_col is too "
            f"discrete for n_slices={n_slices}; an empty slice would "
            "falsely trip the collapse guard")
    d = _tracked_mkdtemp("po_stream_src_")
    lo = None
    for i in range(n_slices):
        cond = None
        if lo is not None:
            cond = order_col > F.lit(lo)
        if i < n_slices - 1:
            hi_cond = order_col <= F.lit(cuts[i])
            cond = hi_cond if cond is None else (cond & hi_cond)
            lo = cuts[i]
        sl = df.where(cond) if cond is not None else df
        sl.coalesce(1).write.mode("append").parquet(d)
    if cache_key is not None:
        _SRC_CACHE[(cache_key, n_slices)] = d
    return d


def doubled_source(df: DataFrame, cache_key: tuple | None = None) -> str:
    """Write ``df`` twice (two appends) — the at-least-once delivery
    fixture for dedup/idempotence gates.  ``cache_key`` must include the
    sf_dir (see ``_SRC_CACHE``)."""
    if cache_key is not None and ("dbl", cache_key) in _SRC_CACHE:
        return _SRC_CACHE[("dbl", cache_key)]
    d = _tracked_mkdtemp("po_stream_dbl_")
    for _ in range(2):
        df.coalesce(1).write.mode("append").parquet(d)
    if cache_key is not None:
        _SRC_CACHE[("dbl", cache_key)] = d
    return d


def read_file_stream(spark: SparkSession, src_dir: str,
                     files_per_trigger: int = 1) -> DataFrame:
    """readStream over a directory written by the builders above, with
    the schema inferred from a batch read (file sources need an explicit
    schema)."""
    schema = spark.read.parquet(src_dir).schema
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", files_per_trigger)
            .parquet(src_dir))


class scoped_shuffle_partitions:
    """Context manager scoping ``spark.sql.shuffle.partitions`` around a
    stateful streaming run (state-store init is per partition per
    operator — the events_stream_stream_join lesson)."""

    def __init__(self, spark: SparkSession, n: int = 4):
        self.spark, self.n = spark, n

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)
        return False


def run_to_memory(stream_df: DataFrame, *, prefix: str, output_mode: str,
                  min_data_batches: int,
                  checkpoint: str | None = None) -> tuple[str, object]:
    """Start ``stream_df`` → memory sink with ``availableNow``, await
    termination, enforce the collapse guard, and return (table_name,
    query).  ``min_data_batches`` is the number of non-empty micro-batches
    the source construction PROMISES — fewer means the forced batching
    degenerated and the gate must fail, not green."""
    if min_data_batches > 90:
        # recentProgress retains only the last
        # spark.sql.streaming.numRecentProgressUpdates entries (default
        # 100) — a guard above that would falsely flag healthy runs
        raise ValueError(
            "min_data_batches > 90 cannot be verified via recentProgress; "
            "use fewer/larger source files or a StreamingQueryListener")
    name = unique_name(prefix)
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode)
         .option("checkpointLocation",
                 checkpoint or _tracked_mkdtemp("po_stream_ck_"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    data_batches = sum(1 for p in q.recentProgress if p["numInputRows"] > 0)
    if data_batches < min_data_batches:
        raise AssertionError(
            f"stream collapsed to {data_batches} data batches; expected "
            f">= {min_data_batches} (one per forced source file)")
    return name, q
