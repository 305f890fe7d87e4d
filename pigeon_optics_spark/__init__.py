"""spark-optics: a PySpark-native engine with the query and data-processing
capabilities of auslan-find-sign/pigeon-optics, rebuilt Spark-first.

Package layout (mirrors SURVEY.md §7):

- ``values``    — M0 canonical dynamic-value core: tagged JSON form, canonical
                  bytes, ``object_hash`` (sha256), attachment-link extraction,
                  cid: rewriting.  (ref: library/models/codec/object-hash.js,
                  library/utility/record-structure.js)
- ``paths``     — data-path encode/decode (``/{source}/{author}:{name}[/records/{id}]``).
                  (ref: library/models/codec/path.js)
- ``session``   — SparkSession factory tuned for the driver's local[32] box but
                  configured the way a 1000-executor cluster job would be (AQE,
                  UTC, Arrow, shuffle partitions).
- ``store``     — M1 versioned multi-author dataset store on Parquet
                  (Delta MERGE on a real cluster).  (ref: library/models/
                  base-data-model.js, dataset.js)
- ``reduce``    — the reference's type-directed deep-merge reduce.
                  (ref: library/utility/reduce.js)
- ``lens``      — M2 lens engine: user map code via mapInPandas, ordered
                  merge-reduce via applyInPandas, compute-cache incrementality.
                  (ref: library/models/lens.js, library/workers/*)
- ``codecs``    — M3 wire codecs: JSON(+tagged), JSON-lines, CBOR, YAML,
                  msgpack, XML/JsonML.  (ref: library/models/codec/*)
- ``queries``   — the oracle-paired gate registry (relational surface,
                  lens/store/codec/events/pipeline gates) backing
                  ``__spark_entry__.py``; ``joins`` holds the
                  skew-mitigation join/agg strategies.
- ``pipeline``  — LLM-data-pipeline operators: dedup, similarity search,
                  text analysis, multimodal plumbing.
- ``attachments`` — content-addressed blob store + GC anti-join.
- ``streaming`` — change feed + reactive lens rebuild on Structured Streaming.
"""

__version__ = "0.1.0"


def _disarm_worker_import_cache_invalidation() -> None:
    """Skip redundant ``importlib.invalidate_caches()`` in reused Python
    workers (guide §4.5: per-task init must not repeat).

    PySpark's worker boot path calls ``importlib.invalidate_caches()`` for
    EVERY task (``setup_spark_files`` — it must notice py-files added via
    ``addPyFile`` mid-job).  With pyspark.zip + py4j zip + a large
    site-packages on ``sys.path`` that call costs ~70-200 ms of pure CPU
    per task (zipimport re-reads every zip TOC, every FileFinder directory
    cache is dropped) — measured 0.2-0.3 cpu-s per task, ~10 cpu-s for a
    32-task stage that does nothing else, the dominant machine-wide cost of
    every Python-bearing stage in this engine.

    This engine never ships py-files mid-session, so once this module is
    imported inside a worker (the first task that unpickles any of our
    UDFs), ``invalidate_caches`` is replaced by a wrapper that only runs the
    real invalidation when ``sys.path`` has changed since the last real run
    — exactly the addPyFile signal (``setup_spark_files`` appends each new
    include to ``sys.path`` before invalidating).  Driver processes are
    left untouched: the patch arms only inside a PySpark worker/daemon
    process (worker-factory env present, or pyspark.daemon/worker argv).
    """
    import os
    import sys

    is_worker = (
        "PYTHON_WORKER_FACTORY_SOCK_PATH" in os.environ
        or "PYTHON_WORKER_FACTORY_PORT" in os.environ
        or any("pyspark.daemon" in str(a) or "pyspark.worker" in str(a)
               for a in sys.argv)
    )
    if not is_worker:
        return
    import importlib
    if getattr(importlib.invalidate_caches, "_po_path_gated", False):
        return
    orig = importlib.invalidate_caches
    state = {"snap": None}

    def _invalidate_when_path_changes() -> None:
        # KNOWN EDGE (accepted, pinned by test_worker_tuning): re-adding a
        # SAME-NAMED py-file via addPyFile leaves sys.path unchanged
        # (worker_util.add_path dedups), so this gate would skip the real
        # invalidation and a stale module could be served.  Unreachable
        # here — this engine never ships py-files at all, let alone
        # re-ships one under the same name mid-session — but any future
        # addPyFile user of this package must drop this patch first.
        snap = tuple(sys.path)
        if state["snap"] == snap:
            return
        state["snap"] = snap
        orig()

    _invalidate_when_path_changes._po_path_gated = True  # type: ignore[attr-defined]
    importlib.invalidate_caches = _invalidate_when_path_changes


_disarm_worker_import_cache_invalidation()
