"""Query registry backing ``__spark_entry__.py``.

Each submodule exposes ``QUERIES: dict[str, tuple[fn, oracle_sql | None]]``
where ``fn(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is the equivalent
ANSI SQL the driver runs in DuckDB over the same parquet (views: region nation
customer supplier part orders lineitem events documents embeddings).  Column
names are aliased identically on both sides — the driver's value-hash compares
columns sorted by name.

Determinism contract for oracle-checked queries (see ``_util.py``):
floating-point SUMs go through a DECIMAL cast so the result is independent of
accumulation order (Spark partial aggs vs DuckDB's ordering would otherwise
drift in the last ulp).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, Optional[str]]] = {}


def register(name: str, fn: QueryFn, oracle: Optional[str]) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query name {name}")
    _REGISTRY[name] = (fn, oracle)


#: Driver-facing ordering.  The round-2/3 driver recorded correctness rows
#: for exactly the FIRST 50 registered queries, so registration order decides
#: which gates get driver-side evidence.  Queries named here are emitted
#: first, in this order; everything else follows in registration order.
#: r4 policy: the 21 queries the r2/r3 driver never checked (events, store,
#: codec, bigram LM, end-to-end) plus this round's new/merged gates lead;
#: gates with two rounds of green driver history absorb the overflow.
#: Rotate this list in later rounds so every gate accumulates driver rows.
_DRIVER_PRIORITY = [
    # never driver-checked through r3 — events/streaming/as-of (§2.9, §2.3)
    "events_tumbling_counts", "events_sliding_windows", "events_sessionize",
    "events_topk_per_type", "asof_join_events_orders", "events_range_join",
    "events_stream_tumbling", "events_stream_stateful", "events_stream_dedup",
    # never driver-checked through r3 — store/codec/reactive (§2.1, §2.2)
    "store_scan_documents", "store_point_lookup", "store_natural_order",
    "store_readpath_union", "store_export_at", "codec_zip_manifest",
    "reactive_dag_cascade", "lens_incremental_rebuild", "store_delta_read",
    "attachments_gc_sweep", "codec_transcode_roundtrip",
    # never driver-checked through r3 — pipeline tail
    "text_bigram_lm", "pipeline_end_to_end",
    # new or newly-merged gates this round (no driver history yet)
    "multimodal_gif_frames", "text_profile", "text_samples",
    "ann_topk_methods", "q_semi_anti_joins", "q_approx_aggregates",
    # scale-path dedup operators: keep fresh driver rows over the simpler
    # exact/ngram gates when the 50-row budget forces a choice
    "dedup_minhash_pairs", "dedup_minhash_components",
]


def all_queries() -> dict[str, tuple[QueryFn, Optional[str]]]:
    # import side-effect registration
    from . import relational  # noqa: F401

    try:
        from . import lens_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from . import pipeline_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from . import events_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from . import store_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from . import codec_queries  # noqa: F401
    except ImportError:
        pass
    ordered: dict[str, tuple[QueryFn, Optional[str]]] = {}
    for name in _DRIVER_PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, entry in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = entry
    return ordered
