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
#: Rotate this list every round so every gate accumulates driver rows.
#: Evidence state entering r6: 112 gates carry green r2-r5 driver rows;
#: after the r6 consolidation (71 + 20 gates merged into 28 packs) the
#: registry is 210 with a 48-gate never-driver-checked backlog OUTSIDE
#: this window — enumerate it with the snippet at the end of this list
#: (hand-maintained lists drifted twice in r5; the executable form is
#: the source of truth).  ROUND_NOTES "r7 rotation plan" orders it.
_DRIVER_PRIORITY = [
    # ===== r6 rotation window (exactly 50) — VERDICT r5 item 1. =====
    # Composition: the 20 r6 consolidation packs (each tag-unions 2-6
    # former never-driver-checked gates, so these 20 slots carry 71
    # former gates' value-hashed columns), then 30 never-driver-checked
    # singles chosen one-per-family with SURVEY-§2 parity rows first.
    # Every gate in the overflow carries a green r2-r5 driver row OR is
    # in the documented never-checked backlog (ROUND_NOTES "r7 rotation
    # plan"); the in-session invariant check verifies both properties.
    # --- consolidation packs (new names, never driver-checked) ---
    "q_scalar_semantics", "q_window_semantics", "q_query_shape_semantics",
    "q_setops_join_semantics", "q_quality_audits",
    "multimodal_container_meta", "multimodal_audio_pcm",
    "multimodal_image_pixels", "graph_structure_metrics", "graph_distances",
    "text_corpus_metrics", "text_normalize_repair", "dedup_canonical_forms",
    "dedup_pair_sketches", "emb_quantized_reps", "events_trend_folds",
    "events_user_activity", "events_value_distribution",
    "events_extract_semantics", "store_lifecycle_history",
    # --- SURVEY §2 parity rows that were pytest/local-only ---
    "store_cid_import", "store_meta_vfs", "reactive_subscribe_feed",
    "lens_markup_extract", "lens_error_capture", "store_path_escaping",
    "q_udtf_ngrams", "q_pandas_grouped_agg",
    # --- native connector (batch read / pushdown / streaming read) ---
    "store_datasource_read", "store_datasource_pushdown",
    "store_stream_source",
    # --- real Structured Streaming runs (state backends / eviction) ---
    "events_stream_rocksdb_state", "events_stream_timeout_sessions",
    "events_stream_multi_source", "events_stream_outer_join",
    "events_stream_late_drop",
    # --- TPC-H breadth (q2 + the rest keep r7 slots) ---
    "q7_nation_volume", "q12_priority_lines",
    "q20_potential_promotion", "q21_sole_late_supplier",
    # --- NEW in r6 (ships with its driver row): real uncompressed-AVI
    # frame extraction — closes the realizable slice of the last
    # env-bound stub ---
    "multimodal_video_frames",
    # --- source formats (orc/csv/json/xml/schema-evolution lead r7;
    # avro_ingest is NEW in r6 — it closes the documented Avro gap and
    # ships with its driver row per the introduce-with-evidence rule) ---
    "avro_ingest",
    # --- tranche-2 consolidation packs (each 2-4 operator surfaces —
    # they displace single-operator slots; the displaced singles
    # (xml_native_ingest, parquet_schema_evolution, text_robots_filter,
    # text_quality_classifier, dedup_bloom_membership,
    # events_geohash_density, events_pattern_matches, events_rate_limit)
    # lead the r7 window) ---
    "events_audit_metrics", "events_interval_ops", "emb_eval_metrics",
    "text_web_census", "text_sample_shuffle", "q_customer_analytics",
    "q_correlated_shapes", "store_catalog_views",
    # ===== end of the 50-slot window =====
    #
    # Never-driver-checked backlog AFTER this window (48 gates after
    # the tranche-2 packs — lead
    # r7's window; the 14 r2/r3-history gates and flagships follow):
    # singles from waves 6-14 not listed above — enumerate with
    #   python -c "import json,glob; from pigeon_optics_spark.queries
    #   import all_queries; rows=set().union(*[json.load(open(f)) for f
    #   in glob.glob('CORRECTNESS_r*.json')]);
    #   print([q for q in all_queries() if q not in rows])"
    # (kept executable rather than as a hand-maintained list — the r5
    # hand-lists drifted twice.)
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
