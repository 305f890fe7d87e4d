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
    # ===== r7 rotation window (exactly 50) — VERDICT r6 item 1. =====
    # This is the FINAL never-driver-checked backlog: after this window
    # every gate in the 212-gate registry has at least one driver row.
    # The list was computed executably (see the snippet below) and
    # matches ROUND_NOTES "r7 window — the EXACT 50 names" verbatim;
    # the in-session invariant test verifies count/uniqueness/registry
    # membership and that all_queries() emits these first.
    # --- displaced-from-r6 singles (introduce-with-evidence debts) ---
    "xml_native_ingest", "parquet_schema_evolution", "text_robots_filter",
    "text_quality_classifier", "dedup_bloom_membership",
    "events_geohash_density", "events_pattern_matches", "events_rate_limit",
    "q2_best_value_supplier", "orc_roundtrip",
    # --- real Structured Streaming runs (shared-harness twins) ---
    "events_stream_ewma", "events_stream_holt", "events_stream_ohlc",
    "events_stream_twap", "events_stream_cusum", "events_stream_pattern",
    "events_stream_rate_limit", "events_stream_static_join",
    "events_stream_dedup_watermark",
    # --- TPC-H breadth (the remaining 10 singles) ---
    "q6_forecast_revenue", "q8_market_share", "q9_product_type_profit",
    "q10_returned_revenue", "q11_important_parts", "q14_promo_revenue",
    "q15_top_supplier", "q16_supplier_counts", "q19_disjunctive_revenue",
    "q22_idle_balance",
    # --- dirty-ingest pair + connector write half ---
    "csv_dirty_ingest", "json_dirty_ingest",
    "store_datasource_write", "store_stream_replicate",
    # --- events batch singles ---
    "events_feature_snapshot", "events_forecast_backtest",
    "events_ohlc_bars", "events_time_weighted_avg", "events_windowed_funnel",
    # --- text / dedup / graph / emb / pipeline singles ---
    "text_pmi_pairs", "text_span_dedup_removal", "text_vocab_ids",
    "text_winsorize", "corpus_curation_report", "graph_link_prediction",
    "emb_maxsim_colbert", "pipeline_decision_audit",
    # --- query-shape singles ---
    "q_salted_join", "q_status_islands", "q_zorder_curve",
    "multimodal_bmp_png_consistency",
    # ===== end of the 50-slot window =====
    #
    # Never-driver-checked backlog AFTER this window: EMPTY (this window
    # retires it).  r8 refreshes the oldest rows instead — the 14
    # r2/r3-history gates + flagships (ROUND_NOTES "r8 refresh plan").
    # Enumerate evidence state executably (the source of truth):
    #   python -c "import json,glob; from pigeon_optics_spark.queries
    #   import all_queries; rows=set().union(*[set(json.load(open(f)))
    #   for f in glob.glob('CORRECTNESS_r*.json')]);
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
