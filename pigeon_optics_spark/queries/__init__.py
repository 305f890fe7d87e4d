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
    # ===== r12 refresh window (exactly 50) — VERDICT r11 item 4. =====
    # Refreshes the OLDEST driver rows.  Computed executably at r12
    # start from CORRECTNESS_r*.json ∩ the live registry (histogram
    # entering r12: r7×12 r8×50 r9×50 r10×50 r11×50) and matches the
    # VERDICT r11 prediction name-for-name.  Ordered (round, name) —
    # the 12 remaining r7-history gates, then the first 38 r8-history
    # gates alphabetically.  The in-session invariant test verifies
    # count/uniqueness/registry membership and that all_queries()
    # emits these first.
    # --- the 12 gates whose newest row is r7 ---
    "q_salted_join", "q_status_islands", "q_zorder_curve",
    "store_datasource_write", "store_stream_replicate", "text_pmi_pairs",
    "text_quality_classifier", "text_robots_filter",
    "text_span_dedup_removal", "text_vocab_ids", "text_winsorize",
    "xml_native_ingest",
    # --- first 38 r8-history gates, alphabetical ---
    "ann_topk_methods", "asof_join_events_orders",
    "codec_transcode_roundtrip", "codec_zip_manifest",
    "dedup_embedding_pairs", "dedup_exact_documents",
    "dedup_minhash_components", "dedup_minhash_pairs",
    "dedup_ngram_pairs", "dedup_simhash_signatures", "emb_kmeans_assign",
    "emb_pq_codes", "emb_pq_topk", "events_range_join",
    "events_sliding_windows", "events_stream_dedup",
    "events_stream_stateful", "events_stream_tumbling",
    "events_topk_per_type", "events_tumbling_counts",
    "lens_count_orders_by_status", "lens_incremental_rebuild",
    "lens_invert_part_types", "lens_object_merge_stats",
    "lens_sum_qty_by_partkey", "multimodal_audio_meta",
    "multimodal_gif_frames", "multimodal_real_image_meta",
    "pipeline_end_to_end", "q1_pricing_summary", "q3_shipping_priority",
    "q5_region_revenue", "q_approx_aggregates", "q_cube_volumes",
    "q_distinct_suppliers_per_flag", "q_event_zscores",
    "q_exact_quantiles", "q_export_at_filter",
    # ===== end of the 50-slot window =====
    #
    # The 12 remaining r8-history gates lead the r13 window (with the
    # next-stalest gates): q_full_outer_join, q_moving_average,
    # q_orderpriority_checker, q_point_lookup_documents, q_rollup_returns,
    # q_scalar_functions, q_segment_setops, text_chunk_dedup,
    # text_contamination, text_pack_sequences, text_pii_scrub,
    # text_tfidf_top_terms.
    # Recompute staleness executably each round (the source of truth —
    # hand-lists drifted twice in r5):
    #   python -c "import json,glob,re; from pigeon_optics_spark.queries
    #   import all_queries; latest={};
    #   [latest.update({k:int(re.search(r'r(\\d+)',f).group(1)) for k in
    #   json.load(open(f))}) for f in
    #   sorted(glob.glob('CORRECTNESS_r*.json'))];
    #   print(sorted((r,k) for k,r in latest.items()
    #   if k in all_queries())[:50])"
]


def all_queries() -> dict[str, tuple[QueryFn, Optional[str]]]:
    # import side-effect registration
    import importlib
    import sys as _sys

    from . import relational  # noqa: F401

    # Optional submodules: an ImportError here means that module's whole
    # gate population silently vanishes from the registry, so shout on
    # stderr (the registry-size pin test protects pytest runs; the
    # warning protects driver runs, where only a row-count shrink would
    # otherwise hint at the loss).
    for _mod in ("lens_queries", "pipeline_queries", "events_queries",
                 "store_queries", "codec_queries"):
        try:
            importlib.import_module(f".{_mod}", __package__)
        except ImportError as exc:
            print(f"warning: queries submodule {_mod} failed to import, "
                  f"its gates are missing from the registry: {exc}",
                  file=_sys.stderr)
    ordered: dict[str, tuple[QueryFn, Optional[str]]] = {}
    for name in _DRIVER_PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, entry in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = entry
    return ordered
