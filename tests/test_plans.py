"""Physical-plan regression tests: the scale properties we rely on —
pushdown, join elimination, shuffle avoidance, no cartesian products —
asserted on ``explain`` output so a plan regression fails CI instead of
silently costing 10x at the next scale factor.

These intentionally test the PLAN, not the result (correctness is the oracle
gate's job): e.g. a single-segment ``read_df`` must not shuffle, a first
lens build must not join against its empty cache, and the LSH candidate
joins must never degrade to ``CartesianProduct``.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from pigeon_optics_spark.store import DatasetStore, empty_local_df


def plan_of(df, mode: str = "simple") -> str:
    """The plan as a string — "simple" = physical plan only (what the
    no-Exchange / no-Join assertions must run against: parsed/analyzed
    plans legitimately still contain pre-optimization joins), "formatted"
    for scan detail (PushedFilters / ReadSchema)."""
    jdf = df._jdf
    try:
        return jdf.queryExecution().explainString(
            df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString(mode))
    except Exception:  # noqa: BLE001 — fallback for API drift
        return jdf.queryExecution().toString()


@pytest.fixture(scope="module")
def store(spark):
    st = DatasetStore(tempfile.mkdtemp(prefix="po_plans_"))
    st.create("t", "docs")
    st.write_entries("t", "docs", [(f"r{i}", {"n": i}) for i in range(50)])
    return st


def test_single_segment_read_has_no_exchange(spark, store):
    """One-segment logs (fresh ingest / post-compaction) must skip the
    latest-wins window: no Exchange, no Window in the plan."""
    df = store.read_df(spark, "t", "docs")
    p = plan_of(df)
    assert "Exchange" not in p
    assert "Window" not in p


def test_point_lookup_filter_reaches_scan(spark, store):
    """record_id equality must push into the parquet scan."""
    df = store.read_df(spark, "t", "docs").where(F.col("record_id") == "r7")
    p = plan_of(df, "formatted")
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert pushed and "EqualTo(record_id,r7)" in pushed[0], p


def test_column_pruning_reaches_scan(spark, store):
    """A 2-column projection must not read the fat value column."""
    df = store.read_df(spark, "t", "docs").select("record_id", "version")
    p = plan_of(df, "formatted")
    assert "ReadSchema" in p
    # the value/hash/links columns must be pruned from the scan
    scan_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "value" not in scan_schema
    assert "links" not in scan_schema


def test_join_against_empty_collection_is_eliminated(spark, store):
    """empty_local_df is a local relation: PropagateEmptyRelation must
    delete joins against an empty collection at plan time (a first lens
    build skips its cache-diff join this way)."""
    empty = spark.createDataFrame([], "record_id string, version long")
    # the helper, not createDataFrame: ExistingRDD scans don't fold
    st2 = DatasetStore(tempfile.mkdtemp(prefix="po_plans2_"))
    st2.create("t", "nothing")
    cur = store.read_df(spark, "t", "docs")
    cached = st2.read_df(spark, "t", "nothing").select("record_id", "version")
    joined = cur.join(cached.withColumnRenamed("version", "cv"),
                      "record_id", "left")
    p = plan_of(joined)
    assert "Join" not in p, p
    assert "Exchange" not in p, p
    del empty


def test_empty_local_df_unions_fold(spark):
    """Unions with the empty relation disappear from the plan."""
    base = spark.range(10).select(F.col("id").cast("string").alias("record_id"))
    e = empty_local_df(spark, "record_id string")
    p = plan_of(base.unionByName(e))
    assert "Union" not in p


def test_minhash_candidates_no_cartesian(spark, sf_dir):
    from pigeon_optics_spark.pipeline.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id"), F.col("text"))
    pairs = minhash_lsh_pairs(docs)
    p = plan_of(pairs)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_ann_lsh_no_cartesian(spark, sf_dir):
    from pigeon_optics_spark.pipeline.similarity import lsh_bucketed_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.limit(5)
    res = lsh_bucketed_topk(q, emb, k=3)
    p = plan_of(res)
    assert "CartesianProduct" not in p


def test_lens_map_phase_runs_at_session_parallelism(spark, store):
    """The CPU-bound exec stage must be repartitioned to the session's
    parallelism, not whatever the scan left (AQE's IO-sized coalesce
    under-parallelizes Python stages ~30x on large deltas)."""
    from pigeon_optics_spark.lens import build_lens, create_lens

    create_lens(store, "t", "plens", inputs=["/datasets/t:docs"],
                code="output('k', 1)")
    # the repartition is part of the build plan; assert on the build result
    # plus the documented invariant marker in the source
    import inspect

    import pigeon_optics_spark.lens as lens_mod
    src = inspect.getsource(lens_mod.build_lens)
    assert "fresh.repartition(spark.sparkContext.defaultParallelism)" in src
    stats = build_lens(spark, store, "t", "plens")
    assert stats["mapped"] == 50


def test_contamination_bench_side_broadcasts(spark, sf_dir):
    """The benchmark n-gram set must broadcast (eval sets are bounded) —
    a shuffle join here would shuffle corpus-scale gram volume."""
    from pigeon_optics_spark.pipeline.text import ngram_contamination

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = plan_of(ngram_contamination(docs))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_pack_sequences_window_is_sharded(spark, sf_dir):
    """Packing must partition its window by shard — an unpartitioned window
    serializes the corpus through a single task."""
    from pigeon_optics_spark.pipeline.text import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = plan_of(pack_sequences(docs), "formatted")
    # the window's required distribution is hashpartitioning on shard, not
    # a SinglePartition sort
    assert "hashpartitioning(shard" in p


def test_pq_topk_query_side_broadcasts(spark, sf_dir):
    from pigeon_optics_spark.pipeline.similarity import pq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    p = plan_of(pq_topk(emb.where(F.col("vec_id") < 5), emb))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_stratified_sample_is_scan_plus_filter(spark, sf_dir):
    """The sampler must stay a pure filter over the scan — no shuffle, no
    join; rebalancing a 100 TB mix is a map-only pass."""
    from pigeon_optics_spark.pipeline.text import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = plan_of(stratified_sample(docs, {"en": 0.25}, default_rate=0.75))
    assert "Exchange" not in p
    assert "Join" not in p
