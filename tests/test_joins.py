"""Skew-mitigation strategies (joins.py): the rewrites must be
result-identical to the naive plans and must actually spread the hot key
(salt participates in the join/shuffle keys)."""

from pyspark.sql import functions as F

from pigeon_optics_spark.joins import (SALT_COL, salted_join,
                                       skew_safe_count_distinct)
from tests.test_plans import plan_of


def _skewed(spark):
    # 10k rows of one hot key + a tail, joined against a 5-row dim
    left = spark.range(10_000).select(
        F.when(F.col("id") < 9_000, F.lit(0)).otherwise(F.col("id") % 5)
        .cast("long").alias("k"),
        F.col("id").alias("payload"))
    right = spark.range(5).select(F.col("id").alias("k"),
                                  (F.col("id") * 100).alias("dim"))
    return left, right


def test_salted_join_matches_plain_inner(spark):
    left, right = _skewed(spark)
    plain = left.join(right, ["k"]).orderBy("payload").collect()
    salted = salted_join(left, right, ["k"], salt=8) \
        .orderBy("payload").collect()
    assert [r.asDict() for r in salted] == [r.asDict() for r in plain]


def test_salted_join_matches_plain_left(spark):
    left, right = _skewed(spark)
    right_partial = right.where(F.col("k") < 3)  # leave unmatched left rows
    plain = left.join(right_partial, ["k"], "left") \
        .orderBy("payload").collect()
    salted = salted_join(left, right_partial, ["k"], "left", salt=8) \
        .orderBy("payload").collect()
    assert [r.asDict() for r in salted] == [r.asDict() for r in plain]


def test_salted_join_salt_is_a_join_key(spark):
    left, right = _skewed(spark)
    p = plan_of(salted_join(left, right, ["k"], salt=8))
    assert SALT_COL in p  # the salt reaches the physical join keys
    assert "CartesianProduct" not in p


def test_salted_join_rejects_outer(spark):
    left, right = _skewed(spark)
    try:
        salted_join(left, right, ["k"], how="full")
    except ValueError:
        return
    raise AssertionError("full outer must be rejected")


def test_skew_safe_count_distinct_matches_naive(spark):
    left, _ = _skewed(spark)
    df = left.select("k", (F.col("payload") % 97).alias("v"))
    naive = {r["k"]: r["n"] for r in
             df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()}
    safe = {r["k"]: r["n_distinct"] for r in
            skew_safe_count_distinct(df, "k", "v").collect()}
    assert safe == naive


def test_skew_safe_count_distinct_spreads_first(spark):
    left, _ = _skewed(spark)
    df = left.select("k", (F.col("payload") % 97).alias("v"))
    p = plan_of(skew_safe_count_distinct(df, "k", "v"))
    # first exchange must hash on BOTH columns (the spread), not key alone
    assert "hashpartitioning(k" in p and ", v" in p


def test_salted_join_spreads_identical_duplicate_rows(spark):
    """Byte-identical hot-key rows must still spread over salts — a
    content-derived salt would put them all in one bucket and recreate
    the straggler the helper exists to remove."""
    from pyspark.sql import functions as F2

    left = spark.range(4_000).select(F2.lit(0).cast("long").alias("k"),
                                     F2.lit("same").alias("payload"))
    right = spark.range(1).select(F2.col("id").alias("k"),
                                  F2.lit(1).alias("dim"))
    salted = left.withColumn(
        SALT_COL, F2.pmod(F2.monotonically_increasing_id(), F2.lit(8))
        .cast("int"))
    n_buckets = salted.select(SALT_COL).distinct().count()
    assert n_buckets == 8
    # and the join result is still the plain join
    assert salted_join(left, right, ["k"], salt=8).count() == \
        left.join(right, ["k"]).count() == 4_000


def test_skew_safe_count_distinct_null_semantics(spark):
    """NULL values are ignored (countDistinct semantics) and an all-NULL
    key still appears with 0."""
    from pyspark.sql import functions as F2

    df = spark.createDataFrame(
        [(1, None), (1, 5), (2, None), (3, 7), (3, 7)],
        "k long, v long")
    naive = {r["k"]: r["n"] for r in
             df.groupBy("k").agg(F2.countDistinct("v").alias("n")).collect()}
    safe = {r["k"]: r["n_distinct"] for r in
            skew_safe_count_distinct(df, "k", "v").collect()}
    assert safe == naive == {1: 1, 2: 0, 3: 1}


# ---------------------------------------------------------------------------
# Z-order layout (pipeline.layout)
# ---------------------------------------------------------------------------


def _py_morton(vals, bits):
    z = 0
    n = len(vals)
    for i in range(bits):
        for d, v in enumerate(vals):
            z |= (((v & ((1 << bits) - 1)) >> i) & 1) << (i * n + d)
    return z


def test_morton_key_matches_python_reference(spark):
    from pyspark.sql import functions as F

    from pigeon_optics_spark.pipeline.layout import morton_key

    rows = [(x, y) for x in (0, 1, 5, 63, 64, 1023) for y in
            (0, 2, 7, 63, 512, 1023)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", morton_key(["x", "y"], bits=10)
                    .alias("z")).collect()
    for r in got:
        assert r["z"] == _py_morton([r["x"], r["y"]], 10), (r["x"], r["y"])


def test_morton_three_dims_and_masking(spark):
    from pigeon_optics_spark.pipeline.layout import morton_key

    # values wider than `bits` must be masked, not alias into high lanes
    df = spark.createDataFrame([(1 + (1 << 40), 2, 3)],
                               "a long, b long, c long")
    z = df.select(morton_key(["a", "b", "c"], bits=4).alias("z")) \
        .collect()[0]["z"]
    assert z == _py_morton([1, 2, 3], 4)


def test_zorder_repartition_disjoint_curve_segments(spark):
    from pyspark.sql import functions as F

    from pigeon_optics_spark.pipeline.layout import (
        morton_key, zorder_repartition,
    )

    df = spark.range(0, 4096).select(
        (F.col("id") % 61).alias("x"), (F.col("id") % 53).alias("y"))
    laid = zorder_repartition(df, ["x", "y"], bits=6, num_partitions=8)
    # recompute the key after layout; partitions must hold disjoint,
    # contiguous z ranges (the property parquet min/max pruning needs)
    spans = (laid.withColumn("z", morton_key(["x", "y"], bits=6))
             .withColumn("pid", F.spark_partition_id())
             .groupBy("pid").agg(F.min("z").alias("lo"),
                                 F.max("z").alias("hi"),
                                 F.count("*").alias("n"))
             .orderBy("lo").collect())
    assert sum(r["n"] for r in spans) == 4096
    assert len(spans) > 1
    for a, b in zip(spans, spans[1:]):
        assert a["hi"] <= b["lo"], spans
    # schema untouched
    assert laid.columns == ["x", "y"]


def test_morton_key_rejects_overflowing_lanes(spark):
    import pytest as _pytest

    from pigeon_optics_spark.pipeline.layout import morton_key

    with _pytest.raises(ValueError, match="exceeds 63"):
        morton_key(["a"] * 7, bits=10)
    with _pytest.raises(ValueError, match="at least one"):
        morton_key([], bits=4)


def test_zorder_layout_beats_single_column_sort_for_box_pruning(spark, tmp_path):
    """The reason Z-order exists: for a 2-D box predicate, file-level
    min/max stats prune MORE files under Z-layout than under a
    single-column sort (which scrambles the second dimension).  This is
    the parquet row-group/file skipping mechanism measured end-to-end on
    real written files."""
    from pyspark.sql import functions as F

    from pigeon_optics_spark.pipeline.layout import zorder_repartition

    n, parts = 1 << 14, 16
    df = spark.range(0, n).select(
        (F.col("id") % 127).alias("x"),
        ((F.col("id") * 37) % 127).alias("y"))

    zdir, sdir = str(tmp_path / "z"), str(tmp_path / "s")
    zorder_repartition(df, ["x", "y"], bits=7,
                       num_partitions=parts).write.parquet(zdir)
    (df.repartitionByRange(parts, "x").sortWithinPartitions("x")
     .write.parquet(sdir))

    def files_overlapping_box(path, x0, x1, y0, y1):
        stats = (spark.read.parquet(path)
                 .groupBy(F.input_file_name().alias("f"))
                 .agg(F.min("x").alias("xlo"), F.max("x").alias("xhi"),
                      F.min("y").alias("ylo"), F.max("y").alias("yhi"))
                 .collect())
        total = len(stats)
        hit = sum(1 for r in stats
                  if r["xhi"] >= x0 and r["xlo"] <= x1
                  and r["yhi"] >= y0 and r["ylo"] <= y1)
        return hit, total

    # the adversarial predicate for a single-column layout: unbounded in
    # the sort column, narrow in the OTHER one.  x-sort files each span
    # (nearly) all y, so min/max stats prune ~nothing; under Z-order the
    # key's high bits alternate dimensions, so a narrow y band maps to a
    # few curve segments and most files are skipped outright.
    zhit, ztot = files_overlapping_box(zdir, 0, 126, 10, 20)
    shit, stot = files_overlapping_box(sdir, 0, 126, 10, 20)
    assert ztot >= parts and stot >= parts
    assert shit >= stot - 1, (shit, stot)      # x-sort: ~no pruning
    assert zhit * 2 <= shit, (zhit, ztot, shit, stot)  # z: >=2x fewer
