"""Focused pins for the r11 parsed-literal optimization.

The similarity/dedup modules build vector literals and the k minhash
aggregates as ONE parsed SQL expression instead of element-wise
``F.lit`` / Column-by-Column ``agg`` (each py4j round-trip costs ~1 ms
of driver wall; an 8×64 plane matrix was ~0.35 s per call site).  The
optimization claims BIT-IDENTICAL results:

- ``repr(float)`` emits the shortest decimal that round-trips, and
  Spark's parser reads double literals with Java's correctly-rounded
  ``Double.parseDouble`` → the parsed IEEE double is bit-for-bit the
  value ``F.lit`` ships via py4j;
- plain integer literals type like ``F.lit(int)``: INT when the value
  fits int32, BIGINT above;
- the ``array(min(..0..), …, min(..k-1..))`` aggregate produces the
  same rows as the per-Column ``agg(*[F.min(...).alias(...)])`` build.

These tests pin each claim against the F.lit / per-Column form so a
Spark upgrade that changes literal parsing or py4j coercion fails loud.
"""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from pigeon_optics_spark.pipeline.similarity import (
    _arr_sql_d,
    _arr_sql_i,
    _dbl_sql,
)

# hostile doubles: subnormal min/max, float max/min-normal, negative zero,
# shortest-repr-needs-17-digits cases, exponent reprs, exact decimals
HOSTILE_DOUBLES = [
    0.0, -0.0, 1.0, -1.0, 0.1, -0.001, 2.0 / 3.0,
    5e-324, -5e-324, 2.2250738585072014e-308, 1.7976931348623157e308,
    1e16, 1e+16, 1.1e-16, 9007199254740993.0, 0.30000000000000004,
    123456789.123456789, 3.141592653589793, -2.718281828459045,
]


def _bits(x: float) -> bytes:
    return struct.pack("<d", float(x))


def test_dbl_sql_bit_identical_to_lit(spark):
    """Each parsed double literal == F.lit(double), bit-for-bit."""
    cols = []
    for i, x in enumerate(HOSTILE_DOUBLES):
        cols.append(F.expr(_dbl_sql(x)).alias(f"p{i}"))
        cols.append(F.lit(float(x)).alias(f"l{i}"))
    row = spark.range(1).select(*cols).first()
    for i, x in enumerate(HOSTILE_DOUBLES):
        assert _bits(row[f"p{i}"]) == _bits(row[f"l{i}"]) == _bits(x), (
            f"double literal mismatch at {x!r}: parsed={row[f'p{i}']!r} "
            f"lit={row[f'l{i}']!r}")


def test_arr_sql_d_nested_matches_lit(spark):
    """Nested array<array<double>> parsed literal == F.lit(nested list),
    values bit-for-bit and schema identical."""
    rows = [HOSTILE_DOUBLES[:6], HOSTILE_DOUBLES[6:12]]
    df = spark.range(1).select(
        F.expr(_arr_sql_d(rows)).alias("p"), F.lit(rows).alias("l"))
    assert df.schema["p"].dataType == df.schema["l"].dataType
    row = df.first()
    assert [[ _bits(v) for v in sub] for sub in row["p"]] == \
           [[ _bits(v) for v in sub] for sub in row["l"]]


def test_arr_sql_i_types_like_lit(spark):
    """Int-array parsed literal == F.lit: INT elements for int32-fitting
    values, BIGINT above — exactly py4j's coercion."""
    small = [0, 1, -1, 2147483647, -2147483648]
    big = [2147483648, -2147483649, 2**40]
    df = spark.range(1).select(
        F.expr(_arr_sql_i(small)).alias("ps"), F.lit(small).alias("ls"),
        F.expr(_arr_sql_i(big)).alias("pb"), F.lit(big).alias("lb"))
    assert df.schema["ps"].dataType == df.schema["ls"].dataType
    assert df.schema["pb"].dataType == df.schema["lb"].dataType
    row = df.first()
    assert list(row["ps"]) == list(row["ls"]) == small
    assert list(row["pb"]) == list(row["lb"]) == big


def test_arr_sql_i_mixed_magnitude_matches_lit(spark):
    """A MIXED int array (int32-fitting next to >int32 values) must type
    and evaluate exactly like ``F.lit``: SQL's array() widens the INT
    elements to BIGINT, and py4j ships the whole list as long[] for the
    same reason (one oversized element).  SQ8 min/range literals have no
    homogeneous-width guarantee at their call sites, so the mixed case is
    the one that must not drift (ADVICE r11)."""
    mixed = [1, 2**40, -3, 2147483648, 0]
    df = spark.range(1).select(
        F.expr(_arr_sql_i(mixed)).alias("p"), F.lit(mixed).alias("l"))
    assert df.schema["p"].dataType == df.schema["l"].dataType
    row = df.first()
    assert list(row["p"]) == list(row["l"]) == mixed


def test_dbl_sql_rejects_non_finite():
    """NaN/±Inf are the only doubles whose ``repr`` Spark SQL cannot
    parse ('nanD'/'infD'); ``_dbl_sql`` must refuse them with a clear
    error instead of letting a kilobyte literal fail deep in the parser
    (ADVICE r11: the bit-identity pin otherwise never covers the known
    failure class)."""
    import math

    import pytest

    for bad in (float("nan"), float("inf"), float("-inf")):
        with pytest.raises(ValueError, match="non-finite"):
            _dbl_sql(bad)
    # the guard must not reject any finite hostile double
    for ok in HOSTILE_DOUBLES:
        assert math.isfinite(float(_dbl_sql(ok)[:-1]))


def test_minhash_parsed_agg_equals_per_column_build(spark):
    """minhash_signatures' single parsed array(min..) aggregate returns
    exactly the rows of the per-Column agg(*[F.min(...)]) formulation."""
    from pigeon_optics_spark.pipeline.dedup import (
        MERSENNE_P,
        char_shingles,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox {i % 3} jumps over {i}") for i in range(40)],
        "doc_id long, text string")
    k, n = 16, 5
    got = {r["id"]: list(r["sig"])
           for r in minhash_signatures(docs, k=k, n=n).collect()}

    ex = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(char_shingles("text", n)).alias("sh"),
    ).withColumn("h", F.md5("sh")).select(
        "id",
        F.conv(F.substring("h", 1, 15), 16, 10).cast("long").alias("a"),
        F.conv(F.substring("h", 17, 14), 16, 10).cast("long").alias("b"),
    )
    mins = ex.groupBy("id").agg(*[
        F.min((F.col("a") + F.lit(i) * F.col("b")) % F.lit(MERSENNE_P)).alias(f"_h{i}")
        for i in range(k)
    ])
    ref = {r["id"]: [r[f"_h{i}"] for i in range(k)] for r in mins.collect()}
    assert got == ref
