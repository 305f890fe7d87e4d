"""Unit tests for the r6 pack helpers (queries/_util.pack_union /
pack_oracle): the coercion discipline that keeps NULL-padded pack columns
from ever splitting int-vs-float between Spark and DuckDB."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pigeon_optics_spark.queries._util import pack_oracle, pack_union


def test_coercion_and_null_padding(spark):
    a = spark.range(2).select(
        F.col("id").alias("k"),                       # bigint -> double
        (F.col("id") == 0).alias("flag"),              # bool -> string
        F.lit("x").alias("s"))                         # string unchanged
    b = spark.range(2).select(
        F.col("id").cast("int").alias("k"),            # int -> double
        F.to_date(F.lit("2024-01-05")).alias("d"))     # date -> string
    out = pack_union([("a", a), ("b", b)])
    dt = dict(out.dtypes)
    assert dt == {"part": "string", "k": "double", "flag": "string",
                  "s": "string", "d": "string"}
    rows = {(r["part"], r["k"]): r for r in out.collect()}
    assert rows[("a", 0.0)]["flag"] == "true"
    assert rows[("a", 0.0)]["d"] is None          # NULL-padded
    assert rows[("b", 1.0)]["d"] == "2024-01-05"  # ISO rendering
    assert rows[("b", 1.0)]["s"] is None


def test_decimal_and_timestamp_refused(spark):
    dec = spark.range(1).select(F.lit(1).cast("decimal(10,2)").alias("m"))
    with pytest.raises(TypeError, match="decimal"):
        pack_union([("d", dec)])
    ts = spark.range(1).select(F.current_timestamp().alias("t"))
    with pytest.raises(TypeError, match="timestamp"):
        pack_union([("t", ts)])


def test_cross_part_type_conflict_refused(spark):
    """The same column name coercing to string in one part and double in
    another would make both engines silently re-coerce (with
    engine-specific double rendering) — a guaranteed hash split.  The
    runtime path must refuse, mirroring tools/gen_pack.py's CONFLICT
    rule."""
    a = spark.range(1).select(F.lit("x").alias("v"))       # -> string
    b = spark.range(1).select(F.col("id").alias("v"))      # -> double
    with pytest.raises(TypeError, match="conflicts|coerces"):
        pack_union([("a", a), ("b", b)])
    # same-type across parts stays fine
    c = spark.range(1).select(F.col("id").cast("int").alias("v"))
    out = pack_union([("b", b), ("c", c)])
    assert dict(out.dtypes)["v"] == "double"


def test_part_column_collision_refused(spark):
    df = spark.range(1).select(F.lit("x").alias("part"))
    with pytest.raises(ValueError, match="'part' column"):
        pack_union([("a", df)])


def test_pack_oracle_mirrors_union_by_name():
    sql = pack_oracle([
        ("a", "SELECT 1 AS k, TRUE AS flag", {"k": "DOUBLE",
                                              "flag": "VARCHAR"}),
        ("b", "SELECT 2 AS k, DATE '2024-01-05' AS d", {"k": "DOUBLE",
                                                        "d": "VARCHAR"}),
    ])
    pdf = duckdb.sql(sql).df().sort_values("part").reset_index(drop=True)
    assert list(sorted(pdf.columns)) == ["d", "flag", "k", "part"]
    assert pdf["k"].tolist() == [1.0, 2.0]
    assert pdf["flag"].tolist()[0] == "true"   # DuckDB bool->varchar
    assert pdf["d"].tolist()[1] == "2024-01-05"
    assert pdf["d"].isna().tolist() == [True, False]  # NULL-padded


def test_driver_window_invariants():
    """The driver records rows for the FIRST 50 registered gates: the
    priority list must be exactly 50 unique names, every one present in
    the registry, and all_queries() must emit them first in order."""
    from pigeon_optics_spark.queries import _DRIVER_PRIORITY, all_queries

    assert len(_DRIVER_PRIORITY) == 50
    assert len(set(_DRIVER_PRIORITY)) == 50
    qs = all_queries()
    missing = [n for n in _DRIVER_PRIORITY if n not in qs]
    assert not missing, missing
    assert list(qs)[:50] == _DRIVER_PRIORITY
    # every registered gate is oracle-paired (the zero-no_oracle stance)
    rows_only = [n for n, (_f, o) in qs.items() if o is None]
    assert not rows_only, rows_only
    # exact registry size: all_queries() wraps each submodule import in
    # try/except ImportError, so a real import bug in one module would
    # SILENTLY drop its whole gate population — and if none of its gates
    # sit in the 50-slot window, nothing above would notice.  Update this
    # count only with a deliberate registry change (ceiling ~215).
    assert len(qs) == 212, len(qs)
