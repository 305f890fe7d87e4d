"""Cross-engine property fuzz for the r6 pack helpers: random tagged
parts (overlapping column names, mixed int/double/bool/string/date
columns, NULLs everywhere) packed through Spark ``pack_union`` and DuckDB
``pack_oracle`` must produce identical normalized results — the same
comparison the oracle gate applies.  28 registry gates ride these
helpers; this pins the coercion/NULL-padding contract itself, not just
the shipped cast maps."""

import datetime

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import types as T

from pigeon_optics_spark.queries._util import pack_oracle, pack_union

# column-name pool is small ON PURPOSE: collisions across parts exercise
# the NULL-padding path; the type pool per NAME is fixed so colliding
# columns always coerce to the same packed type (the gen_pack conflict
# rule — conflicting names must be renamed before packing)
_COL_TYPES = {"n": "int", "x": "double", "ok": "bool",
              "s": "string", "d": "date"}

_VALUES = {
    "int": st.one_of(st.none(), st.integers(-2**40, 2**40)),
    "double": st.one_of(st.none(), st.floats(
        allow_nan=False, allow_infinity=False, width=64,
        min_value=-1e12, max_value=1e12)),
    "bool": st.one_of(st.none(), st.booleans()),
    "string": st.one_of(st.none(), st.text(
        alphabet=st.characters(codec="ascii", categories=("L", "N")),
        max_size=8)),
    "date": st.one_of(st.none(), st.dates(
        min_value=datetime.date(1990, 1, 1),
        max_value=datetime.date(2030, 12, 31))),
}

_SPARK_T = {"int": T.LongType(), "double": T.DoubleType(),
            "bool": T.BooleanType(), "string": T.StringType(),
            "date": T.DateType()}


@st.composite
def _part(draw, tag):
    cols = sorted(draw(st.sets(st.sampled_from(sorted(_COL_TYPES)),
                               min_size=1, max_size=4)))
    n_rows = draw(st.integers(1, 4))
    rows = [tuple(draw(_VALUES[_COL_TYPES[c]]) for c in cols)
            for _ in range(n_rows)]
    return tag, cols, rows


def _sql_lit(v, typ):
    if v is None:
        return {"int": "CAST(NULL AS BIGINT)",
                "double": "CAST(NULL AS DOUBLE)",
                "bool": "CAST(NULL AS BOOLEAN)",
                "string": "CAST(NULL AS VARCHAR)",
                "date": "CAST(NULL AS DATE)"}[typ]
    if typ == "int":
        return f"CAST({v} AS BIGINT)"
    if typ == "double":
        # VARCHAR bounce (the documented _util.py class, reproduced live
        # by this very fuzz): a bare 900719925474.9375 literal is a
        # DECIMAL in DuckDB, and its decimal->double conversion can be
        # 1 ulp off; parsing the shortest repr from a string is exact
        return f"CAST('{v!r}' AS DOUBLE)"
    if typ == "bool":
        return "TRUE" if v else "FALSE"
    if typ == "string":
        return "'" + str(v).replace("'", "''") + "'"
    if typ == "date":
        return f"DATE '{v.isoformat()}'"
    raise AssertionError(typ)


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    key = pdf.astype(str)
    order = key.sort_values(by=list(pdf.columns), kind="mergesort").index
    out = pdf.loc[order].reset_index(drop=True)
    # canonical cell form: None/NaN -> sentinel, doubles -> repr
    def canon(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "<NULL>"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    return out.map(canon)


@settings(max_examples=25, deadline=None)
@given(parts=st.tuples(_part("a"), _part("b"), _part("c")))
def test_pack_union_matches_pack_oracle(spark, parts):
    spark_parts, sql_parts = [], []
    for tag, cols, rows in parts:
        schema = T.StructType(
            [T.StructField(c, _SPARK_T[_COL_TYPES[c]]) for c in cols])
        spark_parts.append((tag, spark.createDataFrame(rows, schema)))
        selects = []
        for r in rows:
            items = ", ".join(
                f"{_sql_lit(v, _COL_TYPES[c])} AS {c}"
                for c, v in zip(cols, r))
            selects.append(f"SELECT {items}")
        casts = {c: {"int": "DOUBLE", "double": "DOUBLE",
                     "bool": "VARCHAR", "date": "VARCHAR",
                     "string": None}[_COL_TYPES[c]] for c in cols}
        sql_parts.append((tag, " UNION ALL ".join(selects), casts))

    spark_pdf = pack_union(spark_parts).toPandas()
    duck_pdf = duckdb.sql(pack_oracle(sql_parts)).df()

    s, d = _normalize(spark_pdf), _normalize(duck_pdf)
    assert list(s.columns) == list(d.columns)
    assert len(s) == len(d)
    pd.testing.assert_frame_equal(s, d)
