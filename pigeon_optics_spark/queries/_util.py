"""Shared helpers for oracle-checked queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    if table == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark can only read
        # as LONG nanos; the conf is runtime-settable, so set it here rather
        # than relying on the session builder (external harnesses build their
        # own sessions).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` as a proper (session-UTC) TIMESTAMP.

    The driver's parquet has shipped two encodings across rounds, both
    handled here so the queries are storage-agnostic:

    - TIMESTAMP(NANOS): Spark lacks nanos; with
      ``spark.sql.legacy.parquet.nanosAsLong`` the column arrives as LONG
      nanos and is floor-divided to micros JVM-side (DuckDB's
      TIMESTAMP_NS→TIMESTAMP cast truncates identically).
    - TIMESTAMP(MICROS, isAdjustedToUTC=false) (the r4 testdata): Spark
      reads TIMESTAMP_NTZ; cast to TIMESTAMP — the session timezone is
      pinned UTC (session.py), so the wall-clock reinterpretation is the
      identity and epoch arithmetic (unix_micros, windows) matches DuckDB's
      naive-TIMESTAMP semantics bit-for-bit.
    """
    from pyspark.sql import functions as F

    ev = load(spark, sf_dir, "events")
    ts_type = dict(ev.dtypes)["ts"]
    if ts_type in ("bigint", "long"):
        # integer division — double division would lose precision at 1e18 nanos
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return ev


def tracked_mkdtemp(prefix: str) -> str:
    """mkdtemp + atexit removal — the fixture-dir discipline.  Cached
    fixture/source/checkpoint dirs otherwise accumulate in /tmp across
    suite and gate runs (one per prefix per process)."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def dsum(expr: str, alias: str, scale: int = 4) -> str:
    """Order-independent floating-point SUM (identical in Spark & DuckDB).

    ``SUM(double)`` is accumulation-order-dependent in the last ulp; Spark's
    partial/final aggregation order differs from DuckDB's scan order, so a raw
    double sum can hash-mismatch.  Casting each addend to DECIMAL makes the sum
    exact and order-free; the final cast back to DOUBLE is deterministic.
    This also reflects the 100 TB stance: decimal partial aggregation is
    map-side combinable, so the plan shape is unchanged.
    """
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(28,{scale}))) AS DOUBLE) AS {alias}"


# NOTE (r4 driver, events_sessionize): DuckDB's *windowed* SUM over an
# integer column returns HUGEINT (int128).  pandas has no int128 dtype and
# materializes it as float64, while Spark's SUM(int) is LONG — the driver's
# value-hash then mismatches on numerically identical results (5.0 vs 5).
# Any oracle windowed integer SUM must be wrapped CAST(... AS BIGINT);
# plain COUNT(*) / ROW_NUMBER() are BIGINT already and safe.

# NOTE (found at sf0.1, q_cube_volumes): the final decimal->double cast is
# itself an engine-divergence class at large magnitudes.  DuckDB computes
# int128 * 10^-scale in FLOAT arithmetic (1 ulp off around ~2e10 with
# scale 8); Spark rounds correctly via BigDecimal.doubleValue().  When a
# summed magnitude approaches ulp(x) ~ 10^-scale, bounce the ORACLE's cast
# through VARCHAR (decimal->varchar is exact, varchar->double correctly
# rounded): CAST(CAST(SUM(...) AS VARCHAR) AS DOUBLE).


#: Exact-decimal money expressions.  The synthetic money columns hold true
#: 2-decimal values stored as doubles (~1e-14 away from any rounding
#: midpoint), so casting each OPERAND to a tight decimal is exact and
#: engine-agreed; the product/sum then stays in decimal arithmetic with no
#: double rounding anywhere.  Summing the double product instead (even into
#: a decimal accumulator) lets a single addend land on a double→decimal
#: rounding tie where Spark (HALF_UP) and DuckDB disagree — observed as a
#: one-ulp drift in q1's sum_charge at sf0.1.  Tight operand precisions
#: ((8,2) price, (3,2) rate) keep three-factor products ≤ DECIMAL(18,6), far
#: from the precision-38 cap where Spark would round.
DISC_PRICE = ("CAST(l_extendedprice AS DECIMAL(8,2))"
              " * (1 - CAST(l_discount AS DECIMAL(3,2)))")
CHARGE = DISC_PRICE + " * (1 + CAST(l_tax AS DECIMAL(3,2)))"


def dsum_exact(expr: str, alias: str) -> str:
    """SUM of an already-decimal expression, surfaced as DOUBLE."""
    return f"CAST(SUM({expr}) AS DOUBLE) AS {alias}"


def davg(expr: str, alias: str, scale: int = 4) -> str:
    """Order-independent AVG via decimal sum / count."""
    return (
        f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(28,{scale}))) AS DOUBLE)"
        f" / COUNT(*) AS DOUBLE) AS {alias}"
    )

# NOTE (r5 wave 10, events_cusum_alarms): DuckDB 1.0.0 `list_reduce` with a
# STRUCT accumulator mis-lanes struct FIELDS across the rows of a vector
# batch — one field can come back carrying another ROW's value (observed:
# final `s` right for every user, `n` permuted between users; 68/150 rows
# wrong at sf0.01, correct when the same rows run solo).  Data/batch-
# composition-dependent, so a passing spot check proves nothing.  Any
# oracle needing a multi-value sequential fold must use a LIST-typed
# accumulator ([a, b] DOUBLE[...]) — 0 mismatches across all SFs — or a
# recursive CTE.  Scalar (single-double) list_reduce folds (EWMA, bigram
# LM) are unaffected.


def ordered_pairs_col(items, a_name: str, b_name: str):
    """In-row expansion of a SORTED array into its ordered pairs
    (items[i], items[j]) for i < j — the shared basket/overlap/edge
    idiom (one shuffle-free explode instead of a self-join).

    ``items`` is a Column of sorted arrays; returns an ARRAY of structs
    (a_name, b_name) ready for ``F.explode``.  The slice guard keeps the
    inner transform in-bounds on 1-element arrays (Spark ``sequence``/
    ``slice`` with a non-positive length is an error, not empty).
    """
    from pyspark.sql import functions as F

    return F.flatten(F.transform(
        items,
        lambda a, i: F.transform(
            F.slice(items, i + 2, F.greatest(F.size(items) - i - 1,
                                             F.lit(1))),
            lambda b: F.struct(a.alias(a_name), b.alias(b_name)))))

# NOTE (r5 wave 10 review, text_readability): Java regex \s matches
# vertical tab \x0B; RE2 (DuckDB) \s does not.  Dormant while the corpus
# has no VT chars, but any oracle pairing Spark split/regexp with DuckDB
# string_split_regex should spell the class explicitly
# ('[ \t\n\x0B\f\r]+') instead of \s.  Pre-wave-10 gates keep their
# driver-row-pinned \s forms (hash_bucket precedent); new gates use the
# explicit class.


# --------------------------------------------------------------------------
# r6 gate consolidation: tag-union "pack" gates.  The driver records
# correctness rows for 50 gates/round, so sibling never-driver-checked
# gates are merged into one slot — each former gate keeps EVERY one of its
# value-hashed columns, tagged by a ``part`` column, so no operator-hash
# coverage is lost (the text_profile / ann_topk_methods precedent extended
# to heterogeneous schemas).
#
# Dtype discipline (the r4 events_sessionize HUGEINT lesson, generalized):
# NULL-padding a column that exists in only some parts must never create
# an int-on-one-side / float-on-the-other split between Spark and DuckDB
# (pandas materializes a nulled int64 as float64; the driver hash sees the
# split).  So packs coerce EVERY column to one of two types on BOTH sides:
#   - numerics (int/long/float/double) -> DOUBLE.  int->double is exact
#     and engine-identical below 2^53; every packed integer column is
#     audited below that at all SFs.  DECIMAL is REFUSED (the documented
#     DuckDB decimal->double 1-ulp class) — cast to double in the sub-gate
#     first, where it is already hash-proven.
#   - boolean / date -> STRING ('true'/'false', ISO dates — both engines
#     render identically).  TIMESTAMP is REFUSED (fractional-second
#     rendering is not audited cross-engine) — format it in the sub-gate.
# --------------------------------------------------------------------------

_PACK_NUM = ("tinyint", "smallint", "int", "bigint", "float", "double")
_PACK_STR = ("boolean", "date")


def pack_union(parts) -> DataFrame:
    """[(tag, DataFrame)] -> one tag-union DataFrame with the coercion
    discipline above; columns missing from a part are NULL-padded by
    ``unionByName(allowMissingColumns=True)``."""
    from pyspark.sql import functions as F

    outs = []
    seen: dict[str, tuple[str, str]] = {}  # col -> (coerced type, first tag)
    for tag, df in parts:
        if "part" in df.columns:
            raise ValueError(
                f"pack_union: part {tag!r} already has a 'part' column — "
                "rename it in the sub-gate")
        cols = [F.lit(tag).alias("part")]
        for f in df.schema.fields:
            t = f.dataType.simpleString()
            if t in _PACK_NUM:
                coerced = "double"
                cols.append(F.col(f.name).cast("double").alias(f.name))
            elif t in _PACK_STR:
                coerced = "string"
                cols.append(F.col(f.name).cast("string").alias(f.name))
            elif t == "string":
                coerced = "string"
                cols.append(F.col(f.name))
            elif t.startswith("string collate"):
                # collated strings re-cast to the default collation so the
                # union never silently adopts a part's collation
                coerced = "string"
                cols.append(F.col(f.name).cast("string").alias(f.name))
            else:
                raise TypeError(
                    f"pack_union: unsupported dtype {t} for column "
                    f"{f.name!r} in part {tag!r} — coerce in the sub-gate")
            # cross-part CONFLICT rule (mirrors tools/gen_pack.py): the
            # same column name coercing to string in one part and double
            # in another would make unionByName / UNION ALL BY NAME each
            # silently re-coerce with engine-specific double rendering —
            # a guaranteed hash split.  Refuse at runtime, not only in
            # the offline codegen.
            prev = seen.setdefault(f.name, (coerced, tag))
            if prev[0] != coerced:
                raise TypeError(
                    f"pack_union: column {f.name!r} coerces to {coerced} "
                    f"in part {tag!r} but to {prev[0]} in part "
                    f"{prev[1]!r} — rename one in its sub-gate")
        outs.append(df.select(*cols))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o, allowMissingColumns=True)
    return out


def pack_oracle(parts) -> str:
    """[(tag, sub_sql, {col: 'DOUBLE'|'VARCHAR'|None})] -> the DuckDB
    mirror of :func:`pack_union` (UNION ALL BY NAME null-pads missing
    columns).  The cast map per part is source-literal so the coercion is
    auditable; tools/gen_pack.py generates it from the sub-oracle types."""
    selects = []
    for tag, sql, casts in parts:
        cols = [f"'{tag}' AS part"] + [
            f'CAST("{c}" AS {t}) AS "{c}"' if t else f'"{c}"'
            for c, t in casts.items()]
        selects.append(
            "SELECT " + ", ".join(cols) + f" FROM ({sql})")
    return "\nUNION ALL BY NAME\n".join(selects)
