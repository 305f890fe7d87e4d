"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` in DuckDB
over the same parquet dir, then compares row count, column names, and values
(columns sorted by name, rows sorted by all columns, exact equality — with a
numeric drift report when exactness fails).

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
        python tools/check_oracle.py [sf_dir] --prefix events_stream,graph
        python tools/check_oracle.py [sf_dir] --changed [base_ref]

``query ...`` runs the named gates only; ``--prefix a,b`` runs every gate
whose name starts with one of the comma-separated prefixes (family filter);
``--changed`` runs the gates whose registering module changed vs git
``base_ref`` (default HEAD) — the per-wave discipline filter.

Runtime budget (recorded r6): the FULL registry (210 gates) at sf0.01 is
~300 s of pure query time — ~10-15 min wall on a calm host, 30-40 min when
competing with another Spark session; a single family via --prefix is
usually < 2 min.  Use the filters per-wave and save full runs for round
start / session close.
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pigeon_optics_spark.queries import all_queries  # noqa: E402
from pigeon_optics_spark.queries._util import TABLES  # noqa: E402
from pigeon_optics_spark.session import get_spark  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for a stable total sort across dtypes incl. None
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns), kind="mergesort").index
    return df.loc[order].reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for col in s.columns:
        sv, dv = s[col], d[col]
        # int-on-one-side / float-on-the-other is a FAILURE even when the
        # values coerce equal: the driver's value-hash sees the dtype split
        # (r4 events_sessionize — DuckDB windowed SUM is HUGEINT, pandas
        # materializes float64, Spark emits int64; this checker's numeric
        # coercion masked it and only the driver row went red).
        if (pd.api.types.is_integer_dtype(sv)
                != pd.api.types.is_integer_dtype(dv)) \
                and (pd.api.types.is_numeric_dtype(sv)
                     and pd.api.types.is_numeric_dtype(dv)):
            problems.append(
                f"col {col}: dtype split spark={sv.dtype} duck={dv.dtype} "
                f"(driver hash WILL mismatch — cast the oracle, e.g. "
                f"windowed int SUM AS BIGINT)")
            continue
        # NOTE: integer WIDTH splits (int32 vs int64) are deliberately NOT
        # flagged.  A strict width check was tried in r5 and immediately
        # flagged 20 queries (store_scan_documents, text_profile,
        # q_top3_customers_per_nation, ...) that all carry GREEN r4 driver
        # rows — empirical proof the driver's value-hash compares integer
        # VALUES across widths and only the int-vs-float split (above)
        # breaks it.
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
            svf = pd.to_numeric(sv, errors="coerce").astype(float)
            dvf = pd.to_numeric(dv, errors="coerce").astype(float)
            both_nan = svf.isna() & dvf.isna()
            exact = (svf == dvf) | both_nan
            if not exact.all():
                drift = (svf - dvf).abs().max()
                problems.append(f"col {col}: {int((~exact).sum())} value diffs, max abs drift {drift!r}")
        else:
            sv2 = sv.map(lambda x: repr(x))
            dv2 = dv.map(lambda x: repr(x))
            if not (sv2 == dv2).all():
                n = int((sv2 != dv2).sum())
                i = (sv2 != dv2).idxmax()
                problems.append(f"col {col}: {n} value diffs, e.g. {sv2[i]} vs {dv2[i]}")
    return problems


def _changed_gates(base_ref: str) -> set[str] | None:
    """Gates registered in query modules that differ vs ``base_ref`` in git
    (uncommitted changes count against HEAD).  Returns ``None`` to mean
    "run EVERYTHING": a shared module (_util / _streaming_util) changed,
    so every gate is potentially affected.  Caveat (documented): the map
    is register()-call-per-file — a gate whose function lives in module A
    but whose (pack) registration lives in module B is attributed to B's
    gates only; run the pack by name when editing cross-module parts."""
    import re
    import subprocess
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        ["git", "diff", "--name-only", base_ref, "--",
         "pigeon_optics_spark/"],
        capture_output=True, text=True, cwd=root)
    if proc.returncode != 0:
        raise SystemExit(
            f"--changed: git diff failed for ref {base_ref!r}: "
            f"{proc.stderr.strip()}")
    files = proc.stdout.splitlines()  # not .split(): paths may have spaces
    names: set[str] = set()
    for path in files:
        base = os.path.basename(path)
        if not path.endswith(".py"):
            continue
        if not path.startswith("pigeon_optics_spark/queries/"):
            # engine module changed — gates depending on it aren't
            # file-mappable; run everything
            return None
        if base in ("_util.py", "_streaming_util.py", "__init__.py"):
            return None  # shared infrastructure: every gate is suspect
        full = os.path.join(root, path)
        if not os.path.exists(full):
            continue
        with open(full) as f:
            names.update(re.findall(r'register\(\s*"([^"]+)"', f.read()))
    return names


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and not args[0].startswith("--"):
        sf_dir = args.pop(0)
    explicit: set[str] = set()
    prefixes: tuple[str, ...] = ()
    changed_given = False
    infra_changed = False
    changed_names: set[str] = set()
    i = 0
    while i < len(args):
        if args[i] == "--prefix":
            prefixes = tuple(args[i + 1].split(","))
            i += 2
        elif args[i] == "--changed":
            if i + 1 < len(args) and not args[i + 1].startswith("--"):
                base, i = args[i + 1], i + 2
            else:
                base, i = "HEAD", i + 1
            changed_given = True
            changed = _changed_gates(base)
            if changed is None:
                infra_changed = True
            else:
                changed_names |= changed
        else:
            explicit.add(args[i])
            i += 1
    # combine the three filter sources AFTER the parse loop, so flag
    # order can never change the result
    if infra_changed:
        # shared infra changed: every gate is suspect — drop explicit
        # names / --prefix filters and say so
        explicit.clear()
        prefixes = ()
        changed_names.clear()
        print("--changed: shared engine/infra module changed — running "
              "the FULL registry (explicit name/--prefix filters cleared)")
    elif changed_given and not changed_names:
        print("--changed: no query-module diffs")
        if not explicit and not prefixes:
            print("nothing to run")
            return 0
        # explicitly requested names / prefixes still run
    only = explicit | changed_names
    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = all_queries()
    n_fail = 0
    n_run = 0
    for name, (fn, oracle) in sorted(qs.items()):
        # explicit names and --prefix UNION (an explicitly named gate
        # always runs, whether or not it matches the prefix filter)
        if (only or prefixes) and not (
                name in only or (prefixes and name.startswith(prefixes))):
            continue
        n_run += 1
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
            # capture inside the try so the reported wall time excludes
            # the finally's cache-teardown (keeps per-gate timings
            # comparable with pre-r9 rounds)
            t1 = time.time()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        finally:
            # several gates deliberately leave a persisted frame behind
            # for their returned (now consumed) plan; 212 gates in one
            # session otherwise accumulate them until eviction thrashes
            # later gates' own persists (the r9 lens-leak class).  Same
            # hygiene as bench.py.
            spark.catalog.clearCache()
        if oracle is None:
            print(f"okNR {name}: rows={len(spark_pdf)} (no oracle, rows-only) [{t1-t0:.1f}s]")
            continue
        try:
            duck_pdf = con.execute(oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            n_fail += 1
            print(f"FAIL {name}: rows={len(spark_pdf)} [{t1-t0:.1f}s]")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"ok   {name}: rows={len(spark_pdf)} [{t1-t0:.1f}s]")
    ran = n_run if (only or prefixes) else len(qs)
    print(f"\n{n_fail} failures / {ran} queries run ({len(qs)} registered)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
