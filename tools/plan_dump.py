"""Dump ``explain("formatted")`` for headline queries to plans/<tag>/.

Usage: python tools/plan_dump.py <tag> [query ...]

Writes ``plans/<tag>/<query>_<suffix>.txt`` (suffix from $PLAN_SUFFIX,
default "before") for each named query (default: the bench HEADLINE set).
Plans are captured WITHOUT executing the query (explain only), so lens
queries — whose DataFrame is the post-build read — are built once first
(the build is the measured object; its plan shape is captured separately
via PO_LENS_TIMING runs and the emitted stage structure).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pigeon_optics_spark.queries import all_queries  # noqa: E402
from pigeon_optics_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r11"
    names = sys.argv[2:]
    if not names:
        import bench

        names = bench.HEADLINE
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan_dump")
    qs = all_queries()
    for name in names:
        if name not in qs:
            print(f"# skip unknown query {name}", file=sys.stderr)
            continue
        fn, _oracle = qs[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted")  # noqa: SLF001
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"# wrote {path} ({len(plan)} bytes)", file=sys.stderr)


if __name__ == "__main__":
    main()
