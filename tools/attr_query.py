"""Run ONE headline query and attribute cpu (user/sys) per process.

Usage: python tools/attr_query.py <query> [sf_dir]

Prints machine-wide /proc/stat deltas over the timed window plus a
per-process table (java driver vs pyspark.daemon trees, utime/stime
including reaped children via cutime/cstime) sampled after the run —
the r10 forensics method, packaged.  Diagnostic only; never part of the
bench contract.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pigeon_optics_spark.queries import all_queries  # noqa: E402
from pigeon_optics_spark.session import get_spark  # noqa: E402


def _machine() -> dict[str, float]:
    parts = open("/proc/stat").readline().split()
    user, nice, system = (float(x) for x in parts[1:4])
    steal = float(parts[8]) if len(parts) > 8 else 0.0
    return {"user": (user + nice) / 100, "sys": system / 100,
            "steal": steal / 100}


def _procs() -> list[tuple[int, str, float, float, float, float]]:
    out = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as fh:
                st = fh.read()
            with open(f"/proc/{pid}/cmdline") as fh:
                cmd = fh.read().replace("\0", " ")[:120]
        except OSError:
            continue
        # comm can contain spaces/parens: split after the last ')'
        rest = st[st.rindex(")") + 2:].split()
        utime, stime, cutime, cstime = (float(x) / 100
                                        for x in rest[11:15])
        out.append((int(pid), cmd, utime, stime, cutime, cstime))
    return out


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("attr_query")
    # same warmups as bench.py so first-stage infra init is excluded
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).collect()
    from pyspark.sql import functions as _F  # noqa: F401

    from pigeon_optics_spark.udfs import hash_value_udf, links_udf
    (spark.range(64, numPartitions=32)
     .select(_F.lit('{"a":1}').alias("value"))
     .select(hash_value_udf("value"), links_udf("value")).collect())

    fn, _oracle = all_queries()[name]
    before = {p[0]: p for p in _procs()}
    m0 = _machine()
    t0 = time.time()
    df = fn(spark, sf_dir)
    n = df.count()
    wall = time.time() - t0
    m1 = _machine()
    after = _procs()
    print(f"# {name}: {n} rows in {wall:.2f}s")
    print(f"# machine delta: "
          f"user={m1['user'] - m0['user']:.1f} "
          f"sys={m1['sys'] - m0['sys']:.1f} "
          f"steal={m1['steal'] - m0['steal']:.1f}")
    print(f"# {'pid':>7} {'d_utime':>8} {'d_stime':>8} {'d_cut':>8} "
          f"{'d_cst':>8}  cmd")
    rows = []
    for pid, cmd, ut, st, cut, cst in after:
        b = before.get(pid)
        d = ((ut - b[2], st - b[3], cut - b[4], cst - b[5]) if b
             else (ut, st, cut, cst))
        if sum(d) > 0.5:
            rows.append((d, pid, cmd))
    rows.sort(reverse=True)
    for (dut, dst, dcut, dcst), pid, cmd in rows:
        print(f"# {pid:>7} {dut:>8.1f} {dst:>8.1f} {dcut:>8.1f} "
              f"{dcst:>8.1f}  {cmd}")


if __name__ == "__main__":
    main()
