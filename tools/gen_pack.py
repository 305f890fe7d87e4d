"""Codegen for r6 pack gates: given sub-gate names, introspect each
sub-oracle's output types in DuckDB (LIMIT-0 over the sf0.01 views) and
print the ``pack_oracle`` cast-map literal, flagging cross-part column
collisions whose coerced types disagree (those must be renamed in a part
before packing — Spark's unionByName would coerce silently, DuckDB's
UNION BY NAME would resolve to VARCHAR, and the hash would split).

Usage: python tools/gen_pack.py pack_name tag1=gate1 tag2=gate2 ...
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pigeon_optics_spark.queries import all_queries  # noqa: E402
from pigeon_optics_spark.queries._util import TABLES  # noqa: E402

_NUM = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
        "FLOAT", "DOUBLE"}
_STR = {"BOOLEAN", "DATE"}


def coerce(duck_type: str) -> str | None:
    t = str(duck_type).upper()
    if t in _NUM:
        return "DOUBLE"
    if t in _STR:
        return "VARCHAR"
    if t == "VARCHAR":
        return None
    raise TypeError(f"unsupported duck type {t} — bridge in the sub-gate")


def _oracle_var(gate: str) -> str:
    """The actual oracle variable name from the gate's register() line in
    the query modules (the repo convention is abbreviated _X_ORACLE names,
    so guessing from the gate name would print NameErrors)."""
    import glob
    import re
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pat = re.compile(
        r'register\(\s*"%s",\s*%s,\s*([^)\s]+)\s*\)' % (gate, gate))
    for path in glob.glob(os.path.join(
            root, "pigeon_optics_spark/queries/*.py")):
        m = pat.search(open(path).read())
        if m:
            return m.group(1)
    return f"<oracle var for {gate} — register() line not found>"


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    pack = sys.argv[1]
    parts = [a.split("=", 1) for a in sys.argv[2:]]
    qs = all_queries()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    seen: dict[str, str] = {}
    print(f"# pack {pack}")
    for tag, gate in parts:
        _, oracle = qs[gate]
        rel = con.sql(f"SELECT * FROM ({oracle}) LIMIT 0")
        casts = {}
        for col, typ in zip(rel.columns, rel.types):
            c = coerce(typ)
            eff = c or "VARCHAR*"  # raw string
            if col in seen and seen[col] != eff:
                print(f"# CONFLICT col {col}: {seen[col]} vs {eff} "
                      f"(part {tag}) — rename before packing")
            seen[col] = eff
            casts[col] = c
        body = ", ".join(f'"{c}": {t!r}' if t else f'"{c}": None'
                         for c, t in casts.items())
        print(f'    ("{tag}", {_oracle_var(gate)}, {{{body}}}),')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
