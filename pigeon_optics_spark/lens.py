"""M2 — the lens engine: user-defined deterministic flatMap + fixed
merge-reduce + version-based incremental rebuild.

Reference semantics (ref ``library/models/lens.js``, ``library/workers/
javascript-lens-worker.js``; SURVEY §2.5, §3.2):

- a lens has ``inputs`` (list of data paths) and user ``code``; the code runs
  once per input record with ``path`` and ``data`` in scope and emits 0..N
  ``output(id, value)`` pairs (flatMap);
- emissions sharing an ``output`` id are combined by the type-directed
  merge-reduce (``reduce.py``) in a deterministic fold order;
- map results (outputs + captured logs/errors per input record) are cached;
  a rebuild re-maps only records whose version changed (incremental view
  maintenance, the reference's one genuinely novel optimization, SURVEY §4);
- lens outputs form a readable dataset (source='lenses'), so lenses compose
  into a reactive DAG.

Spark-first design:

- the map phase is ``mapInPandas`` over the union of input collections —
  Arrow-batched, embarrassingly parallel, no shuffle;
- the reduce phase is ``repartition(out_id) → sortWithinPartitions →
  mapInPandas`` streaming fold — ONE shuffle keyed on out_id, no per-group
  pandas overhead (scales to 1e9 output keys where ``applyInPandas``'s
  group-at-a-time model would choke);
- the compute cache is a hidden store collection (source='meta'); freshness
  is an anti-join of current input rows against cached ``(path, version)`` —
  at 100 TB this is the Delta-CDF delta-scan pattern;
- the output collection is written with hash change-suppression, so unchanged
  output ids keep their versions (downstream lenses then skip them — the DAG
  cascade stays incremental end-to-end).

Divergence from the reference (deliberate): the fold order is the
deterministic total order ``(input_idx, natural(record_id), emit_idx)``
rather than the reference's history-dependent "fresh first, then retained"
order (lens.js:152-188) — same result for associative merges, strictly more
reproducible for last-wins cases.

User code is **Python** here (JS-compat is a non-goal; the capability —
sandboxed deterministic flatMap with log/error capture — is the requirement).
"""

from __future__ import annotations

import json
import time
import traceback
from dataclasses import dataclass
from typing import Any, Iterator

from .paths import DataPath, decode_path, encode_path
from .reduce import fold, merge_into
from .store import DatasetStore
from .values import (
    PMap,
    PSet,
    natural_pad,
    tagged_to_value,
    value_to_tagged,
)

MAX_CODE_SIZE = 5 * 1024 * 1024  # ref defaults.lensCodeSize, lens.js:49

# Builtins available to lens code.  No __import__/open/eval — the reference
# runs lens code in an isolate with no IO and bans nondeterminism sources
# (Math.random throws, ref environment.js/index.js:3-5); here the names are
# simply absent.
_SAFE_BUILTINS = {
    name: __builtins__[name] if isinstance(__builtins__, dict) else getattr(__builtins__, name)
    for name in (
        "abs", "all", "any", "bool", "bytes", "chr", "dict", "divmod",
        "enumerate", "filter", "float", "format", "frozenset", "hash", "int",
        "isinstance", "len", "list", "map", "max", "min", "ord", "pow",
        "range", "repr", "reversed", "round", "set", "sorted", "str", "sum",
        "tuple", "zip", "True", "False", "None", "Exception", "ValueError",
        "TypeError", "KeyError", "IndexError", "StopIteration",
    )
    if (isinstance(__builtins__, dict) and name in __builtins__)
    or hasattr(__builtins__, name)
}


class LensCodeError(ValueError):
    """Raised when lens code fails to compile (startup error — ref
    javascript-lens-worker.js startup compile check)."""


@dataclass
class PathInfo:
    """The ``path`` object visible to lens code (ref worker `:126-130`)."""

    string: str
    source: str
    author: str
    name: str
    recordID: str

    @property
    def record_id(self) -> str:  # pythonic alias
        return self.recordID


class LensHarness:
    """Compile-once / run-per-record executor with output collection and
    log/error capture (ref javascript-lens-worker.js:67-145)."""

    def __init__(self, code: str, timeout_ms: float | None = None):
        if len(code.encode()) > MAX_CODE_SIZE:
            raise LensCodeError("lens code exceeds 5MB")
        try:
            self._compiled = compile(code, "<lens>", "exec")
        except SyntaxError as e:
            raise LensCodeError(f"lens code syntax error: {e}") from e
        self.timeout_ms = timeout_ms

    def run(self, path: PathInfo, data: Any):
        """→ (outputs [(emit_idx, out_id, value)], logs [str], errors [dict])"""
        outputs: list[tuple[int, str, Any]] = []
        logs: list[str] = []
        errors: list[dict] = []

        def output(out_id, value):
            if not isinstance(out_id, str):
                raise TypeError(f"output id must be str, got {type(out_id).__name__}")
            if value is None:
                raise TypeError("output value must not be None")
            outputs.append((len(outputs), out_id, value))

        def log(*args):
            logs.append(" ".join(str(a) for a in args))

        env = {
            "__builtins__": _SAFE_BUILTINS,
            "output": output,
            "log": log,
            "path": path,
            "data": data,
            "Set": PSet,
            "Map": PMap,
        }
        t0 = time.perf_counter()
        try:
            exec(self._compiled, env)  # noqa: S102 — sandboxed lens execution
        except Exception as e:  # noqa: BLE001 — user-code error capture
            tb = traceback.extract_tb(e.__traceback__)
            user_frames = [f for f in tb if f.filename == "<lens>"]
            line = user_frames[-1].lineno if user_frames else None
            errors.append({"type": type(e).__name__, "message": str(e), "line": line})
        elapsed_ms = (time.perf_counter() - t0) * 1000
        if self.timeout_ms is not None and elapsed_ms > self.timeout_ms:
            errors.append({
                "type": "TimeoutError",
                "message": f"lens map took {elapsed_ms:.1f}ms (limit {self.timeout_ms}ms)",
                "line": None,
            })
        return outputs, logs, errors


# --------------------------------------------------------------------------
# distributed map phase
# --------------------------------------------------------------------------

MAP_RESULT_SCHEMA = (
    "path string, record_id string, input_idx int, nat_key string, "
    "version long, outputs string, logs string, errors string"
)


def map_records(inputs_df, code: str, timeout_ms: float | None = None):
    """Run lens code over every row of ``inputs_df`` (columns: input_idx,
    path, source, author, name, record_id, version, value) via mapInPandas.

    One output row per input record; emissions are embedded as a JSON array of
    ``[emit_idx, out_id, tagged_value_json]`` so the row schema stays fixed
    regardless of the user value shapes.
    """
    import pandas as pd

    def run_partition(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        harness = LensHarness(code, timeout_ms)
        for pdf in batches:
            out_rows = {k: [] for k in
                        ("path", "record_id", "input_idx", "nat_key", "version",
                         "outputs", "logs", "errors")}
            for row in pdf.itertuples(index=False):
                data = tagged_to_value(json.loads(row.value))
                pinfo = PathInfo(string=row.path, source=row.source,
                                 author=row.author, name=row.name,
                                 recordID=row.record_id)
                outputs, logs, errors = harness.run(pinfo, data)
                out_rows["path"].append(row.path)
                out_rows["record_id"].append(row.record_id)
                out_rows["input_idx"].append(row.input_idx)
                out_rows["nat_key"].append(natural_pad(row.record_id))
                out_rows["version"].append(row.version)
                out_rows["outputs"].append(json.dumps(
                    [{"i": i, "k": oid,
                      "v": json.dumps(value_to_tagged(v), ensure_ascii=False)}
                     for i, oid, v in outputs], ensure_ascii=False))
                out_rows["logs"].append(json.dumps(logs, ensure_ascii=False))
                out_rows["errors"].append(json.dumps(errors, ensure_ascii=False))
            yield pd.DataFrame(out_rows)

    return inputs_df.mapInPandas(run_partition, schema=MAP_RESULT_SCHEMA)


# --------------------------------------------------------------------------
# distributed reduce phase
# --------------------------------------------------------------------------

REDUCED_SCHEMA = "record_id string, value string"


def reduce_outputs(outputs_df, num_partitions: int | None = None):
    """Fold all emissions per out_id in deterministic order.

    ``outputs_df`` columns: out_id, input_idx, nat_key, emit_idx, value
    (tagged JSON string).  One shuffle (repartition on out_id), then a
    streaming fold inside sorted partitions — groups never cross partitions,
    and a group split across *Arrow batches* is handled by carrying the
    accumulator over.
    """
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    df = outputs_df.repartition(
        *( [num_partitions] if num_partitions else [] ), "out_id"
    ).sortWithinPartitions("out_id", "input_idx", "nat_key", "emit_idx")

    def fold_partition(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cur_id = None
        cur_acc = None

        def emit(rid, acc):
            return pd.DataFrame({
                "record_id": [rid],
                "value": [json.dumps(value_to_tagged(acc), ensure_ascii=False)],
            })

        for pdf in batches:
            done_ids, done_vals = [], []
            for row in pdf.itertuples(index=False):
                v = tagged_to_value(json.loads(row.value))
                if row.out_id != cur_id:
                    if cur_id is not None:
                        done_ids.append(cur_id)
                        done_vals.append(json.dumps(value_to_tagged(cur_acc),
                                                    ensure_ascii=False))
                    cur_id, cur_acc = row.out_id, v
                else:
                    cur_acc = merge_into(cur_acc, v)
            if done_ids:
                yield pd.DataFrame({"record_id": done_ids, "value": done_vals})
        if cur_id is not None:
            yield emit(cur_id, cur_acc)

    return df.mapInPandas(fold_partition, schema=REDUCED_SCHEMA)


# --------------------------------------------------------------------------
# build orchestration
# --------------------------------------------------------------------------

_CACHE_SOURCE = "meta"

_CACHE_VALUE_SCHEMA = (
    "struct<input_idx:int, record_id:string, nat_key:string, version:bigint, "
    "outputs:string, logs:string, errors:string>"
)


def _cache_name(name: str) -> str:
    return f"lens-cache.{name}"


def create_lens(store: DatasetStore, author: str, name: str, *, inputs: list[str],
                code: str, memo: str = "", timeout_ms: float | None = None):
    """Register a lens: validates code compiles (startup-error surface) and
    input paths parse; creates the output collection + compute cache."""
    LensHarness(code)  # compile check
    for p in inputs:
        decode_path(p)
    config = {"inputs": inputs, "code": code, "mapType": "python",
              "timeout_ms": timeout_ms, "input_versions": {}}
    meta = store.create(author, name, source="lenses", memo=memo, config=config)
    store.create(author, _cache_name(name), source=_CACHE_SOURCE)
    return meta


def _load_inputs(spark, store: DatasetStore, input_paths: list[str]):
    """Union of input collections with path/provenance columns.

    Duplicate input *paths* are skipped first-seen-wins (ref lens.js:127-133);
    a ``/records/{id}`` suffix restricts to that record (ref lens.js:139).
    """
    from pyspark.sql import functions as F

    seen: set[str] = set()
    dfs = []
    for idx, p in enumerate(input_paths):
        dp = decode_path(p)
        if dp.collection_path in seen:
            continue
        seen.add(dp.collection_path)
        df = store.read_df(spark, dp.author, dp.name, source=dp.source)
        if dp.record_id is not None:
            df = df.where(F.col("record_id") == dp.record_id)
        dfs.append(
            df.select(
                F.lit(idx).alias("input_idx"),
                F.concat(F.lit(dp.collection_path + "/records/"),
                         F.col("record_id")).alias("path"),
                F.lit(dp.source).alias("source"),
                F.lit(dp.author).alias("author"),
                F.lit(dp.name).alias("name"),
                "record_id",
                "version",
                "value",
            )
        )
    if not dfs:
        raise ValueError("lens has no inputs")
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out


def build_lens(spark, store: DatasetStore, author: str, name: str) -> dict:
    """Incremental lens build (the reference's query execution, SURVEY §3.2).

    Returns build stats {mapped, cached, outputs}.
    """
    from pyspark.sql import functions as F

    meta = store.get_meta(author, name, source="lenses")
    cfg = meta.config
    code, input_paths = cfg["code"], cfg["inputs"]
    timeout_ms = cfg.get("timeout_ms")

    inputs = _load_inputs(spark, store, input_paths)

    # ---- freshness: anti-join current inputs vs cached (path, version) ----
    cache_cur = store.read_df(spark, author, _cache_name(name), source=_CACHE_SOURCE)
    cache_parsed = cache_cur.select(
        F.col("record_id").alias("path"),
        F.from_json("value", _CACHE_VALUE_SCHEMA).alias("c"),
    ).select("path", "c.*")

    cached_keys = cache_parsed.select("path", F.col("version").alias("cached_version"))
    with_cache = inputs.join(cached_keys, "path", "left")
    fresh = with_cache.where(
        F.col("cached_version").isNull() | (F.col("version") > F.col("cached_version"))
    ).drop("cached_version")

    # ---- map phase over fresh records only --------------------------------
    mapped = map_records(fresh, code, timeout_ms)

    cache_entries = mapped.select(
        F.col("path").alias("cache_rid"),
        F.to_json(F.struct("input_idx", "record_id", "nat_key", "version",
                           "outputs", "logs", "errors")).alias("value"),
    ).select(F.col("cache_rid").alias("record_id"), "value")

    # prune cache entries whose input row disappeared (ref lens.js:192-199)
    gone = cached_keys.join(inputs.select("path"), "path", "left_anti").select(
        F.col("path").alias("record_id"), F.lit(None).cast("string").alias("value")
    )
    # persist: the expensive map phase must run exactly once even though the
    # cache write performs several actions (hash, suppression join, write)
    delta = cache_entries.unionByName(gone).persist()
    n_fresh = delta.where(F.col("value").isNotNull()).count()
    store.write_entries_df(spark, author, _cache_name(name), delta, source=_CACHE_SOURCE)
    delta.unpersist()

    # ---- reduce over the FULL cache (fresh ∪ retained) --------------------
    cache_now = store.read_df(spark, author, _cache_name(name), source=_CACHE_SOURCE)
    parsed = cache_now.select(F.from_json("value", _CACHE_VALUE_SCHEMA).alias("c")).select("c.*")
    emissions = parsed.select(
        "input_idx", "nat_key",
        F.explode(
            F.from_json("outputs", "array<struct<i:int,k:string,v:string>>")
        ).alias("e"),
    ).select(F.col("e.k").alias("out_id"), "input_idx", "nat_key",
             F.col("e.i").alias("emit_idx"), F.col("e.v").alias("value"))

    reduced = reduce_outputs(emissions)

    # ---- write output collection (hash suppression keeps stable versions) --
    pre_write_version = store.get_meta(author, name, source="lenses").version
    stats_meta = store.write_entries_df(spark, author, name, reduced,
                                        source="lenses", overwrite=True)
    records_changed = stats_meta.version != pre_write_version

    # bookkeeping: max seen version per input source (ref lens.js:134-137,227)
    versions = {p: int(v) for p, v in
                inputs.groupBy("input_idx").agg(F.max("version").alias("v"))
                .join(spark.createDataFrame(
                    [(i, p) for i, p in enumerate(input_paths)], "input_idx int, p string"),
                    "input_idx").select("p", "v").collect()}
    cfg["input_versions"] = versions
    store.set_config(author, name, cfg, source="lenses", memo=meta.memo)

    n_out = store.read_df(spark, author, name, source="lenses").count()
    return {"mapped": n_fresh, "outputs": n_out, "version": stats_meta.version,
            "records_changed": records_changed}


def lens_logs(spark, store: DatasetStore, author: str, name: str):
    """Captured logs/errors per input path (ref lens.js:87-92, browsable at
    /lenses/a:n/logs)."""
    from pyspark.sql import functions as F

    cache = store.read_df(spark, author, _cache_name(name), source=_CACHE_SOURCE)
    parsed = cache.select(
        F.col("record_id").alias("input_path"),
        F.from_json("value", _CACHE_VALUE_SCHEMA).alias("c"),
    )
    return parsed.select(
        "input_path",
        F.from_json("c.logs", "array<string>").alias("logs"),
        F.from_json("c.errors",
                    "array<struct<type:string,message:string,line:int>>").alias("errors"),
    )
