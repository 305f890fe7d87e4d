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

**TRUST MODEL — read this before exposing lenses to other authors.**  The
reference runs lens code inside ``isolated-vm`` (a true V8 isolate with a
hard 50 ms kill and no host references).  Python has no equivalent in-process
isolation: the ``_SAFE_BUILTINS`` environment removes the obvious IO/import
names, but CPython introspection (``().__class__.__base__.__subclasses__()``
etc.) can reach host objects, so **lens code must come from trusted
authors** — the sandbox here is an accident guard (keeps honest code
deterministic and IO-free), not a security boundary.  What IS enforced:
the per-record timeout is preemptive — a ``SIGVTALRM`` (CPU-time) interrupt
fires mid-``exec`` (ref worker timeout, javascript-lens-worker.js:116,132-135), so
an accidental ``while True`` yields a TimeoutError record instead of hanging
the executor.  (A lens that catches ``BaseException`` in a tight loop can
still defeat it — trusted-author territory again.)
"""

from __future__ import annotations

import json
import re
import time
import traceback
from dataclasses import dataclass
from typing import Any, Iterator

from .paths import DataPath, decode_path, encode_path
from .reduce import fold, merge_into
from .session import job_desc
from .store import DatasetStore
from .values import (
    PMap,
    PSet,
    canonical_json,
    loads_value,
    natural_pad,
    tagged_to_value,
    value_to_tagged,
)

MAX_CODE_SIZE = 5 * 1024 * 1024  # ref defaults.lensCodeSize, lens.js:49

# Builtins available to lens code.  No __import__/open/eval — the reference
# runs lens code in an isolate with no IO and bans nondeterminism sources
# (Math.random throws, ref environment.js/index.js:3-5); here the names are
# simply absent.  ``hash`` is deliberately excluded too: Python string
# hashing is salted per process (PYTHONHASHSEED), so it is exactly the
# nondeterminism class the reference bans — a lens calling it would produce
# different output across executors/restarts and poison the compute cache.
_SAFE_BUILTINS = {
    name: __builtins__[name] if isinstance(__builtins__, dict) else getattr(__builtins__, name)
    for name in (
        "abs", "all", "any", "bool", "bytes", "chr", "dict", "divmod",
        "enumerate", "filter", "float", "format", "frozenset", "int",
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


class _LensTimeout(BaseException):
    """Raised by the SIGALRM handler inside lens ``exec``.

    Subclasses BaseException so a lens's ``except Exception`` can't swallow
    the interrupt (mirrors the isolate kill being outside the guest's reach).
    """


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
        self._alarm_active = False

    def _can_alarm(self) -> bool:
        # SIGVTALRM only delivers to the main thread — PySpark workers run
        # tasks there, so this covers the distributed map phase; elsewhere
        # (exotic threaded embedding) we fall back to the post-hoc check.
        import signal
        import threading

        return (self.timeout_ms is not None
                and hasattr(signal, "setitimer")
                and threading.current_thread() is threading.main_thread())

    def alarm_scope(self):
        """Context manager installing the SIGVTALRM handler ONCE for a run of
        many records (handler (re)installation costs ~6µs/record — measured —
        so per-partition installation matters at millions of records).
        ``run`` then only arms/disarms the interval timer per record."""
        import signal
        from contextlib import contextmanager

        @contextmanager
        def _scope():
            if not self._can_alarm() or self._alarm_active:
                yield
                return

            def _on_alarm(signum, frame):
                raise _LensTimeout()

            prev_handler = signal.signal(signal.SIGVTALRM, _on_alarm)
            self._alarm_active = True
            try:
                yield
            finally:
                self._alarm_active = False
                signal.setitimer(signal.ITIMER_VIRTUAL, 0)
                signal.signal(signal.SIGVTALRM, prev_handler)

        return _scope()

    def run(self, path: PathInfo, data: Any):
        """→ (outputs [(emit_idx, out_id, value)], logs [str], errors [dict])"""
        # Preemptive timeout (ref javascript-lens-worker.js:116,132-135):
        # SIGVTALRM interrupts the running bytecode, so an accidental
        # infinite loop becomes a TimeoutError record instead of a hung
        # executor.  The budget is CPU time (ITIMER_VIRTUAL + thread_time
        # below), not wall clock: the reference runs one lens per worker
        # process where wall == execution time, but a Spark executor is
        # multi-tenant — under host load a wall-clock envelope killed
        # records whose code ran well inside the budget (observed: a 3x
        # oversubscribed box flaked exactly one lens record in an sf0.1
        # sweep; the sandbox has no blocking builtins, so every genuine
        # runaway BURNS CPU and still trips the virtual timer).
        # Direct callers get a handler installed around this single record;
        # batch callers (map_records) hold alarm_scope open across the
        # partition and only pay the timer syscalls here.
        if self.timeout_ms is not None and not self._alarm_active \
                and self._can_alarm():
            with self.alarm_scope():
                return self.run(path, data)

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

        from .markup import Markup  # in-sandbox stdlib (ref markup.js:12-34)

        env = {
            "__builtins__": _SAFE_BUILTINS,
            "output": output,
            "log": log,
            "path": path,
            "data": data,
            "Set": PSet,
            "Map": PMap,
            "Markup": Markup,
        }
        import signal

        use_alarm = self._alarm_active
        t0 = time.thread_time()  # CPU, not wall — see the budget note above
        timed_out = False
        try:  # outer guard: a pending alarm can deliver during cleanup
            try:
                if use_alarm:
                    signal.setitimer(signal.ITIMER_VIRTUAL,
                                     self.timeout_ms / 1000.0)
                exec(self._compiled, env)  # noqa: S102 — sandboxed lens execution
            except _LensTimeout:
                timed_out = True
            except Exception as e:  # noqa: BLE001 — user-code error capture
                tb = traceback.extract_tb(e.__traceback__)
                user_frames = [f for f in tb if f.filename == "<lens>"]
                line = user_frames[-1].lineno if user_frames else None
                errors.append({"type": type(e).__name__, "message": str(e), "line": line})
            finally:
                if use_alarm:
                    signal.setitimer(signal.ITIMER_VIRTUAL, 0)
        except _LensTimeout:
            timed_out = True
        elapsed_ms = (time.thread_time() - t0) * 1000
        if timed_out or (self.timeout_ms is not None and elapsed_ms > self.timeout_ms):
            # discard partial emissions: how far a lens got before the alarm
            # is machine-speed-dependent — a timed-out record deterministically
            # contributes nothing but the error
            outputs.clear()
            # fixed message: embedding the measured elapsed time would make
            # a borderline lens's cached error bytes (and thus cache hashes)
            # machine-dependent — the same nondeterminism class the
            # outputs.clear() above removes
            errors.append({
                "type": "TimeoutError",
                "message": f"lens map exceeded {self.timeout_ms}ms",
                "line": None,
            })
        return outputs, logs, errors


# --------------------------------------------------------------------------
# distributed map phase
# --------------------------------------------------------------------------

MAP_RESULT_SCHEMA = (
    "path string, record_id string, input_idx int, nat_key string, "
    "version long, outputs string, logs string, errors string, "
    "rid_json string, nat_key_json string"
)


def _json_escape_nocc_col(c):
    """JSON-string-encode a column whose value PROVABLY contains no raw
    control character (< 0x20): byte-exact replay of
    ``json.dumps(s, ensure_ascii=False)``, which for such strings escapes
    exactly backslash then double-quote (single-pass over the char class
    ``[\\\\"\\x00-\\x1f]`` — the sequential two-replace chain produces
    identical bytes because step 1 never creates a quote and step 2 never
    creates a backslash that step 1 should have doubled; pinned by
    tests/test_lens.py::test_map_records_serialization).  The lens map
    columns this feeds (``outputs``/``logs``/``errors``) are themselves
    JSON TEXT produced by ``json.dumps`` fragments, whose own escaping
    already removed every raw control char — the reason this is safe.
    Strings that CAN carry control chars (record ids) ship pre-escaped
    from Python instead (``rid_json``/``nat_key_json``)."""
    from pyspark.sql import functions as F

    return F.concat(
        F.lit('"'),
        F.replace(F.replace(c, F.lit("\\"), F.lit("\\\\")),
                  F.lit('"'), F.lit('\\"')),
        F.lit('"'))


def _cache_entry_value_col():
    """The canonical cache-entry JSON envelope, derived in whole-stage
    codegen from the THIN map-output columns — byte-identical to the
    former Python f-string assembly (sorted keys, compact separators),
    so ``sha2(value) == object_hash`` still holds at the cache write.
    Keeping the fat envelope OUT of the map output roughly halves the
    persisted map frame and the Arrow transfer: the embedded
    outputs/logs/errors strings otherwise crossed the Python boundary
    twice (raw + escaped inside the envelope)."""
    from pyspark.sql import functions as F

    return F.concat(
        F.lit('{"errors":'), _json_escape_nocc_col(F.col("errors")),
        F.lit(',"input_idx":'), F.col("input_idx").cast("string"),
        F.lit(',"logs":'), _json_escape_nocc_col(F.col("logs")),
        F.lit(',"nat_key":'), F.col("nat_key_json"),
        F.lit(',"outputs":'), _json_escape_nocc_col(F.col("outputs")),
        F.lit(',"record_id":'), F.col("rid_json"),
        F.lit(',"version":'), F.col("version").cast("string"),
        F.lit("}"))


def map_records(inputs_df, code: str, timeout_ms: float | None = None):
    """Run lens code over every row of ``inputs_df`` (columns: input_idx,
    path, source, author, name, record_id, version, value) via mapInPandas.

    One output row per input record; emissions are embedded as a JSON array of
    ``[emit_idx, out_id, tagged_value_json]`` so the row schema stays fixed
    regardless of the user value shapes.  The complete cache-entry envelope is
    NOT assembled here: it is derived in whole-stage codegen from these thin
    columns (``_cache_entry_value_col``), byte-identical to canonical form, so
    the cache write still hashes JVM-side (``sha2(value) == object_hash``)
    while the outputs/logs/errors bytes cross the Python boundary exactly
    once (the fat envelope embedded them a second time, escaped — ~half the
    map output's bytes).  Only ``rid_json``/``nat_key_json`` ship pre-escaped
    from Python because record ids may contain control characters, whose
    ``\\u00xx`` escapes a JVM replay could not reproduce byte-exactly.
    """
    import pandas as pd

    def run_partition(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        harness = LensHarness(code, timeout_ms)
        # one prebuilt encoder for the whole task: ``json.dumps(x,
        # ensure_ascii=False)`` constructs a fresh JSONEncoder PER CALL
        # (only the zero-kwargs form hits the cached default encoder) —
        # at 5 dumps per record that was ~30% of the loop.  Same params ⇒
        # byte-identical output (pinned by test_map_records_serialization).
        dumps = json.JSONEncoder(ensure_ascii=False).encode
        with harness.alarm_scope():  # install the SIGALRM handler once
            for pdf in batches:
                out_rows = {k: [] for k in
                            ("path", "record_id", "input_idx", "nat_key",
                             "version", "outputs", "logs", "errors",
                             "rid_json", "nat_key_json")}
                for path_s, source, author_s, name_s, rid, version, value, idx in zip(
                        pdf["path"].tolist(), pdf["source"].tolist(),
                        pdf["author"].tolist(), pdf["name"].tolist(),
                        pdf["record_id"].tolist(), pdf["version"].tolist(),
                        pdf["value"].tolist(), pdf["input_idx"].tolist()):
                    data = tagged_to_value(loads_value(value))
                    pinfo = PathInfo(string=path_s, source=source,
                                     author=author_s, name=name_s,
                                     recordID=rid)
                    outputs, logs, errors = harness.run(pinfo, data)
                    nat_key = natural_pad(rid)
                    # serialization runs OUTSIDE harness.run's per-record
                    # capture, so an unserializable emit (a function
                    # object, a nesting bomb blowing value_to_tagged's
                    # stack) must become a CAPTURED per-record error —
                    # not kill the whole mapInPandas task.  The happy
                    # path stays the plain comprehension (this loop runs
                    # once per mapped record — the build's hot path);
                    # only a failing record pays the per-item retry.
                    # each item is assembled as a literal fragment replaying
                    # json.dumps' default dict formatting for the FIXED key
                    # shape {"i": int, "k": ..., "v": str} — skips the dict
                    # construction + iterencode tree walk per emission
                    # (byte-parity pinned by test_map_records_serialization)
                    try:
                        out_items = [
                            f'{{"i": {i}, "k": {dumps(oid)}, '
                            f'"v": {dumps(dumps(value_to_tagged(v)))}}}'
                            for i, oid, v in outputs]
                    except (TypeError, ValueError, RecursionError):
                        out_items = []
                        for i, oid, v in outputs:
                            try:
                                out_items.append(
                                    f'{{"i": {i}, "k": {dumps(oid)}, '
                                    f'"v": {dumps(dumps(value_to_tagged(v)))}}}')
                            except (TypeError, ValueError,
                                    RecursionError) as e:
                                errors.append({
                                    "type": type(e).__name__,
                                    "message": ("unserializable lens "
                                                f"output {oid!r}: {e}"),
                                    "line": None,
                                })
                    outputs_json = ("[" + ", ".join(out_items) + "]"
                                    if out_items else "[]")
                    logs_json = dumps(logs) if logs else "[]"
                    errors_json = dumps(errors) if errors else "[]"
                    out_rows["path"].append(path_s)
                    out_rows["record_id"].append(rid)
                    out_rows["input_idx"].append(idx)
                    out_rows["nat_key"].append(nat_key)
                    out_rows["version"].append(version)
                    out_rows["outputs"].append(outputs_json)
                    out_rows["logs"].append(logs_json)
                    out_rows["errors"].append(errors_json)
                    # the cache-entry envelope itself is DERIVED JVM-side
                    # (``_cache_entry_value_col`` — sorted-key compact dumps
                    # replayed in codegen, canonical by
                    # test_cache_value_is_canonical): only the two strings
                    # that may carry control chars ship pre-escaped here
                    out_rows["rid_json"].append(dumps(rid))
                    out_rows["nat_key_json"].append(dumps(nat_key))
                yield pd.DataFrame(out_rows)

    return inputs_df.mapInPandas(run_partition, schema=MAP_RESULT_SCHEMA)


# --------------------------------------------------------------------------
# distributed reduce phase
# --------------------------------------------------------------------------

REDUCED_SCHEMA = "record_id string, value string"


def reduce_outputs(outputs_df, num_partitions: int | None = None, *,
                   presorted: bool = False):
    """Fold all emissions per out_id in deterministic order.

    ``outputs_df`` columns: out_id, input_idx, nat_key, src_rid, emit_idx,
    value (tagged JSON string).  One shuffle (repartition on out_id), then a
    streaming fold inside sorted partitions — groups never cross partitions,
    and a group split across *Arrow batches* is handled by carrying the
    accumulator over.

    ``src_rid`` (the raw source record id) tie-breaks after ``nat_key``:
    distinct ids can share a nat_key ('a1' vs 'a01' pad identically, and
    Spark-side lpad truncates digit runs beyond the pad width), so without it
    the fold order between such records would be engine-nondeterministic —
    last-wins merges could differ across runs.

    ``presorted=True`` skips the shuffle+sort: the caller guarantees every
    out_id group is contiguous within one read partition and rows are already
    in fold order within each group (the emissions store writes segments
    range-partitioned by out_id and sorted by the full fold key — see
    ``build_lens``'s first-build path, which validates the single-row-group
    precondition before taking this branch).

    Output values are serialized in **canonical** form, so the store write
    can hash them JVM-side (``precanonical=True``) with byte-identical
    semantics to ``object_hash``.
    """
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    if presorted:
        df = outputs_df
    else:
        df = outputs_df.repartition(
            *( [num_partitions] if num_partitions else [] ), "out_id"
        ).sortWithinPartitions("out_id", "input_idx", "nat_key", "src_rid",
                               "emit_idx")

    def fold_partition(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cur_id = None
        cur_acc = None

        for pdf in batches:
            done_ids, done_vals = [], []
            for row in pdf.itertuples(index=False):
                v = tagged_to_value(loads_value(row.value))
                if row.out_id != cur_id:
                    if cur_id is not None:
                        done_ids.append(cur_id)
                        done_vals.append(canonical_json(cur_acc))
                    cur_id, cur_acc = row.out_id, v
                else:
                    cur_acc = merge_into(cur_acc, v)
            if done_ids:
                yield pd.DataFrame({"record_id": done_ids, "value": done_vals})
        if cur_id is not None:
            yield pd.DataFrame({"record_id": [cur_id],
                                "value": [canonical_json(cur_acc)]})

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


# --------------------------------------------------------------------------
# emissions store — the reduce-side index
#
# The map cache is keyed by input *path* (right for freshness / log capture),
# but the reduce gathers by *out_id*: deriving emissions from the cache means
# JSON-parsing and exploding the ENTIRE cache even when one key changed.  The
# emissions store is the same data exploded once at write time and persisted
# as parquet segments RANGE-SORTED BY out_id, so an incremental re-reduce
# reads only the row groups holding affected keys (min/max pruning on the
# pushed-down ``out_id IN (...)`` filter).  An emission row is current iff
# its version is at or above its path's max STALE FLOOR (the sidecar log
# below — O(churn) validity; compaction validates against the authoritative
# cache keys instead).  The validity key is the cache ROW's version, NOT
# its segment seq: cache compaction re-stamps every row with one new seq
# (physical), but preserves per-row versions (logical) — seq-keyed validity
# would invalidate the whole emissions log at the first compaction (silently
# dropping retained contributions on later incremental rebuilds).  A cache
# row's version advances exactly when its path is re-mapped: the cache value
# embeds the input record's version, so hash suppression can never keep an
# old version on a re-map.  Segments compact alongside the cache.
# --------------------------------------------------------------------------

_EMIT_COLS = ["out_id", "input_idx", "nat_key", "src_rid", "emit_idx", "value"]

#: Incremental rebuilds gather affected-out_id emissions either via a
#: driver-side ``IN`` list (≤ this many keys: the literal list pushes into
#: the sorted log's row-group pruning) or via a left-semi join (unbounded).
#: Module-level so tests can lower it to exercise the semi-join path.
AFFECTED_COLLECT_MAX = 10_000


#: committed emission-log segment names (see _write_emit_segment)
_EMIT_SEG_RE = re.compile(r"^seg_(\d+)\.([A-Za-z0-9]+)\.parquet$")


def _emit_dir(store: DatasetStore, author: str, name: str) -> str:
    import os

    return os.path.join(store.root, "records", "meta", author, f"lens-emit.{name}")


def _emit_segments(store: DatasetStore, author: str, name: str) -> list[str]:
    """Emission segment paths in seq order; a base segment supersedes all
    earlier segments (same convention as the store's segment log).

    Pre-(path,version) segments (the r2-era format stamped a ``seq`` column
    instead of ``version``) are detected by schema and the whole log is
    dropped: the log is a derived cache, and returning [] routes the next
    incremental build through the migration-backfill path, which regenerates
    it from the compute cache with correct per-row versions.  Joining the old
    format on ``["path", "version"]`` would either raise AnalysisException or
    — under schema merging — null out ``version`` for old rows and silently
    invalidate retained emissions."""
    import glob
    import os
    import shutil

    d = _emit_dir(store, author, name)
    if not os.path.isdir(d):
        return []
    items = []
    for fn in os.listdir(d):
        # committed emission segments only (seg_<seq>.<kind>.parquet) —
        # a stray file in the dir must not crash the build (the store's
        # _seg_seq stance, applied to the emission log)
        m = _EMIT_SEG_RE.match(fn)
        if m:
            items.append((int(m.group(1)), m.group(2) == "base",
                          os.path.join(d, fn)))
    base_seqs = [s for s, b, _p in items if b]
    floor = max(base_seqs) if base_seqs else None
    keep = [(s, p) for s, b, p in sorted(items)
            if (b and s == floor) or (not b and (floor is None or s > floor))]
    segs = [p for _s, p in keep]
    if segs:
        import pyarrow.parquet as pq

        try:
            first = sorted(glob.glob(os.path.join(segs[0], "*.parquet")))[0]
            migrated = "version" in pq.read_schema(first).names
        except (IndexError, OSError):
            migrated = False  # unreadable/empty segment: treat as stale
        if not migrated:
            shutil.rmtree(d, ignore_errors=True)
            return []
    return segs


# --------------------------------------------------------------------------
# stale-floor sidecar — O(churn) validity, never O(base)
#
# Validity used to be a semi-join of gathered emissions against the CURRENT
# (path, version) of every cache row — correct, but its build side scanned
# and shuffled the whole cache-key set on every incremental rebuild: a
# 1-record delta cost O(base) (measured: the r9 10x probe's linear-in-base
# residue).  The sidecar inverts it: each build appends one small
# ``stale_<seq>.parquet`` of (path, version=FLOOR) rows — every path the
# build re-mapped or pruned, stamped with the post-write cache version.  An
# emission row (path, v) is STALE iff v < the path's max floor: every
# re-map/prune writes its new generation at the floor version (or nothing,
# for prunes), so exactly one generation survives per path.  Validity is
# then ``old_part LEFT JOIN floors`` — both sides O(churn)/O(affected),
# broadcastable, independent of base size.  Compaction folds the log to
# currently-valid rows (via the authoritative cache-key join, unchanged)
# and deletes the floors, which are redundant afterwards: kept rows carry
# the current cache version, which is >= every floor ever written.
#
# Crash safety (r11, crash-injected in tests/test_lens_crash.py): every
# build installs a ``_build_inflight`` marker before its cache write and
# removes it after set_config.  A marker found at build start means the
# previous build died somewhere between those two points — the cache may
# hold row generations the emissions log lacks (died before the emit
# write), the log may hold an orphaned segment (died after it), floors
# may be missing, and the output collection may be stale (died before
# the output write).  :func:`_heal_crashed_build` restores the log
# invariant (exactly the newest generation per live cache path) by
# regenerating missing generations straight from the cache (no re-map —
# the cache value embeds the outputs) and force-compacting, and the
# build then re-reduces EVERY out_id (log ∪ delta ∪ existing output
# records, so outputs whose emissions vanished re-check as deletes).
# O(base) once, only after a detected crash.  The earlier prose-only
# protocol ("the re-run re-maps the same delta") was insufficient on two
# counts the injection tests pin: the full-diff freshness branch uses
# the cache itself as its cursor, so a re-run after the cache write saw
# nothing fresh and never healed the output; and a fully-hash-suppressed
# re-run gathered the orphaned emit segment AND its own re-emissions at
# the same version, double-folding every affected key.
# Emit dirs written before this sidecar existed lack floors
# for their historical builds — detected by the ``_stale_v1`` marker file
# and healed by a one-time compaction at build start.
# --------------------------------------------------------------------------

_STALE_MARKER = "_stale_v1"
_STALE_RE = re.compile(r"^stale_(\d+)_[0-9a-f]+\.parquet$")

#: build-in-flight marker (crash detection) — present while a build is
#: between its cache write and its set_config; found at build start ⇒ heal
_INFLIGHT_MARKER = "_build_inflight"


def _inflight_marker_present(d: str) -> bool:
    import os

    return os.path.exists(os.path.join(d, _INFLIGHT_MARKER))


def _install_inflight_marker(d: str) -> None:
    import os

    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, _INFLIGHT_MARKER), "w"):
        pass


def _remove_inflight_marker(d: str) -> None:
    import contextlib
    import os

    with contextlib.suppress(FileNotFoundError):
        os.remove(os.path.join(d, _INFLIGHT_MARKER))


def _stale_marker_present(d: str) -> bool:
    import os

    return os.path.exists(os.path.join(d, _STALE_MARKER))


def _install_stale_marker(d: str) -> None:
    import os

    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, _STALE_MARKER), "w"):
        pass


def _write_stale_floors(df, d: str, seq: int) -> None:
    """Append one floors sidecar: (path, version) rows, version = the floor
    below which that path's emissions are dead.  Stage-then-rename like the
    emit segments; O(delta) rows, coalesced small.  The uuid suffix makes
    every write collision-free — a crashed build's re-run (which reuses
    the suppressed cache seq) must never clobber existing floors, and
    redundant/duplicate floors are harmless under the max() aggregation."""
    import os
    import shutil
    import uuid

    os.makedirs(d, exist_ok=True)
    stage = os.path.join(d, f"_stage_{uuid.uuid4().hex}")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    for fn in os.listdir(stage):
        if not fn.endswith(".parquet"):
            os.remove(os.path.join(stage, fn))
    final = os.path.join(d, f"stale_{seq:08d}_{uuid.uuid4().hex[:8]}.parquet")
    shutil.rmtree(final, ignore_errors=True)
    os.replace(stage, final)
    _install_stale_marker(d)


def _write_stale_floors_local(paths: list[str], version: int, d: str,
                              seq: int) -> None:
    """Driver-side floors write for the common small-delta build: the
    caller already holds the exact delta-path list (the
    ``suppress_scope_ids`` collect), so a single pyarrow file write
    replaces a whole Spark job (coalesce + parquet task).  Identical
    naming/semantics to :func:`_write_stale_floors`; readable by the same
    ``spark.read.parquet``."""
    import os
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(d, exist_ok=True)
    tbl = pa.table({
        "path": pa.array(paths, pa.string()),
        "version": pa.array([int(version)] * len(paths), pa.int64()),
    })
    stage = os.path.join(d, f"_stage_{uuid.uuid4().hex}.floors")
    pq.write_table(tbl, stage)
    final = os.path.join(d, f"stale_{seq:08d}_{uuid.uuid4().hex[:8]}.parquet")
    os.replace(stage, final)
    _install_stale_marker(d)


def _read_stale_floors(spark, d: str):
    """Union of all floors sidecars as (path, version), or None if none.
    Floors made redundant by a later compaction are deleted there; reading
    a leftover stale one is harmless (kept rows carry the current cache
    version, which is >= any floor ever written for that path)."""
    import os

    if not os.path.isdir(d):
        return None
    files = [os.path.join(d, fn) for fn in os.listdir(d)
             if _STALE_RE.match(fn)]
    if not files:
        return None
    return spark.read.parquet(*files).select("path", "version")


def _drop_stale_floors(d: str) -> None:
    import os
    import shutil

    if not os.path.isdir(d):
        return
    for fn in os.listdir(d):
        if _STALE_RE.match(fn):
            p = os.path.join(d, fn)
            shutil.rmtree(p, ignore_errors=True) if os.path.isdir(p) \
                else os.remove(p)


def _write_emit_segment(df, d: str, seq: int, *, base: bool = False,
                        num_parts: int = 1):
    """Stage-then-rename write of one emissions segment, range-partitioned by
    out_id (tight min/max stats per file for pruning) and sorted by the FULL
    fold key — a fresh segment is then directly foldable without another
    shuffle (groups are contiguous and internally ordered).

    ``nat_key`` is SORTED BY but not STORED (r4): it is a pure function of
    ``src_rid`` (byte-parity of the Python and JVM derivations is pinned by
    tests/test_values.py), and for padded ids it is the widest column in the
    row — deriving it at read time (:func:`_read_emit_log`) cuts emission
    shuffle and parquet bytes ~30% with identical fold order.

    (An r10/r11 variant additionally persisted the post-shuffle sorted
    frame so the first-build fold could skip the parquet decode
    round-trip.  r11 stage attribution killed it: building the
    InMemoryRelation columnar cache of the sorted emissions cost ~20
    executor-cpu-s at 600k rows — ~3× the decode it saved — so the fold
    now re-reads the freshly written (page-cache-hot) segment instead.)"""
    import os
    import shutil
    import uuid

    import time as _time
    _t0 = _time.time()
    _tr = (lambda tag: print(f"[emit_seg] {tag}: {_time.time() - _t0:.2f}s",
                             flush=True)) if os.environ.get("PO_LENS_TIMING") \
        else (lambda tag: None)
    os.makedirs(d, exist_ok=True)
    stage = os.path.join(d, f"_stage_{uuid.uuid4().hex}")
    # range partitioning SAMPLES the frame before shuffling it — two
    # full executions of the emissions plan (which sits on the fat map
    # output).  Persist across the pair; the THIN exploded frame
    # materializes once and the sample + shuffle passes read it instead
    # of re-running parse+explode over the map output (r11 stage
    # attribution: the sample pass alone was ~15 executor-cpu-s at 600k
    # rows when it re-derived from the fat frame).
    # NOTE: DataFrame.persist() returns the SAME object, so an
    # identity test (`cache is not df`) can never detect "we
    # persisted" — a previous guard written that way leaked this
    # cache on every build, and the leaked InMemoryRelation (which
    # pins the fat map output) degraded every LATER build in the
    # session by 3-25x measured CPU (r9 scale-probe finding).  Track
    # the decision in a boolean instead.
    persisted = num_parts > 1
    cache = df.persist() if persisted else df
    try:
        (cache.repartitionByRange(num_parts, "out_id")
         .sortWithinPartitions("out_id", "input_idx", "nat_key",
                               "src_rid", "emit_idx")
         .drop("nat_key")
         .write.mode("overwrite").parquet(stage))
    finally:
        if persisted:
            cache.unpersist(blocking=True)
    _tr("shuffle+sort+write")
    for fn in os.listdir(stage):
        if not fn.endswith(".parquet"):
            os.remove(os.path.join(stage, fn))
    final = os.path.join(d, f"seg_{seq:08d}.{'base' if base else 'delta'}.parquet")
    shutil.rmtree(final, ignore_errors=True)
    os.replace(stage, final)
    return final


def _read_emit_log(spark, segs: list[str]):
    """Read emission segments → the full fold frame, with ``nat_key``
    DERIVED from ``src_rid`` via the JVM natural-sort expression (stored
    segments don't carry it — r4).  The explicit column list also makes the
    read schema-stable across segment generations: pre-r4 segments that
    still store a ``nat_key`` column are pruned to the same seven columns,
    and the derived value is byte-identical to what they stored (parity
    test in tests/test_values.py)."""
    from pyspark.sql import functions as F

    from .values import natural_sort_col_expr

    return (spark.read.parquet(*segs)
            .select("path", "version", "out_id", "input_idx", "src_rid",
                    "emit_idx", "value")
            .withColumn("nat_key",
                        F.expr(natural_sort_col_expr("src_rid"))))


def _cache_keys_df(spark, segs: list[str]):
    """Current (path, version) of a cache segment log — a thin columnar read
    (record_id/seq/version/deleted only; the fat ``value`` column never
    leaves parquet), latest-wins window only when >1 segment.  ``seq`` is
    read purely for latest-wins resolution; the returned validity key is the
    row's *version* (survives cache compaction, which re-stamps seq)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if not segs:
        return None
    df = spark.read.parquet(*segs).select(
        F.col("record_id").alias("path"), "seq", "version", "deleted")
    if len(segs) > 1:
        w = Window.partitionBy("path").orderBy(F.desc("seq"))
        df = df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    return df.where(~F.col("deleted")).select("path", "version")


def _emissions_from_cache_df(df):
    """(path, input_idx, record_id, nat_key, outputs) → one row per emission
    (path, out_id, input_idx, nat_key, src_rid, emit_idx, value)."""
    from pyspark.sql import functions as F

    return df.select(
        "path", "input_idx", "nat_key",
        F.col("record_id").alias("src_rid"),
        F.explode(
            F.from_json("outputs", "array<struct<i:int,k:string,v:string>>")
        ).alias("e"),
    ).select("path", F.col("e.k").alias("out_id"), "input_idx", "nat_key",
             "src_rid", F.col("e.i").alias("emit_idx"),
             F.col("e.v").alias("value"))


def _parsed_cache_rows(df):
    """Cache rows (record_id=path, value=JSON) → flat struct columns + path."""
    from pyspark.sql import functions as F

    return df.select(
        F.col("record_id").alias("path"),
        F.from_json("value", _CACHE_VALUE_SCHEMA).alias("c"),
    ).select("path", "c.*")


def _compact_emissions(spark, store: DatasetStore, author: str, name: str, *,
                       extra=None, force: bool = False) -> None:
    """Fold the emissions log into one base segment of currently-valid rows
    (physical only, like cache compaction).

    Validity is the MAX-GENERATION rule: for each path still live in the
    cache, keep only its newest logged generation, and only if that
    generation is at or above the cache row's version.  The old exact
    (path, version) match was almost always identical but silently dropped
    the one legitimate above-row-version generation: a crashed build's
    re-run with extra churn stamps its re-emissions at the bumped
    collection version while the suppressed row keeps its old version —
    that newer generation is byte-identical to the correct emissions (hash
    suppression guarantees it) and must survive.  Duplicate copies of one
    generation (same path+version twice — possible in logs written before
    the r11 crash-heal) are collapsed here: copies are byte-identical, so
    ``dropDuplicates`` on the emission key is exact.

    ``extra`` (heal path): additional already-valid rows to fold in — the
    generations :func:`_heal_crashed_build` regenerated from the cache.
    ``force``: compact even a 0/1-segment log (heal needs the validity
    sweep regardless of segment count)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    d = _emit_dir(store, author, name)
    segs = _emit_segments(store, author, name)
    if len(segs) <= 1 and extra is None and not force:
        # a single-segment log may still need the migration marker (a base
        # segment IS complete floor coverage: everything in it is valid)
        if segs and not _stale_marker_present(d):
            _install_stale_marker(d)
        return
    cache_meta = store.get_meta(author, _cache_name(name), source=_CACHE_SOURCE)
    keys = _cache_keys_df(spark, store._segments(cache_meta))  # noqa: SLF001
    cols = ["path", "version", *_EMIT_COLS]
    valid = None
    if segs:
        log = _read_emit_log(spark, segs)
        if keys is not None:
            gen_max = log.groupBy("path").agg(F.max("version").alias("_gmax"))
            valid = (log.join(gen_max, "path")
                     .where(F.col("version") == F.col("_gmax"))
                     .drop("_gmax")
                     .join(keys.select("path",
                                       F.col("version").alias("_rowv")),
                           "path")
                     .where(F.col("version") >= F.col("_rowv"))
                     .drop("_rowv")
                     .dropDuplicates(["path", "out_id", "input_idx",
                                      "src_rid", "emit_idx"])
                     .select(*cols))
        else:
            valid = log.limit(0).select(*cols)
    if extra is not None:
        extra = extra.select(*cols)
        valid = extra if valid is None else valid.unionByName(extra)
    final = None
    if valid is not None:
        n = valid.count()
        num_parts = max(1, min(256, n // 200_000 + 1))
        final = _write_emit_segment(valid, d, cache_meta.last_seq, base=True,
                                    num_parts=num_parts)
    if os.path.isdir(d):
        # dir-wide sweep (not just `segs`): invisible orphans — e.g. a
        # delta segment written at a base segment's seq — never appear in
        # _emit_segments and would otherwise linger forever
        for fn in os.listdir(d):
            if not _EMIT_SEG_RE.match(fn):
                continue
            p = os.path.join(d, fn)
            if final is None or os.path.abspath(p) != os.path.abspath(final):
                shutil.rmtree(p, ignore_errors=True) if os.path.isdir(p) \
                    else os.remove(p)
    # floors are redundant against a freshly-compacted (all-valid) log
    _drop_stale_floors(d)
    _install_stale_marker(d)


def _heal_crashed_build(spark, store: DatasetStore, author: str,
                        name: str) -> None:
    """Restore the emissions-log invariant after a crashed build (the
    ``_build_inflight`` marker outlived its build — see the crash-safety
    comment above :data:`_INFLIGHT_MARKER`).

    The cache is authoritative: any live cache row whose newest logged
    generation is below the row's version lost its emissions to the crash
    window between the cache write and the emit write — regenerate them
    straight from the cache value (``outputs`` is embedded; no re-map) and
    fold everything through a forced compaction, whose max-generation rule
    simultaneously drops superseded generations the crashed build's floors
    never got to kill.  The caller then forces a full re-reduce."""
    from pyspark.sql import functions as F

    cache_meta = store.get_meta(author, _cache_name(name), source=_CACHE_SOURCE)
    keys = _cache_keys_df(spark, store._segments(cache_meta))  # noqa: SLF001
    extra = None
    if keys is not None:
        segs = _emit_segments(store, author, name)
        missing = keys
        if segs:
            have_max = (_read_emit_log(spark, segs)
                        .groupBy("path").agg(F.max("version").alias("_gmax")))
            missing = (keys.join(have_max, "path", "left")
                       .where(F.col("_gmax").isNull()
                              | (F.col("_gmax") < F.col("version")))
                       .drop("_gmax"))
        cache_cur = store.read_df(spark, author, _cache_name(name),
                                  source=_CACHE_SOURCE)
        miss_rows = cache_cur.join(
            missing.select(F.col("path").alias("record_id")),
            "record_id", "left_semi")
        extra = (_emissions_from_cache_df(_parsed_cache_rows(miss_rows))
                 .join(keys, "path"))
    _compact_emissions(spark, store, author, name, extra=extra, force=True)


def create_lens(store: DatasetStore, author: str, name: str, *, inputs: list[str],
                code: str, memo: str = "", timeout_ms: float | None = 50.0):
    """Register a lens: validates code compiles (startup-error surface) and
    input paths parse; creates the output collection + compute cache.

    ``timeout_ms`` defaults to the reference's 50 ms-per-record envelope
    (defaults.lensTimeout, applied javascript-lens-worker.js:116,132-135);
    pass ``None`` to disable."""
    LensHarness(code)  # compile check
    for p in inputs:
        decode_path(p)
    config = {"inputs": inputs, "code": code, "mapType": "python",
              "timeout_ms": timeout_ms, "input_versions": {}}
    meta = store.create(author, name, source="lenses", memo=memo, config=config)
    store.create(author, _cache_name(name), source=_CACHE_SOURCE)
    # a recreated lens must not inherit a prior incarnation's emissions log
    import shutil

    shutil.rmtree(_emit_dir(store, author, name), ignore_errors=True)
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
        if dp.source == "meta":
            from .vfs import meta_vfs_df

            df = meta_vfs_df(spark, store).select(
                "record_id", "value",
                F.lit(None).cast("string").alias("hash"),
                F.array().cast("array<string>").alias("links"),
                F.lit(0).cast("long").alias("version"),
            )
        else:
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


def build_lens(spark, store: DatasetStore, author: str, name: str, *,
               count_outputs: bool = False) -> dict:
    """Incremental lens build (the reference's query execution, SURVEY §3.2).

    Returns build stats {mapped, outputs, version, records_changed};
    ``outputs`` is None unless ``count_outputs`` (the count is a whole extra
    job over the output collection — diagnostics, not engine logic).
    """
    import os as _os

    from pyspark.sql import functions as F

    _t0 = time.time()
    _trace = (lambda tag: print(f"[build_lens] {tag}: {time.time() - _t0:.2f}s",
                                flush=True)) if _os.environ.get("PO_LENS_TIMING") \
        else (lambda tag: None)

    meta = store.get_meta(author, name, source="lenses")
    cfg = meta.config
    code, input_paths = cfg["code"], cfg["inputs"]
    timeout_ms = cfg.get("timeout_ms")

    cache_meta = store.get_meta(author, _cache_name(name), source=_CACHE_SOURCE)
    first_build = cache_meta.version == 0
    input_seqs: dict = cfg.get("input_seqs", {})
    input_versions: dict = cfg.get("input_versions", {})

    # migration: an emissions log written before the stale-floor sidecar
    # existed lacks floors for its historical builds — fold it to a base
    # segment ONCE (compaction validates against the authoritative cache
    # keys and installs the marker); from then on validity is floor-based
    if not first_build and not _stale_marker_present(
            _emit_dir(store, author, name)):
        if _emit_segments(store, author, name):
            _compact_emissions(spark, store, author, name)

    # crash recovery: an inflight marker at build start means the previous
    # build died between its cache write and set_config (see the
    # crash-safety comment above _INFLIGHT_MARKER).  Heal the emissions
    # log from the authoritative cache, then force THIS build to re-reduce
    # every out_id.  first_build needs no heal: the full rebuild below
    # overwrites the output and re-emits everything anyway.
    heal_full = False
    if _inflight_marker_present(_emit_dir(store, author, name)):
        if not first_build:
            _heal_crashed_build(spark, store, author, name)
            heal_full = True
            _trace("heal")

    # ---- freshness: per-input DELTA SCAN over the segment log --------------
    # The log layout gives CDF semantics: segments with seq > the seq seen at
    # the last build hold exactly the changed rows (store-level hash
    # suppression guarantees unchanged rewrites produced no rows).  Cost of a
    # rebuild ∝ changed data, not collection size.  Fallbacks: an overwrite
    # since the last build (base segments drop keys silently) or a
    # recordID-selector input use a full diff against the cache; an input
    # whose version didn't advance contributes nothing at all (the
    # reference's inputVersions guard, lens.js:134-137).
    cache_cur = store.read_df(spark, author, _cache_name(name), source=_CACHE_SOURCE)
    cached_keys = cache_cur.select(
        F.col("record_id").alias("path"),
        F.get_json_object("value", "$.version").cast("long").alias("cached_version"),
    )

    seen: set[str] = set()
    fresh_parts = []   # map-phase inputs (input_idx..value)
    gone_parts = []    # cache paths to prune
    next_seqs: dict = {}
    next_versions: dict = {}
    all_delta = True   # every input took the delta branch (gone bounded)
    delta_bytes = 0    # driver-side delta size estimate (file metadata);
    delta_sized = True  # False when any input's fresh size is unknowable
    for idx, p in enumerate(input_paths):
        dp = decode_path(p)
        if dp.collection_path in seen:  # duplicate input paths: first wins
            continue
        seen.add(dp.collection_path)
        if dp.source == "meta":
            im_version, im_seq, im_base = 0, 0, 0  # virtual: always full scan
        else:
            im = store.get_meta(dp.author, dp.name, source=dp.source)
            im_version, im_seq, im_base = im.version, im.last_seq, im.base_seq
        next_seqs[p] = im_seq
        next_versions[p] = im_version
        since_seq = input_seqs.get(p)
        last_version = input_versions.get(p)

        def with_provenance(df, idx=idx, dp=dp):
            return df.select(
                F.lit(idx).alias("input_idx"),
                F.concat(F.lit(dp.collection_path + "/records/"),
                         F.col("record_id")).alias("path"),
                F.lit(dp.source).alias("source"),
                F.lit(dp.author).alias("author"),
                F.lit(dp.name).alias("name"),
                "record_id", "version", "value",
            )

        prefix = dp.collection_path + "/records/"
        if (since_seq is not None and last_version is not None
                and dp.record_id is None and dp.source != "meta"
                and im_base <= since_seq):
            if im_version <= last_version:
                continue  # version guard: untouched input, zero work
            delta_rows = store.read_delta_df(spark, dp.author, dp.name,
                                             since_seq, source=dp.source)
            delta_bytes += store.delta_bytes(dp.author, dp.name, since_seq,
                                             source=dp.source)
            fresh_parts.append(with_provenance(
                delta_rows.where(~F.col("deleted")
                                 & (F.col("version") > F.lit(last_version)))))
            gone_parts.append(delta_rows.where(F.col("deleted")).select(
                F.concat(F.lit(prefix), F.col("record_id")).alias("path")))
        else:
            # full diff: current rows vs cached (first build / post-overwrite
            # / record selector / meta source)
            all_delta = False
            delta_sized = False  # fresh set size unknowable pre-diff
            cur = _load_inputs(spark, store, [p]).withColumn("input_idx", F.lit(idx))
            my_cached = cached_keys.where(F.col("path").startswith(prefix))
            joined = cur.join(my_cached, "path", "left")
            fresh_parts.append(joined.where(
                F.col("cached_version").isNull()
                | (F.col("version") > F.col("cached_version"))
            ).drop("cached_version"))
            gone_parts.append(my_cached.join(cur.select("path"), "path",
                                             "left_anti").select("path"))

    if not fresh_parts:
        # every input version-guarded: O(1) no-op rebuild — no Spark job, no
        # version churn, no change event (nothing advanced, so the cursors
        # are already current)
        out_meta = store.get_meta(author, name, source="lenses")
        return {"mapped": 0, "outputs": None, "version": out_meta.version,
                "records_changed": False}

    fresh = fresh_parts[0]
    for d in fresh_parts[1:]:
        fresh = fresh.unionByName(d)

    # ---- map phase over fresh records only --------------------------------
    # The per-record ``exec`` is the CPU-bound stage of the whole build, but
    # its natural partitioning is whatever the upstream scan/shuffle left
    # (AQE's 64MB advisory coalesces a 600k-row delta to 1-2 partitions —
    # sized for shuffle IO, ~30x under-parallel for Python execution).
    # Round-robin to the session's parallelism, CAPPED by a driver-side
    # estimate of the delta's on-disk bytes (~1 MB of parquet per Python
    # task): the shuffle moves a few dozen MB once and the exec stage uses
    # every core when there's work for every core — while a point update
    # maps in ONE task instead of fanning 32 near-empty Python workers,
    # whose per-stage overhead dominated the small-delta rebuild constant
    # (r10 probe: 38 stages / 45 user-cpu-s for a 1-record delta).  The
    # persisted map output inherits this width, so every downstream stage
    # shrinks with it.  Same sizing a cluster job would pick for a
    # CPU-bound stage (2-3x total cores, less when the input is tiny).
    par = spark.sparkContext.defaultParallelism
    if delta_sized:
        par = max(1, min(par, delta_bytes // (1 << 20) + 1))
    fresh = fresh.repartition(par)
    # persist: the expensive map phase must run exactly once even though the
    # cache write, the emissions write, and the reduce all derive from it
    mapped = map_records(fresh, code, timeout_ms).persist()
    with job_desc(spark, f"lens {author}:{name} map"):
        n_fresh = mapped.count()
    _trace(f"map+count(n={n_fresh})")

    # the cache-entry envelope is assembled canonically in codegen from the
    # thin map columns (the map output no longer carries the fat duplicate),
    # so the cache write hashes JVM-side (precanonical) as before
    cache_entries = mapped.select(F.col("path").alias("record_id"),
                                  _cache_entry_value_col().alias("value"))

    # prune cache entries whose input row disappeared (ref lens.js:192-199)
    gone_paths = gone_parts[0]
    for d in gone_parts[1:]:
        gone_paths = gone_paths.unionByName(d)
    gone = gone_paths.select(F.col("path").alias("record_id"),
                             F.lit(None).cast("string").alias("value"))
    delta = cache_entries.unionByName(gone)
    pre_segs = store._segments(cache_meta)  # noqa: SLF001 — pre-write log
    # small all-delta batches: collect the touched paths once — they scope
    # the cache write's suppression read (point write reads a filtered
    # scan, not the whole cache state) and the output write reuses the
    # affected-id list the same way below.  The limit probe keeps the
    # driver safe: an over-cap delta simply falls back to the join plan.
    delta_paths = mapped.select("path").unionByName(gone_paths)
    with job_desc(spark, f"lens {author}:{name} delta probe"):
        delta_id_rows = (delta_paths.limit(AFFECTED_COLLECT_MAX + 1).collect()
                         if (not first_build and all_delta
                             and n_fresh <= AFFECTED_COLLECT_MAX) else None)
    delta_ids = ([r["path"] for r in delta_id_rows]
                 if delta_id_rows is not None
                 and len(delta_id_rows) <= AFFECTED_COLLECT_MAX else None)
    # inflight marker: from the cache write to set_config this build holds
    # partially-committed state; a crash in the window is detected and
    # healed by the next build (crash-safety comment at _INFLIGHT_MARKER)
    emit_d = _emit_dir(store, author, name)
    _install_inflight_marker(emit_d)
    store.write_entries_df(spark, author, _cache_name(name), delta,
                           assume_unique_ids=True,
                           source=_CACHE_SOURCE, precanonical=True,
                           no_links=True, suppress_scope_ids=delta_ids)
    _trace("cache_write")
    cache_meta_now = store.get_meta(author, _cache_name(name),
                                    source=_CACHE_SOURCE)
    seq_now = cache_meta_now.last_seq       # emission SEGMENT numbering
    ver_now = cache_meta_now.version        # per-row validity stamp

    # ---- reduce ------------------------------------------------------------
    # Emissions come from the EMISSIONS STORE (exploded at write time,
    # range-sorted by out_id), not from re-parsing the cache.  On incremental
    # rebuilds only *affected* out_ids are re-reduced: keys touched by fresh
    # map results, by the pre-change emissions of re-mapped paths, or by
    # pruned paths.  Gathering those keys' emissions is a PRUNED scan — the
    # ``out_id IN (...)`` predicate pushes into the sorted parquet and skips
    # non-matching row groups; validity (latest generation only) is a thin
    # (path, version) join, never a fat-value parse.  Untouched keys keep their
    # stored reduction — at 100 TB a point-write re-reduces a handful of
    # keys reading a handful of row groups (the reference re-folds everything
    # each build, lens.js:204-225; this is strictly stronger incrementality).
    old_emit_segs = _emit_segments(store, author, name)
    # emissions come straight off the persisted map result — only the
    # ``outputs`` column is parsed, never the full cache-entry JSON
    emit_delta = (_emissions_from_cache_df(mapped)
                  .withColumn("version", F.lit(ver_now)))

    pre_write_version = store.get_meta(author, name, source="lenses").version
    if first_build:
        # ~20k rows/file: single-row-group files (foldable without a
        # shuffle) AND enough files that the direct fold uses every core
        num_parts = max(1, min(256, n_fresh // 20_000 + 1))
        with job_desc(spark, f"lens {author}:{name} emit write"):
            seg_path = _write_emit_segment(
                emit_delta, emit_d, seq_now, base=True, num_parts=num_parts)
        _install_stale_marker(emit_d)  # base segment = complete coverage
        _trace("emit_write")
        # Fold off the just-written segment (page-cache-hot): ~20k-row
        # single-row-group files are never split, so every out_id group is
        # contiguous and in fold order within its read partition.  (An
        # r10/r11 variant persisted the post-shuffle sorted frame to skip
        # this decode; the InMemoryRelation build cost ~3× the decode —
        # see _write_emit_segment.)
        reduced = reduce_outputs(
            _read_emit_log(spark, [seg_path]).select(*_EMIT_COLS),
            presorted=True)
        stats_meta = store.write_entries_df(spark, author, name, reduced,
                                            source="lenses",
                                            overwrite=True,
                                            precanonical=True,
                                            assume_unique_ids=True)
    else:
        if n_fresh > 0:
            num_parts = max(1, min(256, n_fresh // 20_000 + 1))
            with job_desc(spark, f"lens {author}:{name} emit write"):
                _write_emit_segment(emit_delta, emit_d, seq_now,
                                    num_parts=num_parts)
            _trace("emit_write")
        if old_emit_segs:
            old_log = _read_emit_log(spark, old_emit_segs)
        else:
            # migration backfill (store predates the emissions log): derive
            # the valid pre-state log from the cache once, attach each path's
            # current cache-row version, and persist it so every later build
            # prunes
            bk_keys = _cache_keys_df(spark, pre_segs)
            state_emits = _emissions_from_cache_df(
                _parsed_cache_rows(cache_cur)).join(bk_keys, "path")
            seg_path = _write_emit_segment(
                state_emits, emit_d, max(0, seq_now - 1), base=True,
                num_parts=32)
            old_log = _read_emit_log(spark, [seg_path])
            _trace("emit_backfill")

        # read PRIOR floors first: this build's own floors only affect its
        # delta paths, which the gather below excludes outright (anti-join)
        # — so right after a compaction (zero floor files) the validity
        # join disappears from the plan entirely
        floors = _read_stale_floors(spark, emit_d)

        # stale-floor sidecar (see the module comment above
        # _stale_marker_present): every path this build touched gets floor
        # ver_now — its new generation (if any) is AT ver_now and survives;
        # every older generation dies.  Written UNCONDITIONALLY: when the
        # cache write was fully suppressed (a crashed build's re-run —
        # identical values, version unchanged) the floors are exactly what
        # the crash may have lost, and a floor at the current version never
        # kills a current-generation row.  When the delta-id list is
        # already on the driver (the suppress_scope collect) the write is
        # a single pyarrow file — zero Spark jobs on the point-update path.
        if delta_ids is not None:
            _write_stale_floors_local(delta_ids, ver_now, emit_d, seq_now)
        else:
            _write_stale_floors(
                delta_paths.withColumn("version",
                                       F.lit(ver_now).cast("long")),
                emit_d, seq_now)
        _trace("stale_write")

        # out_ids from NEW map results + from ALL logged generations of the
        # changed/pruned paths (a path-only semi-join: stale generations'
        # out_ids re-reduce too — idempotent, and it spares the build the
        # O(base) cache-key scan the exact-version match needed)
        new_ids = emit_delta.select("out_id")
        if heal_full:
            # post-crash: the dead build's output write / deletes never
            # ran, so ANY key may be stale — re-reduce every out_id in the
            # healed log plus every existing output record (records whose
            # emissions vanished entirely must re-check as deletes).
            # O(base) once, only after a detected crash.
            out_ids_cur = store.read_df(
                spark, author, name, source="lenses").select(
                F.col("record_id").alias("out_id"))
            affected = (new_ids.unionByName(old_log.select("out_id"))
                        .unionByName(out_ids_cur).distinct().persist())
        else:
            old_ids = (old_log.join(F.broadcast(delta_paths), "path",
                                    "left_semi").select("out_id"))
            affected = new_ids.unionByName(old_ids).distinct().persist()
        # one probe job replaces the old count()+collect() pair: collect up
        # to cap+1 rows — emptiness, the cap branch, AND the id list all
        # come out of the same scan (the persist materializes fully later,
        # under the deletes anti-join that needs it anyway)
        with job_desc(spark, f"lens {author}:{name} affected probe"):
            probe_rows = affected.limit(AFFECTED_COLLECT_MAX + 1).collect()
        n_affected = len(probe_rows)
        _trace(f"affected(n={n_affected}"
               f"{'+' if n_affected > AFFECTED_COLLECT_MAX else ''})")
        if n_affected == 0:
            stats_meta = store.get_meta(author, name, source="lenses")
        else:
            if n_affected <= AFFECTED_COLLECT_MAX:
                # driver-side key list ⇒ parquet pushdown prunes row groups
                # of the sorted log; the whole gather reads ~|affected| keys
                ids = [r["out_id"] for r in probe_rows]
                old_part = old_log.where(F.col("out_id").isin(ids))
                new_part = emit_delta.where(F.col("out_id").isin(ids))
            else:
                ids = None
                old_part = old_log.join(affected, "out_id", "left_semi")
                new_part = emit_delta.join(affected, "out_id", "left_semi")
            # validity: drop generations below their path's max floor
            # (PRIOR floors, read above before this build appended its
            # own).  Both join sides are O(churn)/O(affected) — AQE
            # broadcasts the aggregated floors; nothing here scales with
            # base size.
            if floors is not None:
                floor_max = floors.groupBy("path").agg(
                    F.max("version").alias("_floor"))
                valid_old = (old_part.join(floor_max, "path", "left")
                             .where(F.col("_floor").isNull()
                                    | (F.col("version") >= F.col("_floor")))
                             .drop("_floor"))
            else:
                valid_old = old_part
            # this build's emit_delta re-homes EVERY delta path at ver_now;
            # a surviving old-log generation of a delta path — possible at
            # version == ver_now when the cache write was fully
            # hash-suppressed (a crashed build's re-run gathering its own
            # orphaned segment) — would double the fold.  Exclude old rows
            # of delta paths outright: on non-suppressed builds the floors
            # already killed them, so this broadcast anti-join is a
            # semantic no-op there and O(churn) either way.
            valid_old = valid_old.join(F.broadcast(delta_paths),
                                       "path", "left_anti")
            gathered = valid_old.select(*_EMIT_COLS).unionByName(
                new_part.select(*_EMIT_COLS))
            reduced = reduce_outputs(gathered).persist()
            # materialize NOW: the write plan references `reduced` twice
            # (upserts + the deletes anti-join); an unmaterialized persist
            # would re-run the whole reduce per reference inside one job
            with job_desc(spark, f"lens {author}:{name} reduce"):
                n_reduced = reduced.count()
            _trace(f"reduce(n={n_reduced})")
            # affected ids with no remaining emissions are deleted outputs
            deletes = affected.join(
                reduced.select(F.col("record_id").alias("out_id")),
                "out_id", "left_anti"
            ).select(F.col("out_id").alias("record_id"),
                     F.lit(None).cast("string").alias("value"))
            # reduced is keyed by the fold's out_id groupBy; deletes are
            # an anti-join against it — unique by construction
            # every record_id written here is an affected out_id, so the
            # collected id list (when present) scopes the suppression read
            stats_meta = store.write_entries_df(
                spark, author, name, reduced.unionByName(deletes),
                source="lenses", precanonical=True, assume_unique_ids=True,
                suppress_scope_ids=ids)
            _trace("output_write")
            reduced.unpersist(blocking=True)
        affected.unpersist(blocking=True)
    mapped.unpersist(blocking=True)
    records_changed = stats_meta.version != pre_write_version

    # bookkeeping: input versions + segment positions consumed by this build
    # (ref lens.js:134-137,227 records inputVersions; input_seqs is the CDF
    # cursor for the next delta scan)
    cfg["input_seqs"], cfg["input_versions"] = next_seqs, next_versions
    store.set_config(author, name, cfg, source="lenses", memo=meta.memo)
    # the build's state is fully committed — clear the crash marker (the
    # compactions below are physical-only and individually crash-safe)
    _remove_inflight_marker(emit_d)

    # keep the cache + emissions logs short: the NEXT build's freshness read
    # is a window over cache segments and the gather unions emission
    # segments (compaction is physical only — no events, no versions; safe
    # here because every plan pinning old segments has run)
    if len(store._segments(cache_meta)) > 8:  # noqa: SLF001 — engine-internal
        store.compact_df(spark, author, _cache_name(name), source=_CACHE_SOURCE)
    if len(_emit_segments(store, author, name)) > 8:
        _compact_emissions(spark, store, author, name)
    # the OUTPUT collection also gains a segment per build; unchecked, the
    # suppression join inside every write pays an ever-taller latest-wins
    # window over the log
    if len(store._segments(stats_meta)) > 8:  # noqa: SLF001
        store.compact_df(spark, author, name, source="lenses")

    n_out = (store.read_df(spark, author, name, source="lenses").count()
             if count_outputs else None)
    _trace(f"n_out(n={n_out})")
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
