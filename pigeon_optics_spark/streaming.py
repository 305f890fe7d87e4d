"""M5 — the reactive layer: change feed, lens DAG auto-rebuild, SSE-style
subscriptions.

Reference semantics (SURVEY §2.9, §3.1):

- every mutation emits ``{path, source, author, name, version}``
  (ref `library/utility/update-events.js:7-14`) — the store already appends
  one JSON file per batch under ``<root>/changes/``, which is exactly the
  layout Structured Streaming's file source tails;
- a global listener maps changed paths to subscribed lenses by scanning all
  lens configs and rebuilds them serially; cascades propagate transitively
  because a lens build emits its own change event
  (ref `library/models/lens.js:351-367`, input map `:66-81`);
- on boot the current version of every collection is re-broadcast so
  subscribers catch up (ref `update-events.js:17-35`);
- SSE endpoint per collection: current version on connect, then every
  update (ref `export-controller.js:153-176`).

Spark-first restatement: the change feed is a streaming *table*; the lens
cascade is a ``foreachBatch`` driver over it.  Cascade termination is
guaranteed by the version guard: a lens build whose inputs didn't advance
past ``input_versions`` maps zero records and (by hash suppression) emits
no change event, so cycles converge instead of looping (the reference gets
the same property from ``inputVersions``, ref lens.js:134-137,227).
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Iterator

from .lens import build_lens
from .paths import decode_path, encode_path
from .store import DatasetStore

CHANGE_SCHEMA = ("path string, source string, author string, name string, "
                 "version long, ts double")


# --------------------------------------------------------------------------
# change feed
# --------------------------------------------------------------------------


def changes_dir(store: DatasetStore) -> str:
    return os.path.join(store.root, "changes")


def read_changes_df(spark, store: DatasetStore):
    """The change feed as a batch DataFrame."""
    d = changes_dir(store)
    if not os.listdir(d):
        from .store import empty_local_df
        return empty_local_df(spark, CHANGE_SCHEMA)
    return spark.read.schema(CHANGE_SCHEMA).json(d)


def read_changes_stream(spark, store: DatasetStore):
    """The change feed as a STREAMING DataFrame (file-source tail).  Compose
    with ``.writeStream.foreachBatch(...)`` for reactive jobs."""
    return spark.readStream.schema(CHANGE_SCHEMA).json(changes_dir(store))


def subscribe(store: DatasetStore, *, collection_path: str | None = None,
              after_ts: float = 0.0, poll_interval: float = 0.2,
              max_events: int | None = None,
              timeout: float | None = None) -> Iterator[dict]:
    """SSE-equivalent generator: yields change events in file order,
    optionally filtered to one collection; on connect yields the current
    version first (ref export-controller.js:153-176 sends the current
    version immediately)."""
    seen: set[str] = set()
    n = 0
    if collection_path is not None:
        dp = decode_path(collection_path)
        # filter on the CANONICAL path: events carry encode_path output,
        # so matching the caller's raw string would hang forever on any
        # name needing percent-encoding (review finding)
        collection_path = dp.collection_path
        meta = store.get_meta(dp.author, dp.name, source=dp.source)
        yield {"path": dp.collection_path, "source": dp.source,
               "author": dp.author, "name": dp.name,
               "version": meta.version, "ts": time.time(), "initial": True}
        n += 1
    deadline = None if timeout is None else time.time() + timeout
    d = changes_dir(store)
    while True:
        for fn in sorted(os.listdir(d)):
            if fn in seen or fn.endswith(".tmp"):
                continue
            try:
                with open(os.path.join(d, fn), encoding="utf-8") as f:
                    evt = json.load(f)
            except (OSError, json.JSONDecodeError):
                # do NOT mark seen: a file caught mid-write (or a listing
                # race) retries next poll instead of dropping the event
                # forever (review finding)
                continue
            seen.add(fn)
            if evt.get("ts", 0.0) <= after_ts:
                continue
            if collection_path is not None and evt.get("path") != collection_path:
                continue
            yield evt
            n += 1
            if max_events is not None and n >= max_events:
                return
        if deadline is not None and time.time() >= deadline:
            return
        time.sleep(poll_interval)


def boot_broadcast(store: DatasetStore) -> list[dict]:
    """Re-emit the current version of every collection (ref
    update-events.js:17-35): returns the catch-up event list."""
    events = []
    for meta in store._catalog.values():  # noqa: SLF001 — engine-internal
        events.append({
            "path": encode_path(meta.source, meta.author, meta.name),
            "source": meta.source, "author": meta.author, "name": meta.name,
            "version": meta.version, "ts": time.time(),
        })
    return sorted(events, key=lambda e: e["path"])


# --------------------------------------------------------------------------
# lens DAG
# --------------------------------------------------------------------------


def lens_input_map(store: DatasetStore) -> dict[str, list[tuple[str, str]]]:
    """collection_path → [(lens_author, lens_name)] subscribed to it
    (ref lens.js:66-81: recomputed by scanning all lens configs)."""
    out: dict[str, list[tuple[str, str]]] = {}
    for meta in store._catalog.values():  # noqa: SLF001
        if meta.source != "lenses" or "inputs" not in meta.config:
            continue
        for p in meta.config["inputs"]:
            dp = decode_path(p)
            out.setdefault(dp.collection_path, []).append((meta.author, meta.name))
    return out


def rebuild_affected(spark, store: DatasetStore, changed_paths: list[str],
                     *, max_rounds: int = 100) -> list[dict]:
    """Cascade: rebuild every lens subscribed to a changed path; a build that
    actually changed its output queues the lens's own path for the next
    round (transitive DAG propagation, ref lens.js:351-367).

    Convergence: a rebuild with no fresh inputs writes nothing (hash
    suppression) → its path does not requeue.  ``max_rounds`` bounds
    pathological cyclic configs.
    """
    frontier = list(dict.fromkeys(
        decode_path(p).collection_path for p in changed_paths))
    built: list[dict] = []
    for _ in range(max_rounds):
        if not frontier:
            break
        imap = lens_input_map(store)
        to_build: list[tuple[str, str]] = []
        for p in frontier:
            for lens_key in imap.get(p, []):
                if lens_key not in to_build:
                    to_build.append(lens_key)
        frontier = []
        for author, name in to_build:
            stats = build_lens(spark, store, author, name)
            built.append({"lens": f"{author}:{name}", **stats})
            if stats["records_changed"]:
                # canonical form — lens_input_map keys are
                # decode_path(...).collection_path, so a raw f-string
                # misses the dict for any name needing percent-encoding
                # and the cascade silently stops (review finding)
                frontier.append(encode_path("lenses", author, name))
    return built


def run_reactive(spark, store: DatasetStore, *, checkpoint_dir: str,
                 poll_interval: str = "1 second",
                 on_batch: Callable[[list[dict]], None] | None = None):
    """Continuous mode: Structured Streaming over the change feed,
    ``foreachBatch`` → lens cascade.  Returns the StreamingQuery (caller
    stops it).  One multiplexed driver per store, as SURVEY §2.9 prescribes."""

    def process(batch_df, _batch_id: int):
        changed = [r["path"] for r in
                   batch_df.select("path").distinct().collect()]
        # skip events emitted BY lens builds we ran (they were handled as
        # cascade rounds already); rebuilding them again is a no-op anyway
        if not changed:
            return
        built = rebuild_affected(spark, store, changed)
        if on_batch is not None:
            on_batch(built)

    return (read_changes_stream(spark, store).writeStream
            .option("checkpointLocation", checkpoint_dir)
            .trigger(processingTime=poll_interval)
            .foreachBatch(process)
            .start())
