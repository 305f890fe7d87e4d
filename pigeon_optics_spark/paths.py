"""Data-path codec (ref ``library/models/codec/path.js:4-72``).

A data path addresses a collection or one record:

    /{source}/{author}:{name}
    /{source}/{author}:{name}/records/{recordID}

``source ∈ {datasets, lenses, meta}``.  Segments are percent-encoded.  In the
Spark engine a decoded path maps to a catalog identifier + an optional
``record_id`` predicate (partition-pruned point read).
"""

from __future__ import annotations

import re
import urllib.parse
from dataclasses import dataclass

SOURCES = ("datasets", "lenses", "meta")

_PATH_RE = re.compile(
    r"^/(?P<source>datasets|lenses|meta)"
    r"/(?P<author>[^:/]+):(?P<name>[^/]+)"
    r"(?:/records/(?P<record_id>.+))?$"
)


@dataclass(frozen=True)
class DataPath:
    source: str
    author: str
    name: str
    record_id: str | None = None

    @property
    def collection_path(self) -> str:
        return f"/{self.source}/{_enc(self.author)}:{_enc(self.name)}"

    @property
    def string(self) -> str:
        if self.record_id is None:
            return self.collection_path
        return f"{self.collection_path}/records/{_enc(self.record_id)}"


def _enc(seg: str) -> str:
    # percent-encode ':' and '/' and '%' inside segments (ref path.js:29-49)
    return urllib.parse.quote(seg, safe="")


def _dec(seg: str) -> str:
    return urllib.parse.unquote(seg)


def encode_path(source: str, author: str, name: str, record_id: str | None = None) -> str:
    if source not in SOURCES:
        raise ValueError(f"bad source {source!r}")
    return DataPath(source, author, name, record_id).string


def decode_path(path: str) -> DataPath:
    m = _PATH_RE.match(path)
    if not m:
        raise ValueError(f"not a data path: {path!r}")
    rid = m.group("record_id")
    return DataPath(
        source=m.group("source"),
        author=_dec(m.group("author")),
        name=_dec(m.group("name")),
        record_id=_dec(rid) if rid is not None else None,
    )
