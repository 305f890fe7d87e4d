"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The decode kernels themselves are STUBBED (this container has no
image/audio libraries): ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless ``fake=True``, in which case a deterministic
fake decoder produces metadata derived from the bytes — so the Spark-side
contract (schema, batch shape, partition behavior, null handling) is real
and tested end-to-end even though the pixel math is not.

Scale notes: media blobs ride in their own column so Parquet keeps them in
separate pages — metadata-only queries never read the bytes (column pruning);
decode stages are ``mapInPandas`` with bounded batch sizes
(``spark.sql.execution.arrow.maxRecordsPerBatch``) so a 4K frame batch can't
OOM an executor; frame sampling emits multiple rows per video via the
iterator contract (flatMap shape).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = (
    "media_id long, byte_len long, content_hash string, "
    "width int, height int, channels int, format string"
)

FRAME_SCHEMA = "media_id long, frame_no int, frame_hash string, ts_ms double"


def _fake_image_meta(data: bytes) -> tuple[int, int, int, str]:
    """Deterministic fake 'decode': dimensions derived from the content hash.
    Replace with PIL/OpenCV in a real deployment."""
    h = hashlib.sha256(data).digest()
    width = 64 + h[0] * 8
    height = 64 + h[1] * 8
    channels = 3 if h[2] % 2 == 0 else 4
    fmt = ["jpeg", "png", "webp"][h[3] % 3]
    return width, height, channels, fmt


def decode_image_meta(df: DataFrame, binary_col: str = "data",
                      id_col: str = "media_id", *, fake: bool = False) -> DataFrame:
    """binary column → typed image metadata rows via mapInPandas."""
    if not fake:
        raise NotImplementedError(
            "real image decoding needs PIL/OpenCV (not in this container); "
            "pass fake=True for the deterministic stub")

    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "byte_len", "content_hash",
                                    "width", "height", "channels", "format")}
            for mid, data in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(data) if data is not None else b""
                w, hgt, ch, fmt = _fake_image_meta(b)
                rows["media_id"].append(mid)
                rows["byte_len"].append(len(b))
                rows["content_hash"].append(hashlib.sha256(b).hexdigest())
                rows["width"].append(w)
                rows["height"].append(hgt)
                rows["channels"].append(ch)
                rows["format"].append(fmt)
            yield pd.DataFrame(rows)

    return df.select(id_col, binary_col).mapInPandas(run, schema=IMAGE_META_SCHEMA)


def sample_frames(df: DataFrame, binary_col: str = "data",
                  id_col: str = "media_id", every_n_bytes: int = 1024,
                  *, fake: bool = False) -> DataFrame:
    """Video frame sampling shape: one input row → N frame rows (flatMap via
    the mapInPandas iterator contract).  Fake kernel hashes fixed-size byte
    windows as stand-in 'frames'."""
    if not fake:
        raise NotImplementedError(
            "real frame extraction needs ffmpeg/PyAV (not in this container); "
            "pass fake=True for the deterministic stub")

    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "frame_no", "frame_hash", "ts_ms")}
            for mid, data in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(data) if data is not None else b""
                for i, off in enumerate(range(0, max(len(b), 1), every_n_bytes)):
                    window = b[off:off + every_n_bytes]
                    rows["media_id"].append(mid)
                    rows["frame_no"].append(i)
                    rows["frame_hash"].append(hashlib.sha256(window).hexdigest())
                    rows["ts_ms"].append(i * 40.0)  # fake 25fps
            yield pd.DataFrame(rows)

    return df.select(id_col, binary_col).mapInPandas(run, schema=FRAME_SCHEMA)
