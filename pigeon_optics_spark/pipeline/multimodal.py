"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

Two kernel tiers:

- **Container/header parsing is REAL** (pure-Python byte parsing, no
  libraries): :func:`sniff_image_meta` reads PNG / GIF / BMP / JPEG headers
  for (width, height, channels, format); :func:`sniff_wav_meta` reads RIFF
  WAVE fmt chunks for (channels, sample rate, bit depth, duration);
  :func:`sniff_mp4_meta` box-walks ISO-BMFF (mp4/mov) moov/mvhd/tkhd for
  (timescale, duration, track count, presentation dims);
  :func:`gif_frame_index` enumerates animated-GIF frames.
  ``decode_image_meta(fake=False)`` / ``decode_audio_meta`` /
  ``decode_mp4_meta`` / ``enumerate_gif_frames`` use these.
- **Pixel/sample decode is STUBBED** (this container has no PIL/OpenCV/
  ffmpeg): frame extraction raises ``NotImplementedError`` unless
  ``fake=True``, in which case a deterministic fake kernel hashes byte
  windows — the Spark-side contract (schema, batch shape, flatMap
  iterator, null handling) is real and tested end-to-end even though the
  pixel math is not.

Scale notes: media blobs ride in their own column so Parquet keeps them in
separate pages — metadata-only queries never read the bytes (column pruning);
decode stages are ``mapInPandas`` with bounded batch sizes
(``spark.sql.execution.arrow.maxRecordsPerBatch``) so a 4K frame batch can't
OOM an executor; frame sampling emits multiple rows per video via the
iterator contract (flatMap shape).
"""

from __future__ import annotations

import hashlib
import re
import struct
from typing import Iterator

from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = (
    "media_id long, byte_len long, content_hash string, "
    "width int, height int, channels int, format string"
)

AUDIO_META_SCHEMA = (
    "media_id long, byte_len long, channels int, sample_rate int, "
    "bits_per_sample int, duration_ms double, format string"
)

FRAME_SCHEMA = "media_id long, frame_no int, frame_hash string, ts_ms double"

GIF_FRAME_SCHEMA = ("media_id long, frame_no int, x int, y int, "
                    "width int, height int, ts_ms double")

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
#: JPEG start-of-frame markers (baseline/progressive/etc.); C4=DHT, C8=JPG
#: extension and CC=DAC are not SOFs.
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def sniff_image_meta(data: bytes) -> tuple[int, int, int, str] | None:
    """(width, height, channels, format) from container headers, or None if
    the bytes are not a recognized image.  Pure byte parsing — real decode
    of real files, no image library."""
    if len(data) >= 24 and data[:8] == b"\x89PNG\r\n\x1a\n" and data[12:16] == b"IHDR":
        w, h = struct.unpack(">II", data[16:24])
        color_type = data[25] if len(data) > 25 else 6
        return w, h, _PNG_CHANNELS.get(color_type, 3), "png"
    if len(data) >= 10 and data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", data[6:10])
        return w, h, 3, "gif"
    if len(data) >= 30 and data[:2] == b"BM":
        header_size = struct.unpack("<I", data[14:18])[0]
        if header_size >= 40:  # BITMAPINFOHEADER family
            w, h = struct.unpack("<ii", data[18:26])
            bpp = struct.unpack("<H", data[28:30])[0]
            return w, abs(h), max(1, bpp // 8), "bmp"
    if len(data) >= 4 and data[:2] == b"\xff\xd8":
        # scan marker segments for a start-of-frame
        i = 2
        while i + 4 <= len(data):
            if data[i] != 0xFF:
                break
            # 0xFF fill bytes are legal padding between segments — skip them
            # so the marker byte is never read from a padding position
            while i + 1 < len(data) and data[i + 1] == 0xFF:
                i += 1
            if i + 4 > len(data):
                break
            marker = data[i + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                i += 2
                continue
            seg_len = struct.unpack(">H", data[i + 2:i + 4])[0]
            if marker in _JPEG_SOF and i + 9 <= len(data):
                h, w = struct.unpack(">HH", data[i + 5:i + 9])
                n_comp = data[i + 9] if i + 9 < len(data) else 3
                return w, h, n_comp, "jpeg"
            i += 2 + seg_len
    return None


def sniff_wav_meta(data: bytes) -> tuple[int, int, int, float] | None:
    """(channels, sample_rate, bits_per_sample, duration_ms) from a RIFF
    WAVE header, or None.  Walks the chunk list for fmt/data."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    i = 12
    channels = rate = bits = None
    data_len = None
    while i + 8 <= len(data):
        cid = data[i:i + 4]
        clen = struct.unpack("<I", data[i + 4:i + 8])[0]
        if cid == b"fmt " and i + 24 <= len(data):
            channels, rate = struct.unpack("<HI", data[i + 10:i + 16])
            bits = struct.unpack("<H", data[i + 22:i + 24])[0]
        elif cid == b"data":
            data_len = clen
        i += 8 + clen + (clen % 2)  # chunks are word-aligned
    if channels is None or not rate:
        return None
    byte_rate = rate * channels * max(1, (bits or 8) // 8)
    duration_ms = (data_len / byte_rate * 1000.0) if data_len else 0.0
    return channels, rate, bits or 8, duration_ms


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
    """binary column → typed image metadata rows via mapInPandas.

    ``fake=False`` (default) parses REAL container headers
    (:func:`sniff_image_meta`); unrecognized bytes get format='unknown' and
    null dimensions.  ``fake=True`` keeps the deterministic stub for driving
    the plumbing with arbitrary (non-image) bytes."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "byte_len", "content_hash",
                                    "width", "height", "channels", "format")}
            for mid, data in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(data) if data is not None else b""
                if fake:
                    w, hgt, ch, fmt = _fake_image_meta(b)
                else:
                    sniffed = sniff_image_meta(b)
                    w, hgt, ch, fmt = sniffed if sniffed is not None else (
                        None, None, None, "unknown")
                rows["media_id"].append(mid)
                rows["byte_len"].append(len(b))
                rows["content_hash"].append(hashlib.sha256(b).hexdigest())
                rows["width"].append(w)
                rows["height"].append(hgt)
                rows["channels"].append(ch)
                rows["format"].append(fmt)
            yield pd.DataFrame(rows)

    return df.select(id_col, binary_col).mapInPandas(run, schema=IMAGE_META_SCHEMA)


def decode_audio_meta(df: DataFrame, binary_col: str = "data",
                      id_col: str = "media_id") -> DataFrame:
    """binary column → typed audio metadata rows (REAL RIFF/WAVE header
    parse, :func:`sniff_wav_meta`); non-WAV bytes get format='unknown'."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "byte_len", "channels",
                                    "sample_rate", "bits_per_sample",
                                    "duration_ms", "format")}
            for mid, data in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(data) if data is not None else b""
                sniffed = sniff_wav_meta(b)
                if sniffed is None:
                    ch, rate, bits, dur = None, None, None, None
                    fmt = "unknown"
                else:
                    ch, rate, bits, dur = sniffed
                    fmt = "wav"
                rows["media_id"].append(mid)
                rows["byte_len"].append(len(b))
                rows["channels"].append(ch)
                rows["sample_rate"].append(rate)
                rows["bits_per_sample"].append(bits)
                rows["duration_ms"].append(dur)
                rows["format"].append(fmt)
            yield pd.DataFrame(rows)

    return df.select(id_col, binary_col).mapInPandas(run, schema=AUDIO_META_SCHEMA)


def gif_frame_index(data: bytes) -> list[tuple[int, int, int, int, int, float]]:
    """REAL frame enumeration for animated GIFs by block-walk — NO pixel
    decode, no external library: ``[(frame_no, x, y, width, height, ts_ms)]``
    per image descriptor.

    Walks the GIF grammar (GIF89a spec, Appendix A): header + logical screen
    descriptor (skipping the global color table), then blocks — 0x21
    extensions (a Graphic Control Extension's delay field, in centiseconds,
    is the presentation delay carried into the NEXT image descriptor), 0x2C
    image descriptors (left/top/width/height, skipping any local color table
    and the LZW sub-block chain), 0x3B trailer.  ``ts_ms`` of frame *i* is
    the cumulative delay of frames ``0..i-1`` (frame 0 shows at t=0).
    Truncated or non-GIF bytes yield the frames parsed so far ([] if none).
    """
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        return []
    packed = data[10]
    i = 13
    if packed & 0x80:  # global color table: 3 * 2^(N+1) bytes
        i += 3 * (2 << (packed & 0x07))
    frames: list[tuple[int, int, int, int, int, float]] = []
    pending_delay_cs = 0
    t_ms = 0.0
    while i < len(data):
        block = data[i]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-block chain
            if i + 2 > len(data):
                break
            label = data[i + 1]
            i += 2
            while i < len(data) and data[i] != 0:
                sz = data[i]
                if label == 0xF9 and sz >= 4 and i + 4 <= len(data):
                    pending_delay_cs = struct.unpack(
                        "<H", data[i + 2:i + 4])[0]
                i += 1 + sz
            i += 1  # block terminator
        elif block == 0x2C:  # image descriptor
            if i + 10 > len(data):
                break
            x, y, w, h = struct.unpack("<HHHH", data[i + 1:i + 9])
            fpacked = data[i + 9]
            i += 10
            if fpacked & 0x80:  # local color table
                i += 3 * (2 << (fpacked & 0x07))
            i += 1  # LZW minimum code size
            while i < len(data) and data[i] != 0:
                i += 1 + data[i]
            i += 1
            frames.append((len(frames), x, y, w, h, t_ms))
            t_ms += pending_delay_cs * 10.0
            pending_delay_cs = 0
        else:
            break  # unknown block type: stop rather than misparse
    return frames


def enumerate_gif_frames(df: DataFrame, binary_col: str = "data",
                         id_col: str = "media_id") -> DataFrame:
    """binary column → one row per REAL GIF frame (:func:`gif_frame_index`)
    via the mapInPandas flatMap contract; non-GIF bytes contribute no rows.
    This is the real-kernel sibling of :func:`sample_frames`' fake stub —
    frame *enumeration* needs only the block grammar, no pixel decode."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "frame_no", "x", "y",
                                    "width", "height", "ts_ms")}
            for mid, data in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(data) if data is not None else b""
                for n, x, y, w, h, ts in gif_frame_index(b):
                    rows["media_id"].append(mid)
                    rows["frame_no"].append(n)
                    rows["x"].append(x)
                    rows["y"].append(y)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["ts_ms"].append(ts)
            yield pd.DataFrame(rows)

    return df.select(id_col, binary_col).mapInPandas(
        run, schema=GIF_FRAME_SCHEMA)


MP4_META_SCHEMA = ("media_id long, byte_len long, timescale int, "
                   "duration_ms double, n_tracks int, width int, height int, "
                   "format string")


def _bmff_boxes(data: bytes, start: int, end: int):
    """Yield ``(type, payload_start, box_end)`` for each ISO-BMFF box in
    ``data[start:end]``.  Handles 32-bit sizes, ``size==1`` + 64-bit
    largesize, and ``size==0`` (box runs to the end of the enclosing
    scope).  Stops cleanly on truncated/garbage bytes."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(data[i:i + 4], "big")
        btype = data[i + 4:i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                return
            size = int.from_bytes(data[i + 8:i + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr or i + size > end:
            return
        yield btype, i + hdr, i + size
        i += size


def sniff_mp4_meta(data: bytes) \
        -> tuple[int, int, float, int, int | None, int | None] | None:
    """(timescale, duration, duration_ms, n_tracks, width, height) from an
    ISO-BMFF (mp4/mov) container by box-walk — REAL parse of the moov/mvhd/
    trak/tkhd grammar (ISO 14496-12 §8.2/§8.3), no pixel or sample decode,
    no external library.  The same kernel class as the GIF block-walk:
    container metadata is byte arithmetic, only frame DECODE needs ffmpeg.

    mvhd carries the movie timescale (units/second) and duration (units);
    each tkhd carries 16.16 fixed-point presentation width/height — the
    first track with a nonzero width is reported (video track; audio tracks
    store 0x0).  Both v0 (32-bit times) and v1 (64-bit) layouts are parsed.
    Returns None for non-BMFF bytes (no leading ftyp or no moov/mvhd).
    """
    top = list(_bmff_boxes(data, 0, len(data)))
    if not top or top[0][0] != b"ftyp":
        return None
    timescale = duration = None
    n_tracks = 0
    width = height = None
    for btype, s, e in top:
        if btype != b"moov":
            continue
        for bt2, s2, e2 in _bmff_boxes(data, s, e):
            if bt2 == b"mvhd" and s2 < e2:
                v = data[s2]
                if v == 1 and s2 + 32 <= e2:
                    timescale = int.from_bytes(data[s2 + 20:s2 + 24], "big")
                    duration = int.from_bytes(data[s2 + 24:s2 + 32], "big")
                elif v == 0 and s2 + 20 <= e2:
                    timescale = int.from_bytes(data[s2 + 12:s2 + 16], "big")
                    duration = int.from_bytes(data[s2 + 16:s2 + 20], "big")
            elif bt2 == b"trak":
                n_tracks += 1
                for bt3, s3, e3 in _bmff_boxes(data, s2, e2):
                    if bt3 != b"tkhd" or s3 >= e3:
                        continue
                    # payload offset of the 16.16 width field: version+flags
                    # (4) + times/track_id/reserved/duration (32 for v1,
                    # 20 for v0) + reserved/layer/group/volume (16) +
                    # matrix (36)
                    off = s3 + (88 if data[s3] == 1 else 76)
                    if off + 8 <= e3:
                        w = int.from_bytes(data[off:off + 4], "big") >> 16
                        h = int.from_bytes(data[off + 4:off + 8], "big") >> 16
                        if width is None and w:
                            width, height = w, h
    if timescale is None or duration is None:
        return None
    duration_ms = duration / timescale * 1000.0 if timescale else 0.0
    return timescale, duration, duration_ms, n_tracks, width, height


def decode_mp4_meta(df: DataFrame, binary_col: str = "data",
                    id_col: str = "media_id") -> DataFrame:
    """binary column → typed mp4/ISO-BMFF container metadata rows (REAL
    box-walk, :func:`sniff_mp4_meta`); non-BMFF bytes get format='unknown'
    with null fields.  Same mapInPandas shape as the image/audio decoders."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "byte_len", "timescale",
                                    "duration_ms", "n_tracks", "width",
                                    "height", "format")}
            for mid, data in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(data) if data is not None else b""
                sniffed = sniff_mp4_meta(b)
                if sniffed is None:
                    ts, dur_ms, nt, w, h, fmt = None, None, None, None, None, "unknown"
                else:
                    ts, _dur, dur_ms, nt, w, h = sniffed
                    fmt = "mp4"
                rows["media_id"].append(mid)
                rows["byte_len"].append(len(b))
                rows["timescale"].append(ts)
                rows["duration_ms"].append(dur_ms)
                rows["n_tracks"].append(nt)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["format"].append(fmt)
            yield pd.DataFrame(rows)

    return df.select(id_col, binary_col).mapInPandas(run, schema=MP4_META_SCHEMA)


def sample_frames(df: DataFrame, binary_col: str = "data",
                  id_col: str = "media_id", every_n_bytes: int = 1024,
                  *, fake: bool = False) -> DataFrame:
    """Video frame sampling shape: one input row → N frame rows (flatMap via
    the mapInPandas iterator contract).  Fake kernel hashes fixed-size byte
    windows as stand-in 'frames'.  For GIF containers the REAL sibling is
    :func:`enumerate_gif_frames` (block-walk, no pixel decode); still-image
    PIXEL decode is real for PNG (:func:`decode_png_pixels` — zlib + full
    scanline-filter inversion) and sample decode for PCM audio
    (:func:`wav_pcm_stats`), leaving inter-frame VIDEO codecs (mp4/webm)
    as the one genuinely env-bound kernel (needs ffmpeg/PyAV)."""
    if not fake:
        raise NotImplementedError(
            "real frame extraction for INTER-FRAME-CODED video (h264/vp9/"
            "mp4/webm) needs ffmpeg/PyAV (not in this container).  Real "
            "decode paths that DO exist: decode_avi_frames (uncompressed "
            "RIFF/AVI — full pixel frames, r6), enumerate_gif_frames "
            "(GIF), decode_png_pixels/decode_bmp_pixels (stills).  Pass "
            "fake=True for the deterministic byte-window stub")

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


def tar_member_index(data: bytes) -> list[tuple[str, int, str, int]]:
    """Walk a (possibly ustar) tar archive's 512-byte header blocks and
    return ``(name, size, typeflag, offset)`` per member WITHOUT reading
    member payloads — the shard-manifest step for WebDataset-style
    tar-sharded training corpora (members are `<sample>.<ext>` files; the
    index is what a dataloader needs to plan reads).

    Real parsing: octal size field, checksum verification (unsigned sum
    with the checksum field as spaces), end-of-archive double zero block.
    Malformed headers raise ValueError — a corrupt shard should fail loudly
    in the manifest pass, not at read time.

    GNU longname ('L') / PAX ('x'/'g') special members are listed verbatim
    with their typeflag (their payloads are skipped correctly via the size
    field, so the walk stays aligned); callers that need extended names
    must post-process.  WebDataset shards are plain ustar in practice.
    """
    out: list[tuple[str, int, str, int]] = []
    off = 0
    n = len(data)
    while off + 512 <= n:
        hdr = data[off:off + 512]
        if hdr == b"\x00" * 512:
            break
        raw_size = hdr[124:136].rstrip(b"\x00 ")
        raw_chk = hdr[148:156].rstrip(b"\x00 ")
        try:
            size = int(raw_size or b"0", 8)
            chksum = int(raw_chk or b"0", 8)
        except ValueError as e:
            raise ValueError(f"bad tar header at offset {off}: {e}") from e
        calc = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if calc != chksum:
            raise ValueError(f"tar checksum mismatch at offset {off}")
        name = hdr[0:100].rstrip(b"\x00").decode("utf-8", "replace")
        typeflag = chr(hdr[156]) if hdr[156] else "0"
        if off + 512 + size > n:
            # header promises payload bytes the buffer doesn't have — a
            # manifest pointing past the shard is worse than an error
            raise ValueError(
                f"truncated tar: member {name!r} at offset {off} declares "
                f"{size} payload bytes but only {n - off - 512} remain")
        out.append((name, size, typeflag, off))
        off += 512 + ((size + 511) // 512) * 512
    else:
        # loop exhausted without seeing the zero terminator: any nonzero
        # trailing fragment is a member header cut mid-block
        rem = data[off:]
        if rem.strip(b"\x00"):
            raise ValueError(
                f"truncated tar: {len(rem)} trailing bytes at offset {off} "
                "are not a complete header block")
    return out


def write_tar(members: list[tuple[str, bytes]]) -> bytes:
    """Minimal deterministic ustar writer (regular files only): the
    fixture-side inverse of :func:`tar_member_index`, also usable to pack
    samples into WebDataset shards.  Zero mtime/uid/gid keeps output
    byte-stable for content addressing."""
    blocks: list[bytes] = []
    for name, payload in members:
        nb = name.encode("utf-8")
        if len(nb) > 100:
            raise ValueError(f"tar name too long: {name!r}")
        hdr = bytearray(512)
        hdr[0:len(nb)] = nb
        hdr[100:108] = b"0000644\x00"           # mode
        hdr[108:116] = b"0000000\x00"           # uid
        hdr[116:124] = b"0000000\x00"           # gid
        hdr[124:136] = b"%011o\x00" % len(payload)
        hdr[136:148] = b"00000000000\x00"       # mtime
        hdr[148:156] = b" " * 8                 # checksum placeholder
        hdr[156] = 0x30                          # typeflag '0' regular
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        chk = sum(hdr)
        hdr[148:156] = b"%06o\x00 " % chk
        blocks.append(bytes(hdr))
        blocks.append(payload)
        pad = (-len(payload)) % 512
        if pad:
            blocks.append(b"\x00" * pad)
    blocks.append(b"\x00" * 1024)
    return b"".join(blocks)


TAR_SCHEMA = ("media_id long, member_idx int, member_name string, "
              "member_size long, typeflag string")


def enumerate_tar_members(df: DataFrame, binary_col: str = "data",
                          id_col: str = "media_id") -> DataFrame:
    """flatMap one tar-shard row → one row per member via the manifest walk
    (Arrow-batched; payload bytes are never copied out of the buffer)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "member_idx", "member_name",
                                    "member_size", "typeflag")}
            for mid, data in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(data) if data is not None else b""
                for idx, (name, size, tf, _off) in \
                        enumerate(tar_member_index(b)):
                    rows["media_id"].append(mid)
                    rows["member_idx"].append(idx)
                    rows["member_name"].append(name)
                    rows["member_size"].append(size)
                    rows["typeflag"].append(tf)
            yield pd.DataFrame(rows)

    return df.select(id_col, binary_col).mapInPandas(run, schema=TAR_SCHEMA)


def pack_webdataset_shards(df: DataFrame, content_cols: dict[str, str],
                           id_col: str = "doc_id",
                           n_shards: int = 16) -> DataFrame:
    """Distributed WebDataset EXPORT: pack sample rows into tar shards —
    the write half of the shard story (:func:`enumerate_tar_members` is
    the read half).  ``content_cols`` maps extension → column (e.g.
    ``{"txt": "text", "jpg": "image_bytes"}``); each sample contributes
    one ``<id>.<ext>`` member per mapping, string columns UTF-8 encoded,
    binary passed through, NULLs skipped.

    → (shard_id, n_samples, n_members, shard BINARY), one row per
    non-empty shard.

    Scale shape: samples hash-assign to ``n_shards`` shards
    (deterministic in ``id_col``), ONE shuffle groups each shard's
    samples, and the tar bytes build executor-side in ``applyInPandas``
    — the driver never sees a shard.  Size shards via ``n_shards``
    (~corpus/n_shards samples each); members within a shard are
    id-ordered so output is byte-stable.
    """
    import pandas as pd

    from . import hash_bucket

    cols = [id_col] + sorted(set(content_cols.values()))
    exts = sorted(content_cols)

    def build(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col, kind="mergesort")
        # columnar extraction once; per-cell .iloc in the S*E loop is the
        # slowest pandas access pattern and dominates shard build time
        ids = pdf[id_col].tolist()
        col_vals = {ext: pdf[content_cols[ext]].tolist() for ext in exts}
        members: list[tuple[str, bytes]] = []
        for i, rid in enumerate(ids):
            for ext in exts:
                v = col_vals[ext][i]
                if v is None or (isinstance(v, float) and pd.isna(v)):
                    continue
                payload = v.encode("utf-8") if isinstance(v, str) else bytes(v)
                members.append((f"{rid}.{ext}", payload))
        return pd.DataFrame({
            "shard_id": [int(pdf["_shard"].iloc[0])],
            "n_samples": [len(pdf)],
            "n_members": [len(members)],
            "shard": [write_tar(members)],
        })

    from pyspark.sql import functions as F  # module top has no F import

    # NULL-id samples have no stable member name (and a NULL hash bucket
    # would crash the build task with an opaque int(NaN)): drop them
    with_shard = df.select(*cols).where(F.col(id_col).isNotNull()) \
        .withColumn(
            "_shard",
            (hash_bucket(F.col(id_col)) % F.lit(max(1, n_shards)))
            .cast("long"))
    return (with_shard.groupBy("_shard")
            .applyInPandas(build, schema="shard_id long, n_samples long, "
                                         "n_members long, shard binary"))


# --------------------------------------------------------------------------
# SRT timed text (subtitles / transcripts).  Video training corpora carry
# speech as SubRip files aligned to the footage; cue boundaries are what
# chunking, contamination checks, and audio/text alignment key on.  This
# is a REAL parser for the SubRip grammar (not a stub): numbered blocks
# separated by blank lines, a `HH:MM:SS,mmm --> HH:MM:SS,mmm` timing line
# (optional position metadata after the end stamp tolerated), then 1+
# payload lines.  Handles UTF-8 BOM, CRLF/LF, leading/trailing blank
# lines, and a missing final newline.  Malformed blocks (no timing line)
# are skipped rather than fatal — subtitle files in the wild are dirty.
# --------------------------------------------------------------------------

_SRT_TIME = re.compile(
    r"^(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})\s*-->\s*"
    r"(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})")


def parse_srt_cues(text: str) -> list[tuple[int, int, int, int, int]]:
    """Parse SubRip text into cues.

    Returns ``[(cue_index, start_ms, end_ms, n_lines, n_chars)]`` in file
    order; ``cue_index`` is the declared block number (or the running
    1-based position when the index line is absent/non-numeric — players
    do the same).  ``n_chars`` counts payload characters excluding line
    separators.
    """
    if text.startswith("﻿"):
        text = text[1:]
    cues: list[tuple[int, int, int, int, int]] = []
    # block separator: one or more blank-ISH lines (whitespace-only lines
    # count — real subtitle files ship "\n \n" separators)
    blocks = re.split(r"(?:\r\n|\n)(?:[ \t]*(?:\r\n|\n))+",
                      text.strip("\r\n \t"))
    pos = 0
    for block in blocks:
        lines = [ln.rstrip("\r") for ln in block.split("\n")]
        lines = [ln for ln in lines if ln.strip() != ""] or [""]
        idx: int | None = None
        ti = 0
        if lines and lines[0].strip().isdigit():
            idx = int(lines[0].strip())
            ti = 1
        if ti >= len(lines):
            continue
        m = _SRT_TIME.match(lines[ti].strip())
        if not m:
            continue  # malformed block: no timing line
        h1, m1, s1, ms1, h2, m2, s2, ms2 = (int(g) for g in m.groups())
        start = ((h1 * 60 + m1) * 60 + s1) * 1000 + ms1
        end = ((h2 * 60 + m2) * 60 + s2) * 1000 + ms2
        payload = lines[ti + 1:]
        pos += 1
        cues.append((idx if idx is not None else pos, start, end,
                     len(payload), sum(len(ln) for ln in payload)))
    return cues


def parse_srt_cues_df(df: DataFrame, text_col: str = "srt",
                      id_col: str = "media_id") -> DataFrame:
    """Cue table from a column of SRT documents — one output row per cue.

    Arrow-batched ``mapInPandas`` (the parser is inherently imperative
    string work); the output is a thin integer table, so downstream
    aggregation stays JVM-side.  Rows with a NULL id are dropped (no
    stable identity to key cues on — the pack_webdataset_shards stance);
    NULL text parses as zero cues.
    """
    schema = (f"{id_col} long, cue_index int, start_ms long, end_ms long, "
              "n_lines int, n_chars long")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in (id_col, "cue_index", "start_ms",
                                   "end_ms", "n_lines", "n_chars")}
            for mid, txt in zip(pdf[id_col], pdf[text_col]):
                if pd.isna(mid):
                    continue
                for (ci, st, en, nl, nc) in parse_srt_cues(txt or ""):
                    out[id_col].append(int(mid))
                    out["cue_index"].append(ci)
                    out["start_ms"].append(st)
                    out["end_ms"].append(en)
                    out["n_lines"].append(nl)
                    out["n_chars"].append(nc)
            yield pd.DataFrame(out)

    return df.select(id_col, text_col).mapInPandas(run, schema=schema)


def _wav_pcm_samples(data: bytes):
    """Shared RIFF chunk walk → interleaved int16 sample array (numpy
    ``<i2``), or None for non-WAV / non-16-bit input.  The decode core of
    :func:`wav_pcm_stats` and :func:`pcm_frame_energies`."""
    import numpy as np

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    i = 12
    bits = None
    payload = None
    while i + 8 <= len(data):
        cid = data[i:i + 4]
        clen = struct.unpack("<I", data[i + 4:i + 8])[0]
        if cid == b"fmt " and i + 24 <= len(data):
            bits = struct.unpack("<H", data[i + 22:i + 24])[0]
        elif cid == b"data":
            payload = data[i + 8:i + 8 + clen]
        i += 8 + clen + (clen % 2)
    if bits != 16 or payload is None:
        return None
    return np.frombuffer(payload[:len(payload) // 2 * 2], dtype="<i2")


def wav_pcm_stats(data: bytes) -> tuple[int, int, int, int, int] | None:
    """SAMPLE-level PCM decode of a 16-bit RIFF/WAVE payload → exact
    integer aggregates (n_samples, sum_amp, sum_sq, peak_abs, n_clipped),
    or None for non-WAV / non-16-bit input.

    This is a real decode — the data chunk's bytes are interpreted as
    interleaved little-endian int16 frames (numpy.frombuffer, summed in
    int64) — not a header sniff: uncompressed PCM needs no codec
    library, so the pixel-stub limitation does not apply to audio.
    Aggregates instead of raw samples keep the operator's output
    O(files) not O(samples); all five are exact integers (sum_sq of a
    bounded clip stays far under 2^63), the RMS/loudness ratios are the
    consumer's one division (the q8 num/den discipline).
    """
    import numpy as np

    samples = _wav_pcm_samples(data)
    if samples is None:
        return None
    if len(samples) == 0:
        return 0, 0, 0, 0, 0
    s64 = samples.astype(np.int64)
    return (int(len(s64)), int(s64.sum()), int((s64 * s64).sum()),
            int(np.abs(s64).max()),
            int(((samples == 32767) | (samples == -32768)).sum()))


def decode_wav_pcm(df: DataFrame, binary_col: str = "data",
                   id_col: str = "media_id") -> DataFrame:
    """binary column → per-file exact PCM sample aggregates via
    :func:`wav_pcm_stats` (Arrow-batched mapInPandas; non-decodable rows
    are dropped with decodable=false semantics left to the meta gate)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"media_id": [], "n_samples": [], "sum_amp": [],
                   "sum_sq": [], "peak_abs": [], "n_clipped": []}
            for mid, b in zip(pdf[id_col], pdf[binary_col]):
                st = wav_pcm_stats(bytes(b))
                if st is None:
                    continue
                out["media_id"].append(int(mid))
                for k, v in zip(("n_samples", "sum_amp", "sum_sq",
                                 "peak_abs", "n_clipped"), st):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return df.mapInPandas(
        run, schema=("media_id long, n_samples long, sum_amp long, "
                     "sum_sq long, peak_abs long, n_clipped long"))


def pcm_frame_energies(data: bytes, frame: int = 160) -> list[int] | None:
    """Per-frame exact energy of a 16-bit PCM WAV: the interleaved sample
    stream is cut into consecutive ``frame``-sample blocks and each block's
    Σv² is returned as an exact int (a trailing partial block is dropped).
    None for non-WAV / non-16-bit input.

    This is the segmentation primitive under VAD / silence-split / loudness
    profiling: energies are O(samples/frame) per file, integer-exact (so
    downstream thresholding can use cross-multiplied comparisons instead of
    IEEE division), and each file decodes independently — map-only at any
    corpus size."""
    import numpy as np

    samples = _wav_pcm_samples(data)
    if samples is None:
        return None
    n = len(samples) // frame * frame
    if n == 0:
        return []
    s64 = samples[:n].astype(np.int64).reshape(-1, frame)
    return [int(e) for e in (s64 * s64).sum(axis=1)]


def pcm_frame_energy_df(df: DataFrame, binary_col: str = "data",
                        id_col: str = "media_id",
                        frame: int = 160) -> DataFrame:
    """binary column → one row per PCM frame (media_id, frame_idx, energy)
    via :func:`pcm_frame_energies` (Arrow-batched mapInPandas flatMap;
    non-decodable rows dropped)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "energy": []}
            for mid, b in zip(pdf[id_col], pdf[binary_col]):
                es = None if b is None else pcm_frame_energies(bytes(b), frame)
                if es is None:
                    continue
                for j, e in enumerate(es):
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(j)
                    out["energy"].append(e)
            yield pd.DataFrame(out)

    return df.mapInPandas(
        run, schema="media_id long, frame_idx long, energy long")


def ahash64_words(w: int, h: int, ch: int, pixels: bytes) \
        -> tuple[int, int] | None:
    """64-bit average-hash (aHash) of decoded RGB(A) pixels as two exact
    32-bit words ``(hash_hi, hash_lo)`` — the perceptual-dedup signature.

    The image is divided into an 8×8 grid of equal cells (requires w, h
    divisible by 8; returns None otherwise — production would resample
    first, which needs interpolation this integer kernel refuses to fake).
    Each pixel contributes integer luma 299·R + 587·G + 114·B (the BT.601
    weights ×1000, so everything stays integral); bit b is set iff
    cell_sum·64 > total_sum (cross-multiplied — no division, no float).

    The hash is EXACTLY invariant under a constant per-channel brightness
    shift that avoids clamping: a shift of c adds c·1000·(pixels/cell) to
    every cell and 64× that to the total, which cancels in the
    cross-multiplied comparison — the invariance the phash gate plants
    against.  Two 32-bit words instead of one 64-bit value keep every
    downstream shift ≤ 31 (DuckDB raises on 1<<63)."""
    import numpy as np

    if w % 8 or h % 8 or ch < 3:
        return None
    cw, chh = w // 8, h // 8
    # vectorized exact-int luma + 8x8 block sums: int64 throughout (luma
    # <= 255*1000, block sums bounded far under 2^63), ~100x the pure-
    # Python double loop on production-sized images
    px = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, ch)
    luma = (px[:, :, :3].astype(np.int64)
            * np.array([299, 587, 114], dtype=np.int64)).sum(axis=2)
    blocks = luma.reshape(8, chh, 8, cw).sum(axis=(1, 3))
    cells = [int(v) for v in blocks.reshape(64)]
    total = sum(cells)
    lo = hi = 0
    for b in range(64):
        if cells[b] * 64 > total:
            if b < 32:
                lo |= 1 << b
            else:
                hi |= 1 << (b - 32)
    return hi, lo


def png_ahash(df: DataFrame, binary_col: str = "data",
              id_col: str = "media_id") -> DataFrame:
    """binary PNG column → (media_id, width, height, hash_hi, hash_lo)
    perceptual signatures: :func:`decode_png_pixels` (real zlib + filter
    inversion) composed with :func:`ahash64_words`.  Rows that fail to
    decode or whose dimensions aren't 8-divisible are dropped.  Map-only:
    each file hashes independently, the dedup join downstream shuffles
    only the 16-byte signatures."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [],
                   "hash_hi": [], "hash_lo": []}
            for mid, b in zip(pdf[id_col], pdf[binary_col]):
                got = None if b is None else decode_png_pixels(bytes(b))
                if got is None:
                    continue
                w, h, ch, px = got
                words = ahash64_words(w, h, ch, px)
                if words is None:
                    continue
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["hash_hi"].append(words[0])
                out["hash_lo"].append(words[1])
            yield pd.DataFrame(out)

    return df.mapInPandas(
        run, schema=("media_id long, width long, height long, "
                     "hash_hi long, hash_lo long"))


def png_chunk_integrity(data: bytes) -> tuple[int, int, bool] | None:
    """Chunk-level PNG integrity scan → (n_chunks, n_bad_crc, ok), or
    None if the signature is not PNG.  Walks the chunk grammar
    (len/type/data/crc) verifying each stored CRC32 against
    zlib.crc32(type + data) — the binary-column data-quality primitive
    (detect bit-rot / truncation in a media lake without decoding
    pixels).  A truncated chunk counts as bad."""
    import zlib as _zlib

    if len(data) < 8 or data[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    i = 8
    n_chunks = n_bad = 0
    while i + 8 <= len(data):
        clen = struct.unpack(">I", data[i:i + 4])[0]
        ctype = data[i + 4:i + 8]
        end = i + 8 + clen
        n_chunks += 1
        if end + 4 > len(data):
            n_bad += 1
            break
        stored = struct.unpack(">I", data[end:end + 4])[0]
        if _zlib.crc32(ctype + data[i + 8:end]) & 0xFFFFFFFF != stored:
            n_bad += 1
        i = end + 4
    return n_chunks, n_bad, n_bad == 0


def _png_paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png_pixels(data: bytes):
    """REAL PNG pixel decode — no image library: IDAT zlib inflate + the
    five scanline filters (None/Sub/Up/Average/Paeth) inverted per the
    spec.  Supports 8-bit color types 2 (RGB) and 6 (RGBA),
    non-interlaced — the overwhelmingly common lossless web case.
    Returns (width, height, channels, bytes of raw pixels row-major) or
    None for non-PNG / unsupported layouts (16-bit, palette, interlaced).

    This closes most of the long-standing 'pixel decode is env-bound'
    stub: PNG's codec is zlib (stdlib); only inter-frame video codecs
    (``sample_frames``) still genuinely need external libraries.
    """
    import zlib as _zlib

    if len(data) < 8 or data[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    i = 8
    w = h = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while i + 8 <= len(data):
        clen = struct.unpack(">I", data[i:i + 4])[0]
        ctype = data[i + 4:i + 8]
        body = data[i + 8:i + 8 + clen]
        if ctype == b"IHDR" and clen >= 13:
            if len(body) < 13:
                return None  # truncated inside IHDR (never-raise contract)
            w, h, bit_depth, color_type = struct.unpack(">IIBB", body[:10])
            interlace = body[12]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        i += 8 + clen + 4
    if w is None or bit_depth != 8 or color_type not in (2, 6) \
            or interlace != 0:
        return None
    ch = 3 if color_type == 2 else 4
    try:
        raw = _zlib.decompress(bytes(idat))
    except _zlib.error:
        return None
    stride = w * ch
    if len(raw) != h * (stride + 1):
        return None
    out = bytearray(h * stride)
    prior = bytes(stride)
    pos = 0
    for row in range(h):
        f = raw[pos]
        line = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        if f == 1:      # Sub
            for k in range(ch, stride):
                line[k] = (line[k] + line[k - ch]) & 0xFF
        elif f == 2:    # Up
            for k in range(stride):
                line[k] = (line[k] + prior[k]) & 0xFF
        elif f == 3:    # Average
            for k in range(stride):
                a = line[k - ch] if k >= ch else 0
                line[k] = (line[k] + ((a + prior[k]) >> 1)) & 0xFF
        elif f == 4:    # Paeth
            for k in range(stride):
                a = line[k - ch] if k >= ch else 0
                c = prior[k - ch] if k >= ch else 0
                line[k] = (line[k] + _png_paeth(a, prior[k], c)) & 0xFF
        elif f != 0:
            return None
        out[row * stride:(row + 1) * stride] = line
        prior = bytes(line)
    return w, h, ch, bytes(out)


def write_png(pixels: bytes, w: int, h: int, channels: int = 3,
              row_filters=None) -> bytes:
    """Deterministic PNG writer for 8-bit RGB/RGBA row-major pixel bytes —
    the fixture/export twin of :func:`decode_png_pixels`.  ``row_filters``
    optionally assigns a spec filter (0..4) per row (default all 0);
    filtering is applied against RAW neighbor bytes per the spec, so a
    mixed-filter file exercises every decoder branch."""
    import zlib as _zlib

    if channels not in (2, 3, 4):
        raise ValueError("channels must be 3 (RGB) or 4 (RGBA)")
    if channels == 2:
        raise ValueError("channels must be 3 (RGB) or 4 (RGBA)")
    stride = w * channels
    if len(pixels) != h * stride:
        raise ValueError("pixel buffer does not match w*h*channels")
    ch = channels
    rows = bytearray()
    prior = bytes(stride)
    for row in range(h):
        line = pixels[row * stride:(row + 1) * stride]
        f = row_filters[row] if row_filters is not None else 0
        enc = bytearray(line)
        if f == 1:
            for k in range(stride - 1, ch - 1, -1):
                enc[k] = (line[k] - line[k - ch]) & 0xFF
        elif f == 2:
            for k in range(stride):
                enc[k] = (line[k] - prior[k]) & 0xFF
        elif f == 3:
            for k in range(stride):
                a = line[k - ch] if k >= ch else 0
                enc[k] = (line[k] - ((a + prior[k]) >> 1)) & 0xFF
        elif f == 4:
            for k in range(stride):
                a = line[k - ch] if k >= ch else 0
                c = prior[k - ch] if k >= ch else 0
                enc[k] = (line[k] - _png_paeth(a, prior[k], c)) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown filter {f}")
        rows.append(f)
        rows += enc
        prior = line

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        import zlib as _z

        crc = _z.crc32(ctype + payload) & 0xFFFFFFFF
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", crc))

    color_type = 2 if ch == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _zlib.compress(bytes(rows), 6))
            + chunk(b"IEND", b""))


def resize_nearest(w: int, h: int, ch: int, pixels: bytes,
                   w2: int, h2: int) -> bytes:
    """Nearest-neighbor integer resample of decoded pixels to (w2, h2) —
    the resize stage of the brief's decode/extract/resize/frame-sample
    quartet, real (not stubbed) because :func:`decode_png_pixels` is a
    real decoder.  Source pixel for output (x2, y2) is
    (x2*w // w2, y2*h // h2) — pure integer floor mapping, works for any
    dims (no 8-divisibility constraint), deterministic across engines.
    Only the first 3 channels are kept (alpha dropped)."""
    import numpy as np

    px = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, ch)
    iy = (np.arange(h2, dtype=np.int64) * h) // h2
    ix = (np.arange(w2, dtype=np.int64) * w) // w2
    return px[iy][:, ix, :3].tobytes()


def png_resize_stats(df: DataFrame, w2: int = 8, h2: int = 8,
                     binary_col: str = "data",
                     id_col: str = "media_id") -> DataFrame:
    """binary PNG column → nearest-neighbor thumbnail statistics
    (media_id, src_w, src_h, px_sum, px00, px_center): real decode
    (zlib + filter inversion) composed with :func:`resize_nearest`;
    px_sum is the exact integer sum of all resized RGB bytes, px00 /
    px_center two sampled bytes — enough to value-check the whole
    decode→resample path without shipping pixel blobs downstream.
    Undecodable rows are dropped (the established media-kernel rule).
    Map-only; at 100 TB each file resizes independently."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"media_id": [], "src_w": [], "src_h": [],
                   "px_sum": [], "px00": [], "px_center": []}
            for mid, b in zip(pdf[id_col], pdf[binary_col]):
                got = None if b is None else decode_png_pixels(bytes(b))
                if got is None:
                    continue
                w, h, ch, px = got
                import numpy as np

                small = np.frombuffer(
                    resize_nearest(w, h, ch, px, w2, h2),
                    dtype=np.uint8).reshape(h2, w2, 3)
                out["media_id"].append(int(mid))
                out["src_w"].append(w)
                out["src_h"].append(h)
                out["px_sum"].append(int(small.astype(np.int64).sum()))
                out["px00"].append(int(small[0, 0, 0]))
                out["px_center"].append(int(small[h2 // 2, w2 // 2, 0]))
            yield pd.DataFrame(out)

    return df.mapInPandas(
        run, schema=("media_id long, src_w long, src_h long, "
                     "px_sum long, px00 long, px_center long"))


def pcm_decimate_stats(df: DataFrame, factor: int = 4,
                       binary_col: str = "data",
                       id_col: str = "media_id") -> DataFrame:
    """Integer PCM decimation (sample-rate reduction by keeping every
    ``factor``-th sample) + exact stats of the downsampled signal —
    audio's counterpart of :func:`resize_nearest`: the resample stage of
    the decode/extract/resize/frame-sample quartet, real because the WAV
    PCM decoder is real.  No anti-alias filter (documented: this is the
    nearest-neighbor tier; a windowed-sinc low-pass is the production
    upgrade and needs float DSP out of scope for the exact gate).

    → (media_id, n_out, sum_amp, sum_sq): all exact integers; map-only.
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"media_id": [], "n_out": [], "sum_amp": [],
                   "sum_sq": []}
            for mid, b in zip(pdf[id_col], pdf[binary_col]):
                samples = None if b is None else _wav_pcm_samples(bytes(b))
                if samples is None:
                    continue
                # python ints, not np.int16: v*v overflows int16 silently
                kept = [int(v) for v in samples[::factor]]
                out["media_id"].append(int(mid))
                out["n_out"].append(len(kept))
                out["sum_amp"].append(sum(kept))
                out["sum_sq"].append(sum(v * v for v in kept))
            yield pd.DataFrame(out)

    return df.mapInPandas(
        run, schema="media_id long, n_out long, sum_amp long, sum_sq long")


def sniff_webp_meta(data: bytes) \
        -> tuple[int, int, str, bool, int] | None:
    """REAL WebP container parse → (width, height, variant, has_alpha,
    n_chunks), or None for non-WebP bytes.

    WebP is a RIFF container (the WAV walker's grammar with a 'WEBP' form
    type); the three bitstream variants encode dimensions differently and
    all three are parsed for real:

    - ``VP8 `` (lossy): 3-byte frame tag, the 9d 01 2a start code, then
      width/height as little-endian u14 (upper 2 bits are scale hints).
    - ``VP8L`` (lossless): 0x2f signature byte, then a 32-bit LE word
      packing width-1 (bits 0-13), height-1 (bits 14-27) and an
      alpha-is-used hint (bit 28).
    - ``VP8X`` (extended): 1 flag byte (bit 4 = alpha), 3 reserved bytes,
      then canvas width-1 / height-1 as 24-bit LE.

    ``has_alpha`` is VP8X's flag bit, VP8L's hint bit, or the presence of
    an ``ALPH`` chunk.  ``n_chunks`` counts every top-level chunk (the
    word-alignment pad-byte rule is load-bearing: an odd-sized chunk
    without the pad skip desyncs the walk).  Dimensions come from the
    FIRST dimension-bearing chunk (VP8X canvas wins when present, per the
    spec's extended-format rule that VP8X precedes the image data).
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        return None
    # the RIFF header declares the payload size (everything after byte 8);
    # bound the chunk walk at it so trailing garbage is never parsed as
    # chunks, and refuse a declared size past the buffer (tar strictness)
    riff_size = struct.unpack("<I", data[4:8])[0]
    end = 8 + riff_size
    if end > len(data):
        return None
    i = 12
    w = h = None
    variant = None
    has_alpha = False
    n_chunks = 0
    while i + 8 <= end:
        cid = data[i:i + 4]
        clen = struct.unpack("<I", data[i + 4:i + 8])[0]
        if i + 8 + clen > end:
            return None  # chunk runs past the RIFF payload (tar lesson)
        body = data[i + 8:i + 8 + clen]
        n_chunks += 1
        if cid == b"VP8 " and w is None and clen >= 10 \
                and body[3:6] == b"\x9d\x01\x2a":
            w = struct.unpack("<H", body[6:8])[0] & 0x3FFF
            h = struct.unpack("<H", body[8:10])[0] & 0x3FFF
            variant = variant or "lossy"
        elif cid == b"VP8L" and w is None and clen >= 5 \
                and body[0] == 0x2F:
            bits = struct.unpack("<I", body[1:5])[0]
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            has_alpha = has_alpha or bool((bits >> 28) & 1)
            variant = variant or "lossless"
        elif cid == b"VP8X" and clen >= 10:
            # canvas dims override any later chunk's frame dims
            has_alpha = has_alpha or bool(body[0] & 0x10)
            w = 1 + (body[4] | body[5] << 8 | body[6] << 16)
            h = 1 + (body[7] | body[8] << 8 | body[9] << 16)
            variant = "extended"
        elif cid == b"ALPH":
            has_alpha = True
        i += 8 + clen + (clen % 2)  # chunks are word-aligned
    if w is None or variant is None:
        return None
    return w, h, variant, has_alpha, n_chunks


def decode_webp_meta(df: DataFrame, binary_col: str = "data",
                     id_col: str = "media_id") -> DataFrame:
    """binary column → WebP metadata rows (REAL container parse,
    :func:`sniff_webp_meta`); non-WebP bytes are dropped (the documented
    NULL/unknown-drop contract of the kernel family)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height",
                                   "variant", "has_alpha", "n_chunks")}
            for mid, b in zip(pdf[id_col], pdf[binary_col]):
                sniffed = None if b is None else sniff_webp_meta(bytes(b))
                if sniffed is None:
                    continue
                w, hgt, variant, alpha, nc = sniffed
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(hgt)
                out["variant"].append(variant)
                out["has_alpha"].append(alpha)
                out["n_chunks"].append(nc)
            yield pd.DataFrame(out)

    return df.select(id_col, binary_col).mapInPandas(
        run, schema=("media_id long, width long, height long, "
                     "variant string, has_alpha boolean, n_chunks long"))


_MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                 160, 192, 224, 256, 320)   # MPEG1 Layer III, kbps
_MP3_RATES = (44100, 48000, 32000)


def mp3_frame_walk(data: bytes) \
        -> tuple[int, int, int, int, bool] | None:
    """REAL MPEG-1 Layer III frame walk → (n_frames, sample_rate,
    kbps_min, kbps_max, is_vbr), or None for non-MP3 bytes.

    MP3 has no container index: duration and bitrate mode are only
    knowable by WALKING the frame chain, each frame's length computed
    from its own 4-byte header (the 11-bit sync, version/layer bits,
    bitrate and samplerate indexes, padding bit; len = 144000·kbps/rate
    + pad for MPEG1-LIII).  A wrong length formula desyncs the walk at
    the next header and the whole chain collapses — which is why the
    walk, not the first header, is the parse.  Handles a leading ID3v2
    tag (synchsafe 28-bit size skip) and a trailing 128-byte ID3v1
    'TAG'.  ``is_vbr`` = more than one distinct bitrate seen (the VBR
    detection every audio curation pass needs before trusting a
    nominal-kbps metadata field).

    Strictness (the tar/WebP lesson): a frame whose declared length runs
    past the buffer, a bad sync where a frame should start, or zero
    parseable frames all return None rather than a partial answer.
    """
    i = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        size = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) \
            | ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        i = 10 + size
    n = 0
    rate = None
    kmin = kmax = None
    while i < len(data):
        if data[i:i + 3] == b"TAG" and len(data) - i == 128:
            break  # ID3v1 trailer
        if i + 4 > len(data):
            return None
        b0, b1, b2 = data[i], data[i + 1], data[i + 2]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            return None
        if (b1 >> 3) & 0x3 != 0x3 or (b1 >> 1) & 0x3 != 0x1:
            return None  # only MPEG1 Layer III here
        bri = (b2 >> 4) & 0xF
        sri = (b2 >> 2) & 0x3
        pad = (b2 >> 1) & 0x1
        if not (1 <= bri <= 14) or sri > 2:
            return None
        kbps = _MP3_BITRATES[bri]
        r = _MP3_RATES[sri]
        if rate is None:
            rate = r
        elif r != rate:
            return None  # mid-stream samplerate change: not one stream
        flen = 144000 * kbps // r + pad
        if i + flen > len(data):
            return None  # declared frame runs past the buffer
        kmin = kbps if kmin is None else min(kmin, kbps)
        kmax = kbps if kmax is None else max(kmax, kbps)
        n += 1
        i += flen
    if n == 0 or rate is None:
        return None
    return n, rate, kmin, kmax, kmin != kmax


def decode_mp3_meta(df: DataFrame, binary_col: str = "data",
                    id_col: str = "media_id") -> DataFrame:
    """binary column → MP3 stream metadata rows (REAL frame walk,
    :func:`mp3_frame_walk`); unparseable bytes are dropped (the kernel
    family's documented contract).  duration_ms = n·1152/rate·1000 —
    int/int division is a correctly-rounded double in Python and DuckDB
    alike (the mp4 precedent)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "n_frames", "sample_rate",
                                   "duration_ms", "kbps_min", "kbps_max",
                                   "is_vbr")}
            for mid, b in zip(pdf[id_col], pdf[binary_col]):
                parsed = None if b is None else mp3_frame_walk(bytes(b))
                if parsed is None:
                    continue
                n, rate, kmin, kmax, vbr = parsed
                out["media_id"].append(int(mid))
                out["n_frames"].append(n)
                out["sample_rate"].append(rate)
                out["duration_ms"].append(n * 1152 / rate * 1000)
                out["kbps_min"].append(kmin)
                out["kbps_max"].append(kmax)
                out["is_vbr"].append(vbr)
            yield pd.DataFrame(out)

    return df.select(id_col, binary_col).mapInPandas(
        run, schema=("media_id long, n_frames long, sample_rate long, "
                     "duration_ms double, kbps_min long, kbps_max long, "
                     "is_vbr boolean"))


def write_bmp(pixels: bytes, w: int, h: int, topdown: bool = False) -> bytes:
    """Deterministic 24-bit uncompressed BMP writer from RGB row-major
    pixels — the cross-format twin of :func:`write_png`.  Encodes the
    three BMP layout traps on purpose: BGR channel order, BOTTOM-UP row
    order (or top-down via negative height when ``topdown``), and 4-byte
    row padding."""
    stride = w * 3
    if len(pixels) != h * stride:
        raise ValueError("pixel buffer does not match w*h*3")
    pad = (-stride) % 4
    body = bytearray()
    order = range(h) if topdown else range(h - 1, -1, -1)
    for row in order:
        line = pixels[row * stride:(row + 1) * stride]
        for x in range(w):
            r, g, b = line[3 * x:3 * x + 3]
            body += bytes((b, g, r))
        body += b"\x00" * pad
    pixel_offset = 14 + 40
    fh = b"BM" + struct.pack("<IHHI", pixel_offset + len(body), 0, 0,
                             pixel_offset)
    ih = struct.pack("<IiiHHIIiiII", 40, w, -h if topdown else h, 1, 24,
                     0, len(body), 2835, 2835, 0, 0)
    return fh + ih + bytes(body)


def decode_bmp_pixels(data: bytes):
    """REAL BMP pixel decode → (width, height, 3, RGB row-major top-down
    bytes) or None — 24-bit uncompressed BITMAPINFOHEADER, both row
    orders (positive height = bottom-up, negative = top-down), padded
    strides.  Output layout is byte-identical to
    :func:`decode_png_pixels`, which is what makes cross-format
    consistency checkable at all."""
    if len(data) < 54 or data[:2] != b"BM":
        return None
    pixel_offset = struct.unpack("<I", data[10:14])[0]
    hsize = struct.unpack("<I", data[14:18])[0]
    if hsize < 40:
        return None
    w, hh = struct.unpack("<ii", data[18:26])
    bpp = struct.unpack("<H", data[28:30])[0]
    comp = struct.unpack("<I", data[30:34])[0]
    if bpp != 24 or comp != 0 or w <= 0 or hh == 0:
        return None
    topdown = hh < 0
    h = abs(hh)
    # shared DIB row transform (also the AVI frame path — see
    # _bgr_rows_to_rgb); None when the declared geometry runs past the
    # buffer
    out = _bgr_rows_to_rgb(data, w, h, pixel_offset, topdown)
    if out is None:
        return None
    return w, h, 3, out


def sniff_tiff_meta(data: bytes) \
        -> tuple[int, int, int, int, str] | None:
    """REAL TIFF IFD walk → (width, height, samples_per_pixel, n_pages,
    endian) or None — the one container format whose BYTE ORDER is
    declared per file ('II' little / 'MM' big), so every field read is
    endianness-dispatched: a parser hardcoding one order returns
    byte-swapped garbage dims for half the corpus.  Walks the IFD chain
    (12-byte tag entries, SHORT values packed endian-sensitively into
    the first bytes of the 4-byte value field, next-IFD pointer) and
    counts pages; dims/samples come from IFD0's tags 256/257/277.
    Strictness (tar lesson): an IFD offset past the buffer, a truncated
    entry table, or a missing dimension tag returns None.
    """
    if len(data) < 8:
        return None
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        return None
    if struct.unpack(e + "H", data[2:4])[0] != 42:
        return None
    off = struct.unpack(e + "I", data[4:8])[0]
    w = h = None
    samples = 1
    pages = 0
    seen = set()
    while off:
        if off in seen or off + 2 > len(data):
            return None  # cycle or offset past the buffer
        seen.add(off)
        n = struct.unpack(e + "H", data[off:off + 2])[0]
        end = off + 2 + n * 12
        if end + 4 > len(data):
            return None
        for i in range(n):
            base = off + 2 + i * 12
            tag, typ, cnt = struct.unpack(e + "HHI", data[base:base + 8])
            if cnt != 1:
                # count > 1 stores an OFFSET in the value field (TIFF
                # spec) — reading it as the value yields garbage dims;
                # skip, so a malformed-count dimension tag leaves dims
                # missing and the walk returns None (strictness stance)
                continue
            if typ == 3:      # SHORT: packed into the value field's head
                val = struct.unpack(e + "H", data[base + 8:base + 10])[0]
            elif typ == 4:    # LONG
                val = struct.unpack(e + "I", data[base + 8:base + 12])[0]
            else:
                continue
            if pages == 0:    # dims come from IFD0
                if tag == 256:
                    w = val
                elif tag == 257:
                    h = val
                elif tag == 277:
                    samples = val
        pages += 1
        off = struct.unpack(e + "I", data[end:end + 4])[0]
    if w is None or h is None or pages == 0:
        return None
    return w, h, samples, pages, "little" if e == "<" else "big"


def write_tiff_meta(w: int, h: int, samples: int = 1, pages: int = 1,
                    big_endian: bool = False) -> bytes:
    """Deterministic metadata-only TIFF writer (IFD chain, no strips) —
    the fixture twin of :func:`sniff_tiff_meta`, emitting either byte
    order.  Page 1 carries dims as LONG (width) and SHORT (height) so
    both value-packing rules are exercised in one file."""
    e = ">" if big_endian else "<"

    def entry(tag, typ, val):
        head = struct.pack(e + "HHI", tag, typ, 1)
        if typ == 3:
            return head + struct.pack(e + "H", val) + b"\x00\x00"
        return head + struct.pack(e + "I", val)

    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(e + "H", 42)
    out += struct.pack(e + "I", 8)
    off = 8
    for p in range(pages):
        ents = [entry(256, 4, w), entry(257, 3, h),
                entry(259, 3, 1), entry(277, 3, samples)]
        nxt = off + 2 + len(ents) * 12 + 4
        out += struct.pack(e + "H", len(ents)) + b"".join(ents)
        out += struct.pack(e + "I", nxt if p < pages - 1 else 0)
        off = nxt
    return bytes(out)


# --------------------------------------------------------------------------
# AVI (RIFF) video: the realizable slice of general video-frame
# extraction.  Uncompressed streams ('DIB ' / biCompression=0) store each
# frame as a raw bottom-up BGR stride-padded pixel array — exactly the
# BMP pixel grammar minus the file header — so REAL frame decode needs no
# codec library.  Inter-frame codecs (h264/vp9/...) remain the
# env-bound slice (ffmpeg/PyAV not in this container); the kernel
# REFUSES compressed chunks loudly instead of faking them.
# --------------------------------------------------------------------------


def avi_meta(data: bytes):
    """RIFF/AVI header walk → (width, height, n_frames, us_per_frame) or
    None.  Strictness: declared sizes bound every walk (the WebP/tar
    rule); a truncated LIST or an avih shorter than its fixed 56 bytes
    refuses."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        return None
    riff_size = struct.unpack("<I", data[4:8])[0]
    end = 8 + riff_size
    if end > len(data):
        return None
    i = 12
    while i + 8 <= end:
        cid = data[i:i + 4]
        clen = struct.unpack("<I", data[i + 4:i + 8])[0]
        if i + 8 + clen > end:
            return None
        if cid == b"LIST" and clen >= 4 \
                and data[i + 8:i + 12] == b"hdrl":
            j = i + 12
            hdrl_end = i + 8 + clen
            while j + 8 <= hdrl_end:
                sid = data[j:j + 4]
                slen = struct.unpack("<I", data[j + 4:j + 8])[0]
                if j + 8 + slen > hdrl_end:
                    return None
                if sid == b"avih":
                    if slen < 56:
                        return None
                    f = struct.unpack("<14I", data[j + 8:j + 64])
                    return f[8], f[9], f[4], f[0]  # w, h, frames, us/frame
                j += 8 + slen + (slen % 2)
            return None
        i += 8 + clen + (clen % 2)
    return None


def _bgr_rows_to_rgb(data: bytes, w: int, h: int, offset: int,
                     topdown: bool):
    """Shared DIB pixel transform: BGR stride-padded rows at ``offset``
    (bottom-up unless ``topdown``) → top-down row-major RGB bytes, or
    ``None`` when the declared geometry runs past the buffer.  One
    implementation serves both :func:`decode_bmp_pixels` and the AVI
    frame decoder (a BGR/stride fix must never need applying twice);
    strided slice assignment replaces the per-pixel Python loop (3 slice
    ops per row instead of 3·w interpreter steps — this runs per frame
    inside executors)."""
    stride = w * 3
    pad = (-stride) % 4
    if len(data) < offset + h * (stride + pad):
        return None
    out = bytearray(h * stride)
    for i in range(h):
        src_row = i if topdown else h - 1 - i
        base = offset + src_row * (stride + pad)
        line = data[base:base + stride]
        dst = i * stride
        out[dst:dst + stride:3] = line[2::3]
        out[dst + 1:dst + stride:3] = line[1::3]
        out[dst + 2:dst + stride:3] = line[0::3]
    return bytes(out)


def decode_avi_frames(data: bytes, every_k: int = 1):
    """REAL frame extraction from an uncompressed AVI: returns a LIST of
    ``(frame_no, width, height, rgb_bytes)`` for every ``every_k``-th
    stream-0 video frame (eager, so a malformed container raises HERE,
    not at some distant first iteration).  ``'00db'`` (uncompressed DIB)
    chunks decode via :func:`_bgr_rows_to_rgb`; ``'rec '`` grouping
    LISTs inside movi are recursed into (VirtualDub-style interleaving).

    Loud refusals (the strictness stance): a ``'..dc'`` COMPRESSED chunk
    (codec decode is the documented env-bound slice), a second video
    stream (``'01db'`` — its geometry lives in a strl this kernel does
    not track), a truncated frame/chunk, and a decoded frame count that
    disagrees with the avih-declared total (a cleanly-truncated movi
    must never return silently fewer frames)."""
    meta = avi_meta(data)
    if meta is None:
        raise ValueError("avi: not a parseable RIFF/AVI container")
    w, h, declared_n, _us = meta
    frames: list = []
    frame_no = 0

    def walk_chunks(j: int, chunk_end: int) -> None:
        nonlocal frame_no
        while j + 8 <= chunk_end:
            sid = data[j:j + 4]
            slen = struct.unpack("<I", data[j + 4:j + 8])[0]
            if j + 8 + slen > chunk_end:
                raise ValueError(
                    f"avi: movi chunk at {j} runs past the list")
            if sid == b"LIST" and slen >= 4 \
                    and data[j + 8:j + 12] == b"rec ":
                walk_chunks(j + 12, j + 8 + slen)
            elif sid[2:4] in (b"db", b"dc"):
                if sid[:2] != b"00":
                    raise ValueError(
                        f"avi: stream {sid[:2]!r} video chunk — only the "
                        "single-video-stream layout is supported")
                if sid[2:4] == b"dc":
                    raise ValueError(
                        "avi: compressed stream ('..dc' chunk) — codec "
                        "decode needs ffmpeg/PyAV (env-bound slice)")
                if frame_no % every_k == 0:
                    rgb = _bgr_rows_to_rgb(
                        data[j + 8:j + 8 + slen], w, h, 0, topdown=False)
                    if rgb is None:
                        raise ValueError(
                            f"avi: frame {frame_no} pixel array truncated")
                    frames.append((frame_no, w, h, rgb))
                frame_no += 1
            j += 8 + slen + (slen % 2)

    end = 8 + struct.unpack("<I", data[4:8])[0]
    i = 12
    while i + 8 <= end:
        cid = data[i:i + 4]
        clen = struct.unpack("<I", data[i + 4:i + 8])[0]
        if i + 8 + clen > end:
            raise ValueError(f"avi: chunk at {i} runs past RIFF payload")
        if cid == b"LIST" and clen >= 4 and data[i + 8:i + 12] == b"movi":
            walk_chunks(i + 12, i + 8 + clen)
        i += 8 + clen + (clen % 2)
    if frame_no != declared_n:
        raise ValueError(
            f"avi: decoded {frame_no} frames but avih declares "
            f"{declared_n} — truncated or padded movi list")
    return frames


def build_avi(w: int, h: int, frames: list[bytes],
              us_per_frame: int = 40000) -> bytes:
    """Deterministic uncompressed-AVI writer (the tar-writer precedent:
    both directions of the container grammar under test).  ``frames`` are
    bottom-up BGR stride-padded DIB pixel arrays."""
    def chunk(cid: bytes, payload: bytes) -> bytes:
        return (cid + struct.pack("<I", len(payload)) + payload
                + (b"\x00" if len(payload) % 2 else b""))

    avih = struct.pack(
        "<14I", us_per_frame, 0, 0, 0, len(frames), 0, 1, 0, w, h,
        0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"vids", b"DIB ", 0, 0, 0,
                       0, 1, 25, 0, len(frames), 0, 0xFFFFFFFF, 0,
                       0, 0, w, h)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       len(frames[0]) if frames else 0, 0, 0, 0, 0)
    strl = chunk(b"LIST", b"strl" + chunk(b"strh", strh)
                 + chunk(b"strf", strf))
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih) + strl)
    movi = chunk(b"LIST", b"movi"
                 + b"".join(chunk(b"00db", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
