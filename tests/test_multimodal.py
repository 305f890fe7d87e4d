"""Real container-header parsing (pure Python, no image/audio libs): the
metadata tier of the multimodal kernels.  Pixel/sample decode remains a
documented stub (no PIL/ffmpeg in this container)."""

from __future__ import annotations

import struct
import zlib

import pytest

from pigeon_optics_spark.pipeline.multimodal import (
    sniff_image_meta,
    sniff_wav_meta,
)


def _png(w, h, color_type=6):
    ihdr = struct.pack(">II5B", w, h, 8, color_type, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + chunk
            + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF))


def _jpeg(w, h, n_comp=3, progressive=False):
    # SOI + APP0(JFIF) + DQT filler + SOF + EOI — a structurally valid header
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" * 65
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    sof = (sof_marker + struct.pack(">H", 8 + 3 * n_comp) + b"\x08"
           + struct.pack(">HH", h, w) + bytes([n_comp]) + b"\x00" * (3 * n_comp))
    return b"\xff\xd8" + app0 + dqt + sof + b"\xff\xd9"


def _wav(rate, ch, bits, data_len):
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * bits // 8,
                      ch * bits // 8, bits)
    body = (b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", data_len) + b"\x00" * data_len)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_png_dimensions_and_channels():
    assert sniff_image_meta(_png(640, 480, color_type=6)) == (640, 480, 4, "png")
    assert sniff_image_meta(_png(1, 1, color_type=0)) == (1, 1, 1, "png")
    assert sniff_image_meta(_png(13, 7, color_type=2)) == (13, 7, 3, "png")


def test_gif_and_bmp():
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00;"
    assert sniff_image_meta(gif) == (320, 200, 3, "gif")
    info = struct.pack("<IiiHH", 40, 800, -600, 1, 32) + b"\x00" * 20
    bmp = b"BM" + struct.pack("<I", 54) + b"\x00" * 4 + struct.pack("<I", 54) + info
    # negative height = top-down BMP; reported as positive
    assert sniff_image_meta(bmp) == (800, 600, 4, "bmp")


def test_jpeg_baseline_and_progressive():
    assert sniff_image_meta(_jpeg(1920, 1080)) == (1920, 1080, 3, "jpeg")
    assert sniff_image_meta(_jpeg(64, 32, n_comp=1, progressive=True)) == \
        (64, 32, 1, "jpeg")


def test_non_images_rejected():
    assert sniff_image_meta(b"") is None
    assert sniff_image_meta(b"plain text bytes, definitely not an image") is None
    assert sniff_image_meta(b"\x89PNG\r\n\x1a\n tru") is None  # truncated
    assert sniff_image_meta(b"\xff\xd8\xff\xd9") is None  # JPEG with no SOF


def test_wav_meta_and_duration():
    ch, rate, bits, dur = sniff_wav_meta(_wav(44100, 2, 16, 44100 * 4))
    assert (ch, rate, bits) == (2, 44100, 16)
    assert dur == pytest.approx(1000.0)  # one second of stereo 16-bit
    assert sniff_wav_meta(b"RIFFxxxxNOPE") is None
    assert sniff_wav_meta(b"") is None


def test_decode_image_meta_distributed(spark):
    from pigeon_optics_spark.pipeline.multimodal import decode_image_meta

    rows = [(1, _png(10, 20)), (2, _jpeg(30, 40)), (3, b"not an image"),
            (4, None)]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    got = {r["media_id"]: r for r in decode_image_meta(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["format"]) == (10, 20, "png")
    assert (got[2]["width"], got[2]["height"], got[2]["format"]) == (30, 40, "jpeg")
    assert got[3]["format"] == "unknown" and got[3]["width"] is None
    assert got[4]["format"] == "unknown" and got[4]["byte_len"] == 0


def _gif_anim(frames, *, gct=False, screen=(100, 100)):
    """Minimal valid animated GIF: frames = [(x, y, w, h, delay_cs, lct)]."""
    out = [b"GIF89a", struct.pack("<HH", *screen)]
    if gct:
        out.append(bytes([0x80, 0, 0]) + b"\x00" * 6)  # 2-entry GCT
    else:
        out.append(bytes([0x00, 0, 0]))
    for x, y, w, h, delay_cs, lct in frames:
        if delay_cs is not None:  # GCE is optional per frame
            out.append(b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs)
                       + b"\x00\x00")
        out.append(b"\x2c" + struct.pack("<HHHH", x, y, w, h)
                   + bytes([0x80 if lct else 0x00]))
        if lct:
            out.append(b"\x00" * 6)  # 2-entry LCT
        out.append(b"\x02\x02\x4c\x01\x00")  # LZW min + one sub-block + term
    out.append(b"\x3b")
    return b"".join(out)


def test_gif_frame_index_multiframe():
    from pigeon_optics_spark.pipeline.multimodal import gif_frame_index

    b = _gif_anim([(0, 0, 10, 20, 5, False), (2, 3, 30, 40, 10, True),
                   (4, 5, 50, 60, None, False)], gct=True)
    got = gif_frame_index(b)
    # ts is cumulative PRIOR delay: frame0 at 0, frame1 after 50ms,
    # frame2 after 50+100ms (its own missing GCE means delay 0 carried out)
    assert got == [(0, 0, 0, 10, 20, 0.0), (1, 2, 3, 30, 40, 50.0),
                   (2, 4, 5, 50, 60, 150.0)]


def test_gif_frame_index_plain_comment_and_netscape_extensions():
    from pigeon_optics_spark.pipeline.multimodal import gif_frame_index

    # comment extension (0xFE) and application extension (0xFF) between
    # frames must be walked over without affecting delays
    b = (b"GIF89a" + struct.pack("<HH", 10, 10) + bytes([0, 0, 0])
         + b"\x21\xfe\x05hello\x00"                      # comment
         + b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"  # app ext + loop
         + b"\x2c" + struct.pack("<HHHH", 1, 2, 3, 4) + b"\x00"
         + b"\x02\x02\x4c\x01\x00" + b"\x3b")
    assert gif_frame_index(b) == [(0, 1, 2, 3, 4, 0.0)]


def test_gif_frame_index_rejects_and_truncation():
    from pigeon_optics_spark.pipeline.multimodal import gif_frame_index

    assert gif_frame_index(b"") == []
    assert gif_frame_index(b"GIF89a\x01") == []          # truncated header
    assert gif_frame_index(b"not a gif at all") == []
    # single-frame still GIF parses as one frame
    single = _gif_anim([(0, 0, 8, 8, None, False)])
    assert gif_frame_index(single) == [(0, 0, 0, 8, 8, 0.0)]
    # truncation mid-descriptor yields the frames parsed so far
    two = _gif_anim([(0, 0, 8, 8, 1, False), (1, 1, 9, 9, 2, False)])
    cut = two[:two.index(b"\x2c", two.index(b"\x2c") + 1) + 4]
    assert [f[:5] for f in gif_frame_index(cut)] == [(0, 0, 0, 8, 8)]


def test_enumerate_gif_frames_distributed(spark):
    from pigeon_optics_spark.pipeline.multimodal import enumerate_gif_frames

    rows = [(1, _gif_anim([(0, 0, 5, 6, 4, False), (1, 1, 7, 8, 0, True)])),
            (2, b"not a gif"), (3, None)]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    got = sorted((r["media_id"], r["frame_no"], r["width"], r["height"],
                  r["ts_ms"]) for r in enumerate_gif_frames(df).collect())
    assert got == [(1, 0, 5, 6, 0.0), (1, 1, 7, 8, 40.0)]


# --- mp4 / ISO-BMFF box-walk ------------------------------------------------


def _bmff_box(btype, payload):
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _mp4(ts, dur, tracks, *, mvhd_v=0, tkhd_v=0, largesize_mdat=False):
    if mvhd_v:
        mvhd = _bmff_box(b"mvhd", bytes([1, 0, 0, 0])
                         + struct.pack(">QQIQ", 0, 0, ts, dur))
    else:
        mvhd = _bmff_box(b"mvhd", bytes([0, 0, 0, 0])
                         + struct.pack(">IIII", 0, 0, ts, dur))
    trak_boxes = []
    for i, (w, h) in enumerate(tracks):
        head = (bytes([1, 0, 0, 0]) + struct.pack(">QQIIQ", 0, 0, i + 1, 0, dur)
                if tkhd_v else
                bytes([0, 0, 0, 0]) + struct.pack(">IIIII", 0, 0, i + 1, 0, dur))
        tkhd = _bmff_box(b"tkhd", head + b"\x00" * 8
                         + struct.pack(">HHHH", 0, 0, 0, 0) + b"\x00" * 36
                         + struct.pack(">II", w << 16, h << 16))
        trak_boxes.append(_bmff_box(b"trak", tkhd))
    moov = _bmff_box(b"moov", mvhd + b"".join(trak_boxes)
                     + _bmff_box(b"free", b""))
    ftyp = _bmff_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"iso2mp41")
    if largesize_mdat:
        mdat = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 20) + b"\x00" * 4
    else:
        mdat = _bmff_box(b"mdat", b"\x00" * 4)
    return ftyp + moov + mdat


def test_mp4_meta_v0_and_v1():
    from pigeon_optics_spark.pipeline.multimodal import sniff_mp4_meta

    got = sniff_mp4_meta(_mp4(1000, 2500, [(640, 360)]))
    assert got == (1000, 2500, 2500.0, 1, 640, 360)
    # v1 (64-bit) layouts parse to the same answer
    got = sniff_mp4_meta(_mp4(1000, 2500, [(640, 360)], mvhd_v=1, tkhd_v=1))
    assert got == (1000, 2500, 2500.0, 1, 640, 360)


def test_mp4_meta_audio_track_and_largesize():
    from pigeon_optics_spark.pipeline.multimodal import sniff_mp4_meta

    # audio-only track stores 0x0 dims -> no width reported, track counted
    ts, dur, dur_ms, nt, w, h = sniff_mp4_meta(
        _mp4(600, 600, [(0, 0)], largesize_mdat=True))
    assert (ts, dur, dur_ms, nt, w, h) == (600, 600, 1000.0, 1, None, None)
    # first VIDEO track wins when audio precedes it
    got = sniff_mp4_meta(_mp4(600, 300, [(0, 0), (1280, 720)]))
    assert got[3:] == (2, 1280, 720)


def test_mp4_meta_rejects_and_truncation():
    from pigeon_optics_spark.pipeline.multimodal import sniff_mp4_meta

    assert sniff_mp4_meta(b"") is None
    assert sniff_mp4_meta(b"not an mp4 container") is None
    # moov-less file (no mvhd) -> None
    ftyp = _bmff_box(b"ftyp", b"isom\x00\x00\x02\x00")
    assert sniff_mp4_meta(ftyp + _bmff_box(b"mdat", b"xx")) is None
    # truncated mid-moov: the walker stops instead of misparsing
    whole = _mp4(1000, 2500, [(640, 360)])
    assert sniff_mp4_meta(whole[:40]) is None
    # RIFF/WAV bytes are not BMFF
    assert sniff_mp4_meta(_wav(8000, 1, 16, 64)) is None


def test_decode_mp4_meta_distributed(spark):
    from pigeon_optics_spark.pipeline.multimodal import decode_mp4_meta

    rows = [(1, _mp4(1000, 5000, [(320, 240)])),
            (2, b"garbage"), (3, None)]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    got = {r["media_id"]: (r["timescale"], r["duration_ms"], r["n_tracks"],
                           r["width"], r["height"], r["format"])
           for r in decode_mp4_meta(df).collect()}
    assert got[1] == (1000, 5000.0, 1, 320, 240, "mp4")
    assert got[2] == (None, None, None, None, None, "unknown")
    assert got[3] == (None, None, None, None, None, "unknown")


# ---------------------------------------------------------------------------
# tar shard manifest kernel
# ---------------------------------------------------------------------------


def test_tar_roundtrip_with_stdlib():
    """Our writer parses with the stdlib and the stdlib's output parses
    with our walker — both directions, padding and end-block included."""
    import io
    import tarfile

    from pigeon_optics_spark.pipeline.multimodal import (
        tar_member_index,
        write_tar,
    )

    t = write_tar([("a.txt", b"x" * 123), ("dir/b.jpg", b"y" * 512),
                   ("empty.bin", b"")])
    got = [(n, s, tf) for n, s, tf, _ in tar_member_index(t)]
    assert got == [("a.txt", 123, "0"), ("dir/b.jpg", 512, "0"),
                   ("empty.bin", 0, "0")]
    with tarfile.open(fileobj=io.BytesIO(t)) as tf:
        assert [(m.name, m.size) for m in tf.getmembers()] == \
            [("a.txt", 123), ("dir/b.jpg", 512), ("empty.bin", 0)]

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as w:
        data = b"z" * 700
        info = tarfile.TarInfo("sample.00.txt")
        info.size = len(data)
        w.addfile(info, io.BytesIO(data))
    idx = tar_member_index(buf.getvalue())
    assert [(n, s) for n, s, _, _ in idx] == [("sample.00.txt", 700)]
    # offsets advance by 512-padded payloads
    assert idx[0][3] == 0


def test_tar_rejects_corrupt_checksum_and_bad_octal():
    from pigeon_optics_spark.pipeline.multimodal import (
        tar_member_index,
        write_tar,
    )

    t = bytearray(write_tar([("a.txt", b"x" * 10)]))
    t[0] ^= 0xFF  # name byte flip breaks the checksum
    with pytest.raises(ValueError, match="checksum"):
        tar_member_index(bytes(t))

    t2 = bytearray(write_tar([("a.txt", b"x" * 10)]))
    t2[124:136] = b"notanoctal!\x00"
    with pytest.raises(ValueError, match="bad tar header"):
        tar_member_index(bytes(t2))


def test_tar_truncation_fails_loudly():
    from pigeon_optics_spark.pipeline.multimodal import (
        tar_member_index,
        write_tar,
    )

    t = write_tar([("a.txt", b"x" * 100), ("b.txt", b"y" * 100)])
    # cut inside the second member's HEADER: trailing nonzero fragment
    with pytest.raises(ValueError, match="trailing bytes"):
        tar_member_index(t[: 1024 + 100])
    # cut inside the FIRST member's payload: declared size exceeds buffer
    with pytest.raises(ValueError, match="declares"):
        tar_member_index(t[: 512 + 50])
    # cut exactly at a member boundary (no terminator): tolerated — some
    # writers omit the end blocks; nothing in the manifest is a lie
    assert [n for n, *_ in tar_member_index(t[:1024])] == ["a.txt"]


def test_enumerate_tar_members_distributed(spark):
    import pandas as pd

    from pigeon_optics_spark.pipeline.multimodal import (
        enumerate_tar_members,
        write_tar,
    )

    rows = [(i, write_tar([(f"{i}.txt", b"a" * (i + 1)),
                           (f"{i}.jpg", b"b" * (2 * i + 1))]))
            for i in range(5)]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    out = enumerate_tar_members(df).toPandas() \
        .sort_values(["media_id", "member_idx"]).reset_index(drop=True)
    assert len(out) == 10
    assert list(out[out.media_id == 3].member_name) == ["3.txt", "3.jpg"]
    assert list(out[out.media_id == 3].member_size) == [4, 7]


def test_tar_roundtrip_hypothesis():
    """Property fuzz: any member list round-trips through write_tar →
    tar_member_index with names, sizes, and offsets intact."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pigeon_optics_spark.pipeline.multimodal import (
        tar_member_index,
        write_tar,
    )

    name_st = st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=1, max_size=40)
    member_st = st.tuples(name_st, st.binary(min_size=0, max_size=1500))

    @settings(max_examples=60, deadline=None)
    @given(st.lists(member_st, min_size=0, max_size=6))
    def check(members):
        t = write_tar(members)
        idx = tar_member_index(t)
        assert [(n, len(p)) for n, p in members] == \
            [(n, s) for n, s, _tf, _o in idx]
        # payload offsets point at the actual bytes
        for (name, payload), (_n, size, _tf, off) in zip(members, idx):
            assert t[off + 512: off + 512 + size] == payload

    check()


def test_pack_webdataset_shards_roundtrip(spark):
    """Write half meets read half: shards built distributed must parse
    back (our walker AND stdlib) to exactly the input samples."""
    import io
    import tarfile

    from pigeon_optics_spark.pipeline.multimodal import (
        pack_webdataset_shards,
        tar_member_index,
    )

    rows = [(i, f"text {i}", bytes([i % 256]) * (i + 1)) for i in range(37)]
    df = spark.createDataFrame(rows, "doc_id long, text string, img binary")
    shards = pack_webdataset_shards(
        df, {"txt": "text", "jpg": "img"}, n_shards=4).collect()

    assert 1 <= len(shards) <= 4
    assert sum(r["n_samples"] for r in shards) == 37
    assert sum(r["n_members"] for r in shards) == 74

    seen = {}
    for r in shards:
        blob = bytes(r["shard"])
        idx = tar_member_index(blob)
        assert len(idx) == r["n_members"]
        with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
            for m in tf.getmembers():
                seen[m.name] = tf.extractfile(m).read()
    for i, text, img in rows:
        assert seen[f"{i}.txt"] == text.encode()
        assert seen[f"{i}.jpg"] == img


def test_pack_webdataset_shards_skips_nulls(spark):
    from pigeon_optics_spark.pipeline.multimodal import (
        pack_webdataset_shards,
        tar_member_index,
    )

    df = spark.createDataFrame([(1, "a", None), (2, None, b"x")],
                               "doc_id long, text string, img binary")
    shards = pack_webdataset_shards(
        df, {"txt": "text", "jpg": "img"}, n_shards=1).collect()
    names = [n for n, *_ in tar_member_index(bytes(shards[0]["shard"]))]
    assert sorted(names) == ["1.txt", "2.jpg"]


def test_pack_webdataset_shards_drops_null_ids(spark):
    from pigeon_optics_spark.pipeline.multimodal import (
        pack_webdataset_shards,
        tar_member_index,
    )

    df = spark.createDataFrame([(1, "a"), (None, "ghost"), (2, "b")],
                               "doc_id long, text string")
    shards = pack_webdataset_shards(df, {"txt": "text"}, n_shards=1).collect()
    names = [n for n, *_ in tar_member_index(bytes(shards[0]["shard"]))]
    assert sorted(names) == ["1.txt", "2.txt"]
    assert shards[0]["n_samples"] == 2


# ---------------------------------------------------------------------------
# SRT timed-text parser
# ---------------------------------------------------------------------------


def test_srt_basic_and_position_metadata():
    from pigeon_optics_spark.pipeline.multimodal import parse_srt_cues

    srt = ("1\n00:00:01,000 --> 00:00:03,500\nHello world\nsecond line\n"
           "\n2\n00:00:04,000 --> 00:00:06,000 X1:100 X2:200\nNext cue\n")
    assert parse_srt_cues(srt) == [
        (1, 1000, 3500, 2, len("Hello world") + len("second line")),
        (2, 4000, 6000, 1, len("Next cue")),
    ]


def test_srt_bom_crlf_dot_millis_no_trailing_newline():
    from pigeon_optics_spark.pipeline.multimodal import parse_srt_cues

    srt = ("﻿1\r\n00:00:00,100 --> 00:00:00,900\r\nA\r\n\r\n"
           "garbage block without timing\r\n\r\n"
           "3\r\n00:01:00.000 --> 00:01:02.250\r\nBB\r\nCCC")
    # malformed middle block skipped; '.' millisecond separator accepted
    assert parse_srt_cues(srt) == [(1, 100, 900, 1, 1),
                                   (3, 60000, 62250, 2, 5)]


def test_srt_missing_index_uses_running_position():
    from pigeon_optics_spark.pipeline.multimodal import parse_srt_cues

    srt = ("00:00:01,000 --> 00:00:02,000\nxy\n\n"
           "00:00:03,000 --> 00:00:04,000\nz\n")
    assert [c[0] for c in parse_srt_cues(srt)] == [1, 2]


def test_srt_empty_and_hour_rollover():
    from pigeon_optics_spark.pipeline.multimodal import parse_srt_cues

    assert parse_srt_cues("") == []
    assert parse_srt_cues("junk with no cues at all") == []
    cues = parse_srt_cues("1\n01:02:03,004 --> 01:02:05,006\nx\n")
    assert cues == [(1, 3723004, 3725006, 1, 1)]


def test_srt_distributed_cue_table(spark):
    import pandas as pd  # noqa: F401
    from pigeon_optics_spark.pipeline.multimodal import parse_srt_cues_df

    df = spark.createDataFrame(
        [(1, "1\n00:00:01,000 --> 00:00:02,000\nhello\n"),
         (2, None),
         (3, "not a subtitle file")],
        "media_id long, srt string")
    rows = sorted(parse_srt_cues_df(df).collect())
    assert len(rows) == 1
    assert tuple(rows[0]) == (1, 1, 1000, 2000, 1, 5)


def test_srt_whitespace_only_separator_lines():
    from pigeon_optics_spark.pipeline.multimodal import parse_srt_cues

    srt = ("1\n00:00:01,000 --> 00:00:02,000\na\n \n"
           "2\n00:00:03,000 --> 00:00:04,000\nbb\n\t\n \n"
           "3\n00:00:05,000 --> 00:00:06,000\nccc\n")
    assert parse_srt_cues(srt) == [(1, 1000, 2000, 1, 1),
                                   (2, 3000, 4000, 1, 2),
                                   (3, 5000, 6000, 1, 3)]


def test_wav_pcm_stats_against_stdlib_wave():
    """The PCM kernel must agree with a file written by stdlib `wave`
    (independent writer), reject non-16-bit input, and tolerate an
    odd-length payload by dropping the trailing half-sample."""
    import io
    import struct
    import wave

    import numpy as np

    from pigeon_optics_spark.pipeline.multimodal import wav_pcm_stats

    rng = np.random.default_rng(3)
    samples = rng.integers(-32768, 32768, size=999, dtype=np.int16)
    samples[5] = 32767
    samples[6] = -32768
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(samples.tobytes())
    st = wav_pcm_stats(buf.getvalue())
    s64 = samples.astype(np.int64)
    assert st == (999, int(s64.sum()), int((s64 * s64).sum()),
                  int(np.abs(s64).max()),
                  int(((samples == 32767) | (samples == -32768)).sum()))
    assert wav_pcm_stats(b"not a wav") is None
    # 8-bit wav: rejected (kernel is 16-bit PCM only)
    fmt8 = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"fmt " + struct.pack("<I", 16) + fmt8 \
        + b"data" + struct.pack("<I", 4) + b"\x01\x02\x03\x04"
    assert wav_pcm_stats(b"RIFF" + struct.pack("<I", 4 + len(body))
                         + b"WAVE" + body) is None
    # odd payload length: trailing byte ignored, not a crash
    raw = buf.getvalue() + b"\x00"
    fmt16 = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"fmt " + struct.pack("<I", 16) + fmt16 \
        + b"data" + struct.pack("<I", 5) + b"\x01\x00\x02\x00\x03"
    st2 = wav_pcm_stats(b"RIFF" + struct.pack("<I", 4 + len(body))
                        + b"WAVE" + body)
    assert st2 is not None and st2[0] == 2


def test_png_chunk_integrity_kernel():
    """CRC verify: intact file ok; payload flip caught; truncated final
    chunk counted bad; non-PNG rejected."""
    import struct
    import zlib

    from pigeon_optics_spark.pipeline.multimodal import png_chunk_integrity

    def chunk(ctype, payload):
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload \
            + struct.pack(">I", crc)

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = chunk(b"IHDR", struct.pack(">II5B", 4, 4, 8, 6, 0, 0, 0))
    good = sig + ihdr + chunk(b"idAT", b"hello world")
    assert png_chunk_integrity(good) == (2, 0, True)
    bad = bytearray(good)
    bad[len(sig) + len(ihdr) + 8] ^= 0xFF  # flip first payload byte
    assert png_chunk_integrity(bytes(bad)) == (2, 1, False)
    truncated = good[:-6]  # chops into the final chunk's CRC
    n, nbad, ok = png_chunk_integrity(truncated)
    assert nbad >= 1 and not ok
    assert png_chunk_integrity(b"JFIF") is None


def test_png_pixel_roundtrip_all_filters():
    """write_png/decode_png_pixels identity across every filter type,
    channel count, and odd sizes (incl. 1x1 where left/up neighbors are
    absent)."""
    import random

    from pigeon_optics_spark.pipeline.multimodal import (
        decode_png_pixels,
        write_png,
    )

    rng = random.Random(1)
    for ch in (3, 4):
        for w, h in ((1, 1), (5, 4), (17, 9)):
            px = bytes(rng.randrange(256) for _ in range(w * h * ch))
            for filt in (None, [1] * h, [2] * h, [3] * h, [4] * h,
                         [rng.randrange(5) for _ in range(h)]):
                b = write_png(px, w, h, ch, filt)
                assert decode_png_pixels(b) == (w, h, ch, px)


def test_png_decode_hand_computed_paeth():
    """Independent of the writer: a 2x2 RGB IDAT stream hand-filtered per
    the PNG spec (filter 4 rows; Paeth predictor worked by hand) must
    invert to the intended raw pixels — guards against a shared
    encoder/decoder bug (the events_concurrency lesson)."""
    import struct
    import zlib

    from pigeon_optics_spark.pipeline.multimodal import decode_png_pixels

    # raw pixels: row0 = (10,20,30) (40,60,80); row1 = (15,25,35) (70,90,110)
    # row0 filter 4: prior row = 0s -> paeth(a,0,0)=a (first px a=0 -> raw)
    #   bytes: 10 20 30 | 40-10=30 60-20=40 80-30=50
    # row1 filter 4: a=left raw, b=up raw, c=up-left raw
    #   px0: paeth(0, up, 0)=up -> 15-10=5 25-20=5 35-30=5
    #   px1: a=(15,25,35) b=(40,60,80) c=(10,20,30):
    #     p=a+b-c=(45,65,85); |p-a|=30,40,50; |p-b|=5,5,5; |p-c|=35,45,55
    #     -> predictor=b -> 70-40=30 90-60=30 110-80=30
    rows = bytes([4, 10, 20, 30, 30, 40, 50,
                  4, 5, 5, 5, 30, 30, 30])

    def chunk(ctype, payload):
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload \
            + struct.pack(">I", crc)

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(rows))
           + chunk(b"IEND", b""))
    got = decode_png_pixels(png)
    assert got == (2, 2, 3, bytes([10, 20, 30, 40, 60, 80,
                                   15, 25, 35, 70, 90, 110]))


def test_png_decode_third_party_file():
    """Decode a PNG produced by an external encoder (adaptive per-row
    filters): stream must parse end-to-end with exact length — any
    filter-inversion bug desyncs the row walk immediately."""
    import glob
    import os

    import pytest

    from pigeon_optics_spark.pipeline.multimodal import decode_png_pixels

    candidates = [p for pat in ("/usr/share/doc/python3/_static/*.png",
                                "/usr/share/gitweb/static/*.png")
                  for p in glob.glob(pat)]
    decoded = 0
    for p in candidates:
        if not os.path.exists(p):
            continue
        got = decode_png_pixels(open(p, "rb").read())
        if got is None:     # palette/16-bit/interlaced: out of scope
            continue
        w, h, ch, px = got
        assert len(px) == w * h * ch
        decoded += 1
    if decoded == 0:
        pytest.skip("no decodable system PNGs on this host")


def test_ahash64_brightness_invariance_and_sensitivity():
    """aHash is exactly invariant under unclamped constant brightness
    shifts (the phash gate's plant class) yet changes when cell structure
    changes (not a constant function)."""
    from pigeon_optics_spark.pipeline.multimodal import ahash64_words

    w = h = 16
    base = bytes((i * 7 + (i * i) % 97) % 224 for i in range(w * h * 3))
    shifted = bytes(v + 16 for v in base)
    hw0 = ahash64_words(w, h, 3, base)
    assert hw0 == ahash64_words(w, h, 3, shifted)
    assert 0 <= hw0[0] < (1 << 32) and 0 <= hw0[1] < (1 << 32)
    # brighten ONLY the top half: top cells flip relative to the mean
    half = bytearray(base)
    for i in range(len(half) // 2):
        half[i] = min(255, half[i] + 120)
    assert ahash64_words(w, h, 3, bytes(half)) != hw0
    # non-8-divisible dims refuse (no fake resampling)
    assert ahash64_words(12, 16, 3, bytes(12 * 16 * 3)) is None


def test_ahash64_matches_bruteforce_reference():
    """Kernel vs an independent dict-based reference on RGBA pixels."""
    from pigeon_optics_spark.pipeline.multimodal import ahash64_words

    w, h, ch = 24, 8, 4
    px = bytes((i * 13 + (i * i * i) % 31) % 256 for i in range(w * h * ch))
    cells = {}
    for y in range(h):
        for x in range(w):
            p = (y * w + x) * ch
            luma = 299 * px[p] + 587 * px[p + 1] + 114 * px[p + 2]
            key = (y // (h // 8)) * 8 + x // (w // 8)
            cells[key] = cells.get(key, 0) + luma
    total = sum(cells.values())
    hi = lo = 0
    for b, cs in cells.items():
        if cs * 64 > total:
            if b < 32:
                lo |= 1 << b
            else:
                hi |= 1 << (b - 32)
    assert ahash64_words(w, h, ch, px) == (hi, lo)


def test_pcm_frame_energies_consistent_with_stats():
    """Σ per-frame energies + tail == wav_pcm_stats sum_sq; frame cut and
    tail-drop semantics pinned."""
    import numpy as np

    from pigeon_optics_spark.pipeline.multimodal import (
        pcm_frame_energies, wav_pcm_stats)

    n = 160 * 3 + 57          # deliberately non-multiple: 57-sample tail
    i = np.arange(n, dtype=np.int64)
    v = ((i * 31 + 5) % 65536 - 32768).astype("<i2")
    payload = v.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (b"RIFF" + struct.pack("<I", 4 + 24 + 8 + len(payload)) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + fmt
           + b"data" + struct.pack("<I", len(payload)) + payload)
    es = pcm_frame_energies(wav, frame=160)
    assert len(es) == 3
    s64 = v.astype(np.int64)
    for j, e in enumerate(es):
        assert e == int((s64[j * 160:(j + 1) * 160] ** 2).sum())
    stats = wav_pcm_stats(wav)
    assert sum(es) + int((s64[480:] ** 2).sum()) == stats[2]
    assert pcm_frame_energies(b"RIFX" + wav[4:]) is None


def test_png_ahash_and_frame_energy_drop_undecodable(spark):
    """DataFrame kernels drop non-decodable rows instead of erroring —
    the media-lake reality where a fraction of blobs is junk."""
    from pigeon_optics_spark.pipeline.multimodal import (
        pcm_frame_energy_df, png_ahash, write_png)

    good_png = write_png(bytes(16 * 16 * 3), 16, 16, 3)
    rows = [(1, bytearray(good_png)), (2, bytearray(b"not a png")),
            (3, bytearray(b""))]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    got = png_ahash(df).collect()
    assert [r["media_id"] for r in got] == [1]
    # all-zero image: no cell beats the mean -> hash words are 0
    assert (got[0]["hash_hi"], got[0]["hash_lo"]) == (0, 0)

    import struct as _s
    fmt = _s.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    pay = (b"\x01\x00" * 320)
    wav = (b"RIFF" + _s.pack("<I", 4 + 24 + 8 + len(pay)) + b"WAVE"
           + b"fmt " + _s.pack("<I", 16) + fmt
           + b"data" + _s.pack("<I", len(pay)) + pay)
    rows = [(1, bytearray(wav)), (2, bytearray(b"junk"))]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    got = pcm_frame_energy_df(df, frame=160).collect()
    assert sorted((r["media_id"], r["frame_idx"], r["energy"])
                  for r in got) == [(1, 0, 160), (1, 1, 160)]


def test_resize_nearest_odd_dims_replica():
    """resize_nearest on non-divisible dims must match the pure-Python
    floor-mapping replica exactly (5x3 -> 2x2, 7x7 -> 3x3), and an
    upscale repeats source pixels."""
    from pigeon_optics_spark.pipeline.multimodal import resize_nearest

    def replica(w, h, ch, px, w2, h2):
        out = bytearray()
        for y2 in range(h2):
            for x2 in range(w2):
                sx, sy = (x2 * w) // w2, (y2 * h) // h2
                base = (sy * w + sx) * ch
                out.extend(px[base:base + 3])
        return bytes(out)

    import random
    rng = random.Random(7)
    for (w, h, w2, h2) in [(5, 3, 2, 2), (7, 7, 3, 3), (2, 2, 4, 4),
                           (16, 16, 8, 8), (1, 1, 3, 3)]:
        for ch in (3, 4):
            px = bytes(rng.randrange(256) for _ in range(w * h * ch))
            assert resize_nearest(w, h, ch, px, w2, h2) \
                == replica(w, h, ch, px, w2, h2), (w, h, w2, h2, ch)


def test_webp_sniff_all_variants():
    from pigeon_optics_spark.pipeline.multimodal import sniff_webp_meta

    def chunk(cid, payload):
        return (cid + struct.pack("<I", len(payload)) + payload
                + (b"\x00" if len(payload) % 2 else b""))

    def riff(chunks):
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks

    # lossy: u14 dims behind the 9d 01 2a start code
    lossy = riff(chunk(b"VP8 ", b"\x00\x00\x00\x9d\x01\x2a"
                       + struct.pack("<HH", 640, 480)))
    assert sniff_webp_meta(lossy) == (640, 480, "lossy", False, 1)

    # lossless: packed 32-bit word, odd payload => pad byte is load-bearing
    bits = (99) | (49 << 14) | (1 << 28)
    vp8l = chunk(b"VP8L", b"\x2f" + struct.pack("<I", bits))
    assert len(vp8l) % 2 == 0  # padded
    trailer = chunk(b"META", b"xy")
    assert sniff_webp_meta(riff(vp8l + trailer)) == \
        (100, 50, "lossless", True, 2)

    # extended: 24-bit canvas wins over the frame chunk's dims
    vp8x = chunk(b"VP8X", b"\x10" + b"\x00" * 3
                 + (7000 - 1).to_bytes(3, "little")
                 + (5000 - 1).to_bytes(3, "little"))
    frame = chunk(b"VP8 ", b"\x00\x00\x00\x9d\x01\x2a"
                  + struct.pack("<HH", 16383, 16383))
    assert sniff_webp_meta(riff(vp8x + frame)) == \
        (7000, 5000, "extended", True, 2)

    # ALPH chunk implies alpha without VP8X
    alph = chunk(b"ALPH", b"\x00")
    assert sniff_webp_meta(riff(alph + lossy[12:]))[3] is True

    # negatives: wrong form type, empty, dimension-less, truncated payload
    assert sniff_webp_meta(b"RIFF" + struct.pack("<I", 4) + b"WAVE") is None
    assert sniff_webp_meta(b"") is None
    assert sniff_webp_meta(riff(chunk(b"META", b"xy"))) is None
    assert sniff_webp_meta(riff(vp8l)[:-3]) is None

    # the RIFF declared size BOUNDS the walk: trailing bytes after the
    # declared payload are never parsed as chunks (n_chunks stays 1),
    # and a chunk whose declared length runs past the RIFF payload
    # (though inside the buffer) refuses
    padded = riff(vp8l) + chunk(b"META", b"xy")
    assert sniff_webp_meta(padded) == (100, 50, "lossless", True, 1)
    overrun = riff(vp8l[:-2]) + b"\x00\x00"  # chunk len > payload end
    assert sniff_webp_meta(overrun) is None


def test_mp3_frame_walk_kernel():
    from pigeon_optics_spark.pipeline.multimodal import mp3_frame_walk

    def frame(bri, sri, pad):
        brt = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
               160, 192, 224, 256, 320)
        rates = (44100, 48000, 32000)
        flen = 144000 * brt[bri] // rates[sri] + pad
        return bytes([0xFF, 0xFB, (bri << 4) | (sri << 2) | (pad << 1),
                      0]) + b"\x00" * (flen - 4)

    # CBR: 3 frames at 128 kbps / 44100, alternating padding
    cbr = frame(9, 0, 0) + frame(9, 0, 1) + frame(9, 0, 0)
    assert mp3_frame_walk(cbr) == (3, 44100, 128, 128, False)

    # VBR: two bitrates
    vbr = frame(9, 1, 0) + frame(14, 1, 0)
    assert mp3_frame_walk(vbr) == (2, 48000, 128, 320, True)

    # ID3v2 prefix (synchsafe size 200) + ID3v1 trailer
    size = 200
    id3 = (b"ID3\x04\x00\x00"
           + bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                    (size >> 7) & 0x7F, size & 0x7F]) + b"\x00" * size)
    tagged = id3 + cbr + b"TAG" + b"\x00" * 125
    assert mp3_frame_walk(tagged) == (3, 44100, 128, 128, False)

    # negatives: garbage, truncated frame, mid-stream rate change,
    # desync after a valid frame, ID3 with no frames
    assert mp3_frame_walk(b"junkjunkjunk") is None
    assert mp3_frame_walk(cbr[:-10]) is None
    assert mp3_frame_walk(frame(9, 0, 0) + frame(9, 2, 0)) is None
    assert mp3_frame_walk(frame(9, 0, 0) + b"\x00\x00\x00\x00") is None
    assert mp3_frame_walk(id3) is None
    assert mp3_frame_walk(b"") is None


def test_bmp_pixel_roundtrip_and_png_consistency():
    import random

    from pigeon_optics_spark.pipeline.multimodal import (
        decode_bmp_pixels,
        decode_png_pixels,
        write_bmp,
        write_png,
    )

    rng = random.Random(7)
    for w, h in [(1, 1), (4, 4), (5, 3), (7, 2), (3, 7), (15, 13)]:
        px = bytes(rng.randrange(256) for _ in range(w * h * 3))
        for td in (False, True):
            assert decode_bmp_pixels(write_bmp(px, w, h, topdown=td)) \
                == (w, h, 3, px), (w, h, td)
        # the cross-format property the gate rides on: identical tensors
        png = decode_png_pixels(
            write_png(px, w, h, 3, row_filters=[r % 5 for r in range(h)]))
        assert png == (w, h, 3, px)

    # negatives: empty, header-only, truncated pixel array, wrong bpp
    assert decode_bmp_pixels(b"") is None
    assert decode_bmp_pixels(b"BM" + b"\x00" * 60) is None
    full = write_bmp(b"\x00" * 12, 2, 2)
    assert decode_bmp_pixels(full[:-3]) is None
    bad_bpp = bytearray(full)
    bad_bpp[28] = 8
    assert decode_bmp_pixels(bytes(bad_bpp)) is None


def test_tiff_ifd_walk_kernel():
    from pigeon_optics_spark.pipeline.multimodal import (
        sniff_tiff_meta,
        write_tiff_meta,
    )

    for be in (False, True):
        for pages in (1, 2, 3):
            t = write_tiff_meta(800, 600, samples=3, pages=pages,
                                big_endian=be)
            assert sniff_tiff_meta(t) == \
                (800, 600, 3, pages, "big" if be else "little")

    # negatives: empty, bad magic, truncated chain, dangling IFD offset
    assert sniff_tiff_meta(b"") is None
    assert sniff_tiff_meta(b"II\x2b\x00\x08\x00\x00\x00") is None
    assert sniff_tiff_meta(write_tiff_meta(8, 9)[:-6]) is None
    dangling = bytearray(write_tiff_meta(8, 9))
    dangling[4:8] = (9999).to_bytes(4, "little")
    assert sniff_tiff_meta(bytes(dangling)) is None


def test_byte_walkers_never_raise_on_fuzz():
    """Crash-safety fuzz for every pure-byte container walker: at 100 TB
    a parser exception kills the executor task (and with it the job),
    so the kernel contract is return-None-or-parse, NEVER raise.  Feeds
    (a) random bytes, (b) truncations of valid files at every small
    length, (c) single-byte corruptions of valid files."""
    import random

    from pigeon_optics_spark.pipeline.multimodal import (
        avi_meta,
        build_avi,
        decode_avi_frames,
        decode_bmp_pixels,
        decode_png_pixels,
        gif_frame_index,
        mp3_frame_walk,
        pcm_frame_energies,
        png_chunk_integrity,
        sniff_image_meta,
        sniff_mp4_meta,
        sniff_tiff_meta,
        sniff_wav_meta,
        sniff_webp_meta,
        tar_member_index,
        wav_pcm_stats,
        write_bmp,
        write_png,
        write_tiff_meta,
    )

    walkers = [sniff_image_meta, sniff_wav_meta, sniff_webp_meta,
               sniff_tiff_meta, mp3_frame_walk, sniff_mp4_meta,
               decode_png_pixels, decode_bmp_pixels, png_chunk_integrity,
               wav_pcm_stats, pcm_frame_energies, avi_meta]

    def try_all(b):
        for w in walkers:
            w(b)          # must not raise
        try:
            gif_frame_index(b)
        except ValueError:
            pass          # gif walker documents ValueError on non-GIF
        try:
            tar_member_index(b)
        except ValueError:
            pass          # tar walker documents loud failure
        try:
            list(decode_avi_frames(b))
        except ValueError:
            pass          # avi decoder documents loud failure

    rng = random.Random(42)
    for _ in range(300):
        try_all(bytes(rng.randrange(256)
                      for _ in range(rng.randrange(0, 200))))

    valid = [write_tiff_meta(80, 60, pages=2, big_endian=True),
             write_bmp(b"\x00" * 36, 4, 3),
             write_png(b"\x01" * 27, 3, 3,
                       row_filters=[0, 2, 4])]
    # seed each walker's own magic so fuzz reaches past the header check
    valid.append(b"RIFF\x10\x00\x00\x00WEBPVP8 ")
    valid.append(build_avi(3, 2, [b"\x00" * 12] * 2))
    valid.append(b"\xff\xfb\x92\x00" + b"\x00" * 40)
    for v in valid:
        for cut in range(0, min(len(v), 64)):
            try_all(v[:cut])
        for _ in range(100):
            b = bytearray(v)
            b[rng.randrange(len(b))] = rng.randrange(256)
            try_all(bytes(b))


def test_avi_kernel_roundtrip_and_strictness():
    """Uncompressed-AVI frame extraction: build_avi → decode_avi_frames
    recovers exact pixels top-down RGB (orientation is load-bearing: a
    row-order bug flips y and changes the first pixel), sampling takes
    every k-th frame, and the strictness negatives refuse loudly."""
    import struct as _struct

    from pigeon_optics_spark.pipeline.multimodal import (
        avi_meta,
        build_avi,
        decode_avi_frames,
    )

    w, h = 9, 4  # stride 27 → pad 1: the stride-pad rule is live
    stride, pad = w * 3, (-(w * 3)) % 4

    def dib(f):
        out = bytearray()
        for sy in range(h):            # stored bottom-up
            y = h - 1 - sy
            for x in range(w):
                base = 7 * 17 + f * 5 + y * 7 + x * 3
                out += bytes([(base * 11 + 2) % 256,
                              (base * 5 + 1) % 256, base % 256])  # BGR
            out += b"\x00" * pad
        return bytes(out)

    avi = build_avi(w, h, [dib(f) for f in range(5)])
    assert avi_meta(avi) == (w, h, 5, 40000)

    frames = list(decode_avi_frames(avi, every_k=2))
    assert [f[0] for f in frames] == [0, 2, 4]
    for fno, fw, fh, rgb in frames:
        assert (fw, fh, len(rgb)) == (w, h, w * h * 3)
        for y in (0, h - 1):
            for x in (0, w - 1):
                base = 7 * 17 + fno * 5 + y * 7 + x * 3
                off = (y * w + x) * 3
                assert rgb[off:off + 3] == bytes(
                    [base % 256, (base * 5 + 1) % 256,
                     (base * 11 + 2) % 256])

    # negatives: truncated frame payload, compressed chunk, bad magic
    import pytest as _pytest
    with _pytest.raises(ValueError, match="truncated|runs past|parseable"):
        list(decode_avi_frames(avi[:-10]))
    compressed = avi.replace(b"00db", b"00dc")
    with _pytest.raises(ValueError, match="compressed"):
        list(decode_avi_frames(compressed))
    assert avi_meta(b"RIFF\x04\x00\x00\x00WAVE") is None
    with _pytest.raises(ValueError, match="parseable"):
        list(decode_avi_frames(b"garbage"))


def test_avi_property_roundtrip():
    """Random geometry/frame-count AVI roundtrip: every pixel of every
    frame decodes exactly across stride pads 0-3 and both tiny and
    wide geometries."""
    import random

    from pigeon_optics_spark.pipeline.multimodal import (
        avi_meta,
        build_avi,
        decode_avi_frames,
    )

    rng = random.Random(7)
    for _ in range(12):
        w = rng.randrange(1, 15)
        h = rng.randrange(1, 10)
        n = rng.randrange(1, 6)
        pad = (-(w * 3)) % 4
        pixels = [[rng.randrange(256) for _ in range(w * h * 3)]
                  for _ in range(n)]

        def dib(f):
            out = bytearray()
            for sy in range(h):
                y = h - 1 - sy
                for x in range(w):
                    off = (y * w + x) * 3
                    r, g, b = pixels[f][off:off + 3]
                    out += bytes([b, g, r])
                out += b"\x00" * pad
            return bytes(out)

        avi = build_avi(w, h, [dib(f) for f in range(n)])
        assert avi_meta(avi) == (w, h, n, 40000)
        frames = list(decode_avi_frames(avi))
        assert len(frames) == n
        for fno, fw, fh, rgb in frames:
            assert list(rgb) == pixels[fno]


def test_avi_rec_lists_multistream_and_frame_count():
    """'rec ' grouping LISTs recurse; a second video stream refuses; a
    frame count disagreeing with avih refuses (silently-short class)."""
    import struct as _struct

    import pytest as _pytest

    from pigeon_optics_spark.pipeline.multimodal import (
        build_avi,
        decode_avi_frames,
    )

    def chunk(cid, payload):
        return (cid + _struct.pack("<I", len(payload)) + payload
                + (b"\x00" if len(payload) % 2 else b""))

    w, h = 4, 2
    dib = bytes(range(w * h * 3))  # stride 12, pad 0
    base = build_avi(w, h, [dib, dib])

    # rewrap the two movi frames inside a 'rec ' LIST
    plain_movi = chunk(b"LIST", b"movi" + chunk(b"00db", dib)
                       + chunk(b"00db", dib))
    rec_movi = chunk(b"LIST", b"movi" + chunk(
        b"LIST", b"rec " + chunk(b"00db", dib) + chunk(b"00db", dib)))
    assert plain_movi in base
    grouped = base.replace(plain_movi, rec_movi)
    # RIFF size changed: rebuild the header length field
    grouped = b"RIFF" + _struct.pack("<I", len(grouped) - 8) + grouped[8:]
    assert [f[0] for f in decode_avi_frames(grouped)] == [0, 1]

    # second video stream refuses
    second = base.replace(b"00db", b"01db", 1)
    with _pytest.raises(ValueError, match="stream"):
        decode_avi_frames(second)

    # avih declares 2 frames; drop one movi frame cleanly -> refuse
    short_movi = chunk(b"LIST", b"movi" + chunk(b"00db", dib))
    short = base.replace(plain_movi, short_movi)
    short = b"RIFF" + _struct.pack("<I", len(short) - 8) + short[8:]
    with _pytest.raises(ValueError, match="declares"):
        decode_avi_frames(short)
