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
