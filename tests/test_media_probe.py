"""MediaProbe (operators/multimodal.py): REAL container-header parsing
— PNG IHDR, JPEG SOF marker walk, GIF/BMP headers, RIFF/WAVE fmt chunk
— with no codec libraries. Valid payloads are built byte-by-byte here
(struct-packed per the public format specs), so the parser is tested
against the real wire layout, not a mock of itself."""

import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators import MediaProbe, probe_media


def png(w, h):
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
            + b"\x00\x00\x00\x00")


def gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def bmp(w, h):
    return (b"BM" + struct.pack("<I", 26) + b"\x00\x00\x00\x00"
            + struct.pack("<I", 26) + struct.pack("<I", 12)
            + struct.pack("<ii", w, h))


def jpeg(w, h):
    # SOI, APP0 (JFIF), then SOF0 — the probe must WALK past APP0
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
            + struct.pack(">HH", h, w) + b"\x03" + b"\x01\x11\x00" * 3)
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def wav(sr, ch):
    fmt = (b"fmt " + struct.pack("<I", 16) + struct.pack("<H", 1)
           + struct.pack("<H", ch) + struct.pack("<I", sr)
           + struct.pack("<I", sr * ch * 2) + struct.pack("<H", ch * 2)
           + struct.pack("<H", 16))
    data = b"data" + struct.pack("<I", 4) + b"\x00" * 4
    body = b"WAVE" + fmt + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_probe_media_parses_real_headers():
    assert probe_media(png(640, 480)) == {
        "format": "png", "width": 640, "height": 480,
        "sample_rate": None, "channels": None}
    assert probe_media(gif(13, 7))["format"] == "gif"
    assert (probe_media(gif(13, 7))["width"],
            probe_media(gif(13, 7))["height"]) == (13, 7)
    assert probe_media(bmp(320, 200)) == {
        "format": "bmp", "width": 320, "height": 200,
        "sample_rate": None, "channels": None}
    # BMP stores bottom-up rows as negative height — geometry is abs
    assert probe_media(bmp(320, -200))["height"] == 200
    j = probe_media(jpeg(1920, 1080))
    assert (j["format"], j["width"], j["height"]) == ("jpeg", 1920, 1080)
    a = probe_media(wav(44100, 2))
    assert (a["format"], a["sample_rate"], a["channels"]) \
        == ("wav", 44100, 2)


def test_probe_media_never_raises_on_garbage():
    for p in (None, b"", b"not media", png(1, 1)[:10], jpeg(9, 9)[:3],
              b"RIFFxxxxWAVE", b"\xff\xd8\xff\xfe\x00"):
        got = probe_media(p)
        assert got["format"] is None and got["width"] is None


def test_media_probe_operator_end_to_end(spark):
    rows = [(0, png(64, 32)), (1, jpeg(100, 50)), (2, gif(8, 4)),
            (3, wav(16000, 1)), (4, b"corrupt")]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = MediaProbe().transform(df).select("id", "media_probe.*")
    got = {r.id: (r.format, r.width, r.height, r.sample_rate, r.channels)
           for r in out.collect()}
    assert got == {0: ("png", 64, 32, None, None),
                   1: ("jpeg", 100, 50, None, None),
                   2: ("gif", 8, 4, None, None),
                   3: ("wav", None, None, 16000, 1),
                   4: (None, None, None, None, None)}
