"""The real image-container codec behind the multimodal seam (r16 verdict
#7): PNG IHDR parsing and the JPEG segment walk, exercised through the
public decode_features Arrow-batch path (the closure is self-contained for
cloudpickle, so the parser is only reachable through it)."""

from __future__ import annotations

import struct

from cta_train_tracker_analytics_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    decode_features,
)


def _png(w: int, h: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x06\x00\x00\x00"
    )


def _jpeg(w: int, h: int, extra_segments: int = 0, fill_bytes: int = 0) -> bytes:
    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # optional COM segments + a standalone RST marker before the frame
    # header — the walk must skip both kinds correctly
    fillers = (b"\xff\xfe\x00\x04ab" + b"\xff\xd0") * extra_segments
    # ITU-T T.81 §B.1.1.2 allows any number of 0xFF fill bytes before a
    # marker byte; fill_bytes pads the SOF marker with them
    sof0 = (
        b"\xff" * fill_bytes
        + b"\xff\xc0\x00\x11\x08"
        + struct.pack(">HH", h, w)
        + b"\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 + fillers + sof0


def _decode(spark, payloads):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "doc_id long, data binary"
    )
    rows = decode_features(df).collect()
    return {r["doc_id"]: r for r in rows}


def test_codec_parses_png_and_jpeg_headers(spark):
    got = _decode(spark, [_png(640, 480), _jpeg(1024, 7), _jpeg(3, 5, extra_segments=2)])
    assert (got[0]["format"], got[0]["width"], got[0]["height"]) == ("png", 640, 480)
    assert got[0]["first_byte"] == 0x89 and got[0]["n_bytes"] == 29
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("jpeg", 1024, 7)
    # segment walk: COM segments and standalone RST markers are stepped over
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == ("jpeg", 3, 5)


def test_codec_skips_jpeg_fill_bytes_before_markers(spark):
    # spec-legal 0xFF padding before the SOF marker (ADVICE r17): the walk
    # must treat the run as fill, not read a fill byte as the marker
    got = _decode(
        spark,
        [
            _jpeg(31, 17, fill_bytes=3),
            _jpeg(8, 8, extra_segments=1, fill_bytes=7),
            b"\xff\xd8" + b"\xff" * 6,  # SOI then only fill bytes: no frame
        ],
    )
    assert (got[0]["format"], got[0]["width"], got[0]["height"]) == ("jpeg", 31, 17)
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("jpeg", 8, 8)
    assert got[2]["format"] == "jpeg"
    assert got[2]["width"] is None and got[2]["height"] is None


def test_codec_edge_payloads_never_crash_the_batch(spark):
    truncated_jpeg = _jpeg(9, 9)[:12]        # SOI+APP0 cut before SOF
    eoi_only = b"\xff\xd8\xff\xd9"           # SOI then EOI, no frame
    corrupt_len = b"\xff\xd8\xff\xfe\x00\x00" + b"\xff\xc0"  # len<2 must advance
    bad_magic_png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16      # no IHDR tag
    got = _decode(
        spark,
        [truncated_jpeg, eoi_only, corrupt_len, bad_magic_png, b"", None, b"BM12"],
    )
    for i in (0, 1, 2):
        assert got[i]["format"] == "jpeg"
        assert got[i]["width"] is None and got[i]["height"] is None
    # PNG magic without IHDR falls back to raw byte features
    assert got[3]["format"] == "raw" and got[3]["width"] == 24 % 640
    assert got[4]["format"] == "raw" and got[4]["n_bytes"] == 0
    assert got[4]["first_byte"] == 0
    assert got[5]["format"] is None and got[5]["n_bytes"] is None
    assert got[6]["format"] == "raw"  # ASCII-leading bytes never sniff


def test_feature_schema_has_format_column():
    assert [f.name for f in FEATURE_SCHEMA.fields] == [
        "doc_id", "format", "n_bytes", "first_byte", "width", "height",
    ]
