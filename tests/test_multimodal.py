"""Image header parsing: pure byte-level tests (no Spark) + the synth
round-trip.  The corpus-scale oracle (`image_meta` in __spark_entry__)
checks the Spark plumbing; these pin the parser's edge behavior."""

from __future__ import annotations

from htmlcleanup_spark.operators.multimodal import (
    parse_image_header,
    synth_image_bytes,
)


def test_png_ihdr():
    b = synth_image_bytes(0)  # png, w=1, h=1
    assert parse_image_header(b) == ("png", 1, 1)
    big = synth_image_bytes(3 * 511)  # png, w=1+509? compute directly
    fmt, w, h = parse_image_header(big)
    assert fmt == "png" and w == 1 + (3 * 511) % 512 and h == 1 + (3 * 511 * 7) % 512


def test_jpeg_segment_walk_past_app0_and_comment():
    b = synth_image_bytes(1)  # jpeg
    assert parse_image_header(b) == ("jpeg", 2, 8)


def test_jpeg_fill_bytes_between_segments():
    # insert a 0xFF fill byte before the SOF marker: still parsed
    b = synth_image_bytes(1)
    i = b.find(b"\xff\xc0")
    padded = b[:i] + b"\xff" + b[i:]
    assert parse_image_header(padded) == ("jpeg", 2, 8)


def test_gif_screen_descriptor():
    assert parse_image_header(synth_image_bytes(2)) == ("gif", 3, 15)


def test_garbage_and_truncation_never_raise():
    assert parse_image_header(b"") == (None, None, None)
    assert parse_image_header(b"plain text") == (None, None, None)
    # truncated PNG: signature only
    assert parse_image_header(b"\x89PNG\r\n\x1a\n") == ("png", None, None)
    # truncated GIF header
    assert parse_image_header(b"GIF89a\x05") == ("gif", None, None)
    # JPEG with no SOF before truncation
    assert parse_image_header(b"\xff\xd8\xff\xe0\x00\x04\x00\x00") == (
        "jpeg", None, None,
    )
    # JPEG with corrupt (non-marker) byte mid-stream
    assert parse_image_header(b"\xff\xd8zz") == ("jpeg", None, None)
    # zero-length segment field cannot loop forever
    assert parse_image_header(b"\xff\xd8\xff\xe0\x00\x00zz") == (
        "jpeg", None, None,
    )


def test_synth_cycle_matches_oracle_arithmetic():
    for i in (0, 1, 2, 100, 511, 512, 1000):
        fmt, w, h = parse_image_header(synth_image_bytes(i))
        assert fmt == ("png", "jpeg", "gif")[i % 3]
        assert w == 1 + i % 512
        assert h == 1 + (i * 7) % 512
