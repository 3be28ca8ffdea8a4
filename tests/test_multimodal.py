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


# ---------------------------------------------------------------------------
# audio header metadata
# ---------------------------------------------------------------------------

def test_wav_chunk_walk():
    from htmlcleanup_spark.operators.multimodal import (
        parse_audio_header, synth_audio_bytes,
    )

    # j=1: 16 kHz stereo 16-bit, 1601 samples -> 100 ms (integer floor)
    assert parse_audio_header(synth_audio_bytes(2)) == (
        "wav", 16000, 2, 16, 100,
    )
    # extra chunk before fmt must be skipped (word-aligned walk)
    b = synth_audio_bytes(2)
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx"
    spliced = b[:12] + extra + b"\x00" + b[12:]  # odd len -> pad byte
    assert parse_audio_header(spliced)[:4] == ("wav", 16000, 2, 16)


def test_mp3_frame_walk_and_id3_skip():
    from htmlcleanup_spark.operators.multimodal import (
        parse_audio_header, synth_audio_bytes,
    )

    # j=0: 5 frames, no ID3 -> 5*1152*1000//44100 = 130 ms
    assert parse_audio_header(synth_audio_bytes(1)) == (
        "mp3", 44100, 2, None, 130,
    )
    # j=1: ID3v2 tag prefixed, 6 frames
    assert parse_audio_header(synth_audio_bytes(3)) == (
        "mp3", 44100, 2, None, 156,
    )


def test_audio_garbage_never_raises():
    from htmlcleanup_spark.operators.multimodal import parse_audio_header

    none5 = (None, None, None, None, None)
    assert parse_audio_header(b"") == none5
    assert parse_audio_header(b"NOTAUDIOJUNKJUNK") == none5
    # RIFF but not WAVE
    assert parse_audio_header(b"RIFF\x04\x00\x00\x00AVI ") == none5
    # truncated WAV: RIFF/WAVE but no chunks
    assert parse_audio_header(b"RIFF\x04\x00\x00\x00WAVE") == (
        "wav", None, None, None, None,
    )
    # MP3 sync byte but reserved samplerate index -> no frames counted
    assert parse_audio_header(bytes((0xFF, 0xFB, 0x9C, 0x00))) == (
        "mp3", None, None, None, None,
    )


def test_audio_meta_spark_plan(spark):
    import pandas as pd

    from htmlcleanup_spark.operators.multimodal import (
        audio_meta, synth_audio_bytes,
    )

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["id"],
                    "payload": [synth_audio_bytes(int(i)) for i in pdf["id"]],
                }
            )

    df = spark.range(40).mapInPandas(gen, "doc_id bigint, payload binary")
    rows = {r.doc_id: r for r in audio_meta(df).collect()}
    assert rows[0].format is None and rows[0].n_bytes == 16
    assert rows[2].format == "wav" and rows[2].duration_e3 == 100
    assert rows[1].format == "mp3" and rows[1].bits is None
    assert rows[34].format is None  # garbage band hits both parities


# ---------------------------------------------------------------------------
# video container metadata (ISO BMFF box walk)
# ---------------------------------------------------------------------------

def test_mp4_box_walk():
    from htmlcleanup_spark.operators.multimodal import (
        parse_video_header, synth_video_bytes,
    )

    # i=1: mp42, timescale 1000, 3001 units -> 3001 ms, 2 tracks, 720p
    assert parse_video_header(synth_video_bytes(1)) == (
        "mp4", "mp42", 3001, 2, 1280, 720,
    )
    # i=2: isom, timescale 600 -> 3002*1000//600 = 5003 ms, 1080p
    assert parse_video_header(synth_video_bytes(2)) == (
        "mp4", "isom", 5003, 3, 1920, 1080,
    )
    # i=5: version-1 mvhd (64-bit duration), same arithmetic
    assert parse_video_header(synth_video_bytes(5)) == (
        "mp4", "mp42", 3005, 3, 1280, 720,
    )


def test_mp4_largesize_and_to_end_boxes():
    from htmlcleanup_spark.operators.multimodal import (
        parse_video_header, synth_video_bytes,
    )

    b = synth_video_bytes(1)
    # rewrite ftyp as a 64-bit largesize box: size=1 + 8-byte size
    ftyp_payload = b[8:20]
    big_ftyp = (
        (1).to_bytes(4, "big") + b"ftyp"
        + (16 + len(ftyp_payload)).to_bytes(8, "big") + ftyp_payload
    )
    assert parse_video_header(big_ftyp + b[20:]) == (
        "mp4", "mp42", 3001, 2, 1280, 720,
    )
    # size==0 (to end of file) on the LAST top-level box (moov)
    to_end = b[:20] + (0).to_bytes(4, "big") + b[24:]
    assert parse_video_header(to_end) == (
        "mp4", "mp42", 3001, 2, 1280, 720,
    )


def test_video_garbage_never_raises():
    from htmlcleanup_spark.operators.multimodal import parse_video_header

    none6 = (None,) * 6
    assert parse_video_header(b"") == none6
    assert parse_video_header(b"NOTVIDEOJNK!") == none6
    # declared size overruns the buffer -> walk stops, no brand seen
    assert parse_video_header(
        (999).to_bytes(4, "big") + b"ftypisom"
    ) == none6
    # moov with truncated mvhd: brand parses, duration stays None
    from htmlcleanup_spark.operators.multimodal import _box
    b = _box(b"ftyp", b"isom" + b"\x00" * 8) + _box(
        b"moov", _box(b"mvhd", b"\x00\x00\x00")
    )
    assert parse_video_header(b) == ("mp4", "isom", None, 0, None, None)


def test_video_meta_spark_plan(spark):
    import pandas as pd

    from htmlcleanup_spark.operators.multimodal import (
        synth_video_bytes, video_meta,
    )

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["id"],
                    "payload": [synth_video_bytes(int(i)) for i in pdf["id"]],
                }
            )

    df = spark.range(40).mapInPandas(gen, "doc_id bigint, payload binary")
    rows = {r.doc_id: r for r in video_meta(df).collect()}
    assert rows[0].format is None and rows[0].n_bytes == 12
    assert rows[1].brand == "mp42" and rows[1].n_tracks == 2
    assert rows[2].duration_e3 == 5003 and rows[2].width == 1920
    assert rows[5].duration_e3 == 3005  # version-1 mvhd path
    assert rows[38].format is None  # junk band (19*2)


def test_parse_exif_roundtrip_and_absence():
    from htmlcleanup_spark.operators.multimodal import (
        parse_exif,
        synth_exif_bytes,
    )

    for i in (0, 1, 2, 5, 28, 103):
        got = parse_exif(synth_exif_bytes(i))
        if i % 4 == 3:
            assert got == (False, None, None, None, None)
        else:
            assert got == (
                True, "II" if i % 2 == 0 else "MM", 1 + i % 8,
                "Cam%d" % (i % 5),
                "2026:01:%02d 12:00:00" % (1 + i % 28),
            )
    # corrupt inputs never raise and never claim EXIF
    for junk in (b"", b"\xff\xd8", b"plainly not a jpeg",
                 b"\xff\xd8\xff\xe1\x00\x10Exif\x00\x00ZZ\x00\x2a"):
        assert parse_exif(junk)[0] is False


def test_exif_meta_spark(spark):
    import pandas as pd

    from htmlcleanup_spark.operators.multimodal import (
        exif_meta,
        synth_exif_bytes,
    )

    pdf = pd.DataFrame({
        "doc_id": [0, 1, 3],
        "payload": [synth_exif_bytes(i) for i in (0, 1, 3)],
    })
    rows = {r.doc_id: r for r in exif_meta(
        spark.createDataFrame(pdf)).collect()}
    assert rows[0].byte_order == "II" and rows[0].orientation == 1
    assert rows[1].byte_order == "MM" and rows[1].make == "Cam1"
    assert rows[3].has_exif is False and rows[3].orientation is None
