"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
metadata struct.  The Spark-side plumbing (schema, Arrow batching via
mapInPandas, partition behavior) is real and tested; the *decode* step is a
stub because no image/audio codec libraries exist in this container —
``decode_stub=True`` (default) derives deterministic fake features from the
payload digest, ``decode_stub=False`` raises NotImplementedError where a
real ``PIL.Image.open`` / ``soundfile.read`` call would go.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

FEATURE_DDL = (
    "doc_id bigint, n_bytes bigint, digest string, width int, height int, "
    "codec string"
)


def _fake_decode(payload: bytes):
    """Deterministic stand-in for an image decode: dimensions from digest."""
    d = hashlib.md5(payload).digest()
    width = 16 * (1 + d[0] % 64)
    height = 16 * (1 + d[1] % 64)
    return width, height


def extract_features(df: DataFrame, payload_col: str = "payload",
                     id_col: str = "doc_id",
                     decode_stub: bool = True) -> DataFrame:
    """binary payload -> per-item features via Arrow-batched mapInPandas.

    Batch shape: the UDF sees pandas DataFrames of whole Arrow batches; per
    element it computes (n_bytes, md5 digest, fake WxH).  Swap `_fake_decode`
    for a real codec on a cluster with PIL/ffmpeg available.
    """

    def fe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                if not decode_stub:
                    raise NotImplementedError(
                        "real decode needs PIL/soundfile; not in this container"
                    )
                w, h = _fake_decode(payload)
                rows.append(
                    (
                        int(doc_id),
                        len(payload),
                        hashlib.md5(payload).hexdigest(),
                        w,
                        h,
                        "stub",
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_bytes", "digest", "width", "height", "codec"],
            )

    return df.select(id_col, payload_col).mapInPandas(fe, FEATURE_DDL)


# ---------------------------------------------------------------------------
# image header metadata: REAL byte-level parsing, no codec libraries needed
# ---------------------------------------------------------------------------

IMAGE_META_DDL = (
    "doc_id bigint, format string, width int, height int, n_bytes bigint"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_JPEG_SOF = frozenset(
    (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
     0xCE, 0xCF)
)


def parse_image_header(b: bytes):
    """(format, width, height) from a PNG / JPEG / GIF byte header, or
    (None, None, None) for anything unrecognized or truncated.

    Pure container-format parsing (PNG IHDR chunk, JPEG segment walk to the
    first SOF marker, GIF logical-screen descriptor) — the dimensions live
    in the first bytes, so a training pipeline can size-filter billions of
    images while reading only parquet's first column pages, no decode, no
    codec dependency.  Never raises on garbage.
    """
    if b[:8] == _PNG_SIG:
        # first chunk must be IHDR: 4-byte length, 'IHDR', width, height
        if len(b) >= 24 and b[12:16] == b"IHDR":
            return (
                "png",
                int.from_bytes(b[16:20], "big"),
                int.from_bytes(b[20:24], "big"),
            )
        return "png", None, None
    if b[:6] in (b"GIF87a", b"GIF89a"):
        if len(b) >= 10:
            return (
                "gif",
                int.from_bytes(b[6:8], "little"),
                int.from_bytes(b[8:10], "little"),
            )
        return "gif", None, None
    if b[:2] == b"\xff\xd8":
        i = 2
        n = len(b)
        while i + 4 <= n:
            if b[i] != 0xFF:
                break  # not at a marker: corrupt stream
            marker = b[i + 1]
            if marker == 0xFF:
                i += 1  # fill byte
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD9:
                i += 2  # standalone marker, no length field
                continue
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            if seg_len < 2:
                break
            if marker in _JPEG_SOF:
                # SOF payload: precision(1), height(2), width(2)
                if i + 9 <= n:
                    return (
                        "jpeg",
                        int.from_bytes(b[i + 7 : i + 9], "big"),
                        int.from_bytes(b[i + 5 : i + 7], "big"),
                    )
                break
            i += 2 + seg_len
        return "jpeg", None, None
    return None, None, None


def image_meta(df: DataFrame, payload_col: str = "payload",
               id_col: str = "doc_id") -> DataFrame:
    """Per-item image metadata via Arrow-batched header parsing:
    (doc_id, format, width, height, n_bytes); format/dims NULL for
    unrecognized payloads.  This is the decode-free fraction of image
    feature extraction that IS possible offline — the pixel-level decode
    stays behind extract_features(decode_stub=...)."""

    def fe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                fmt, w, h = parse_image_header(payload)
                rows.append((int(doc_id), fmt, w, h, len(payload)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "format", "width", "height", "n_bytes"],
            )

    return df.select(id_col, payload_col).mapInPandas(fe, IMAGE_META_DDL)


def synth_image_bytes(i: int) -> bytes:
    """Deterministic minimal-but-well-formed image bytes for doc #i:
    format cycles png/jpeg/gif by i%3; width = 1 + i%512,
    height = 1 + (i*7)%512.  The SQL oracle recomputes the dims from i
    arithmetically, so the header parser is checked against an
    independently-derived expectation."""
    w = 1 + i % 512
    h = 1 + (i * 7) % 512
    k = i % 3
    if k == 0:  # PNG: signature + IHDR chunk (crc not validated by parsers)
        ihdr = (
            w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0])
        )
        return (
            _PNG_SIG + (13).to_bytes(4, "big") + b"IHDR" + ihdr
            + b"\x00\x00\x00\x00"
        )
    if k == 1:  # JPEG: SOI + APP0 + COM + SOF0 + EOI
        # length field counts itself + payload: 2 + 14 = 16
        app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
        com = b"\xff\xfe" + (7).to_bytes(2, "big") + b"synth"
        sof = (
            b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
            + h.to_bytes(2, "big") + w.to_bytes(2, "big")
            + b"\x01" + b"\x01\x11\x00"  # Nf=1 + (id, sampling, qtable)
        )
        return b"\xff\xd8" + app0 + com + sof + b"\xff\xd9"
    # GIF: header + logical screen descriptor + trailer
    return (
        b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + b"\x00\x00\x00;"
    )
