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
