"""Spark wiring for charset sniffing + transcoding (pure core:
:mod:`htmlcleanup_spark.engine.charset`).

``decode_pages`` is the bytes→str head of the extraction pipeline — a
stateless Arrow-batched map with zero shuffles, pipelined by Spark into
the same task as an adjacent cascade stage.  ``engine.clean.clean_html``
also sniffs binary inputs through the same core, so WARC payloads flow
WARC → decode → cascade without a bare-utf-8 guess anywhere.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

# re-exported pure core (kept importable from either layer)
from ..engine.charset import (  # noqa: F401
    decode_html,
    detect_charset,
    expected_charset,
    expected_decoded_text,
    synth_encoded_page,
)

DECODE_DDL = "doc_id bigint, text string, charset string, error string"


def decode_pages(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "doc_id") -> DataFrame:
    """binary pages → (text, charset, error)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                text, cs, err = decode_html(payload)
                rows.append((int(doc_id), text, cs, err))
            yield pd.DataFrame(
                rows, columns=["doc_id", "text", "charset", "error"])

    return df.select(id_col, payload_col).mapInPandas(run, DECODE_DDL)
